"""Multi-host layer test (VERDICT r1 item 9): two REAL jax.distributed CPU
processes — initialize, build a global mesh, run a psum collective across
processes, all-gather host objects, and merge per-host bitstream artifacts
(the parcat-analogue path)."""

import os
import socket
import subprocess
import sys
import textwrap
from pathlib import Path

import pytest

REPO = Path(__file__).resolve().parents[1]

WORKER = textwrap.dedent(
    """
    import os, sys, json
    sys.path.insert(0, os.environ["REPO"])
    import jax
    jax.config.update("jax_platforms", "cpu")

    from lmsfc_tpu.parallel.multihost import (
        gather_host_objects, initialize_distributed, is_primary,
    )

    pid = int(os.environ["PID"])
    initialize_distributed(
        coordinator_address=os.environ["COORD"], num_processes=2, process_id=pid,
    )
    assert jax.process_count() == 2, jax.process_count()
    assert (jax.process_index() == 0) == is_primary()

    # global mesh across both processes' devices
    import numpy as np
    import jax.numpy as jnp
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    devs = np.array(jax.devices())
    assert devs.size == 4, devs  # 2 cpu devices per process
    mesh = Mesh(devs.reshape(4), ("dp",))
    sharding = NamedSharding(mesh, P("dp"))

    @jax.jit
    def global_sum(x):
        return jnp.sum(x)

    # each process contributes its local shard of [0,1,2,3]
    from jax import make_array_from_callback
    arr = make_array_from_callback(
        (4,), sharding, lambda idx: np.arange(4, dtype=np.float32)[idx]
    )
    total = float(global_sum(arr))
    assert total == 6.0, total

    # host-object all-gather (different payload sizes per host)
    mine = {"host": pid, "bytes": [1.0] * (3 + pid), "tag": "x" * (10 * (pid + 1))}
    gathered = gather_host_objects(mine)
    assert len(gathered) == 2
    assert [g["host"] for g in gathered] == [0, 1]
    assert len(gathered[1]["bytes"]) == 4

    # per-host bitstream merge: each host writes a part, primary merges
    out_dir = os.environ["OUT"]
    part = os.path.join(out_dir, f"part_{pid}.bin")
    with open(part, "wb") as f:
        f.write(bytes([pid]) * 8)
    names = gather_host_objects(part)
    if is_primary():
        with open(os.path.join(out_dir, "merged.bin"), "wb") as f:
            for n in sorted(names):
                with open(n, "rb") as p:
                    f.write(p.read())
    print(json.dumps({"pid": pid, "total": total, "ok": True}))
    """
)


def _free_port():
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


@pytest.mark.slow
def test_two_process_distributed(tmp_path):
    port = _free_port()
    worker_py = tmp_path / "worker.py"
    worker_py.write_text(WORKER)
    env_base = {
        **os.environ,
        "REPO": str(REPO),
        "COORD": f"127.0.0.1:{port}",
        "OUT": str(tmp_path),
        "XLA_FLAGS": "--xla_force_host_platform_device_count=2",
        "JAX_PLATFORMS": "cpu",
    }
    procs = [
        subprocess.Popen(
            [sys.executable, str(worker_py)],
            env={**env_base, "PID": str(i)},
            stdout=subprocess.PIPE,
            stderr=subprocess.PIPE,
        )
        for i in range(2)
    ]
    outs = []
    for p in procs:
        out, err = p.communicate(timeout=420)
        outs.append((p.returncode, out.decode(), err.decode()))
    for rc, out, err in outs:
        assert rc == 0, f"worker failed:\n{out}\n{err[-3000:]}"
        assert '"ok": true' in out
    merged = tmp_path / "merged.bin"
    assert merged.exists()
    assert merged.read_bytes() == bytes([0]) * 8 + bytes([1]) * 8
