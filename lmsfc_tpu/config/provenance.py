"""Run provenance capture.

Mirrors compressai_vision/config/env.py:44-64 and config/outputs.py:46-79:
records git hash/branch, SLURM vars, host/user/start time, resolved config and
the installed-package list into the run output directory.
"""

from __future__ import annotations

import getpass
import json
import os
import socket
import subprocess
import sys
from datetime import datetime, timezone
from pathlib import Path
from typing import Any, Dict

from .conf import Config


def _git(args, cwd) -> str:
    try:
        return subprocess.run(
            ["git", *args], cwd=cwd, capture_output=True, text=True, timeout=10
        ).stdout.strip()
    except Exception:
        return ""


def get_env() -> Dict[str, Any]:
    here = Path(__file__).resolve().parent
    env: Dict[str, Any] = {
        "git_hash": _git(["rev-parse", "HEAD"], here),
        "git_branch": _git(["rev-parse", "--abbrev-ref", "HEAD"], here),
        "hostname": socket.gethostname(),
        "user": getpass.getuser(),
        "start_utc": datetime.now(timezone.utc).isoformat(),
        "python": sys.version.split()[0],
    }
    for var in ("SLURM_JOB_ID", "SLURM_ARRAY_JOB_ID", "SLURM_ARRAY_TASK_ID"):
        if var in os.environ:
            env[var.lower()] = os.environ[var]
    try:
        import jax

        env["jax_version"] = jax.__version__
        env["jax_backend"] = jax.default_backend()
        env["jax_device_count"] = jax.device_count()
    except Exception:
        pass
    return env


def write_outputs(conf: Config, out_dir: Path) -> None:
    out_dir = Path(out_dir)
    out_dir.mkdir(parents=True, exist_ok=True)
    (out_dir / "config.yaml").write_text(conf.to_yaml())
    (out_dir / "env.json").write_text(json.dumps(get_env(), indent=2))
    # Source paths only: an unrestricted `git diff` of a dirty working tree
    # embeds prior runs' uncommitted artifacts — including their own
    # src.patch — so successive runs' patches compound geometrically
    # (observed: a 557 MB src.patch). Run artifacts/weights are never part
    # of the source delta this file exists to record.
    # :(top) anchors each pathspec at the repo root (the diff runs with cwd
    # inside the package, where a bare "lmsfc_tpu" would match nothing)
    src_paths = ["lmsfc_tpu", "scripts", "tests", "cfgs", "tools", "native"]
    diff = _git(
        ["diff", "--", *(f":(top){p}" for p in src_paths)],
        Path(__file__).resolve().parent,
    )
    if diff:
        cap = 5 * 1024 * 1024
        if len(diff) > cap:
            diff = diff[:cap] + "\n[src.patch truncated at 5 MB]\n"
        (out_dir / "src.patch").write_text(diff)
    # installed-package snapshot (ref config/outputs.py:46-79 captures
    # pip list + freeze); importlib.metadata avoids a pip subprocess
    try:
        from importlib import metadata

        pkgs = sorted(
            f"{d.metadata['Name']}=={d.version}"
            for d in metadata.distributions()
            if d.metadata["Name"]
        )
        (out_dir / "pip_freeze.txt").write_text("\n".join(pkgs) + "\n")
    except Exception:  # provenance must never break a run
        pass
