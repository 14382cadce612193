"""Multi-host orchestration: jax.distributed init + per-host artifact gather.

The reference has no distributed layer (SURVEY.md §2.11); on multi-host TPU
pods this module provides the standard recipe: one process per host,
`jax.distributed.initialize` (coordinator via env/Slurm), global Mesh over
all devices, and host-side artifacts (bitstreams, evaluator state, csv rows)
gathered with `multihost_utils.process_allgather` — the TPU analogue of the
reference's parcat+csv aggregation (ref std_codecs.py:204-274,
utils/compute_overall_*.py).
"""

from __future__ import annotations

import os
import pickle
from typing import Any, List, Optional

import jax
import numpy as np


def initialize_distributed(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> None:
    """Idempotent jax.distributed init; no-ops in single-process runs.

    Resolution order: explicit args > JAX_COORDINATOR_ADDRESS env > Slurm
    vars (the reference records Slurm ids only, config/env.py:52-57; here
    they drive real initialization).
    """
    # IMPORTANT: probing jax.process_count() here would itself initialize
    # the XLA backend and make jax.distributed.initialize impossible; the
    # distributed client state is the only safe already-initialized check.
    from jax._src import distributed as _dist

    if getattr(_dist.global_state, "client", None) is not None:
        return  # already initialized
    coordinator_address = coordinator_address or os.environ.get("JAX_COORDINATOR_ADDRESS")
    if coordinator_address is None and "SLURM_JOB_NODELIST" in os.environ:
        jax.distributed.initialize()  # jax auto-detects Slurm clusters
        return
    if coordinator_address is None:
        return  # single host
    if process_id is None:
        process_id = int(os.environ.get("JAX_PROCESS_ID", 0))
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes or int(os.environ.get("JAX_NUM_PROCESSES", 1)),
        process_id=process_id,
    )


def gather_host_objects(obj: Any) -> List[Any]:
    """All-gather arbitrary picklable host objects across processes.

    Serializes to a padded uint8 tensor and rides process_allgather; used to
    merge per-host evaluator state / coded-bytes lists before aggregation.
    """
    if jax.process_count() == 1:
        return [obj]
    from jax.experimental import multihost_utils

    payload = np.frombuffer(pickle.dumps(obj), np.uint8)
    sizes = multihost_utils.process_allgather(np.array([payload.size]))
    max_size = int(np.max(sizes))
    padded = np.zeros(max_size, np.uint8)
    padded[: payload.size] = payload
    all_payloads = multihost_utils.process_allgather(padded)
    return [
        pickle.loads(all_payloads[i, : int(sizes[i][0])].tobytes())
        for i in range(jax.process_count())
    ]


def is_primary() -> bool:
    return jax.process_index() == 0
