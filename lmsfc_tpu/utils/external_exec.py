"""Subprocess runner with thread-pooled parallel mode.

Mirrors compressai_vision/utils/external_exec.py:57-107: `run_cmdline` runs
one command logging stdout/stderr to a file; `run_cmdlines_parallel` fans a
list of command lines over a CPU thread pool (used for GOP-parallel anchor
encoding, ref codecs/std_codecs.py:204-255).
"""

from __future__ import annotations

import os
import subprocess
import time
from concurrent.futures import ThreadPoolExecutor
from pathlib import Path
from typing import Optional, Sequence, Union

Cmd = Sequence[Union[str, Path, int, float]]


def get_max_num_cpus() -> int:
    return max(1, os.cpu_count() or 1)


def run_cmdline(cmdline: Cmd, logpath: Optional[Path] = None, retries: int = 0) -> float:
    """Run one command; returns wall seconds. Raises on nonzero exit.

    `retries` re-runs transient failures (the legacy path retried failed
    encoder/decoder invocations once, ref fo_vcm/fo/predict.py:139-147).
    """
    cmd = [str(c) for c in cmdline]
    t0 = time.perf_counter()
    for attempt in range(retries + 1):
        try:
            if logpath is not None:
                Path(logpath).parent.mkdir(parents=True, exist_ok=True)
                with open(logpath, "w" if attempt == 0 else "a") as f:
                    f.write(" ".join(cmd) + "\n")
                    f.flush()
                    subprocess.run(cmd, stdout=f, stderr=subprocess.STDOUT, check=True)
            else:
                subprocess.run(cmd, capture_output=True, check=True)
            break
        except subprocess.CalledProcessError:
            if attempt == retries:
                raise
    return time.perf_counter() - t0


def run_cmdlines_parallel(
    cmdlines: Sequence[Cmd], logpath: Optional[Path] = None, max_workers: Optional[int] = None
) -> float:
    """Run commands concurrently over a thread pool; returns total wall seconds."""
    t0 = time.perf_counter()
    workers = max_workers or min(len(cmdlines), get_max_num_cpus())

    def _one(idx_cmd):
        idx, cmd = idx_cmd
        sublog = None
        if logpath is not None:
            p = Path(logpath)
            sublog = p.with_name(f"{p.stem}_job{idx}{p.suffix}")
        return run_cmdline(cmd, sublog)

    with ThreadPoolExecutor(max_workers=workers) as pool:
        list(pool.map(_one, enumerate(cmdlines)))
    return time.perf_counter() - t0
