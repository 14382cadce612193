"""The bench supervisor must be un-losable (VERDICT r4 next #3).

Round 2 and round 4 both lost the driver's bench capture because the old
supervisor buffered the child's entire stdout through a single timeout: a
wedge in any optional stage after the headline measurement threw the
already-measured number away. The rewritten supervisor streams the child's
stdout and re-prints the FIRST JSON line the moment it appears; these tests
drive that logic with scripted children via the LMSFC_BENCH_CHILD_CMD hook
(no TPU, no probe — the probe is bypassed with a stub PROBE that succeeds).

Reference analogue: the reference has no bench driver; this guards this
repo's own BENCH_r0N.json capture contract.
"""

import pytest
import json
import os
import subprocess
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
PROBE_OK_CMD = "echo PROBE_OK"


def run_supervisor(child_cmd: str, deadline: str = "20", timeout: int = 60):
    env = dict(
        os.environ,
        LMSFC_BENCH_CHILD_CMD=child_cmd,
        LMSFC_BENCH_DEADLINE=deadline,
        LMSFC_BENCH_RETRY_DELAYS="0",
        LMSFC_BENCH_PROBE_TIMEOUT="30",
    )
    # the probe subprocess imports jax (slow but works on CPU); keep it off
    # the TPU relay in CI
    env.setdefault("JAX_PLATFORMS", "cpu")
    return subprocess.run(
        [sys.executable, str(REPO / "bench.py")],
        env=env, capture_output=True, text=True, timeout=timeout,
    )


@pytest.mark.slow
def test_headline_survives_wedged_appendix():
    """Child prints the headline then hangs forever: the supervisor must
    still print the headline and exit rc=0 at the global deadline."""
    line = '{"metric": "m", "value": 42.0, "unit": "u", "vs_baseline": 1.0}'
    r = run_supervisor(f"echo '{line}'; sleep 600", deadline="8")
    assert r.returncode == 0, r.stderr[-2000:]
    out = [l for l in r.stdout.splitlines() if l.strip().startswith("{")]
    assert out, r.stdout
    assert json.loads(out[0])["value"] == 42.0


def test_headline_survives_crashing_appendix():
    line = '{"metric": "m", "value": 7.5, "unit": "u", "vs_baseline": 1.0}'
    r = run_supervisor(f"echo '{line}'; exit 3")
    assert r.returncode == 0
    out = [l for l in r.stdout.splitlines() if l.strip().startswith("{")]
    assert json.loads(out[0])["value"] == 7.5


def test_no_headline_degrades_to_partial_json():
    """Child dies before any JSON: supervisor emits a parseable partial
    line with value null (never an empty stdout)."""
    r = run_supervisor("echo not-json; exit 1")
    assert r.returncode == 0
    out = [l for l in r.stdout.splitlines() if l.strip().startswith("{")]
    assert out, r.stdout
    d = json.loads(out[0])
    assert d["value"] is None and "error" in d


def test_first_json_line_wins():
    """Extras printing stray JSON later must not displace the headline."""
    l1 = '{"metric": "m", "value": 1.0, "unit": "u", "vs_baseline": 1.0}'
    l2 = '{"metric": "m", "value": 99.0, "unit": "u", "vs_baseline": 9.0}'
    r = run_supervisor(f"echo '{l1}'; echo '{l2}'")
    assert r.returncode == 0
    out = [l for l in r.stdout.splitlines() if l.strip().startswith("{")]
    assert json.loads(out[0])["value"] == 1.0
