"""rd_eval bootstrap + multi-seed report machinery (VERDICT r3 weak #3:
the headline BD-rate needs an uncertainty estimate and a monotone-frontier
rule that actually drops dominated points)."""

import importlib.util
import sys
from pathlib import Path

import numpy as np
import pytest

REPO = Path(__file__).resolve().parents[1]


def _load_rd_eval():
    spec = importlib.util.spec_from_file_location(
        "rd_eval", REPO / "scripts" / "rd_eval.py"
    )
    mod = importlib.util.module_from_spec(spec)
    sys.path.insert(0, str(REPO / "scripts"))
    spec.loader.exec_module(mod)
    return mod


def _synth_rows(rng, bpps, psnrs, n_frames=16, peak=30.0, jitter=0.1):
    """Rate-point rows with per-frame bytes/MSE that aggregate to ~the
    requested curve (bpp in bits/pixel over 256*384 pixels)."""
    n_pixels = 256 * 384
    rows = []
    for bpp, psnr in zip(bpps, psnrs):
        total_bytes = bpp * n_pixels * n_frames / 8
        w = 1 + jitter * rng.standard_normal(n_frames)
        w = np.maximum(w / w.sum(), 1e-4)
        mse = peak**2 / 10 ** (psnr / 10)
        m = mse * np.maximum(1 + jitter * rng.standard_normal(n_frames), 0.2)
        rows.append({
            "n_frames": n_frames,
            "per_frame_bytes": list(total_bytes * w),
            "per_frame_mse": list(m),
            "peak": peak,
        })
    return rows, n_pixels


def test_bootstrap_bd_recovers_known_gap():
    rd = _load_rd_eval()
    rng = np.random.default_rng(0)
    # joint curve = single curve shifted 10% cheaper at equal quality
    bpps = np.array([0.05, 0.1, 0.2, 0.4])
    psnrs = np.array([33.0, 35.0, 36.5, 37.5])
    s_rows, n_pixels = _synth_rows(rng, bpps, psnrs)
    j_rows, _ = _synth_rows(rng, bpps * 0.9, psnrs)
    spread = rd.bootstrap_bd(s_rows, j_rows, n_pixels, n_boot=100)
    assert spread is not None
    p5, p50, p95 = spread
    assert p5 <= p50 <= p95
    # true gap is -10%; independent per-frame jitter between the two model
    # rows biases/widens the estimate, so only bracket it loosely
    assert -25 < p50 < -3
    assert p95 - p5 < 25
    assert p95 < 0  # the win must be significant at this jitter level


def test_bootstrap_bd_none_when_degenerate():
    rd = _load_rd_eval()
    rng = np.random.default_rng(1)
    # disjoint quality ranges: every resample raises -> None
    s_rows, n_pixels = _synth_rows(rng, [0.05, 0.1, 0.2, 0.4],
                                   [20.0, 21.0, 22.0, 23.0])
    j_rows, _ = _synth_rows(rng, [0.05, 0.1, 0.2, 0.4],
                            [30.0, 31.0, 32.0, 33.0])
    assert rd.bootstrap_bd(s_rows, j_rows, n_pixels, n_boot=20) is None


def test_pchip_drops_dominated_tail_point():
    """A q4 point with MORE bits and LESS quality than q3 (the committed
    single_r4 shape, RD_r04.json:103-112) must not distort the fit: the
    frontier rule drops it, matching the fit on the clean 3-point curve."""
    from lmsfc_tpu.tools.bdrate import bd_rate_pchip

    anchor_r = [0.05, 0.1, 0.369, 0.451]
    anchor_q = [33.0, 35.0, 37.87, 37.57]  # tail: +bits, -quality
    test_r = [0.045, 0.09, 0.33]
    test_q = [33.0, 35.0, 37.8]
    with_tail = bd_rate_pchip(anchor_r, anchor_q, test_r, test_q)
    without = bd_rate_pchip(anchor_r[:3], anchor_q[:3], test_r, test_q)
    assert with_tail == pytest.approx(without)
