"""Image quality metrics: PSNR and MS-SSIM (host numpy).

Backs the `metrics-eval` CLI verb (ref run/vcm_app_cli/metrics_eval.py:
psnr + ms-ssim per image over a dataset). Pure numpy — these run on decoded
PNGs on the host next to file IO, not in the jit path.
"""

from __future__ import annotations

import numpy as np

# Wang et al. 2003 5-scale weights
_MSSSIM_WEIGHTS = (0.0448, 0.2856, 0.3001, 0.2363, 0.1333)


def psnr(a: np.ndarray, b: np.ndarray, data_range: float = 255.0) -> float:
    a = np.asarray(a, np.float64)
    b = np.asarray(b, np.float64)
    mse = float(np.mean((a - b) ** 2))
    if mse == 0:
        return float("inf")
    return 10.0 * np.log10(data_range**2 / mse)


def _gaussian_kernel(size: int = 11, sigma: float = 1.5) -> np.ndarray:
    x = np.arange(size, dtype=np.float64) - (size - 1) / 2
    g = np.exp(-(x**2) / (2 * sigma**2))
    return g / g.sum()


def _filter2_valid(img: np.ndarray, k: np.ndarray) -> np.ndarray:
    """Separable 'valid' gaussian filtering over the two leading axes."""
    size = len(k)
    # axis 0
    out = np.zeros((img.shape[0] - size + 1,) + img.shape[1:], img.dtype)
    for i, kv in enumerate(k):
        out += kv * img[i : i + out.shape[0]]
    # axis 1
    out2 = np.zeros((out.shape[0], out.shape[1] - size + 1) + out.shape[2:], img.dtype)
    for i, kv in enumerate(k):
        out2 += kv * out[:, i : i + out2.shape[1]]
    return out2


def ssim(
    a: np.ndarray, b: np.ndarray, data_range: float = 255.0, win: int = 11
) -> tuple[float, float]:
    """Mean SSIM and mean contrast-structure (cs) term, gaussian window."""
    a = np.asarray(a, np.float64)
    b = np.asarray(b, np.float64)
    k = _gaussian_kernel(win, 1.5 * win / 11)
    c1 = (0.01 * data_range) ** 2
    c2 = (0.03 * data_range) ** 2
    mu_a = _filter2_valid(a, k)
    mu_b = _filter2_valid(b, k)
    saa = _filter2_valid(a * a, k) - mu_a**2
    sbb = _filter2_valid(b * b, k) - mu_b**2
    sab = _filter2_valid(a * b, k) - mu_a * mu_b
    cs = (2 * sab + c2) / (saa + sbb + c2)
    s = ((2 * mu_a * mu_b + c1) / (mu_a**2 + mu_b**2 + c1)) * cs
    return float(np.mean(s)), float(np.mean(cs))


def _downsample2(img: np.ndarray) -> np.ndarray:
    h, w = img.shape[:2]
    img = img[: h - h % 2, : w - w % 2]
    return (img[0::2, 0::2] + img[1::2, 0::2] + img[0::2, 1::2] + img[1::2, 1::2]) / 4.0


def ms_ssim(a: np.ndarray, b: np.ndarray, data_range: float = 255.0) -> float:
    """Multi-scale SSIM (Wang et al. 2003), 5 scales, product form.

    Images too small for the full 5-scale pyramid use as many scales as
    fit, with the LUMINANCE-bearing full-SSIM term always taken at the
    last computed scale and the weights renormalized — cs alone is blind
    to brightness shifts, so the luminance term must never be dropped.
    Images smaller than the 11px window fall back to single-scale SSIM
    with a shrunken window."""
    a = np.asarray(a, np.float64)
    b = np.asarray(b, np.float64)
    min_dim = min(a.shape[0], a.shape[1])
    if min_dim < 11:
        win = min_dim if min_dim % 2 else min_dim - 1  # largest odd <= dim
        if win < 3:
            # degenerate (1-2 px): single global SSIM window
            c1 = (0.01 * data_range) ** 2
            c2 = (0.03 * data_range) ** 2
            mu_a, mu_b = a.mean(), b.mean()
            va, vb, cov = a.var(), b.var(), ((a - mu_a) * (b - mu_b)).mean()
            return float(
                ((2 * mu_a * mu_b + c1) * (2 * cov + c2))
                / ((mu_a**2 + mu_b**2 + c1) * (va + vb + c2))
            )
        s, _ = ssim(a, b, data_range, win=win)
        return float(s)
    cs_vals = []
    s_last = 1.0
    n_scales = 0
    for i in range(len(_MSSSIM_WEIGHTS)):
        s, cs = ssim(a, b, data_range)
        s_last = s
        n_scales = i + 1
        if i == len(_MSSSIM_WEIGHTS) - 1:
            break
        cs_vals.append(max(cs, 0.0))
        a2, b2 = _downsample2(a), _downsample2(b)
        if min(a2.shape[0], a2.shape[1]) < 11:
            break
        a, b = a2, b2
    w = np.asarray(_MSSSIM_WEIGHTS[:n_scales], np.float64)
    w = w / w.sum()
    # cs at all but the last computed scale; full SSIM (with luminance) last
    vals = cs_vals[: n_scales - 1] + [max(s_last, 0.0)]
    return float(np.prod([v**wi for v, wi in zip(vals, w)]))
