"""Bjontegaard-delta metrics: BD-rate / BD-accuracy between R-D curves.

The framework's headline metric is BD-rate (task mAP/MOTA vs bpp) against
the MPEG FCM anchors (BASELINE.json:2, target <=0.1% drift). Standard
Bjontegaard computation: cubic polynomial fit of accuracy vs log-rate,
integrated over the overlapping accuracy range (piecewise-cubic-hermite
variant available for monotone data).

CLI: python -m lmsfc_tpu.tools.bdrate anchor.csv test.csv
     (csv columns: rate, accuracy; one row per rate point)
"""

from __future__ import annotations

import csv
import sys
from pathlib import Path
from typing import List, Sequence, Tuple

import numpy as np


def bd_rate(
    rate_anchor: Sequence[float],
    acc_anchor: Sequence[float],
    rate_test: Sequence[float],
    acc_test: Sequence[float],
) -> float:
    """BD-rate in percent (negative = test needs fewer bits than anchor)."""
    ra = np.log10(np.asarray(rate_anchor, np.float64))
    rt = np.log10(np.asarray(rate_test, np.float64))
    aa = np.asarray(acc_anchor, np.float64)
    at = np.asarray(acc_test, np.float64)

    # sort by accuracy (integration variable)
    ia, it = np.argsort(aa), np.argsort(at)
    ra, aa = ra[ia], aa[ia]
    rt, at = rt[it], at[it]

    pa = np.polyfit(aa, ra, min(3, len(aa) - 1))
    pt = np.polyfit(at, rt, min(3, len(at) - 1))

    lo = max(aa.min(), at.min())
    hi = min(aa.max(), at.max())
    if hi <= lo:
        raise ValueError("accuracy ranges do not overlap")

    ia_int = np.polyint(pa)
    it_int = np.polyint(pt)
    avg_a = (np.polyval(ia_int, hi) - np.polyval(ia_int, lo)) / (hi - lo)
    avg_t = (np.polyval(it_int, hi) - np.polyval(it_int, lo)) / (hi - lo)
    return float((10 ** (avg_t - avg_a) - 1) * 100)


def bd_rate_pchip(
    rate_anchor: Sequence[float],
    acc_anchor: Sequence[float],
    rate_test: Sequence[float],
    acc_test: Sequence[float],
) -> float:
    """BD-rate via monotone piecewise-cubic-Hermite (PCHIP) interpolation.

    The modern JVET practice: interpolate log-rate as a shape-preserving
    PCHIP function of accuracy instead of a global cubic polynomial. On
    near-flat quality curves the global cubic's extrapolation between
    knots can diverge by orders of magnitude; PCHIP stays bounded by the
    data, so it is the variant to quote when `bd_rate` is ill-conditioned.
    Requires >=2 strictly-increasing accuracy points per curve after
    dropping non-monotone (rate-increasing, accuracy-decreasing) tails.
    """
    from scipy.interpolate import PchipInterpolator

    def _fit(rates, accs):
        r = np.log10(np.asarray(rates, np.float64))
        a = np.asarray(accs, np.float64)
        # walk in rate order and keep only the monotone R-D frontier: a
        # point spending MORE rate for NO accuracy gain is dominated and
        # dropped (the documented tail-drop; ADVICE r3 #3 — previously only
        # exact ties were merged and non-monotone points were silently
        # reordered by the accuracy sort, shifting the quoted BD-rate).
        # At equal accuracy the cheaper-rate point wins (first in rate order).
        order = np.argsort(r)
        r, a = r[order], a[order]
        keep_a: List[float] = []
        keep_r: List[float] = []
        for ri, ai in zip(r, a):
            if keep_a and ai <= keep_a[-1] + 1e-12:
                continue
            keep_a.append(float(ai))
            keep_r.append(float(ri))
        if len(keep_a) < 2:
            raise ValueError("need >=2 distinct accuracy points")
        return PchipInterpolator(np.asarray(keep_a), np.asarray(keep_r)), keep_a

    fa, aa = _fit(rate_anchor, acc_anchor)
    ft, at = _fit(rate_test, acc_test)
    lo = max(aa[0], at[0])
    hi = min(aa[-1], at[-1])
    if hi <= lo:
        raise ValueError("accuracy ranges do not overlap")
    avg_a = fa.integrate(lo, hi) / (hi - lo)
    avg_t = ft.integrate(lo, hi) / (hi - lo)
    return float((10 ** (avg_t - avg_a) - 1) * 100)


def bd_accuracy(
    rate_anchor: Sequence[float],
    acc_anchor: Sequence[float],
    rate_test: Sequence[float],
    acc_test: Sequence[float],
) -> float:
    """BD-accuracy: average accuracy gain at equal rate."""
    ra = np.log10(np.asarray(rate_anchor, np.float64))
    rt = np.log10(np.asarray(rate_test, np.float64))
    aa = np.asarray(acc_anchor, np.float64)
    at = np.asarray(acc_test, np.float64)
    ia, it = np.argsort(ra), np.argsort(rt)
    ra, aa = ra[ia], aa[ia]
    rt, at = rt[it], at[it]
    pa = np.polyfit(ra, aa, min(3, len(ra) - 1))
    pt = np.polyfit(rt, at, min(3, len(rt) - 1))
    lo = max(ra.min(), rt.min())
    hi = min(ra.max(), rt.max())
    if hi <= lo:
        raise ValueError("rate ranges do not overlap")
    ia_int = np.polyint(pa)
    it_int = np.polyint(pt)
    avg_a = (np.polyval(ia_int, hi) - np.polyval(ia_int, lo)) / (hi - lo)
    avg_t = (np.polyval(it_int, hi) - np.polyval(it_int, lo)) / (hi - lo)
    return float(avg_t - avg_a)


def _read_curve(path: Path) -> Tuple[List[float], List[float]]:
    rates, accs = [], []
    with open(path) as f:
        for row in csv.DictReader(f):
            rate = row.get("rate") or row.get("bpp") or row.get("bitrate_kbps")
            acc = row.get("accuracy") or row.get("mAP") or row.get("mota")
            rates.append(float(rate))
            accs.append(float(acc))
    return rates, accs


def main() -> None:
    anchor, test = sys.argv[1:3]
    ra, aa = _read_curve(Path(anchor))
    rt, at = _read_curve(Path(test))
    print(f"BD-rate (cubic): {bd_rate(ra, aa, rt, at):+.2f}%")
    print(f"BD-rate (pchip): {bd_rate_pchip(ra, aa, rt, at):+.2f}%")
    print(f"BD-accuracy: {bd_accuracy(ra, aa, rt, at):+.4f}")


if __name__ == "__main__":
    main()
