"""R-D curve plotting from run summaries.

Stands in for the legacy CLI plotter (compressai_vision/run/vcm_app_cli/
plotter.py, SURVEY.md §2.1): accuracy-vs-rate curves for any number of
labelled runs, written to PNG/PDF.

CLI: python -m lmsfc_tpu.tools.plot out.png label1=dir1/cttc.csv label2=...
"""

from __future__ import annotations

import csv
import sys
from pathlib import Path
from typing import Dict, List, Tuple


def read_points(path: Path) -> List[Tuple[float, float]]:
    pts = []
    with open(path) as f:
        for row in csv.DictReader(f):
            rate = row.get("BPP") or row.get("bpp") or row.get("Bitrate [kbps]") or row.get("bitrate_kbps")
            acc = row.get("End-to-end accuracy") or row.get("accuracy")
            if rate and acc:
                pts.append((float(rate), float(acc)))
    return sorted(pts)


def plot_rd(curves: Dict[str, List[Tuple[float, float]]], out_path: Path,
            xlabel: str = "bpp", ylabel: str = "accuracy") -> None:
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    fig, ax = plt.subplots(figsize=(6, 4.5))
    for label, pts in curves.items():
        if not pts:
            continue
        xs, ys = zip(*pts)
        ax.plot(xs, ys, marker="o", label=label)
    ax.set_xlabel(xlabel)
    ax.set_ylabel(ylabel)
    ax.grid(True, alpha=0.3)
    ax.legend()
    fig.tight_layout()
    fig.savefig(out_path, dpi=150)


def main() -> None:
    out = Path(sys.argv[1])
    curves = {}
    for arg in sys.argv[2:]:
        label, _, path = arg.partition("=")
        curves[label] = read_points(Path(path))
    plot_rd(curves, out)
    print(f"wrote {out}")


if __name__ == "__main__":
    main()
