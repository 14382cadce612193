"""Conformance comparison: per-channel mean/variance dumps vs tolerance.

The FCM cross-implementation conformance mechanism (ref pipelines/
base.py:193-217 + SURVEY.md §4: subsampled channel statistics compared
between implementations). Compares two conformance JSONs written by
BasePipeline.dump_conformance.

CLI: python -m lmsfc_tpu.tools.conformance ref.json test.json [--tol 1e-3]
"""

from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path

import numpy as np


def compare(ref_path: Path, test_path: Path, tol: float = 1e-3) -> dict:
    ref = json.loads(Path(ref_path).read_text())
    test = json.loads(Path(test_path).read_text())
    report = {"pass": True, "tags": {}}
    for tag in ref:
        if tag not in test:
            report["pass"] = False
            report["tags"][tag] = "missing"
            continue
        entry = {}
        for stat in ("means", "variances"):
            a = np.asarray(ref[tag][stat])
            b = np.asarray(test[tag][stat])
            if a.shape != b.shape:
                entry[stat] = f"shape {a.shape} vs {b.shape}"
                report["pass"] = False
                continue
            err = float(np.max(np.abs(a - b))) if a.size else 0.0
            entry[stat] = err
            if err > tol:
                report["pass"] = False
        report["tags"][tag] = entry
    return report


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("ref")
    ap.add_argument("test")
    ap.add_argument("--tol", type=float, default=1e-3)
    args = ap.parse_args()
    report = compare(Path(args.ref), Path(args.test), args.tol)
    print(json.dumps(report, indent=2))
    sys.exit(0 if report["pass"] else 1)


if __name__ == "__main__":
    main()
