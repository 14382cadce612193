"""Audit a Detectron2 pickle against the expected key/shape manifest.

Usage: python scripts/audit_weights.py model_final_280758.pkl \
           --arch faster_rcnn_R_50_FPN_3x

Exit 0 + "OK" when every expected key is present with the right shape —
the precondition for trusting load_detectron2_weights on that file
(accuracy-parity harness step 1; see docs/parity.md).
"""

from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

ARCHS = {
    "faster_rcnn_R_50_FPN_3x": dict(with_mask=False, depth=50),
    "mask_rcnn_R_50_FPN_3x": dict(with_mask=True, depth=50),
    "faster_rcnn_X_101_32x8d_FPN_3x": dict(
        with_mask=False, depth=101, groups=32, width_per_group=8
    ),
    "mask_rcnn_X_101_32x8d_FPN_3x": dict(
        with_mask=True, depth=101, groups=32, width_per_group=8
    ),
}


def main() -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("pickle_path")
    ap.add_argument("--arch", required=True, choices=sorted(ARCHS))
    args = ap.parse_args()

    from lmsfc_tpu.models.wrappers.manifest import audit_d2_pickle

    report = audit_d2_pickle(args.pickle_path, **ARCHS[args.arch])
    print(json.dumps(report, indent=2))
    print("OK" if report["ok"] else "AUDIT FAILED")
    return 0 if report["ok"] else 1


if __name__ == "__main__":
    raise SystemExit(main())
