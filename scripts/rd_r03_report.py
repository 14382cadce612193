"""Assemble the RD_r03 artifact: the r3 ChARM+gain-unit joint curve vs the
r2 single-rate baseline curve (both measured by scripts/rd_eval.py on the
same deterministic synthetic eval features).

Usage: python scripts/rd_r03_report.py [--r3 runs/rd_r03/..RD_r03_raw.json]
"""

from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--r2", default="RD_r02.json")
    ap.add_argument("--r3-raw", default="RD_r03_raw.json")
    ap.add_argument("--out", default="RD_r03.json")
    args = ap.parse_args()

    from lmsfc_tpu.tools.bdrate import bd_rate

    r2 = json.loads(Path(args.r2).read_text())
    r3 = json.loads(Path(args.r3_raw).read_text())
    single = sorted(map(tuple, r2["curves"]["single"]))
    joint_plain = sorted(map(tuple, r2["curves"]["joint"]))
    joint_charm = sorted(map(tuple, r3["curves"]["joint"]))

    report = {
        "curves": {
            "single_r2": single,
            "joint_gain_r2": joint_plain,
            "joint_gain_charm_r3": joint_charm,
        },
        "rows": r3["rows"],
        "eval": r3["eval"],
    }
    rs, qs = zip(*single)
    rc, qc = zip(*joint_charm)
    try:
        report["bd_rate_charm_vs_single_pct"] = bd_rate(rs, qs, rc, qc)
    except ValueError as e:
        report["bd_rate_charm_vs_single_pct"] = None
        report["bd_rate_error"] = str(e)
    rj, qj = zip(*joint_plain)
    try:
        report["bd_rate_charm_vs_plain_joint_pct"] = bd_rate(rj, qj, rc, qc)
    except ValueError as e:
        report["bd_rate_charm_vs_plain_joint_pct"] = None
    Path(args.out).write_text(json.dumps(report, indent=2))
    print(json.dumps({k: v for k, v in report.items() if "bd_rate" in k}, indent=2))
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
