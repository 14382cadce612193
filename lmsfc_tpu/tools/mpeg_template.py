"""MPEG FCM reporting-template generator.

Compact equivalent of the reference's template formatter
(utils/mpeg_template_format.py:47-272 + fcm_cttc_output_gen.py:53-162):
takes per-(sequence, rate-point) CTTC csvs for the TEST codec and the ANCHOR
codec, computes per-sequence BD-rate (accuracy vs rate), and emits the
report csv with per-SFU-class-group and overall averages.

CLI: python -m lmsfc_tpu.tools.mpeg_template test_cttc.csv anchor_cttc.csv out.csv
"""

from __future__ import annotations

import csv
import sys
from collections import defaultdict
from pathlib import Path
from typing import Dict, List, Tuple

from .aggregate import SFU_CLASS_GROUPS
from .bdrate import bd_rate


def _load_cttc(path: Path) -> Dict[str, List[Tuple[float, float]]]:
    """sequence -> [(rate, accuracy), ...] (rate = kbps if present else bpp)."""
    curves: Dict[str, List[Tuple[float, float]]] = defaultdict(list)
    with open(path) as f:
        for row in csv.DictReader(f):
            seq = row.get("Sequence", "seq")
            rate = row.get("Bitrate [kbps]") or row.get("BPP")
            acc = row.get("End-to-end accuracy")
            if rate not in (None, "") and acc not in (None, ""):
                curves[seq].append((float(rate), float(acc)))
    return {k: sorted(v) for k, v in curves.items()}


def _group_of(seq: str) -> str:
    for group, names in SFU_CLASS_GROUPS.items():
        if any(n.lower() in seq.lower() for n in names):
            return group
    return "OTHER"


def build_report(test_csv: Path, anchor_csv: Path, out_csv: Path) -> Dict:
    test = _load_cttc(test_csv)
    anchor = _load_cttc(anchor_csv)
    rows = []
    group_bd: Dict[str, List[float]] = defaultdict(list)
    for seq in sorted(test):
        if seq not in anchor or len(test[seq]) < 2 or len(anchor[seq]) < 2:
            continue
        rt, at = zip(*test[seq])
        ra, aa = zip(*anchor[seq])
        try:
            bd = bd_rate(ra, aa, rt, at)
        except (ValueError, FloatingPointError):
            continue
        group = _group_of(seq)
        group_bd[group].append(bd)
        rows.append({"Sequence": seq, "Class": group, "BD-rate [%]": round(bd, 2)})

    summary = {}
    all_bd: List[float] = []
    for group, bds in sorted(group_bd.items()):
        avg = sum(bds) / len(bds)
        summary[group] = avg
        all_bd.extend(bds)
        rows.append({"Sequence": f"{group} AVERAGE", "Class": group,
                     "BD-rate [%]": round(avg, 2)})
    if all_bd:
        overall = sum(all_bd) / len(all_bd)
        summary["OVERALL"] = overall
        rows.append({"Sequence": "OVERALL AVERAGE", "Class": "",
                     "BD-rate [%]": round(overall, 2)})

    with open(out_csv, "w", newline="") as f:
        w = csv.DictWriter(f, fieldnames=["Sequence", "Class", "BD-rate [%]"])
        w.writeheader()
        w.writerows(rows)
    return summary


def main() -> None:
    test, anchor, out = sys.argv[1:4]
    summary = build_report(Path(test), Path(anchor), Path(out))
    for k, v in summary.items():
        print(f"{k}: {v:+.2f}%")


if __name__ == "__main__":
    main()
