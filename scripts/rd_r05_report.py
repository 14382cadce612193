"""Assemble RD_r05.json — the round-4 headline R-D artifact.

Inputs (produced by scripts/r5_tpu_chain.sh stages):
  RD_r05_plain.json    singles + PLAIN gain-unit joint @200k, multi-seed
  RD_r05_charm.json    singles + ChARM(4)+LRP joint @200k, multi-seed
  RD_r05_single.json   singles re-eval with the lambda-96 recalibrated q4
  RD_r04_temporal.json temporal vs intra after the 50k extension
  RD_r04.json          prior rounds' budget trend (50k/100k/150k)

Output RD_r05.json:
  headline — ChARM vs PLAIN joint BD-rate (monotone PCHIP + classic
  cubic) PER SEED with a per-seed bootstrap spread (VERDICT r3 weak #3:
  more frames, a second sequence, and an uncertainty estimate), the
  50k->200k budget trend, and the q4fix + temporal sections.
"""

from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))
sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from rd_eval import bootstrap_bd  # scripts/ sibling

from lmsfc_tpu.tools.bdrate import bd_rate, bd_rate_pchip


def _load(path):
    p = Path(path)
    return json.loads(p.read_text()) if p.exists() else None


def _monotone(single_report):
    """PSNR non-decreasing in rate along the singles curve (None if absent)."""
    pre = single_report.get("single_curve_monotone")
    if pre is not None:
        return pre
    curve = sorted((single_report.get("curves") or {}).get("single") or [])
    if len(curve) < 2:
        return None
    return all(q2 >= q1 for (_, q1), (_, q2) in zip(curve, curve[1:]))


def _joint_rows(report, seed):
    return [r for r in report["rows"]
            if r["model"] == "joint" and r["seed"] == seed]


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--plain", default="RD_r05_plain.json")
    ap.add_argument("--charm", default="RD_r05_charm.json")
    ap.add_argument("--single", default="RD_r05_single.json")
    ap.add_argument("--temporal", default="RD_r04_temporal.json")
    ap.add_argument("--prior", default="RD_r04.json")
    ap.add_argument("--out", default="RD_r05.json")
    ap.add_argument("--budget", default="150k",
                    help="training budget of the evaluated joints, quoted "
                         "in the protocol note. Default 150k: the r4 chain "
                         "skipped the 200k extension (could not fit the TPU "
                         "window before the deadline; the window went to the "
                         "MOT artifact instead), so the standing evals are "
                         "of the 150k checkpoints")
    args = ap.parse_args()

    plain, charm = _load(args.plain), _load(args.charm)
    if not (plain and charm):
        raise SystemExit(f"missing {args.plain} or {args.charm} — run chain stage 9")

    hw = plain["eval"]["hw"]
    n_pixels = hw[0] * hw[1]
    seeds = [s for s in plain["eval"]["seeds"] if s in charm["eval"]["seeds"]]

    per_seed = {}
    for seed in seeds:
        pj = sorted(plain["per_seed"][str(seed)]["curves"]["joint"])
        cj = sorted(charm["per_seed"][str(seed)]["curves"]["joint"])
        entry = {"plain_joint": pj, "charm_joint": cj}
        if len(pj) >= 4 and len(cj) >= 4:
            rp, qp = zip(*pj)
            rc, qc = zip(*cj)
            for name, fn in (("bd_rate_charm_vs_plain_pchip_pct", bd_rate_pchip),
                             ("bd_rate_charm_vs_plain_cubic_pct", bd_rate)):
                try:
                    entry[name] = fn(rp, qp, rc, qc)
                except ValueError as e:
                    entry[name] = None
                    entry[name + "_error"] = str(e)
            entry["bootstrap_p5_p50_p95"] = bootstrap_bd(
                _joint_rows(plain, seed), _joint_rows(charm, seed), n_pixels
            )
        per_seed[str(seed)] = entry

    vals = [e.get("bd_rate_charm_vs_plain_pchip_pct") for e in per_seed.values()]
    vals = [v for v in vals if v is not None]

    prior = _load(args.prior) or {}
    trend = dict(
        (prior.get("headline") or {}).get(
            "bd_rate_charm_vs_plain_joint_pct_by_budget_pchip", {}
        )
    )
    if vals:
        key = args.budget.split()[0]
        if key in trend:
            # a re-measurement of an existing budget point under the wider
            # protocol must not silently replace the original trend entry
            key += "_multiseed"
        trend[key] = sorted(vals)[len(vals) // 2]

    single = _load(args.single)
    temporal = _load(args.temporal)

    out = {
        "protocol": {
            "eval": {**plain["eval"], "note": (
                "held-out procedural->NN1 sequences; per-seed PCHIP BD-rate "
                "of the ChARM(4)+LRP joint vs the plain gain-unit joint at "
                f"the equal-budget {args.budget}-step point, "
                "bootstrap spread per seed")},
        },
        "headline": {
            "bd_rate_charm_vs_plain_pchip_pct_per_seed": {
                s: e.get("bd_rate_charm_vs_plain_pchip_pct")
                for s, e in per_seed.items()
            },
            "bd_rate_charm_vs_plain_pchip_pct_median": (
                sorted(vals)[len(vals) // 2] if vals else None
            ),
            "bd_rate_charm_vs_plain_joint_pct_by_budget_pchip": trend,
            "replication_note": (
                "The sign of the ChARM-vs-plain comparison does NOT "
                "replicate across training instances: the round-3 150k "
                "instance measured -10.6% (16f) / -6.9% median (24f x 2 "
                "seeds, CPU), while the post-reset rebuild of both joints "
                "under the same configs measures +47/+53% per seed (64f x "
                "2 seeds, TPU) — the underlying curves sit ~0.2 dB apart "
                "on a <1 dB-span (fit-sensitive) region, inside "
                "training-instance variance. Standing conclusion: ChARM(4)"
                "+LRP and the plain gain-unit joint are R-D equivalent at "
                "this scale; the plain joint is simpler and currently "
                "slightly ahead."),
        },
        "per_seed": per_seed,
        "q4fix": None if single is None else {
            "single_curve_monotone": _monotone(single),
            "curves": single.get("curves"),
            # the q4-drop CPU fallback ships its own note; the lambda-96
            # retrain (chain stage 3) writes a report without one
            "note": single.get("note") or (
                "top rate point retrained at lambda=96; the retrain did "
                "NOT restore monotonicity (q4 still costs more bits for "
                "less PSNR than q3 on both the 16- and 64-frame "
                "protocols), so the operative fix remains dropping the "
                "top point from BD computations"
                if _monotone(single) is False else
                "top rate point retrained at lambda=96 (inside the "
                "stride-32 saturation knee); the lambda=256 checkpoint "
                "is retained for the record"),
            **({"recomputed_vs_150k_joints":
                single["recomputed_vs_150k_joints"]}
               if "recomputed_vs_150k_joints" in single else {}),
        },
        "temporal": temporal,
    }
    Path(args.out).write_text(json.dumps(out, indent=2))
    med = out["headline"]["bd_rate_charm_vs_plain_pchip_pct_median"]
    print(f"wrote {args.out}; headline median BD-rate(ChARM vs plain, PCHIP) "
          + (f"{med:+.2f}%" if med is not None else "undefined")
          + f" over seeds {seeds}; trend {trend}")


if __name__ == "__main__":
    main()
