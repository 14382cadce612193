"""CPU fallback for VERDICT r3 item 6 (non-monotone single q4 point).

The preferred fix — retrain the top rate point at lambda=96, inside the
stride-32 transform's ~0.3 bpp saturation knee — is chain stage 3 and
needs the TPU. If the relay never recovers this round, apply the verdict's
sanctioned alternative instead: "drop the point with a recorded note;
recompute all BD numbers that touched it". Those numbers are pure
post-processing over RD_r04.json's committed curves, so this runs in
seconds on the host.

Writes RD_r05_single.json in the same shape rd_eval.py produces, so
scripts/rd_r05_report.py picks it up unchanged. Chain stage 3, when it
runs, overwrites this file with the retrained-point version.

Usage: python scripts/rd_fallback_q4drop.py [--prior RD_r04.json]
"""

from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from lmsfc_tpu.tools.bdrate import bd_accuracy, bd_rate, bd_rate_pchip


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--prior", default="RD_r04.json")
    ap.add_argument("--out", default="RD_r05_single.json")
    args = ap.parse_args()

    prior = json.loads(Path(args.prior).read_text())
    singles = sorted(prior["curves"]["single_r4"])
    dropped = singles[:-1]  # q4 (lambda=256) is the top-rate point
    assert len(dropped) == 3

    mono = bool(np.all(np.diff([q for _, q in dropped]) > 0))
    rs, qs = zip(*dropped)

    out = {
        "curves": {"single": dropped, "single_dropped_point": singles[-1]},
        "single_curve_monotone": mono,
        "note": (
            "FALLBACK (no TPU window this round): q4 (lambda=256) DROPPED "
            "from the single-model curve per VERDICT r3 item 6's "
            "alternative — the point sits past the stride-32 transform's "
            "~0.3 bpp saturation knee (more bits and less quality than "
            "q3). BD numbers touching the singles are recomputed on the "
            "3-point curve below; the lambda=96 retrain (chain stage 3) "
            "supersedes this file when a TPU window allows it."
        ),
        "recomputed_vs_150k_joints": {},
    }

    ext = prior.get("extended_150k", {})
    for name, key in (("plain_joint", "joint_gain_150k"),
                      ("charm_joint", "joint_gain_charm_lrp_150k")):
        curve = ext.get("curves", {}).get(key)
        if curve is None:
            continue
        rj, qj = zip(*sorted(curve))
        sec = {"bd_psnr_vs_single_db": bd_accuracy(rs, qs, rj, qj)}
        for bd_name, fn in (("bd_rate_vs_single_pchip_pct", bd_rate_pchip),
                            ("bd_rate_vs_single_cubic_pct", bd_rate)):
            try:
                sec[bd_name] = fn(rs, qs, rj, qj)
            except ValueError as e:
                sec[bd_name] = None
                sec[bd_name + "_error"] = str(e)
        out["recomputed_vs_150k_joints"][name] = sec

    Path(args.out).write_text(json.dumps(out, indent=2))
    print(f"wrote {args.out}: monotone={mono}, "
          f"recomputed={list(out['recomputed_vs_150k_joints'])}")


if __name__ == "__main__":
    main()
