"""Reset-proof trained-params store: orbax checkpoint <-> committed npz.

The session driver wipes gitignored state (checkpoints/, data/*_features)
between sessions — round 4 lost every 150k-step joint to exactly that.
This tool makes training milestones durable: `export` packs a checkpoint's
params into a compressed fp32 npz small enough to commit (artifacts/params/),
and `import` reconstitutes an orbax checkpoint (params-only, at the recorded
step) that every eval path already consumes unchanged
(LMSFCCodec(checkpoint_dir=...) restores bare trees, codecs/learned.py:167).

Training resume needs opt_state, which is deliberately NOT stored (3x the
size; Adam moments are re-warmable) — imported checkpoints are for EVAL.
`lmsfc_tpu.run.train` detects a params-only checkpoint and restarts the
optimizer state rather than crashing on the template mismatch.

Usage:
  python scripts/params_store.py export <ckpt_dir> <out.npz> [--step N]
  python scripts/params_store.py import <in.npz> <ckpt_dir>
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent))
sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from export_bench_params import flatten, unflatten  # scripts/ sibling


def do_export(ckpt_dir: str, out: str, step: int | None) -> None:
    import jax

    jax.config.update("jax_platforms", "cpu")
    from lmsfc_tpu.training.checkpoint import CheckpointManager

    mgr = CheckpointManager(Path(ckpt_dir))
    restored = mgr.restore(step=step)
    assert restored is not None, f"no checkpoint under {ckpt_dir}"
    at_step = step if step is not None else mgr.latest_step
    flat = flatten(restored["params"])
    flat["__step__"] = np.asarray(int(at_step or 0), np.int64)
    out_p = Path(out)
    out_p.parent.mkdir(parents=True, exist_ok=True)
    np.savez_compressed(out_p, **flat)
    n = sum(v.size for k, v in flat.items() if k != "__step__")
    print(f"exported {ckpt_dir}@{at_step} -> {out_p} "
          f"({n/1e6:.2f}M params, {out_p.stat().st_size/1e6:.1f} MB)")


def do_import(src: str, ckpt_dir: str) -> None:
    import jax

    jax.config.update("jax_platforms", "cpu")
    from lmsfc_tpu.training.checkpoint import CheckpointManager

    z = np.load(src)
    step = int(z["__step__"]) if "__step__" in z.files else 0
    params = unflatten(
        {k: np.asarray(z[k]) for k in z.files if k != "__step__"}
    )
    mgr = CheckpointManager(Path(ckpt_dir))
    if mgr.latest_step is not None and int(mgr.latest_step) >= step:
        print(f"{ckpt_dir} already at step {mgr.latest_step} >= {step}; skipping")
        return
    mgr.save(step, params)
    print(f"imported {src} -> {ckpt_dir}@{step} (params-only, eval use)")


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    sub = ap.add_subparsers(dest="cmd", required=True)
    e = sub.add_parser("export")
    e.add_argument("ckpt_dir")
    e.add_argument("out")
    e.add_argument("--step", type=int, default=None)
    i = sub.add_parser("import")
    i.add_argument("src")
    i.add_argument("ckpt_dir")
    args = ap.parse_args()
    if args.cmd == "export":
        do_export(args.ckpt_dir, args.out, args.step)
    else:
        do_import(args.src, args.ckpt_dir)


if __name__ == "__main__":
    main()
