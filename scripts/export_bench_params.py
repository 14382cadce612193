"""Export trained codec params as the committed bench asset.

bench.py's end-to-end metric needs a TRAINED entropy model: random params
give degenerate CDFs and the rANS stage measures a pathological operating
point (~0.56 bpp of escape/bypass symbols). This packs a trained checkpoint
into a compact fp16 npz (committed at bench_assets/) that bench.py restores.

Usage: python scripts/export_bench_params.py \
           [--ckpt checkpoints/r2_single/q4_lmbda0.1] [--out bench_assets/lmsfc_q4_params.npz]
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def flatten(tree, prefix=""):
    out = {}
    for k in sorted(tree.keys()):
        v = tree[k]
        key = f"{prefix}/{k}" if prefix else k
        if hasattr(v, "keys"):
            out.update(flatten(v, key))
        else:
            out[key] = np.asarray(v)
    return out


def unflatten(flat):
    tree = {}
    for key, v in flat.items():
        parts = key.split("/")
        node = tree
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = v
    return tree


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--ckpt", default="checkpoints/r2_single/q4_lmbda0.1")
    ap.add_argument("--out", default="bench_assets/lmsfc_q4_params.npz")
    args = ap.parse_args()

    import jax

    jax.config.update("jax_platforms", "cpu")
    from lmsfc_tpu.training.checkpoint import CheckpointManager

    restored = CheckpointManager(Path(args.ckpt)).restore()
    assert restored is not None, f"no checkpoint under {args.ckpt}"
    flat = flatten(restored["params"])
    # quantiles drive the integer CDF build: keep them fp32; everything else
    # tolerates fp16 for benchmarking
    packed = {
        k: v if "quantiles" in k else v.astype(np.float16)
        for k, v in flat.items()
    }
    out = Path(args.out)
    out.parent.mkdir(parents=True, exist_ok=True)
    np.savez_compressed(out, **packed)
    size = out.stat().st_size / 1e6
    n_params = sum(v.size for v in flat.values())
    print(f"wrote {out}: {n_params/1e6:.2f}M params, {size:.1f} MB")


def load_bench_params(path):
    """fp16 npz -> fp32 param tree (bench.py helper)."""
    z = np.load(path)
    return unflatten({k: np.asarray(z[k], np.float32) for k in z.files})


if __name__ == "__main__":
    main()
