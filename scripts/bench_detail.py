"""Detailed per-stage TPU benchmark (not the driver bench — see bench.py).

Measures NN-Part1 (ResNet-50+FPN), NN-Part2 (RPN+ROI heads), and the codec
transforms separately at SFU class-C geometry, using the carry-chained
single-readback method (see bench.py measurement notes).

Usage: python scripts/bench_detail.py [batch]
"""

import statistics
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np


def timeit(name, fn, iters=10, trials=3):
    carry = 0.0
    for _ in range(iters):
        carry = fn(carry)
    _ = float(carry)
    rates = []
    for _ in range(trials):
        t0 = time.perf_counter()
        carry = 0.0
        for _ in range(iters):
            carry = fn(carry)
        _ = float(carry)
        rates.append((time.perf_counter() - t0) / iters)
    dt = statistics.median(rates)
    print(f"{name:28s} {dt*1000:8.2f} ms/call")
    return dt


def main():
    from lmsfc_tpu.models.resnet_fpn import ResNetFPN
    from lmsfc_tpu.models.wrappers.rcnn import _RCNNPart2
    from lmsfc_tpu.models import LMSFCv2
    from lmsfc_tpu.training.rd import bits_from_likelihoods

    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 1
    h, w = 544, 960  # SFU class-C
    rng = np.random.default_rng(0)

    # NN-Part1
    backbone = ResNetFPN()
    x = jnp.asarray(rng.normal(0, 50, (batch, h, w, 3)).astype(np.float32))
    bb_params = backbone.init(jax.random.key(0), x[:1])["params"]

    @jax.jit
    def nn1(c):
        out = backbone.apply({"params": bb_params}, x + c, method=ResNetFPN.pyramid_no_p6)
        return sum(jnp.sum(jnp.abs(v)) for v in out.values()) * 1e-30

    dt1 = timeit(f"NN1 backbone (b{batch})", nn1)

    # codec forward
    shapes = [(h // 4, w // 4), (h // 8, w // 8), (h // 16, w // 16), (h // 32, w // 32)]
    model = LMSFCv2(out_channels=(256,) * 4, num_filters=192, latent_filters=192,
                    hyper_filters=128, dtype=jnp.bfloat16)
    feats = [jnp.asarray(rng.normal(0, 2, (batch, hh, ww, 256)).astype(np.float32))
             for hh, ww in shapes]
    cp = model.init({"params": jax.random.key(0), "noise": jax.random.key(1)},
                    feats, training=False)["params"]

    @jax.jit
    def codec(c):
        out = model.apply({"params": cp}, [feats[0] + c] + feats[1:], training=False)
        return (bits_from_likelihoods(out["likelihoods"])
                + sum(jnp.sum(jnp.abs(r)) for r in out["features_hat"])) * 1e-30

    dt2 = timeit(f"codec fwd (b{batch})", codec)

    # NN-Part2, vmapped over the frame axis (matches the wrapper's path)
    part2 = _RCNNPart2(with_mask=False)
    pyr1 = [f[:1] for f in feats]
    p2_params = part2.init(jax.random.key(1), pyr1, (h, w))["params"]

    def single(params, pyramid):
        pyramid = tuple(p[None] for p in pyramid)
        return part2.apply({"params": params}, pyramid, (h, w))

    @jax.jit
    def nn2(c):
        det = jax.vmap(single, in_axes=(None, 0))(
            p2_params, tuple([feats[0] + c] + feats[1:])
        )
        return (jnp.sum(det["boxes"]) + jnp.sum(det["scores"])) * 1e-30

    dt3 = timeit(f"NN2 RPN+ROI (b{batch})", nn2)
    total = (dt1 + dt2 + dt3) / batch
    print(f"\nsplit-inference device path: {total*1000:.1f} ms/frame -> {1/total:.1f} frames/s/chip")


if __name__ == "__main__":
    main()
