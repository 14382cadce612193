"""Benchmark: L-MSFC-V2 feature-codec throughput on one TPU chip.

Measures the device-side codec path (FENet analysis + hyperprior + entropy
likelihoods + DRNet synthesis) on SFU-HW-geometry FPN features
(p2 [256,136,240] .. p5 [256,17,30], ~GCC-class sequence at 544x960), the
shape class the reference's flagship video-split-inference path codes
(SURVEY.md §3.1, data/mpeg-fcm/SFUHW/fpn-sizes).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

vs_baseline: the reference repo publishes no FCM throughput numbers
(BASELINE.md: "published": {}). We normalize against an ESTIMATED 25
features/sec for the A100 torch reference pipeline's NN+codec device path
(north-star asks >=5x that, BASELINE.json:5); revise when a measured
reference number lands.
"""

from __future__ import annotations

import json
import time

ASSUMED_REF_FPS = 25.0


def main() -> None:
    import jax
    import jax.numpy as jnp
    import numpy as np

    from lmsfc_tpu.models import LMSFCv2
    from lmsfc_tpu.training.rd import bits_from_likelihoods

    # SFU-HW class-C geometry (e.g. BasketballDrill 544x960 input): strides 4..32
    shapes = [(136, 240), (68, 120), (34, 60), (17, 30)]
    channels = (256, 256, 256, 256)
    batch = 8

    model = LMSFCv2(
        out_channels=channels, num_filters=192, latent_filters=192, hyper_filters=128,
        dtype=jnp.bfloat16,
    )
    rng = np.random.default_rng(0)
    feats = [
        jnp.asarray(rng.normal(0, 2, (batch, h, w, c)).astype(np.float32))
        for (h, w), c in zip(shapes, channels)
    ]
    params = model.init(
        {"params": jax.random.key(0), "noise": jax.random.key(1)}, feats, training=False
    )["params"]

    @jax.jit
    def codec_step(params, feats):
        out = model.apply({"params": params}, feats, training=False)
        bits = bits_from_likelihoods(out["likelihoods"])
        # return recon sum to keep everything live
        s = sum(jnp.sum(r) for r in out["features_hat"])
        return bits, s

    # warmup/compile (float() readback is the only reliable barrier through
    # the axon relay — its block_until_ready returns before execution ends)
    b, s = codec_step(params, feats)
    _ = float(b) + float(s)

    iters = 20
    t0 = time.perf_counter()
    tot = None
    for _ in range(iters):
        b, s = codec_step(params, feats)
        # chain results on device so the final readback is a true barrier
        tot = b + s if tot is None else tot + b + s
    _ = float(tot)
    dt = time.perf_counter() - t0

    fps = batch * iters / dt
    print(
        json.dumps(
            {
                "metric": "lmsfc_codec_features_per_sec_per_chip",
                "value": round(fps, 2),
                "unit": "features/s",
                "vs_baseline": round(fps / ASSUMED_REF_FPS, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
