"""Benchmark: L-MSFC-V2 feature-codec throughput on one TPU chip.

Measures the device-side codec path (FENet analysis + hyperprior + entropy
likelihoods + DRNet synthesis) on SFU-HW-geometry FPN features
(p2 [256,136,240] .. p5 [256,17,30], ~SFU class-C sequence at 544x960), the
shape class the reference's flagship video-split-inference path codes
(SURVEY.md §3.1, data/mpeg-fcm/SFUHW/fpn-sizes).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Measurement notes (axon relay): block_until_ready returns early, so each
iteration's output feeds the next iteration's input (carry chaining) and a
single float() readback at the end is the barrier; a warmup pass absorbs
compile + relay cache effects; the reported value is the median of 3 trials.

vs_baseline: the reference repo publishes no FCM throughput numbers
(BASELINE.md: "published": {}). We normalize against an ESTIMATED 25
features/sec for the A100 torch reference pipeline's NN+codec device path
(north-star asks >=5x that, BASELINE.json:5); revise when a measured
reference number lands.
"""

from __future__ import annotations

import json
import statistics
import time

ASSUMED_REF_FPS = 25.0


def main() -> None:
    import jax
    import jax.numpy as jnp
    import numpy as np

    from lmsfc_tpu.models import LMSFCv2
    from lmsfc_tpu.training.rd import bits_from_likelihoods

    # SFU-HW class-C geometry (e.g. BasketballDrill 544x960): strides 4..32
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
    def codec_step(params, feats, carry):
        out = model.apply(
            {"params": params}, [feats[0] + carry] + feats[1:], training=False
        )
        bits = bits_from_likelihoods(out["likelihoods"])
        recon_sum = sum(jnp.sum(jnp.abs(r)) for r in out["features_hat"])
        return (bits + recon_sum) * 1e-30  # scalar carry keeps everything live

    iters = 20
    # warmup: compile + absorb relay cold-cache effects
    carry = 0.0
    for _ in range(iters):
        carry = codec_step(params, feats, carry)
    _ = float(carry)

    rates = []
    for _ in range(3):
        t0 = time.perf_counter()
        carry = 0.0
        for _ in range(iters):
            carry = codec_step(params, feats, carry)
        _ = float(carry)  # single readback = the only reliable barrier
        dt = time.perf_counter() - t0
        rates.append(batch * iters / dt)
    fps = statistics.median(rates)

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
