"""Rate-distortion loss: lambda * MSE + bpp.

The reference's training loop is the fork delta that is absent from the
snapshot (SURVEY.md §2.9 — 'RD training loop (λ·MSE + bpp), multi-rate-point
training, aux_loss'); this is its TPU-native realization. bpp is normalized
by source-image pixels: the FCM convention divides total bits by the pixel
count of the input image, which for an FPN whose finest level is stride-4 is
(16 * H_finest * W_finest) per frame (ref bpp rule: run/eval_split_inference
.py:225-229 uses coded bytes over dataset pixels).
"""

from __future__ import annotations

from typing import Dict, Optional, Sequence

import jax
import jax.numpy as jnp

_LOG2_E = 1.4426950408889634


def bits_from_likelihoods(likelihoods: Dict[str, jax.Array]) -> jax.Array:
    """Total bits across all latents (sum over every element)."""
    total = 0.0
    for lk in likelihoods.values():
        total = total + (-jnp.sum(jnp.log(lk)) * _LOG2_E)
    return total


def rd_image_loss(
    output: Dict, x: jax.Array, lmbda: float
) -> Dict[str, jax.Array]:
    """Image-codec RD objective: lambda * 255^2 * MSE + bpp (CompressAI
    convention for [0,1] inputs)."""
    n, h, w, _ = x.shape
    mse = jnp.mean((output["x_hat"] - x) ** 2)
    bpp = bits_from_likelihoods(output["likelihoods"]) / (n * h * w)
    loss = lmbda * (255.0**2) * mse + bpp
    return {"loss": loss, "mse": mse, "bpp": bpp}


def rd_loss(
    output: Dict,
    targets: Sequence[jax.Array],
    lmbda: float,
    num_pixels: Optional[int] = None,
    finest_stride: int = 4,
) -> Dict[str, jax.Array]:
    """Per-batch RD objective.

    targets: list of NHWC feature levels (finest first). num_pixels defaults
    to batch * (finest_stride^2 * H0 * W0) — source-image pixels.
    """
    recons = output["features_hat"]
    n = targets[0].shape[0]
    if num_pixels is None:
        h0, w0 = targets[0].shape[1:3]
        num_pixels = n * (finest_stride**2) * h0 * w0

    mse_terms = []
    for rec, tgt in zip(recons, targets):
        mse_terms.append(jnp.mean((rec - tgt) ** 2))
    mse = jnp.mean(jnp.stack(mse_terms))

    bpp = bits_from_likelihoods(output["likelihoods"]) / num_pixels
    loss = lmbda * mse + bpp
    return {"loss": loss, "mse": mse, "bpp": bpp}
