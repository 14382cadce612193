"""Temporal L-MSFC-V2: conditional latent coding across frames.

The temporal-feature-coding configuration of the north star (BASELINE.json
configs: 'JDE tracking features on TVD/HiEve with temporal feature coding').
TPU-first design:

  * spatial transforms (FENet / DRNet / hyper) run frame-PARALLEL (the batch
    axis is the time axis — pure data parallel on the MXU);
  * only the entropy parameters are temporal: a small conv predictor maps
    the PREVIOUS decoded latent y_hat_{t-1} to (d_means, d_scales) that
    refine the hyperprior's output, so slowly-varying features cost few
    bits. The sequential part is a lax.scan over T with tiny per-step work.
  * GOP structure: prediction resets every `intra_period` frames, matching
    the anchors' GOP chunking (ref std_codecs.py:204-255) — chunks stay
    independently decodable and GOP-parallel.

Rate behaviour: for static content the conditional scales shrink toward the
predictor's accuracy, so -log2 p(y_t | y_{t-1}) << -log2 p(y_t).
"""

from __future__ import annotations

from typing import Dict, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..entropy.gaussian_conditional import GaussianConditional
from ..ops.quant import ste_round
from .layers import ConvBlock
from .lmsfc import LMSFCv2


class TemporalPredictor(nn.Module):
    """y_hat_{t-1} -> (d_scales_raw, d_means); zero-init so the model starts
    exactly at the intra (hyper-only) behaviour."""

    latent_filters: int = 192
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, y_prev: jax.Array) -> Tuple[jax.Array, jax.Array]:
        m = self.latent_filters
        t = ConvBlock(m, 3, 1, act=nn.relu, dtype=self.dtype, name="t0")(
            y_prev.astype(self.dtype)
        )
        t = ConvBlock(m, 3, 1, act=nn.relu, dtype=self.dtype, name="t1")(t)
        out = nn.Conv(
            2 * m, (3, 3), padding=[(1, 1)] * 2, dtype=self.dtype,
            param_dtype=jnp.float32,
            kernel_init=nn.initializers.zeros,  # start as pure-intra
            name="to_params",
        )(t)
        d_scales, d_means = jnp.split(out.astype(jnp.float32), 2, axis=-1)
        return d_scales, d_means


class LMSFCv2Temporal(nn.Module):
    """Clip model: features are [T, H, W, C] per level (time = leading axis)."""

    out_channels: Sequence[int] = (256, 256, 256, 256)
    num_filters: int = 192
    latent_filters: int = 192
    hyper_filters: int = 128
    intra_period: int = 8
    dtype: jnp.dtype = jnp.bfloat16
    latent_stride_div: int = 2  # 1 = high-rate stride-32 latent (see lmsfc.py)

    def setup(self):
        self.base = LMSFCv2(
            out_channels=self.out_channels,
            num_filters=self.num_filters,
            latent_filters=self.latent_filters,
            hyper_filters=self.hyper_filters,
            dtype=self.dtype,
            latent_stride_div=self.latent_stride_div,
        )
        self.predictor = TemporalPredictor(self.latent_filters, self.dtype)
        self.gaussian = GaussianConditional()

    # ------------------------------------------------------------ pieces
    def _combine(self, scales_h, means_h, d_scales, d_means, is_intra):
        """Merge hyper and temporal params; intra frames use hyper only."""
        scales = jax.nn.softplus(scales_h + d_scales) + 1e-6
        means = means_h + d_means
        scales_intra = jax.nn.softplus(scales_h) + 1e-6
        return (
            jnp.where(is_intra, scales_intra, scales),
            jnp.where(is_intra, means_h, means),
        )

    def __call__(self, features: Sequence[jax.Array], training: bool = True) -> Dict:
        """features: list of [T,H,W,C] levels, finest first (one clip)."""
        T = features[0].shape[0]
        # frame-parallel analysis + hyperprior
        y = self.base.fenet(list(features))  # [T, yh, yw, M]
        z = self.base.h_a(y)
        if training:
            rng_z = self.make_rng("noise")
            rng_y = self.make_rng("noise")
        else:
            rng_z = rng_y = None
        z_hat, z_lk = self.base.entropy_bottleneck(z, training=training, rng=rng_z)
        scales_h, means_h = self.base.h_s(z_hat, y.shape[1:3])

        # sequential conditional entropy over time — unrolled python loop
        # (T <= intra period per chunk is small; flax submodule calls can't
        # live inside a raw lax.scan, and the per-step work is tiny)
        noise_keys = jax.random.split(rng_y, T) if training else [None] * T
        y_prev_hat = jnp.zeros_like(y[0:1])
        y_hat_l, y_lk_l, scales_l, means_l = [], [], [], []
        for t in range(T):
            is_intra = (t % self.intra_period) == 0
            d_s, d_m = self.predictor(y_prev_hat)
            scales, means = self._combine(
                scales_h[t : t + 1], means_h[t : t + 1], d_s, d_m,
                jnp.asarray(is_intra),
            )
            y_t = y[t : t + 1]
            if training:
                noise = jax.random.uniform(noise_keys[t], y_t.shape, y_t.dtype, -0.5, 0.5)
                y_hat_t = y_t + noise
            else:
                y_hat_t = ste_round(y_t - means) + means
            lk = jnp.maximum(self.gaussian._likelihood(y_hat_t, scales, means), 1e-9)
            y_hat_l.append(y_hat_t)
            y_lk_l.append(lk)
            scales_l.append(scales)
            means_l.append(means)
            y_prev_hat = y_hat_t

        y_hat = jnp.concatenate(y_hat_l, axis=0)
        y_lk = jnp.concatenate(y_lk_l, axis=0)
        scales = jnp.concatenate(scales_l, axis=0)
        means = jnp.concatenate(means_l, axis=0)

        recon = self.base.drnet(y_hat, [f.shape[1:3] for f in features])
        return {
            "features_hat": recon,
            "likelihoods": {"y": y_lk, "z": z_lk},
            "latents": {"y": y, "y_hat": y_hat, "scales": scales, "means": means},
        }

    def aux_loss(self) -> jax.Array:
        return self.base.entropy_bottleneck.aux_loss()

    # ------------------------------------------------------- codec support
    def analysis_clip(self, features: Sequence[jax.Array]):
        """Frame-parallel encode-side compute: y, z_hat, hyper params."""
        y = self.base.fenet(list(features))
        z = self.base.h_a(y)
        z_hat, _ = self.base.entropy_bottleneck(z, training=False)
        scales_h, means_h = self.base.h_s(z_hat, y.shape[1:3])
        return y, z, scales_h, means_h

    def analysis_latents_clip(self, features: Sequence[jax.Array]):
        """Latents only (fenet + h_a): the codec quantizes z on device and
        recomputes hyper params through the shared standalone h_s program,
        so EB/h_s compute here would be dead work."""
        y = self.base.fenet(list(features))
        z = self.base.h_a(y)
        return y, z

    def predict_params(self, y_prev_hat: jax.Array, scales_h: jax.Array,
                       means_h: jax.Array, is_intra: bool):
        """Single-frame conditional params (used by BOTH encoder and decoder
        host loops — identical program keeps rANS in sync)."""
        d_s, d_m = self.predictor(y_prev_hat)
        return self._combine(scales_h, means_h, d_s, d_m, jnp.asarray(is_intra))

    def synthesis_clip(self, y_hat: jax.Array, shapes_hw):
        return self.base.drnet(y_hat, shapes_hw)
