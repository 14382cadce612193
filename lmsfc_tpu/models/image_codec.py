"""Learned image codecs: factorized-prior and mean-scale hyperprior.

Re-creation of the CompressAI image-codec models the reference's legacy VCM
path evaluates (bmshj2018-factorized / bmshj2018-hyperprior — BASELINE.md
R-D tables; model surface at examples/vcm/models/bmshj2018-factorized/
model.py:8-10 and pipelines/fo_vcm/pipeline/compressai.py:47-161
net.compress/net.decompress), built from this framework's own blocks:
ConvBlock+GDN stacks on the MXU, EntropyBottleneck/GaussianConditional in
XLA, rANS on the host.

Layout NHWC, input float in [0,1], 4x stride-2 analysis (1/16 latent).
"""

from __future__ import annotations

from typing import Dict, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..entropy.entropy_bottleneck import EntropyBottleneck
from ..entropy.gaussian_conditional import GaussianConditional
from .layers import ConvBlock, UpConvBlock


def _down_sizes(h: int, w: int, n: int):
    sizes = [(h, w)]
    for _ in range(n):
        h, w = -(-h // 2), -(-w // 2)
        sizes.append((h, w))
    return sizes


class FactorizedPrior(nn.Module):
    """bmshj2018-factorized: g_a/g_s with GDN, factorized entropy on y."""

    num_filters: int = 128  # N
    latent_filters: int = 192  # M
    dtype: jnp.dtype = jnp.bfloat16

    def setup(self):
        n, m = self.num_filters, self.latent_filters
        self.g_a = [
            ConvBlock(n, 5, 2, gdn="gdn", dtype=self.dtype),
            ConvBlock(n, 5, 2, gdn="gdn", dtype=self.dtype),
            ConvBlock(n, 5, 2, gdn="gdn", dtype=self.dtype),
            ConvBlock(m, 5, 2, dtype=self.dtype),
        ]
        self.g_s = [
            UpConvBlock(n, 5, gdn="igdn", dtype=self.dtype),
            UpConvBlock(n, 5, gdn="igdn", dtype=self.dtype),
            UpConvBlock(n, 5, gdn="igdn", dtype=self.dtype),
            UpConvBlock(3, 5, dtype=self.dtype),
        ]
        self.entropy_bottleneck = EntropyBottleneck(channels=self.latent_filters)

    def analysis(self, x: jax.Array) -> jax.Array:
        y = x.astype(self.dtype)
        for blk in self.g_a:
            y = blk(y)
        return y.astype(jnp.float32)

    def synthesis(self, y_hat: jax.Array, image_hw: Tuple[int, int]) -> jax.Array:
        sizes = _down_sizes(*image_hw, 4)
        x = y_hat.astype(self.dtype)
        for i, blk in enumerate(self.g_s):
            x = blk(x, sizes[3 - i])
        return x.astype(jnp.float32)

    def __call__(self, x: jax.Array, training: bool = True) -> Dict:
        y = self.analysis(x)
        rng = self.make_rng("noise") if training else None
        y_hat, y_lk = self.entropy_bottleneck(y, training=training, rng=rng)
        x_hat = self.synthesis(y_hat, x.shape[1:3])
        return {
            "x_hat": x_hat,
            "likelihoods": {"y": y_lk},
            "latents": {"y": y, "y_hat": y_hat},
        }

    def aux_loss(self) -> jax.Array:
        return self.entropy_bottleneck.aux_loss()


class MeanScaleHyperprior(nn.Module):
    """bmshj2018-hyperprior (mean-scale variant, mbt2018-mean style)."""

    num_filters: int = 128
    latent_filters: int = 192
    dtype: jnp.dtype = jnp.bfloat16

    def setup(self):
        n, m = self.num_filters, self.latent_filters
        self.g_a = [
            ConvBlock(n, 5, 2, gdn="gdn", dtype=self.dtype),
            ConvBlock(n, 5, 2, gdn="gdn", dtype=self.dtype),
            ConvBlock(n, 5, 2, gdn="gdn", dtype=self.dtype),
            ConvBlock(m, 5, 2, dtype=self.dtype),
        ]
        self.g_s = [
            UpConvBlock(n, 5, gdn="igdn", dtype=self.dtype),
            UpConvBlock(n, 5, gdn="igdn", dtype=self.dtype),
            UpConvBlock(n, 5, gdn="igdn", dtype=self.dtype),
            UpConvBlock(3, 5, dtype=self.dtype),
        ]
        self.h_a = [
            ConvBlock(n, 3, 1, act=nn.relu, dtype=self.dtype),
            ConvBlock(n, 5, 2, act=nn.relu, dtype=self.dtype),
            ConvBlock(n, 5, 2, dtype=self.dtype),
        ]
        self.h_s = [
            UpConvBlock(n, 5, act=nn.relu, dtype=self.dtype),
            UpConvBlock(n * 3 // 2, 5, act=nn.relu, dtype=self.dtype),
            ConvBlock(2 * m, 3, 1, dtype=self.dtype),
        ]
        self.entropy_bottleneck = EntropyBottleneck(channels=self.num_filters)
        self.gaussian = GaussianConditional()

    def analysis(self, x):
        y = x.astype(self.dtype)
        for blk in self.g_a:
            y = blk(y)
        return y.astype(jnp.float32)

    def hyper_analysis(self, y):
        z = jnp.abs(y).astype(self.dtype)
        for blk in self.h_a:
            z = blk(z)
        return z.astype(jnp.float32)

    def hyper_synthesis(self, z_hat, y_hw):
        sizes = _down_sizes(*y_hw, 2)
        x = z_hat.astype(self.dtype)
        x = self.h_s[0](x, sizes[1])
        x = self.h_s[1](x, sizes[0])
        x = self.h_s[2](x).astype(jnp.float32)
        scales, means = jnp.split(x, 2, axis=-1)
        return scales, means

    def synthesis(self, y_hat, image_hw):
        sizes = _down_sizes(*image_hw, 4)
        x = y_hat.astype(self.dtype)
        for i, blk in enumerate(self.g_s):
            x = blk(x, sizes[3 - i])
        return x.astype(jnp.float32)

    def __call__(self, x: jax.Array, training: bool = True) -> Dict:
        y = self.analysis(x)
        z = self.hyper_analysis(y)
        rng_z = self.make_rng("noise") if training else None
        rng_y = self.make_rng("noise") if training else None
        z_hat, z_lk = self.entropy_bottleneck(z, training=training, rng=rng_z)
        scales, means = self.hyper_synthesis(z_hat, y.shape[1:3])
        y_hat, y_lk = self.gaussian(y, scales, means, training=training, rng=rng_y)
        x_hat = self.synthesis(y_hat, x.shape[1:3])
        return {
            "x_hat": x_hat,
            "likelihoods": {"y": y_lk, "z": z_lk},
            "latents": {"y": y, "y_hat": y_hat, "z": z, "z_hat": z_hat},
        }

    def aux_loss(self) -> jax.Array:
        return self.entropy_bottleneck.aux_loss()
