"""L-MSFC-V2 learned multi-scale feature codec (FENet / DRNet), TPU-first.

Re-creation of the codec the north star targets (BASELINE.json:5; the
reference's fork delta trains L-MSFC analysis/synthesis transforms + feature
fusion + GDN/IGDN with EntropyBottleneck/GaussianConditional entropy models,
SURVEY.md §2.9). Architecture is designed for the MXU, not translated:

  FENet (analysis):  bottom-up fusion of the FPN pyramid. The finest level is
    downsampled with a strided 5x5 conv + GDN, concatenated with the next
    level, repeated to the coarsest scale, then one more strided conv emits
    the latent y (M channels, 1/2 the coarsest-level resolution). All convs
    NHWC bfloat16 -> MXU; GDN runs as the fused Pallas kernel.

  Hyperprior:  h_a (conv s1, conv s2, conv s2) -> z; factorized
    EntropyBottleneck on z; h_s (resize-conv x2) -> per-element (scales,
    means) for a mean-scale GaussianConditional on y.

  DRNet (synthesis): shared trunk from y_hat upsampled level-by-level with
    resize-conv + IGDN; a per-level projection head emits each reconstructed
    pyramid level at its exact original (static) shape.

Supports arbitrary pyramids: Faster/Mask R-CNN FPN {p2..p5, 256ch each} and
JDE Darknet splits {256,512,1024}ch at 3 scales (SURVEY.md §2.4).
"""

from __future__ import annotations

from typing import Dict, List, Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..entropy.entropy_bottleneck import EntropyBottleneck
from ..entropy.gaussian_conditional import GaussianConditional
from .layers import ConvBlock, UpConvBlock, resize_to


def _halve(h: int, w: int) -> Tuple[int, int]:
    return -(-h // 2), -(-w // 2)


class FENet(nn.Module):
    """Analysis transform: pyramid {finest..coarsest} -> latent y.

    latent_stride_div halves the final downsampling: the default latent
    lives at 2x the coarsest level's stride (stride-64 for an FPN); with
    latent_stride_div=1 it stays AT the coarsest stride (stride-32), 4x
    the spatial positions — the high-rate regime (>~0.1 bpp per source
    pixel) is spatially starved at stride 64 (0.047 latent values/pixel
    caps the achievable rate far below the anchor range, VERDICT r2
    item 1)."""

    num_filters: int = 192  # N
    latent_filters: int = 192  # M
    dtype: jnp.dtype = jnp.bfloat16
    latent_stride_div: int = 2  # stride of the final fusion conv

    @nn.compact
    def __call__(self, features: Sequence[jax.Array]) -> jax.Array:
        """features: list ordered finest -> coarsest, NHWC."""
        n = self.num_filters
        x = ConvBlock(n, 5, 2, gdn="gdn", dtype=self.dtype, name="down0")(
            features[0].astype(self.dtype)
        )
        last = len(features) - 1
        for i, feat in enumerate(features[1:], start=1):
            f = feat.astype(self.dtype)
            # align (ceil-division stride can overshoot odd sizes by 1 pixel)
            x = resize_to(x, f.shape[1:3])
            x = jnp.concatenate([x, f], axis=-1)
            stride = self.latent_stride_div if i == last else 2
            x = ConvBlock(n, 5, stride, gdn="gdn", dtype=self.dtype, name=f"down{i}")(x)
        y = ConvBlock(self.latent_filters, 5, 1, dtype=self.dtype, name="to_latent")(x)
        return y.astype(jnp.float32)


class HyperEncoder(nn.Module):
    num_filters: int = 192
    hyper_filters: int = 128
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, y: jax.Array) -> jax.Array:
        h = self.hyper_filters
        x = ConvBlock(h, 3, 1, act=nn.relu, dtype=self.dtype, name="h0")(
            jnp.abs(y).astype(self.dtype)
        )
        x = ConvBlock(h, 5, 2, act=nn.relu, dtype=self.dtype, name="h1")(x)
        x = ConvBlock(h, 5, 2, dtype=self.dtype, name="h2")(x)
        return x.astype(jnp.float32)


class HyperDecoder(nn.Module):
    latent_filters: int = 192
    hyper_filters: int = 128
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, z_hat: jax.Array, y_hw: Tuple[int, int]) -> Tuple[jax.Array, jax.Array]:
        h, m = self.hyper_filters, self.latent_filters
        mid_hw = _halve(*y_hw)
        x = UpConvBlock(h, 5, act=nn.relu, dtype=self.dtype, name="u0")(
            z_hat.astype(self.dtype), mid_hw
        )
        x = UpConvBlock(h * 3 // 2, 5, act=nn.relu, dtype=self.dtype, name="u1")(x, y_hw)
        x = ConvBlock(2 * m, 3, 1, dtype=self.dtype, name="to_params")(x)
        x = x.astype(jnp.float32)
        scales, means = jnp.split(x, 2, axis=-1)
        return scales, means


class DRNet(nn.Module):
    """Synthesis transform: y_hat -> reconstructed pyramid (exact shapes)."""

    out_channels: Sequence[int] = (256, 256, 256, 256)  # finest -> coarsest
    num_filters: int = 192
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(
        self, y_hat: jax.Array, shapes_hw: Sequence[Tuple[int, int]]
    ) -> List[jax.Array]:
        """shapes_hw ordered finest -> coarsest; returns same order."""
        n = self.num_filters
        num_levels = len(shapes_hw)
        assert len(self.out_channels) == num_levels

        x = y_hat.astype(self.dtype)
        recons: List[Optional[jax.Array]] = [None] * num_levels
        # walk coarsest -> finest
        for lvl in range(num_levels - 1, -1, -1):
            x = UpConvBlock(n, 5, gdn="igdn", dtype=self.dtype, name=f"up{lvl}")(
                x, shapes_hw[lvl]
            )
            recons[lvl] = (
                ConvBlock(self.out_channels[lvl], 3, 1, dtype=self.dtype, name=f"head{lvl}")(x)
            ).astype(jnp.float32)
        return recons  # type: ignore[return-value]


class SliceNet(nn.Module):
    """Entropy-parameter network for one channel slice (ChARM, Minnen &
    Singh 2020, arXiv:2007.08739): maps the hyperprior support concatenated
    with all PREVIOUSLY decoded slices to this slice's (scales, means).
    Channel-autoregression is TPU-friendly: the sequence is only num_slices
    long and every step is a full-spatial conv stack on the MXU (unlike
    spatial autoregression, which serializes per pixel)."""

    slice_ch: int
    mid: int = 96
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, support: jax.Array) -> Tuple[jax.Array, jax.Array]:
        x = ConvBlock(self.mid, 3, 1, act=nn.relu, dtype=self.dtype, name="s0")(
            support.astype(self.dtype)
        )
        x = ConvBlock(self.mid, 3, 1, act=nn.relu, dtype=self.dtype, name="s1")(x)
        out = ConvBlock(2 * self.slice_ch, 3, 1, dtype=self.dtype, name="to_params")(x)
        out = out.astype(jnp.float32)
        scales, means = jnp.split(out, 2, axis=-1)
        return scales, means


class LRPNet(nn.Module):
    """Latent residual prediction head (ChARM, Minnen & Singh 2020 §III-C):
    predicts a bounded correction to a dequantized channel slice from the
    hyper support, the previously decoded slices, and the slice itself.
    Zero rate cost (runs after entropy decoding) for a distortion win —
    the quantization-error structure the gaussian mean can't express."""

    slice_ch: int
    mid: int = 96
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, support: jax.Array) -> jax.Array:
        x = ConvBlock(self.mid, 3, 1, act=nn.relu, dtype=self.dtype, name="l0")(
            support.astype(self.dtype)
        )
        x = ConvBlock(self.mid, 3, 1, act=nn.relu, dtype=self.dtype, name="l1")(x)
        r = ConvBlock(self.slice_ch, 3, 1, dtype=self.dtype, name="to_res")(x)
        # bounded to (-0.5, 0.5): a residual larger than half the quant bin
        # would fight the entropy model instead of refining it
        return 0.5 * jnp.tanh(r.astype(jnp.float32))


class LMSFCv2(nn.Module):
    """Full codec: forward pass returns reconstructions + likelihoods.

    Input/output feature layout is NHWC lists ordered finest -> coarsest.

    num_rates > 0 enables GAIN UNITS (asymmetric gained VAE, Cui et al.):
    per-rate learned channel-wise gain/inverse-gain vectors scale the latent
    before/after quantization, so ONE model serves all rate points (the
    reference trains a separate model per lambda, SURVEY.md §2.9
    'multi-rate-point training' — this halves the training bill). rate_idx
    selects the operating point; it can be a traced scalar during training
    (sampled per step) and rides the bitstream header at coding time.

    num_slices > 0 enables a CHANNEL-AUTOREGRESSIVE entropy model (ChARM):
    the latent is split into num_slices channel groups; each group's
    gaussian params condition on the hyperprior AND all previously decoded
    groups, capturing cross-channel correlation the factorized-over-space
    hyperprior misses (typically 5-10% rate at equal distortion). Beyond
    the reference, which stops at the mean-scale hyperprior.
    """

    out_channels: Sequence[int] = (256, 256, 256, 256)
    num_filters: int = 192
    latent_filters: int = 192
    hyper_filters: int = 128
    dtype: jnp.dtype = jnp.bfloat16
    remat: bool = False  # rematerialize transforms (trade FLOPs for HBM)
    num_rates: int = 0  # 0 = single-rate (no gain units)
    num_slices: int = 0  # 0 = plain hyperprior; >0 = ChARM channel slices
    lrp: bool = False  # ChARM latent residual prediction (needs num_slices)
    latent_stride_div: int = 2  # 1 = high-rate latent at the coarsest stride

    def setup(self):
        fenet_cls = nn.remat(FENet) if self.remat else FENet
        # DRNet's shapes_hw argument must stay static under remat
        drnet_cls = nn.remat(DRNet, static_argnums=(2,)) if self.remat else DRNet
        self.fenet = fenet_cls(self.num_filters, self.latent_filters, self.dtype,
                               self.latent_stride_div)
        self.h_a = HyperEncoder(self.latent_filters, self.hyper_filters, self.dtype)
        self.h_s = HyperDecoder(self.latent_filters, self.hyper_filters, self.dtype)
        self.drnet = drnet_cls(self.out_channels, self.num_filters, self.dtype)
        self.entropy_bottleneck = EntropyBottleneck(channels=self.hyper_filters)
        self.gaussian = GaussianConditional()
        if self.num_rates > 0:
            ones = lambda key, shape: jnp.ones(shape, jnp.float32)
            self.gains = self.param("gains", ones, (self.num_rates, self.latent_filters))
            self.inv_gains = self.param(
                "inv_gains", ones, (self.num_rates, self.latent_filters)
            )
        if self.num_slices > 0:
            assert self.latent_filters % self.num_slices == 0, (
                self.latent_filters, self.num_slices,
            )
            cs = self.latent_filters // self.num_slices
            self.slice_nets = [
                SliceNet(cs, dtype=self.dtype, name=f"slice{i}")
                for i in range(self.num_slices)
            ]
            if self.lrp:
                self.lrp_nets = [
                    LRPNet(cs, dtype=self.dtype, name=f"lrp{i}")
                    for i in range(self.num_slices)
                ]

    def _gain(self, rate_idx) -> jax.Array:
        return jnp.abs(self.gains[rate_idx])[None, None, None, :]

    def _inv_gain(self, rate_idx) -> jax.Array:
        return jnp.abs(self.inv_gains[rate_idx])[None, None, None, :]

    def __call__(
        self, features: Sequence[jax.Array], training: bool = True, rate_idx=0
    ) -> Dict[str, object]:
        y = self.fenet(features)
        if self.num_rates > 0:
            y = y * self._gain(rate_idx)
        z = self.h_a(y)

        if training:
            rng_z = self.make_rng("noise")
            rng_y = self.make_rng("noise")
        else:
            rng_z = rng_y = None
        z_hat, z_likelihoods = self.entropy_bottleneck(z, training=training, rng=rng_z)
        scales_h, means_h = self.h_s(z_hat, y.shape[1:3])
        if self.num_slices > 0:
            y_hat, y_likelihoods, scales, means = self._charm_code(
                y, scales_h, means_h, training, rng_y
            )
        else:
            scales, means = scales_h, means_h
            y_hat, y_likelihoods = self.gaussian(
                y, scales, means, training=training, rng=rng_y
            )
        if self.num_rates > 0:
            y_hat = y_hat * self._inv_gain(rate_idx)
        shapes_hw = [f.shape[1:3] for f in features]
        recon = self.drnet(y_hat, shapes_hw)
        return {
            "features_hat": recon,
            "likelihoods": {"y": y_likelihoods, "z": z_likelihoods},
            "latents": {"y": y, "y_hat": y_hat, "z": z, "z_hat": z_hat,
                        "scales": scales, "means": means},
        }

    def _charm_code(self, y, scales_h, means_h, training, rng_y):
        """Sequential channel-slice coding: slice i's gaussian params
        condition on the hyper support and slices [0, i)."""
        cs = self.latent_filters // self.num_slices
        support0 = jnp.concatenate([scales_h, means_h], axis=-1)
        keys = (
            jax.random.split(rng_y, self.num_slices)
            if training
            else [None] * self.num_slices
        )
        y_hat_parts, lk_parts, sc_parts, mn_parts = [], [], [], []
        for i in range(self.num_slices):
            sup = jnp.concatenate([support0] + y_hat_parts, axis=-1)
            sc_i, mn_i = self.slice_nets[i](sup)
            y_i = y[..., i * cs : (i + 1) * cs]
            y_hat_i, lk_i = self.gaussian(
                y_i, sc_i, mn_i, training=training, rng=keys[i]
            )
            if self.lrp:
                y_hat_i = y_hat_i + self.lrp_nets[i](
                    jnp.concatenate([sup, y_hat_i], axis=-1)
                )
            y_hat_parts.append(y_hat_i)
            lk_parts.append(lk_i)
            sc_parts.append(sc_i)
            mn_parts.append(mn_i)
        return (
            jnp.concatenate(y_hat_parts, axis=-1),
            jnp.concatenate(lk_parts, axis=-1),
            jnp.concatenate(sc_parts, axis=-1),
            jnp.concatenate(mn_parts, axis=-1),
        )

    def aux_loss(self) -> jax.Array:
        return self.entropy_bottleneck.aux_loss()

    # ---------------------------------------------------------------- codec
    def analysis(self, features: Sequence[jax.Array], rate_idx=0):
        """Deterministic encode-side compute: y, z, z_hat, gaussian params."""
        y = self.fenet(features)
        if self.num_rates > 0:
            y = y * self._gain(rate_idx)
        z = self.h_a(y)
        z_hat, _ = self.entropy_bottleneck(z, training=False)
        scales, means = self.h_s(z_hat, y.shape[1:3])
        return y, z, scales, means

    def analysis_latents(self, features: Sequence[jax.Array], rate_idx=0):
        """Encode-side latents only (fenet + h_a): the codec quantizes z and
        recomputes gaussian params through the decoder's exact standalone
        hyper-synthesis program, so computing h_s here would be dead work."""
        y = self.fenet(features)
        if self.num_rates > 0:
            y = y * self._gain(rate_idx)
        z = self.h_a(y)
        return y, z

    def synthesis(self, y_hat: jax.Array, shapes_hw: Sequence[Tuple[int, int]],
                  rate_idx=0):
        if self.num_rates > 0:
            y_hat = y_hat * self._inv_gain(rate_idx)
        return self.drnet(y_hat, shapes_hw)

    def hyper_synthesis(self, z_hat: jax.Array, y_hw: Tuple[int, int]):
        return self.h_s(z_hat, y_hw)

    def slice_params(self, support: jax.Array, slice_idx: int):
        """ChARM codec support: gaussian params for one channel slice from
        concat([scales_h, means_h, y_hat_slices[<slice_idx]])."""
        return self.slice_nets[slice_idx](support)

    def slice_lrp(self, support: jax.Array, slice_idx: int):
        """ChARM codec support: LRP residual for one dequantized slice from
        concat([scales_h, means_h, y_hat_slices[<slice_idx], y_hat_raw_i])."""
        return self.lrp_nets[slice_idx](support)
