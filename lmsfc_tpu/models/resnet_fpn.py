"""ResNet-50 + FPN backbone (Flax, NHWC) — NN-Part1 of the R-CNN split.

Functional re-creation of the Detectron2 GeneralizedRCNN backbone used by the
reference's vision-model wrapper (compressai_vision/model_wrappers/
detectron2.py:57-147): caffe-style ResNet-50 (stride-in-1x1 bottlenecks,
frozen BN folded into per-channel scale/bias) and an FPN with 1x1 laterals,
3x3 output convs, nearest top-down upsampling, and p6 = maxpool(p5)
(LastLevelMaxPool). The wrapper drops p6 from the coded features and
recomputes it decoder-side (ref detectron2.py:96-111).

Param names mirror Detectron2's checkpoint keys closely enough for the
mechanical weight converter in models/wrappers/torch_weights.py.
"""

from __future__ import annotations

from typing import Dict, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp


class FrozenBN(nn.Module):
    """Per-channel affine (BN folded to scale/bias at conversion time)."""

    features: int

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        scale = self.param("scale", lambda k, s: jnp.ones(s, jnp.float32), (self.features,))
        bias = self.param("bias", lambda k, s: jnp.zeros(s, jnp.float32), (self.features,))
        return x * scale + bias


class ConvBN(nn.Module):
    features: int
    kernel: int
    stride: int = 1
    use_relu: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        y = nn.Conv(
            self.features,
            (self.kernel, self.kernel),
            strides=(self.stride, self.stride),
            padding=[(self.kernel // 2, self.kernel // 2)] * 2,
            use_bias=False,
            dtype=self.dtype,
            param_dtype=jnp.float32,
            name="conv",
        )(x)
        y = FrozenBN(self.features, name="norm")(y.astype(jnp.float32)).astype(self.dtype)
        if self.use_relu:
            y = nn.relu(y)
        return y


class ConvBNGrouped(nn.Module):
    """Grouped 3x3 conv + frozen BN (ResNeXt cardinality path)."""

    features: int
    stride: int = 1
    groups: int = 32
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        y = nn.Conv(
            self.features, (3, 3), strides=(self.stride, self.stride),
            padding=[(1, 1)] * 2, use_bias=False,
            feature_group_count=self.groups,
            dtype=self.dtype, param_dtype=jnp.float32, name="conv",
        )(x)
        y = FrozenBN(self.features, name="norm")(y.astype(jnp.float32)).astype(self.dtype)
        return nn.relu(y)


class Bottleneck(nn.Module):
    """1x1 -> 3x3 -> 1x1 with stride in the 1x1 (caffe/MSRA convention).

    groups > 1 gives the ResNeXt (X-101 32x8d) block: grouped 3x3 and
    stride moved to the 3x3 (Detectron2 X-101 convention).
    """

    bottleneck_channels: int
    out_channels: int
    stride: int = 1
    has_shortcut: bool = False
    groups: int = 1
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        if self.has_shortcut:
            shortcut = ConvBN(
                self.out_channels, 1, self.stride, use_relu=False, dtype=self.dtype,
                name="shortcut",
            )(x)
        else:
            shortcut = x
        if self.groups == 1:
            y = ConvBN(self.bottleneck_channels, 1, self.stride, dtype=self.dtype, name="conv1")(x)
            y = ConvBN(self.bottleneck_channels, 3, 1, dtype=self.dtype, name="conv2")(y)
        else:
            y = ConvBN(self.bottleneck_channels, 1, 1, dtype=self.dtype, name="conv1")(x)
            y = ConvBNGrouped(
                self.bottleneck_channels, self.stride, self.groups, dtype=self.dtype,
                name="conv2",
            )(y)
        y = ConvBN(self.out_channels, 1, 1, use_relu=False, dtype=self.dtype, name="conv3")(y)
        return nn.relu(y + shortcut)


class ResNet50(nn.Module):
    """Returns {res2, res3, res4, res5} (strides 4/8/16/32), NHWC.

    depth=50 -> R-50; depth=101 with groups=32/width_per_group=8 -> the
    ResNeXt-101 32x8d backbone of the X_101 model zoo entries
    (ref model_wrappers/detectron2.py:277-298 registers both families).
    """

    depth: int = 50
    groups: int = 1
    width_per_group: int = 64
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> Dict[str, jax.Array]:
        y = ConvBN(64, 7, 2, dtype=self.dtype, name="stem")(x)
        # Detectron2 stem maxpool: kernel 3 stride 2, SAME-ish padding 1
        y = nn.max_pool(y, (3, 3), strides=(2, 2), padding=[(1, 1), (1, 1)])

        blocks_per_stage = {50: (3, 4, 6, 3), 101: (3, 4, 23, 3)}[self.depth]
        bottleneck_base = self.groups * self.width_per_group
        out: Dict[str, jax.Array] = {}
        stage_specs = [
            ("res2", blocks_per_stage[0], bottleneck_base, 256, 1),
            ("res3", blocks_per_stage[1], bottleneck_base * 2, 512, 2),
            ("res4", blocks_per_stage[2], bottleneck_base * 4, 1024, 2),
            ("res5", blocks_per_stage[3], bottleneck_base * 8, 2048, 2),
        ]
        for name, blocks, bott, out_ch, stride in stage_specs:
            for i in range(blocks):
                y = Bottleneck(
                    bottleneck_channels=bott,
                    out_channels=out_ch,
                    stride=stride if i == 0 else 1,
                    has_shortcut=(i == 0),
                    groups=self.groups,
                    dtype=self.dtype,
                    name=f"{name}_{i}",
                )(y)
            out[name] = y
        return out


class FPN(nn.Module):
    """Feature pyramid: laterals + top-down nearest + 3x3 output convs + p6."""

    out_channels: int = 256
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, bottom_up: Dict[str, jax.Array]) -> Dict[str, jax.Array]:
        names = ["res2", "res3", "res4", "res5"]
        laterals = []
        for i, n in enumerate(names):
            laterals.append(
                nn.Conv(
                    self.out_channels, (1, 1), dtype=self.dtype,
                    param_dtype=jnp.float32, name=f"fpn_lateral{i+2}",
                )(bottom_up[n])
            )
        # top-down pathway
        merged = [None] * 4
        merged[3] = laterals[3]
        for i in (2, 1, 0):
            up = _nearest_x2(merged[i + 1], laterals[i].shape[1:3])
            merged[i] = laterals[i] + up
        out = {}
        for i in range(4):
            out[f"p{i+2}"] = nn.Conv(
                self.out_channels, (3, 3), padding=[(1, 1), (1, 1)],
                dtype=self.dtype, param_dtype=jnp.float32, name=f"fpn_output{i+2}",
            )(merged[i])
        out["p6"] = nn.max_pool(out["p5"], (1, 1), strides=(2, 2))
        return out


def _nearest_x2(x: jax.Array, target_hw: Tuple[int, int]) -> jax.Array:
    n, h, w, c = x.shape
    y = jnp.repeat(jnp.repeat(x, 2, axis=1), 2, axis=2)
    return y[:, : target_hw[0], : target_hw[1], :]


class ResNetFPN(nn.Module):
    depth: int = 50
    groups: int = 1
    width_per_group: int = 64
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        self.bottom_up = ResNet50(
            depth=self.depth, groups=self.groups,
            width_per_group=self.width_per_group, dtype=self.dtype,
        )
        self.fpn = FPN(dtype=self.dtype)

    def __call__(self, x: jax.Array) -> Dict[str, jax.Array]:
        return self.fpn(self.bottom_up(x))

    def pyramid_no_p6(self, x: jax.Array) -> Dict[str, jax.Array]:
        """NN-Part1 output: {p2..p5}, p6 dropped (ref detectron2.py:96-102)."""
        out = self(x)
        return {k: out[k] for k in ("p2", "p3", "p4", "p5")}


def top_block_p6(p5: jax.Array) -> jax.Array:
    """Recompute p6 from (decoded) p5 — NN-Part2 entry (ref detectron2.py:111)."""
    return nn.max_pool(p5, (1, 1), strides=(2, 2))
