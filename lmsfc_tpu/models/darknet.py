"""Darknet-53 + JDE (YOLOv3 joint-detection-embedding) halves in Flax, NHWC.

Re-creation of the patched JDE network the reference wraps
(compressai_vision/model_wrappers/jde.py:35-178 + the installer's interface
patch scripts/0001-interface-with-compressai-vision.patch: forward with
`features_at_splits` capture for NN-Part1 and feature injection for
NN-Part2). Split points follow the darknet cfg layer numbering used by the
FCM configs (cfgs/vision_model/default.yaml:24-34):

  TVD   : layers {36, 61, 74}  = backbone stage outputs, 256/512/1024 ch at
          strides 8/16/32 (fpn-sizes TVD-01.json: [76,136]/[38,68]/[19,34])
  HiEve : layers {105, 90, 75} = the three YOLO-branch pre-prediction maps
          (128/256/512 ch at strides 8/16/32)

Each YOLO branch predicts 4 anchors x (4 box + 2 conf-logits) = 24 channels
plus a 512-d embedding map -> 54264 proposals at 1088x608
(ref jde.py:206-208 asserts that count).
"""

from __future__ import annotations

from typing import Dict, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

# JDE 1088x608 anchor set (w,h) per stride, 4 anchors each
JDE_ANCHORS = {
    32: ((128, 384), (180, 540), (256, 640), (512, 640)),
    16: ((32, 96), (45, 135), (64, 192), (90, 271)),
    8: ((8, 24), (11, 34), (16, 48), (23, 68)),
}
EMB_DIM = 512


class ConvBNLeaky(nn.Module):
    features: int
    kernel: int = 3
    stride: int = 1
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        pad = self.kernel // 2
        y = nn.Conv(
            self.features, (self.kernel, self.kernel), strides=(self.stride, self.stride),
            padding=[(pad, pad)] * 2, use_bias=False, dtype=self.dtype,
            param_dtype=jnp.float32, name="conv",
        )(x)
        scale = self.param("bn_scale", lambda k, s: jnp.ones(s, jnp.float32), (self.features,))
        bias = self.param("bn_bias", lambda k, s: jnp.zeros(s, jnp.float32), (self.features,))
        y = (y.astype(jnp.float32) * scale + bias).astype(self.dtype)
        return nn.leaky_relu(y, 0.1)


class Residual(nn.Module):
    features: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        y = ConvBNLeaky(self.features // 2, 1, dtype=self.dtype, name="reduce")(x)
        y = ConvBNLeaky(self.features, 3, dtype=self.dtype, name="expand")(y)
        return x + y


class Darknet53(nn.Module):
    """Backbone; returns stage outputs {s8: 256ch, s16: 512ch, s32: 1024ch}."""

    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x) -> Dict[str, jax.Array]:
        y = ConvBNLeaky(32, 3, dtype=self.dtype, name="stem")(x)
        spec = [(64, 1), (128, 2), (256, 8), (512, 8), (1024, 4)]
        out = {}
        for si, (ch, nblocks) in enumerate(spec):
            y = ConvBNLeaky(ch, 3, 2, dtype=self.dtype, name=f"down{si}")(y)
            for bi in range(nblocks):
                y = Residual(ch, dtype=self.dtype, name=f"res{si}_{bi}")(y)
            if ch in (256, 512, 1024):
                out[f"s{2 ** (si + 1)}"] = y  # s8/s16/s32 strides
        return out


class _Branch(nn.Module):
    """YOLO branch: conv set -> (route tensor, prediction map, embedding)."""

    mid: int
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        self.c0 = ConvBNLeaky(self.mid, 1, dtype=self.dtype)
        self.c1 = ConvBNLeaky(self.mid * 2, 3, dtype=self.dtype)
        self.c2 = ConvBNLeaky(self.mid, 1, dtype=self.dtype)
        self.c3 = ConvBNLeaky(self.mid * 2, 3, dtype=self.dtype)
        self.c4 = ConvBNLeaky(self.mid, 1, dtype=self.dtype)
        self.c5 = ConvBNLeaky(self.mid * 2, 3, dtype=self.dtype)
        self.pred = nn.Conv(24, (1, 1), dtype=self.dtype, param_dtype=jnp.float32)
        self.emb = nn.Conv(
            EMB_DIM, (3, 3), padding=[(1, 1)] * 2, dtype=self.dtype, param_dtype=jnp.float32
        )

    def __call__(self, x):
        y = self.c3(self.c2(self.c1(self.c0(x))))
        route = self.c4(y)
        feat = self.c5(route)
        return route, self.pred(feat), self.emb(route)


class JDEHead(nn.Module):
    """From backbone stage outputs to per-scale (pred, emb) maps."""

    dtype: jnp.dtype = jnp.float32

    def setup(self):
        self.b32 = _Branch(512, dtype=self.dtype)
        self.up32 = ConvBNLeaky(256, 1, dtype=self.dtype)
        self.b16 = _Branch(256, dtype=self.dtype)
        self.up16 = ConvBNLeaky(128, 1, dtype=self.dtype)
        self.b8 = _Branch(128, dtype=self.dtype)

    def _pre_maps(self, feats: Dict[str, jax.Array]) -> Dict[str, jax.Array]:
        """Pre-prediction maps — the HiEve split tensors {l105,l90,l75}.

        Dict order is finest-first (l105 = stride 8): codecs consume the
        level dict in order with the finest level leading (ops/tiling
        packing and FENet fusion both assume it).
        """
        r32, _, _ = self.b32(feats["s32"])
        u = _up2(self.up32(r32), feats["s16"].shape[1:3])
        x16 = jnp.concatenate([u, feats["s16"]], axis=-1)
        r16, _, _ = self.b16(x16)
        u = _up2(self.up16(r16), feats["s8"].shape[1:3])
        x8 = jnp.concatenate([u, feats["s8"]], axis=-1)
        r8, _, _ = self.b8(x8)
        return {"l105": r8, "l90": r16, "l75": r32}

    def __call__(self, feats: Dict[str, jax.Array]):
        r32, p32, e32 = self.b32(feats["s32"])
        u = _up2(self.up32(r32), feats["s16"].shape[1:3])
        x16 = jnp.concatenate([u, feats["s16"]], axis=-1)
        r16, p16, e16 = self.b16(x16)
        u = _up2(self.up16(r16), feats["s8"].shape[1:3])
        x8 = jnp.concatenate([u, feats["s8"]], axis=-1)
        _, p8, e8 = self.b8(x8)
        return {32: (p32, e32), 16: (p16, e16), 8: (p8, e8)}


def _up2(x, target_hw):
    y = jnp.repeat(jnp.repeat(x, 2, axis=1), 2, axis=2)
    return y[:, : target_hw[0], : target_hw[1], :]


def decode_yolo(
    pred: jax.Array, emb: jax.Array, stride: int
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """pred [1,H,W,24], emb [1,H,W,512] -> boxes [H*W*4,4] (xywh image
    coords), conf [H*W*4], embeddings [H*W*4,512] (L2-normalized)."""
    _, h, w, _ = pred.shape
    p = pred.reshape(h, w, 4, 6)
    anchors = jnp.asarray(JDE_ANCHORS[stride], jnp.float32)  # [4,2]

    gx = jax.lax.broadcasted_iota(jnp.float32, (h, w), 1)
    gy = jax.lax.broadcasted_iota(jnp.float32, (h, w), 0)
    cx = (jax.nn.sigmoid(p[..., 0]) + gx[..., None]) * stride
    cy = (jax.nn.sigmoid(p[..., 1]) + gy[..., None]) * stride
    bw = jnp.exp(p[..., 2]) * anchors[None, None, :, 0]
    bh = jnp.exp(p[..., 3]) * anchors[None, None, :, 1]
    conf = jax.nn.softmax(p[..., 4:6], axis=-1)[..., 1]

    boxes = jnp.stack([cx, cy, bw, bh], axis=-1).reshape(-1, 4)
    conf = conf.reshape(-1)
    e = emb[0] / (jnp.linalg.norm(emb[0], axis=-1, keepdims=True) + 1e-6)
    e = jnp.broadcast_to(e[:, :, None, :], (h, w, 4, EMB_DIM)).reshape(-1, EMB_DIM)
    return boxes, conf, e


class JDENet(nn.Module):
    """Full network with split-capable forward."""

    dtype: jnp.dtype = jnp.float32

    def setup(self):
        self.backbone = Darknet53(dtype=self.dtype)
        self.head = JDEHead(dtype=self.dtype)

    def __call__(self, x):
        return self.head(self.backbone(x))

    # --- NN-Part1 variants -------------------------------------------------
    def features_backbone(self, x) -> Dict[str, jax.Array]:
        """TVD split {36,61,74}: the three backbone stage outputs."""
        s = self.backbone(x)
        return {"l36": s["s8"], "l61": s["s16"], "l74": s["s32"]}

    def features_head(self, x) -> Dict[str, jax.Array]:
        """HiEve split {105,90,75}: pre-prediction maps."""
        return self.head._pre_maps(self.backbone(x))

    # --- NN-Part2 variants -------------------------------------------------
    def outputs_from_backbone(self, feats: Dict[str, jax.Array]):
        s = {"s8": feats["l36"], "s16": feats["l61"], "s32": feats["l74"]}
        return self.head(s)

    def outputs_from_head(self, feats: Dict[str, jax.Array]):
        """Resume from {l75,l90,l105} route tensors: prediction convs only."""
        r32, r16, r8 = feats["l75"], feats["l90"], feats["l105"]
        out = {}
        for stride, r, br in ((32, r32, self.head.b32), (16, r16, self.head.b16), (8, r8, self.head.b8)):
            feat = br.c5(r)
            out[stride] = (br.pred(feat), br.emb(r))
        return out
