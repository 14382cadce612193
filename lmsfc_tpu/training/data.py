"""Training-data sources for the RD loop.

The reference trains L-MSFC on FPN features exported by NN-Part1 (SURVEY.md
§2.9/§5 — feature dumping via `generate_features_only`). Two sources here:

  FeatureDumpSource — iterate .npz dumps written by the pipelines' feature
      cache (pipelines/base.py `dump_features_dir`), random-cropped to a
      fixed patch geometry so every batch compiles to one XLA program.
  SyntheticSource  — gaussian features with per-dataset dynamic ranges, for
      smoke tests and throughput work without the vision datasets.

Both yield lists of NHWC levels (finest first) with static shapes.
"""

from __future__ import annotations

from pathlib import Path
from typing import Iterator, List, Optional, Sequence, Tuple

import numpy as np


class SyntheticSource:
    def __init__(
        self,
        batch: int,
        base_hw: Tuple[int, int] = (64, 64),
        channels: Sequence[int] = (256, 256, 256, 256),
        value_range: Tuple[float, float] = (-17.8848, 16.69417),  # SFUHW
        seed: int = 0,
    ):
        self.batch = batch
        self.base_hw = base_hw
        self.channels = tuple(channels)
        self.rng = np.random.default_rng(seed)
        lo, hi = value_range
        self.mean = (hi + lo) / 2
        self.std = (hi - lo) / 8

    def __iter__(self) -> Iterator[List[np.ndarray]]:
        while True:
            feats = []
            h, w = self.base_hw
            for c in self.channels:
                feats.append(
                    self.rng.normal(self.mean, self.std, (self.batch, h, w, c)).astype(
                        np.float32
                    )
                )
                h, w = -(-h // 2), -(-w // 2)
            yield feats


class FeatureDumpSource:
    """Random crops from .npz feature dumps (keys = levels, NCHW arrays)."""

    def __init__(
        self,
        dump_dir: Path,
        batch: int,
        base_hw: Tuple[int, int] = (64, 64),
        levels: Optional[Sequence[str]] = None,
        seed: int = 0,
        preload: bool = False,
    ):
        self.files = sorted(Path(dump_dir).glob("*_features.npz"))
        if not self.files:
            raise FileNotFoundError(f"no *_features.npz under {dump_dir}")
        self.batch = batch
        self.base_hw = base_hw
        self.levels = list(levels) if levels else None
        self.rng = np.random.default_rng(seed)
        # decompressing a full npz per sample starves the accelerator on
        # few-core hosts; preload decompresses every dump into RAM once
        self._cache: Optional[List[dict]] = None
        if preload:
            self._cache = []
            for f in self.files:
                loaded = np.load(f)
                keys = self.levels or [k for k in loaded.files if k != "_meta"]
                self._cache.append({k: np.asarray(loaded[k]) for k in keys})

    def _sample(self, idx: int) -> dict:
        if self._cache is not None:
            return self._cache[idx]
        loaded = np.load(self.files[idx])
        keys = self.levels or [k for k in loaded.files if k != "_meta"]
        return {k: loaded[k] for k in keys}

    def __iter__(self) -> Iterator[List[np.ndarray]]:
        while True:
            batch_feats: Optional[List[List[np.ndarray]]] = None
            for _ in range(self.batch):
                crops = self._crop(self._sample(int(self.rng.integers(len(self.files)))))
                if batch_feats is None:
                    batch_feats = [[] for _ in crops]
                for i, c in enumerate(crops):
                    batch_feats[i].append(c)
            yield [np.stack(level) for level in batch_feats]

    def _crop(self, data) -> List[np.ndarray]:
        keys = list(data.keys())
        h0, w0 = self.base_hw
        first = data[keys[0]]
        _, c, fh, fw = first.shape
        # random top-left on the finest level, aligned to the coarsest stride
        align = 2 ** (len(keys) - 1)
        max_y = max(fh - h0, 0)
        max_x = max(fw - w0, 0)
        y = int(self.rng.integers(0, max_y // align + 1)) * align if max_y else 0
        x = int(self.rng.integers(0, max_x // align + 1)) * align if max_x else 0
        out = []
        ch, cw, cy, cx = h0, w0, y, x
        for k in keys:
            lvl = data[k][0]  # [C,H,W]
            pad_h = max(cy + ch - lvl.shape[1], 0)
            pad_w = max(cx + cw - lvl.shape[2], 0)
            if pad_h or pad_w:
                lvl = np.pad(lvl, ((0, 0), (0, pad_h), (0, pad_w)))
            crop = lvl[:, cy : cy + ch, cx : cx + cw]
            out.append(np.transpose(crop, (1, 2, 0)).astype(np.float32))
            ch, cw = -(-ch // 2), -(-cw // 2)
            cy, cx = cy // 2, cx // 2
        return out


def device_crop_sampler(base_hw: Tuple[int, int], batch: int):
    """On-device random-crop sampler (jit-traceable).

    The host->device path is the training bottleneck on relay-attached TPUs
    (a b32 64x64 4-level batch is ~176MB/step); instead the FULL dump set is
    staged in HBM once and every step samples crops with device RNG +
    dynamic_slice — zero per-step host transfer.

    Returns sample(levels, rng) -> list of [batch,h,w,C] crops, where
    levels are [N,H,W,C] arrays (finest first, dyadic sizes).
    """
    import jax
    import jax.numpy as jnp

    h0, w0 = base_hw

    def sample(levels, rng):
        n_levels = len(levels)
        align = 2 ** (n_levels - 1)
        n, fh, fw = levels[0].shape[0], levels[0].shape[1], levels[0].shape[2]
        rng_i, rng_y, rng_x = jax.random.split(rng, 3)
        img = jax.random.randint(rng_i, (batch,), 0, n)
        # top-left on the finest level, aligned to the coarsest stride
        y0 = jax.random.randint(rng_y, (batch,), 0, (fh - h0) // align + 1) * align
        x0 = jax.random.randint(rng_x, (batch,), 0, (fw - w0) // align + 1) * align
        out = []
        ch, cw = h0, w0
        for lvl, data in enumerate(levels):
            ys = y0 >> lvl
            xs = x0 >> lvl

            def crop_one(i, y, x, d=data, hh=ch, ww=cw):
                # 4-D dynamic_slice: never materializes the whole image
                return jax.lax.dynamic_slice(
                    d, (i, y, x, 0), (1, hh, ww, d.shape[-1])
                )[0]

            out.append(jax.vmap(crop_one)(img, ys, xs))
            ch, cw = -(-ch // 2), -(-cw // 2)
        return out

    return sample


def device_clip_sampler(base_hw: Tuple[int, int], clip_len: int, clip_t: int):
    """On-device random clip sampler (temporal analog of
    device_crop_sampler): levels are [N_clips*clip_t, H, W, C] with each
    clip's frames contiguous; every step picks one clip, a frame offset,
    and a spatial window shared across the clip — one dynamic_slice per
    level, zero per-step host transfer (a host-fed 8-frame clip batch is
    ~45MB/step, >1s on the relay link)."""
    import jax

    h0, w0 = base_hw
    # a clip longer than the source stride would make randint's range empty
    # and dynamic_slice clamp — silently sampling frames that straddle two
    # unrelated source clips (broken motion structure); fail loudly instead
    if clip_len > clip_t:
        raise ValueError(f"clip_len={clip_len} exceeds source clip_t={clip_t}")

    def sample(levels, rng):
        n_levels = len(levels)
        align = 2 ** (n_levels - 1)
        n_clips = levels[0].shape[0] // clip_t
        fh, fw = levels[0].shape[1], levels[0].shape[2]
        rng_c, rng_t, rng_y, rng_x = jax.random.split(rng, 4)
        c = jax.random.randint(rng_c, (), 0, n_clips)
        t0 = jax.random.randint(rng_t, (), 0, clip_t - clip_len + 1)
        start = c * clip_t + t0
        y0 = jax.random.randint(rng_y, (), 0, (fh - h0) // align + 1) * align
        x0 = jax.random.randint(rng_x, (), 0, (fw - w0) // align + 1) * align
        out = []
        ch, cw = h0, w0
        for lvl, data in enumerate(levels):
            out.append(jax.lax.dynamic_slice(
                data, (start, y0 >> lvl, x0 >> lvl, 0),
                (clip_len, ch, cw, data.shape[-1]),
            ))
            ch, cw = -(-ch // 2), -(-cw // 2)
        return out

    return sample


class FeatureClipDumpSource:
    """Random spatio-temporal crops from *_clip.npz motion dumps (keys =
    levels, [T,C,H,W]; written by scripts/make_motion_features.py). Yields
    [clip_len, h, w, C] levels (finest first) — the temporal trainer's
    batch axis IS the clip. The crop window is shared across the clip's
    frames so the motion structure survives."""

    def __init__(
        self,
        dump_dir: Path,
        clip_len: int = 8,
        base_hw: Tuple[int, int] = (64, 64),
        seed: int = 0,
        preload: bool = True,
    ):
        self.files = sorted(Path(dump_dir).glob("*_clip.npz"))
        if not self.files:
            raise FileNotFoundError(f"no *_clip.npz under {dump_dir}")
        self.clip_len = clip_len
        self.base_hw = base_hw
        self.rng = np.random.default_rng(seed)
        self._cache: Optional[List[dict]] = None
        if preload:
            self._cache = []
            for f in self.files:
                loaded = np.load(f)
                keys = [k for k in loaded.files if k != "_meta"]
                self._cache.append({k: np.asarray(loaded[k]) for k in keys})

    def _sample(self, idx: int) -> dict:
        if self._cache is not None:
            return self._cache[idx]
        loaded = np.load(self.files[idx])
        return {k: loaded[k] for k in loaded.files if k != "_meta"}

    def __iter__(self) -> Iterator[List[np.ndarray]]:
        while True:
            data = self._sample(int(self.rng.integers(len(self.files))))
            keys = list(data.keys())
            t_total = data[keys[0]].shape[0]
            if self.clip_len > t_total:
                raise ValueError(
                    f"clip_len={self.clip_len} exceeds dump length {t_total}"
                )
            t0 = int(self.rng.integers(0, t_total - self.clip_len + 1))
            h0, w0 = self.base_hw
            fh, fw = data[keys[0]].shape[2], data[keys[0]].shape[3]
            align = 2 ** (len(keys) - 1)
            y = int(self.rng.integers(0, max(fh - h0, 0) // align + 1)) * align
            x = int(self.rng.integers(0, max(fw - w0, 0) // align + 1)) * align
            out = []
            ch, cw, cy, cx = h0, w0, y, x
            for k in keys:
                lvl = data[k][t0 : t0 + self.clip_len]  # [T,C,H,W]
                pad_h = max(cy + ch - lvl.shape[2], 0)
                pad_w = max(cx + cw - lvl.shape[3], 0)
                if pad_h or pad_w:
                    lvl = np.pad(lvl, ((0, 0), (0, 0), (0, pad_h), (0, pad_w)))
                crop = lvl[:, :, cy : cy + ch, cx : cx + cw]
                out.append(np.transpose(crop, (0, 2, 3, 1)).astype(np.float32))
                ch, cw = -(-ch // 2), -(-cw // 2)
                cy, cx = cy // 2, cx // 2
            yield out


class SyntheticClipSource:
    """Synthetic temporally-correlated clips for the temporal codec:
    [T,H,W,C] levels per sample (translation motion + small innovation)."""

    def __init__(
        self,
        clip_len: int = 8,
        base_hw: Tuple[int, int] = (64, 64),
        channels: Sequence[int] = (256, 256, 256, 256),
        motion_px: float = 1.0,
        innovation: float = 0.1,
        value_range: Tuple[float, float] = (-17.8848, 16.69417),
        seed: int = 0,
    ):
        self.clip_len = clip_len
        self.base_hw = base_hw
        self.channels = tuple(channels)
        self.motion_px = motion_px
        self.innovation = innovation
        lo, hi = value_range
        self.mean = (hi + lo) / 2
        self.std = (hi - lo) / 8
        self.rng = np.random.default_rng(seed)

    def __iter__(self) -> Iterator[List[np.ndarray]]:
        while True:
            feats = []
            h, w = self.base_hw
            shift = self.motion_px
            for c in self.channels:
                f0 = self.rng.normal(self.mean, self.std, (h, w, c)).astype(np.float32)
                frames = [f0]
                for _ in range(self.clip_len - 1):
                    prev = frames[-1]
                    moved = np.roll(prev, max(1, int(round(shift))), axis=1)
                    noise = self.rng.normal(0, self.std * self.innovation, prev.shape)
                    frames.append((moved + noise).astype(np.float32))
                feats.append(np.stack(frames))
                h, w = -(-h // 2), -(-w // 2)
                shift = shift / 2
            yield feats
