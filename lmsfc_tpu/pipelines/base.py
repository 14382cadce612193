"""Pipeline base: shared plumbing for split-/remote-inference.

Mirrors compressai_vision/pipelines/base.py:48-254: output dirs, frame-range
bookkeeping, NN-Part1/2 invocation with feature dump/load caching,
conformance statistic dumps, codec passthrough, evaluation.
"""

from __future__ import annotations

import enum
import json
from pathlib import Path
from typing import Any, Dict, List, Optional

import numpy as np

from ..utils.misc import StageTimer


class Parts(str, enum.Enum):
    NNTaskPart1 = "nn-task-part1"
    Encoder = "encoder"
    Decoder = "decoder"
    NNTaskPart2 = "nn-task-part2"
    Evaluation = "evaluation"


class BasePipeline:
    def __init__(self, configs: Any = None, device: str = "tpu"):
        self.configs = configs or {}
        self.device = device
        get = self.configs.get if hasattr(self.configs, "get") else (lambda k, d=None: d)
        self.output_dir = Path(get("output_dir", "./runs"))
        self.output_dir.mkdir(parents=True, exist_ok=True)
        self.codec_output_dir = Path(get("codec_output_dir", self.output_dir / "codec"))
        self.codec_output_dir.mkdir(parents=True, exist_ok=True)
        self.skip_n_frames = int(get("skip_n_frames", 0))
        self.n_frames_to_be_encoded = int(get("n_frames_to_be_encoded", -1))
        self.encode_only = bool(get("encode_only", False))
        self.decode_only = bool(get("decode_only", False))
        # "float16" halves the video pipeline's host feature buffer + codec
        # upload (safe for the bf16 learned codec); float32 default matches
        # the reference's buffering exactly
        self.feature_buffer_dtype = str(get("feature_buffer_dtype", "float32"))
        self.conformance = bool(get("conformance", False))
        self.conformance_subsample = int(get("conformance_subsample", 9))
        self.dump_features_dir: Optional[Path] = None
        dump = get("dump_features_dir")
        if dump:
            self.dump_features_dir = Path(dump)
            self.dump_features_dir.mkdir(parents=True, exist_ok=True)
        self.profile_dir = get("profile_dir")
        self.timer = StageTimer([p.value for p in Parts])

    # ------------------------------------------------------- frame range
    def frame_slice(self, total: Optional[int] = None) -> slice:
        """Frame range selected by skip_n_frames / n_frames_to_be_encoded.

        Mirrors ref pipelines/base.py:106-112: coding a PARTIAL range is only
        allowed in encode_only mode — a partial decode+eval would silently
        score a truncated sequence against full ground truth.
        """
        start = self.skip_n_frames
        stop = None if self.n_frames_to_be_encoded < 0 else start + self.n_frames_to_be_encoded
        partial = start > 0 or (
            stop is not None and (total is None or stop < total)
        )
        if partial and not self.encode_only:
            raise ValueError(
                "partial frame-range coding (skip_n_frames="
                f"{self.skip_n_frames}, n_frames_to_be_encoded="
                f"{self.n_frames_to_be_encoded}) requires encode_only=True "
                "(ref pipelines/base.py:106-112)"
            )
        return slice(start, stop)

    def maybe_profile(self):
        """XLA profiler trace around the run (SURVEY.md §5: the reference has
        wall timers only, run/eval_split_inference.py timing dict; jax
        .profiler traces are the TPU superset — view with tensorboard)."""
        import contextlib

        if not self.profile_dir:
            return contextlib.nullcontext()
        import jax

        Path(self.profile_dir).mkdir(parents=True, exist_ok=True)
        return jax.profiler.trace(str(self.profile_dir))

    # ------------------------------------------------------------- NN parts
    def _from_input_to_features(self, vision_model, batch: List[Dict], file_prefix: str = "") -> Dict:
        """NN-Part1 with optional feature dump cache (ref base.py:118-152)."""
        cache = None
        if self.dump_features_dir is not None and file_prefix:
            cache = self.dump_features_dir / f"{file_prefix}_features.npz"
            if cache.exists():
                loaded = np.load(cache, allow_pickle=True)
                data = {k: loaded[k] for k in loaded.files if k != "_meta"}
                meta = json.loads(str(loaded["_meta"])) if "_meta" in loaded.files else {}
                return {"data": data, **meta}
        out = vision_model.input_to_features(batch, self.device)
        if cache is not None:
            np.savez_compressed(
                cache,
                _meta=json.dumps(
                    {k: v for k, v in out.items() if k != "data"}, default=str
                ),
                **{k: np.asarray(v) for k, v in out["data"].items()},
            )
        return out

    def _from_features_to_output(self, vision_model, feats: Dict) -> Any:
        return vision_model.features_to_output(feats, self.device)

    # --------------------------------------------------------------- codec
    def _compress(self, codec, feats: Dict, codec_output_dir, bitstream_name, file_prefix, img_input=False):
        return codec.encode(
            feats,
            codec_output_dir=codec_output_dir,
            bitstream_name=bitstream_name,
            file_prefix=file_prefix,
            img_input=img_input,
        )

    def _decompress(self, codec, bitstream, codec_output_dir="", file_prefix="", org_img_size=None, img_input=False):
        return codec.decode(
            bitstream,
            codec_output_dir=codec_output_dir,
            file_prefix=file_prefix,
            org_img_size=org_img_size,
            img_input=img_input,
        )

    # ---------------------------------------------------------- conformance
    def _conformance_stats(self, data: Dict[str, Any]) -> Dict[str, Dict[str, List[float]]]:
        """Per-tensor channel means/variances, subsampled (ref base.py:193-217)."""
        stats = {}
        for tag, t in data.items():
            arr = np.asarray(t, np.float64)  # [N,C,H,W]
            means = arr.mean(axis=(0, 2, 3))
            variances = arr.var(axis=(0, 2, 3))
            step = max(1, self.conformance_subsample)
            stats[tag] = {
                "means": means[::step].tolist(),
                "variances": variances[::step].tolist(),
            }
        return stats

    def dump_conformance(self, data: Dict, file_prefix: str) -> None:
        if not self.conformance:
            return
        path = self.output_dir / f"{file_prefix}_conformance.json"
        with open(path, "w") as f:
            json.dump(self._conformance_stats(data), f)

    # ----------------------------------------------------------- evaluation
    def _evaluation(self, evaluator) -> Dict:
        if evaluator is None:
            return {}
        return evaluator.results(str(self.output_dir / "evaluation"))
