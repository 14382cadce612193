"""Single-input-multiple-tasks pipeline: one bitstream, several NN-Part2 heads.

Mirrors compressai_vision/pipelines/single_input_multiple_tasks/
single_input_multiple_tasks_v1.py:106-226: NN-Part1 + encode once per image;
decode once; every registered task head consumes the same decoded features
(tag remapping hooks: `feature_map` renames codec-side level names to each
head's expected names).
"""

from __future__ import annotations

from typing import Any, Dict, List, Optional, Sequence

from ..registry import register_pipeline
from .base import BasePipeline, Parts


@register_pipeline("single-input-multiple-tasks")
class SingleInputMultipleTasks(BasePipeline):
    def __call__(
        self,
        vision_models: Any,  # primary model or [primary, *extra_heads]
        codec,
        dataloader,
        evaluators,  # evaluator or list aligned with vision_models
    ) -> tuple:
        models = vision_models if isinstance(vision_models, (list, tuple)) else [vision_models]
        evals: List[Optional[Any]] = (
            list(evaluators) if isinstance(evaluators, (list, tuple)) else [evaluators]
        )
        evals += [None] * (len(models) - len(evals))
        primary = models[0]
        get = self.configs.get if hasattr(self.configs, "get") else (lambda k, d=None: d)
        feature_maps: Sequence[Dict[str, str]] = get("feature_maps", [{}] * len(models))

        coded_bytes: List[float] = []
        n_pixels = 0
        idx = 0
        for batch in dataloader:
            for sample in batch:
                file_prefix = f"img_id_{sample.get('image_id', idx)}"
                idx += 1
                org = sample.get("org_input_size", {})
                n_pixels += org.get("height", 0) * org.get("width", 0)

                self.timer.start(Parts.NNTaskPart1.value)
                feats = self._from_input_to_features(primary, [sample], file_prefix)
                self.timer.stop()

                self.timer.start(Parts.Encoder.value)
                enc = self._compress(codec, feats, self.codec_output_dir, "bitstream", file_prefix)
                self.timer.stop()
                coded_bytes.extend(enc["bytes"])

                self.timer.start(Parts.Decoder.value)
                dec = self._decompress(codec, enc["bitstream"], self.codec_output_dir, file_prefix)
                self.timer.stop()
                for k, v in feats.items():
                    if k != "data":
                        dec.setdefault(k, v)

                self.timer.start(Parts.NNTaskPart2.value)
                for model, ev, fmap in zip(models, evals, feature_maps):
                    task_feats = dict(dec)
                    if fmap:
                        task_feats = {
                            **dec,
                            "data": {fmap.get(k, k): v for k, v in dec["data"].items()},
                        }
                    preds = model.features_to_output(task_feats, self.device)
                    if ev is not None:
                        ev.digest(sample, preds[0])
                self.timer.stop()

        performances = [
            ev.results(str(self.output_dir / "evaluation")) if ev is not None else {}
            for ev in evals
        ]
        coded_res = {"bytes": coded_bytes, "total_pixels": n_pixels}
        return self.timer.times, codec.eval_encode_type, coded_res, performances
