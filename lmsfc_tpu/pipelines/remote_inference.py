"""Remote-inference pipelines: code the INPUT IMAGE, then run the full model.

Mirrors compressai_vision/pipelines/remote_inference/ (image:60-185,
video:67-207): encode consumes the raw frames (img_input=True), decode
reconstructs them, and the vision model runs its complete forward on the
reconstruction — no feature tensors cross the codec.
"""

from __future__ import annotations

from typing import Dict, List

import numpy as np

from ..registry import register_pipeline
from .base import BasePipeline, Parts


@register_pipeline("image-remote-inference")
class ImageRemoteInference(BasePipeline):
    def __call__(self, vision_model, codec, dataloader, evaluator) -> tuple:
        coded_bytes: List[float] = []
        n_pixels = 0
        idx = 0
        for batch in dataloader:
            for sample in batch:
                file_prefix = f"img_id_{sample.get('image_id', idx)}"
                idx += 1
                org = sample.get("org_input_size", {})
                n_pixels += org.get("height", 0) * org.get("width", 0)

                enc_input = {
                    "file_names": [sample["file_name"]],
                    "org_input_size": org,
                    "data": {"frames": sample["image_bgr"][None]},
                }
                self.timer.start(Parts.Encoder.value)
                enc = self._compress(
                    codec, enc_input, self.codec_output_dir, "bitstream",
                    file_prefix, img_input=True,
                )
                self.timer.stop()
                coded_bytes.extend(enc["bytes"])

                if self.encode_only:
                    continue

                self.timer.start(Parts.Decoder.value)
                dec = self._decompress(
                    codec, enc["bitstream"], self.codec_output_dir, file_prefix,
                    org_img_size=org, img_input=True,
                )
                self.timer.stop()

                recon = dec["data"]["frames"][0] if "data" in dec else sample["image_bgr"]
                rec_sample = dict(sample)
                rec_sample["image_bgr"] = np.asarray(recon, np.uint8)

                self.timer.start(Parts.NNTaskPart2.value)
                preds = vision_model.forward([rec_sample])
                self.timer.stop()

                self.timer.start(Parts.Evaluation.value)
                if evaluator is not None:
                    evaluator.digest(sample, preds[0])
                self.timer.stop()

        if self.encode_only:
            return self.timer.times, codec.eval_encode_type, {"bytes": coded_bytes}, {}
        performance = self._evaluation(evaluator)
        coded_res = {"bytes": coded_bytes, "total_pixels": n_pixels}
        return self.timer.times, codec.eval_encode_type, coded_res, performance


@register_pipeline("video-remote-inference")
class VideoRemoteInference(BasePipeline):
    def __call__(self, vision_model, codec, dataloader, evaluator) -> tuple:
        samples: List[Dict] = []
        frames: List[np.ndarray] = []
        for batch in dataloader:
            for sample in batch:
                samples.append(sample)
                frames.append(np.asarray(sample["image_bgr"]))
        org = samples[0].get("org_input_size", {}) if samples else {}

        enc_input = {
            "file_names": [s["file_name"] for s in samples],
            "org_input_size": org,
            "data": {"frames": np.stack(frames)},
        }
        self.timer.start(Parts.Encoder.value)
        enc = self._compress(
            codec, enc_input, self.codec_output_dir, "sequence", "", img_input=True
        )
        self.timer.stop()

        if self.encode_only:
            return self.timer.times, codec.eval_encode_type, {"bytes": enc["bytes"]}, {}

        self.timer.start(Parts.Decoder.value)
        dec = self._decompress(
            codec, enc["bitstream"], self.codec_output_dir, "",
            org_img_size=org, img_input=True,
        )
        self.timer.stop()
        recon_frames = dec["data"]["frames"] if "data" in dec else np.stack(frames)

        for i, sample in enumerate(samples):
            rec_sample = dict(sample)
            rec_sample["image_bgr"] = np.asarray(recon_frames[i], np.uint8)
            self.timer.start(Parts.NNTaskPart2.value)
            preds = vision_model.forward([rec_sample])
            self.timer.stop()
            self.timer.start(Parts.Evaluation.value)
            if evaluator is not None:
                evaluator.digest(sample, preds[0])
            self.timer.stop()

        performance = self._evaluation(evaluator)
        coded_res = {
            "bytes": enc["bytes"],
            "total_pixels": len(samples) * org.get("height", 0) * org.get("width", 0),
            "n_frames": len(samples),
            "fps": 30,
        }
        return self.timer.times, codec.eval_encode_type, coded_res, performance
