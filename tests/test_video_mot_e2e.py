"""Video split-inference end-to-end on the tracking workload: synthetic MOT
sequence -> JDE NN1 -> lmsfc codec (whole-sequence encode) -> JDE NN2 +
tracker -> CLEAR-MOT evaluation (the reference's flagship video path,
SURVEY.md §3.1/§3.4)."""

import numpy as np
import pytest

import lmsfc_tpu.plugins  # noqa: F401
from lmsfc_tpu.codecs import LMSFCCodec
from lmsfc_tpu.config import Config
from lmsfc_tpu.evaluators import MOTEval
from lmsfc_tpu.models.wrappers.jde import JDE1088x608
from lmsfc_tpu.pipelines import VideoSplitInference

pytestmark = pytest.mark.slow  # e2e: skip with -m 'not slow' for a fast loop


class _SyntheticTrackingLoader:
    """4 frames, tiny letterboxed input, with MOT gt."""

    def __init__(self, n=4, h=64, w=96):
        rng = np.random.default_rng(0)
        self.samples = []
        for f in range(n):
            img = rng.random((3, h, w)).astype(np.float32)
            self.samples.append(
                {
                    "image": img,
                    "file_name": f"f{f}.png",
                    "image_id": f,
                    "frame_id": f + 1,
                    "ratio": 1.0,
                    "pad": (0.0, 0.0),
                    "org_input_size": {"height": h, "width": w},
                    "gt": [{"id": 1, "tlwh": [10 + f, 10, 20, 30]}],
                }
            )

    def __iter__(self):
        for s in self.samples:
            yield [s]


def test_video_split_inference_jde_lmsfc(tmp_path):
    wrapper = JDE1088x608(splits=(36, 61, 74))
    codec = LMSFCCodec(
        num_filters=16, latent_filters=16, hyper_filters=8,
        out_channels=(256, 512, 1024), dtype="float32", chunk_frames=4,
    )
    evaluator = MOTEval()
    pipe = VideoSplitInference(
        Config({"output_dir": str(tmp_path), "codec_output_dir": str(tmp_path / "c")})
    )
    timing, enc_type, coded, perf = pipe(
        wrapper, codec, _SyntheticTrackingLoader(), evaluator
    )
    assert enc_type == "bpp"
    assert len(coded["bytes"]) == 4 and all(b > 0 for b in coded["bytes"])
    assert coded["n_frames"] == 4
    assert "mota" in perf  # random net -> no tracks, mota <= 0; just defined
    assert (tmp_path / "c" / "sequence.bin").exists()
    # all stages ran
    for stage in ("nn-task-part1", "encoder", "decoder", "nn-task-part2"):
        assert timing[stage] > 0
