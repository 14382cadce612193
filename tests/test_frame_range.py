"""Frame-range bookkeeping + video decode_only resume (VERDICT r1 item 7).

skip_n_frames / n_frames_to_be_encoded select a frame range; coding a
partial range requires encode_only (ref pipelines/base.py:106-112). Video
split-inference can resume from an existing sequence bitstream (the video
analog of ref image_split_inference.py:86-129 decode_only).
"""

import numpy as np
import pytest

import lmsfc_tpu.plugins  # noqa: F401
from lmsfc_tpu.config import Config
from lmsfc_tpu.codecs.learned import LMSFCCodec
from lmsfc_tpu.models.wrappers.rcnn import FasterRCNNFPN
from lmsfc_tpu.pipelines import ImageSplitInference, VideoSplitInference

pytestmark = pytest.mark.slow  # e2e: skip with -m 'not slow' for a fast loop


class _Loader:
    def __init__(self, n=4):
        rng = np.random.default_rng(0)
        self.samples = [
            {
                "image_bgr": rng.integers(0, 255, (64, 96, 3)).astype(np.uint8),
                "file_name": f"f{i}.png",
                "image_id": i,
                "org_input_size": {"height": 64, "width": 96},
            }
            for i in range(n)
        ]
        self.dataset = self.samples

    def __iter__(self):
        for s in self.samples:
            yield [s]


class _CaptureCodec:
    """Stub codec recording how many frames it was asked to encode."""

    eval_encode_type = "bpp"
    n_frames_seen = None

    def encode(self, input, codec_output_dir="", bitstream_name="", file_prefix="", img_input=False):
        self.n_frames_seen = next(iter(input["data"].values())).shape[0]
        return {"bytes": [1.0] * self.n_frames_seen, "bitstream": "none"}


def _video_pipe(tmp_path, **cfg):
    return VideoSplitInference(
        Config(
            {
                "output_dir": str(tmp_path / "out"),
                "codec_output_dir": str(tmp_path / "codec"),
                **cfg,
            }
        )
    )


def test_partial_range_requires_encode_only(tmp_path):
    pipe = _video_pipe(tmp_path, skip_n_frames=1)
    with pytest.raises(ValueError, match="encode_only"):
        pipe(FasterRCNNFPN(resize_input=False), _CaptureCodec(), _Loader(), None)


def test_video_encode_range(tmp_path):
    """skip 1, encode 2 of 4 frames -> codec sees exactly 2 frames."""
    pipe = _video_pipe(
        tmp_path, skip_n_frames=1, n_frames_to_be_encoded=2, encode_only=True
    )
    codec = _CaptureCodec()
    timing, _, coded, perf = pipe(
        FasterRCNNFPN(resize_input=False), codec, _Loader(4), None
    )
    assert codec.n_frames_seen == 2
    assert len(coded["bytes"]) == 2
    assert perf == {}


def test_image_range(tmp_path):
    pipe = ImageSplitInference(
        Config(
            {
                "output_dir": str(tmp_path / "out"),
                "codec_output_dir": str(tmp_path / "codec"),
                "skip_n_frames": 2,
                "encode_only": True,
            }
        )
    )
    codec = _CaptureCodec()
    timing, _, coded, _ = pipe(
        FasterRCNNFPN(resize_input=False), codec, _Loader(4), None
    )
    assert len(coded["bytes"]) == 2  # images 2 and 3 only
    # image encode_only carries total_pixels like the video path, so the
    # runner reports a real bpp for bitstream-generation runs (VERDICT r2
    # weak #4: previously NaN)
    from lmsfc_tpu.run.eval_split_inference import _calc_bpp

    assert coded["total_pixels"] == 2 * 64 * 96
    bpp = _calc_bpp(coded)
    assert np.isfinite(bpp) and bpp > 0


def test_video_decode_only_resume(tmp_path):
    """encode_only writes sequence.bin; decode_only resumes from it."""
    wrapper = FasterRCNNFPN(resize_input=False)
    codec_settings = dict(
        num_filters=16, latent_filters=16, hyper_filters=8,
        dtype="float32", seed=3, chunk_frames=2,
    )
    codec = LMSFCCodec(**codec_settings)
    enc_pipe = _video_pipe(tmp_path, encode_only=True)
    enc_pipe(wrapper, codec, _Loader(4), None)
    assert (tmp_path / "codec" / "sequence.bin").exists()

    codec2 = LMSFCCodec(**codec_settings)
    codec2._params = codec.params  # same model on both sides
    dec_pipe = _video_pipe(tmp_path, decode_only=True)
    timing, _, coded, _ = dec_pipe(wrapper, codec2, _Loader(4), None)
    assert coded["n_frames"] == 4
    assert timing["nn-task-part1"] == 0.0  # NN1 never ran
    assert timing["nn-task-part2"] > 0.0


def test_decode_only_frame_count_mismatch(tmp_path):
    wrapper = FasterRCNNFPN(resize_input=False)
    codec = LMSFCCodec(
        num_filters=16, latent_filters=16, hyper_filters=8,
        dtype="float32", seed=3, chunk_frames=2,
    )
    enc_pipe = _video_pipe(tmp_path, encode_only=True)
    enc_pipe(wrapper, codec, _Loader(2), None)
    dec_pipe = _video_pipe(tmp_path, decode_only=True)
    with pytest.raises(AssertionError, match="frames"):
        dec_pipe(wrapper, codec, _Loader(4), None)
