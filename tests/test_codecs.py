import jax.numpy as jnp
import numpy as np
import pytest

from lmsfc_tpu.codecs import Bypass, LMSFCCodec


def feature_dict(batch=2, base=16, channels=(8, 8, 8, 8), seed=0):
    rng = np.random.default_rng(seed)
    data = {}
    h = w = base
    for i, c in enumerate(channels):
        data[f"p{i+2}"] = jnp.asarray(
            rng.normal(0, 2, (batch, c, h, w)).astype(np.float32)
        )
        h, w = -(-h // 2), -(-w // 2)
    return data


class TestBypass:
    def test_bytes_accounting(self):
        codec = Bypass(eval_encode="bpp")
        data = feature_dict()
        total = sum(np.prod(v.shape) for v in data.values()) * 4
        out = codec.encode({"data": data})
        assert len(out["bytes"]) == 2
        assert sum(out["bytes"]) == pytest.approx(total)
        dec = codec.decode(out["bitstream"])
        for k in data:
            assert np.array_equal(np.asarray(dec["data"][k]), np.asarray(data[k]))

    def test_nbit_quant_noise(self):
        codec = Bypass(nbit_quant=8, eval_encode="bpp")
        data = feature_dict(seed=1)
        orig = {k: np.asarray(v).copy() for k, v in data.items()}
        out = codec.encode({"data": data})
        dec = codec.decode(out["bitstream"])
        for k in orig:
            a, b = orig[k], np.asarray(dec["data"][k])
            assert not np.array_equal(a, b)
            rng = a.max() - a.min()
            assert np.max(np.abs(a - b)) <= rng / 255 + 1e-5


class TestLMSFCCodec:
    @pytest.fixture(scope="class")
    def codec(self):
        return LMSFCCodec(
            num_filters=16,
            latent_filters=16,
            hyper_filters=8,
            out_channels=(8, 8, 8, 8),
            dtype="float32",
        )

    def test_roundtrip_bitstream(self, codec, tmp_path):
        data = feature_dict(batch=2, seed=2)
        out = codec.encode({"data": data}, codec_output_dir=tmp_path, bitstream_name="t")
        assert (tmp_path / "t.bin").exists()
        assert len(out["bytes"]) == 2 and all(b > 0 for b in out["bytes"])
        file_size = (tmp_path / "t.bin").stat().st_size
        assert sum(out["bytes"]) == pytest.approx(file_size, rel=0.01)

        dec = codec.decode(out["bitstream"])
        assert set(dec["data"].keys()) == set(data.keys())
        for k in data:
            assert dec["data"][k].shape == data[k].shape

    def test_deterministic_reconstruction(self, codec, tmp_path):
        """Decoding twice gives the identical tensors (no rng in eval path)."""
        data = feature_dict(batch=1, seed=3)
        out = codec.encode({"data": data}, codec_output_dir=tmp_path, bitstream_name="d")
        d1 = codec.decode(out["bitstream"])
        d2 = codec.decode(out["bitstream"])
        for k in d1["data"]:
            assert np.array_equal(np.asarray(d1["data"][k]), np.asarray(d2["data"][k]))

    def test_compression_beats_raw(self, codec, tmp_path):
        data = feature_dict(batch=1, seed=4)
        raw = sum(np.prod(v.shape) for v in data.values()) * 4
        out = codec.encode({"data": data}, codec_output_dir=tmp_path, bitstream_name="c")
        assert sum(out["bytes"]) < raw, "learned codec should beat fp32 raw size"

    def test_odd_sfu_like_shapes(self, tmp_path):
        codec = LMSFCCodec(
            num_filters=16, latent_filters=16, hyper_filters=8,
            out_channels=(8, 8, 8, 8), dtype="float32",
        )
        rng = np.random.default_rng(5)
        shapes = [(100, 168), (50, 84), (25, 42), (13, 21)]
        data = {
            f"p{i+2}": jnp.asarray(rng.normal(size=(1, 8, h, w)).astype(np.float32))
            for i, (h, w) in enumerate(shapes)
        }
        out = codec.encode({"data": data}, codec_output_dir=tmp_path, bitstream_name="o")
        dec = codec.decode(out["bitstream"])
        for k in data:
            assert dec["data"][k].shape == data[k].shape
