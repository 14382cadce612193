import io
import json

import numpy as np
import pytest

from lmsfc_tpu.config.provenance import get_env, write_outputs
from lmsfc_tpu.config import Config
from lmsfc_tpu.tools.conformance import compare
from lmsfc_tpu.utils.readwrite import (
    read_bytes,
    read_float32,
    read_uchars,
    read_uints,
    write_bytes,
    write_float32,
    write_uchars,
    write_uints,
)
from lmsfc_tpu.utils.yuv import YUVReader, YUVWriter, frame_size_bytes


class TestReadWrite:
    def test_struct_roundtrip(self):
        buf = io.BytesIO()
        write_uints(buf, (1, 2**32 - 1))
        write_uchars(buf, (0, 255))
        write_float32(buf, (3.14, -1e9))
        write_bytes(buf, b"abc")
        buf.seek(0)
        assert read_uints(buf, 2) == (1, 2**32 - 1)
        assert read_uchars(buf, 2) == (0, 255)
        f = read_float32(buf, 2)
        assert f[0] == pytest.approx(3.14, rel=1e-6)
        assert read_bytes(buf, 3) == b"abc"

    def test_big_endian_wire_format(self):
        buf = io.BytesIO()
        write_uints(buf, (1,))
        assert buf.getvalue() == b"\x00\x00\x00\x01"


class TestYUV:
    def test_yuv400_10le_roundtrip(self, tmp_path):
        rng = np.random.default_rng(0)
        frames = rng.integers(0, 1024, (3, 8, 16)).astype(np.uint16)
        p = tmp_path / "t.yuv"
        with YUVWriter(p, 16, 8, "yuv400_10le") as w:
            for f in frames:
                w.write_frame(f)
        assert p.stat().st_size == 3 * frame_size_bytes(16, 8, "yuv400_10le")
        r = YUVReader(p, 16, 8, "yuv400_10le")
        assert r.n_frames == 3
        for i in range(3):
            y, u, v = r.read_frame(i)
            assert np.array_equal(y, frames[i]) and u is None

    def test_yuv420_planes(self, tmp_path):
        y = np.arange(8 * 16, dtype=np.uint16).reshape(8, 16) % 1024
        u = np.full((4, 8), 512, np.uint16)
        v = np.full((4, 8), 100, np.uint16)
        p = tmp_path / "c.yuv"
        with YUVWriter(p, 16, 8, "yuv420_10le") as w:
            w.write_frame(y, u, v)
        r = YUVReader(p, 16, 8, "yuv420_10le")
        y2, u2, v2 = r.read_frame(0)
        assert np.array_equal(y2, y) and np.array_equal(u2, u) and np.array_equal(v2, v)


class TestProvenance:
    def test_env_and_outputs(self, tmp_path):
        env = get_env()
        assert "git_hash" in env and "jax_version" in env
        conf = Config({"a": {"b": 1}})
        write_outputs(conf, tmp_path)
        assert (tmp_path / "config.yaml").exists()
        assert json.loads((tmp_path / "env.json").read_text())["git_hash"] == env["git_hash"]


class TestConformanceTool:
    def test_pass_and_fail(self, tmp_path):
        ref = {"p2": {"means": [0.0, 1.0], "variances": [1.0, 2.0]}}
        (tmp_path / "ref.json").write_text(json.dumps(ref))
        test_ok = {"p2": {"means": [0.0, 1.0 + 1e-5], "variances": [1.0, 2.0]}}
        (tmp_path / "ok.json").write_text(json.dumps(test_ok))
        assert compare(tmp_path / "ref.json", tmp_path / "ok.json", tol=1e-3)["pass"]
        test_bad = {"p2": {"means": [0.5, 1.0], "variances": [1.0, 2.0]}}
        (tmp_path / "bad.json").write_text(json.dumps(test_bad))
        assert not compare(tmp_path / "ref.json", tmp_path / "bad.json", tol=1e-3)["pass"]
