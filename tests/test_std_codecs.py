"""Anchor-codec plumbing + cmdline fidelity tests.

No VTM/HM binaries exist in the image; a stub script standing in for
EncoderApp/DecoderApp lets the whole pack -> 10-bit quantize -> YUV ->
subprocess -> GOP-parallel merge -> header -> decode -> un-tile path run for
real (the reference's own tests also rely on fake backends, SURVEY.md §4).

Cmdline fidelity: generated VTM/HM/vvenc cmdlines are asserted against the
exact argument sequences the reference constructs
(compressai_vision/codecs/std_codecs.py:154-255, :697-792, :808-836).
"""

import stat
import textwrap

import jax.numpy as jnp
import numpy as np
import pytest

from lmsfc_tpu.codecs.std_codecs import HM, VTM, VVENC


@pytest.fixture()
def stub_codec(tmp_path):
    """Frame-range-aware identity codec.

    Encoder: parses the VTM flags (-i, --BitstreamFile=, --FrameSkip=,
    --FramesToBeEncoded=, -wdt/-hgt, chroma) and writes a part file
    [skip u32][count u32][payload frames]. Parcat assembles parts at
    skip*framebytes offsets (overlapping GOP boundary frames overwrite with
    identical data, mirroring how VTM parallel chunks overlap by one frame).
    Decoder strips the header back to raw YUV.
    """
    enc = tmp_path / "stub_enc.py"
    enc.write_text(textwrap.dedent("""\
        #!/usr/bin/env python3
        import struct, sys
        argv = sys.argv[1:]
        opts, kv = {}, {}
        i = 0
        while i < len(argv):
            a = argv[i]
            if a.startswith("--") and "=" in a:
                k, v = a[2:].split("=", 1); kv[k] = v; i += 1
            elif a.startswith("-") and i + 1 < len(argv):
                opts[a] = argv[i+1]; i += 2
            else:
                i += 1
        if "-b" in opts and "-o" in opts and "-i" not in opts:
            # decoder invocation: strip part header
            with open(opts["-b"], "rb") as f:
                f.read(8)
                payload = f.read()
            with open(opts["-o"], "wb") as g:
                g.write(payload)
            sys.exit(0)
        # encoder invocation
        w, h = int(opts["-wdt"]), int(opts["-hgt"])
        chroma = kv.get("InputChromaFormat", "400")
        fb = w * h * 2
        if chroma == "420":
            fb = fb * 3 // 2
        skip = int(kv.get("FrameSkip", 0))
        count = int(kv["FramesToBeEncoded"])
        with open(opts["-i"], "rb") as f:
            f.seek(skip * fb)
            payload = f.read(count * fb)
        with open(kv["BitstreamFile"], "wb") as g:
            g.write(struct.pack(">II", skip, count))
            g.write(payload)
    """))
    enc.chmod(enc.stat().st_mode | stat.S_IEXEC)

    parcat = tmp_path / "stub_parcat.py"
    parcat.write_text(textwrap.dedent("""\
        #!/usr/bin/env python3
        import struct, sys
        out = sys.argv[-1]
        parts = []
        for p in sys.argv[1:-1]:
            with open(p, "rb") as f:
                skip, count = struct.unpack(">II", f.read(8))
                parts.append((skip, count, f.read()))
        fb = max(len(d) // c for _, c, d in parts)
        total = max(s + c for s, c, _ in parts)
        buf = bytearray(total * fb)
        for s, c, d in parts:
            buf[s*fb : s*fb + len(d)] = d
        with open(out, "wb") as g:
            g.write(struct.pack(">II", 0, total))
            g.write(bytes(buf))
    """))
    parcat.chmod(parcat.stat().st_mode | stat.S_IEXEC)
    return str(enc), str(enc), str(parcat)


def _features(n_frames=4, seed=0):
    rng = np.random.default_rng(seed)
    return {
        "p2": jnp.asarray(rng.normal(0, 3, (n_frames, 16, 16, 24)).astype(np.float32)),
        "p3": jnp.asarray(rng.normal(0, 3, (n_frames, 16, 8, 12)).astype(np.float32)),
    }


class TestVTMPath:
    def test_roundtrip_identity_codec(self, stub_codec, tmp_path):
        enc, dec, parcat = stub_codec
        codec = VTM(
            encoder_path=enc, decoder_path=dec, parcat_path=parcat,
            qp=37, intra_period=1, parallel_encoding=False,
            min_max_override=(-17.8848, 16.69417),  # SFUHW constants
        )
        data = _features()
        out = codec.encode({"data": data}, tmp_path, "seq")
        assert (tmp_path / "seq.bin").exists()
        assert len(out["bytes"]) == 4

        dec_out = codec.decode(out["bitstream"], tmp_path)
        for k, v in data.items():
            got = np.asarray(dec_out["data"][k])
            assert got.shape == v.shape
            # identity codec: only 10-bit min-max quantization error remains
            step = (16.69417 + 17.8848) / 1023
            clipped = np.clip(np.asarray(v), -17.8848, 16.69417)
            assert np.max(np.abs(got - clipped)) <= step + 1e-4, k

    @pytest.mark.slow
    def test_gop_parallel_merge(self, stub_codec, tmp_path):
        enc, dec, parcat = stub_codec
        codec = VTM(
            encoder_path=enc, decoder_path=dec, parcat_path=parcat,
            qp=37, intra_period=2, parallel_encoding=True,
            min_max_override=(-10.0, 10.0),
        )
        data = _features(n_frames=6, seed=1)
        out = codec.encode({"data": data}, tmp_path, "gop")
        # FrameSkip-selected overlapping parts were produced and merged
        parts = list(tmp_path.glob("gop.vtm-part-*.bin"))
        assert len(parts) == 3
        dec_out = codec.decode(out["bitstream"], tmp_path)
        got = np.asarray(dec_out["data"]["p2"])
        assert got.shape == (6, 16, 16, 24)
        # the merged stream must reconstruct every frame (no GOP boundary
        # duplication/loss), not just have the right shape
        step = 20.0 / 1023
        clipped = np.clip(np.asarray(data["p2"]), -10.0, 10.0)
        assert np.max(np.abs(got - clipped)) <= step + 1e-4

    def test_header_self_decodable(self, stub_codec, tmp_path):
        """A FRESH codec instance (no dataset) can decode the bitstream."""
        enc, dec, parcat = stub_codec
        c1 = VTM(encoder_path=enc, decoder_path=dec, parcat_path=parcat,
                 min_max_override=(-5.0, 5.0), parallel_encoding=False)
        out = c1.encode({"data": _features(2, seed=2)}, tmp_path, "h")
        c2 = VTM(encoder_path=enc, decoder_path=dec, parcat_path=parcat)
        dec_out = c2.decode(out["bitstream"], tmp_path)
        assert set(dec_out["data"].keys()) == {"p2", "p3"}


class TestCmdlineFidelity:
    """Generated cmdlines vs the reference's exact argument sequences."""

    def _ref_vtm_base(self, yuv, w, h, n_frames, qp, fr, ip, cfg=None,
                      hm=False, chroma="400", bitdepth=10, hash_check=1):
        """Reference base_cmd (std_codecs.py:168-202 / HM :716-741),
        re-typed here as the recorded ground truth."""
        level = 5.1 if n_frames > 1 else 6.2
        drt = 1 if ip >= 1 else 0
        cmd = ["ENC", "-i", str(yuv)]
        if cfg:
            cmd += ["-c", str(cfg)]
        cmd += ["-q", str(qp), "-o", "/dev/null",
                "-wdt", str(w), "-hgt", str(h), "-fr", str(fr), "-ts", "1"]
        if not hm:
            cmd += ["-v", "6"]
        cmd += [
            f"--Level={level}",
            f"--IntraPeriod={ip}",
            f"--InputChromaFormat={chroma}",
            f"--InputBitDepth={bitdepth}",
            f"--InternalBitDepth={bitdepth}",
            "--ConformanceWindowMode=1",
        ]
        if not hm:
            cmd += ["-dph", str(hash_check)]
        cmd += [f"--DecodingRefreshType={drt}"]
        return cmd

    def test_vtm_single_video(self, tmp_path):
        codec = VTM(encoder_path="ENC", cfg_file="enc.cfg", qp=42,
                    intra_period=8, frame_rate=30, parallel_encoding=False)
        cmds = codec.get_encode_cmd(tmp_path / "in.yuv", tmp_path / "out.bin",
                                    352, 288, 16, 8)
        expected = self._ref_vtm_base(
            tmp_path / "in.yuv", 352, 288, 16, 42, 30, 8, cfg="enc.cfg"
        ) + [f"--BitstreamFile={tmp_path/'out.bin'}", "--FramesToBeEncoded=16"]
        assert cmds == [expected]

    def test_vtm_still_level_6_2(self, tmp_path):
        """Stills (1 frame) use Level 6.2 per the MPEG anchor rule."""
        codec = VTM(encoder_path="ENC", qp=37, intra_period=1)
        (cmd,) = codec.get_encode_cmd(tmp_path / "i.yuv", tmp_path / "o.bin",
                                      1280, 720, 1, 1)
        assert "--Level=6.2" in cmd
        assert "--DecodingRefreshType=1" in cmd
        assert "-ts" in cmd and cmd[cmd.index("-ts") + 1] == "1"
        assert "-v" in cmd and cmd[cmd.index("-v") + 1] == "6"
        assert "--ConformanceWindowMode=1" in cmd
        assert "-o" in cmd and cmd[cmd.index("-o") + 1] == "/dev/null"

    def test_vtm_gop_parallel_cmds(self, tmp_path):
        """Parallel parts: FrameSkip multiples of ip, ip+1 frames per part,
        -part-{e:03d} naming (ref :211-255)."""
        codec = VTM(encoder_path="ENC", qp=37, intra_period=8,
                    parallel_encoding=True)
        cmds = codec.get_encode_cmd(tmp_path / "i.yuv", tmp_path / "o.bin",
                                    352, 288, 20, 8)
        assert len(cmds) == 3
        skips = [next(a for a in c if a.startswith("--FrameSkip=")) for c in cmds]
        counts = [next(a for a in c if a.startswith("--FramesToBeEncoded=")) for c in cmds]
        names = [next(a for a in c if a.startswith("--BitstreamFile=")) for c in cmds]
        assert skips == ["--FrameSkip=0", "--FrameSkip=8", "--FrameSkip=16"]
        assert counts == [
            "--FramesToBeEncoded=9", "--FramesToBeEncoded=9", "--FramesToBeEncoded=4"
        ]
        assert [n.endswith(f"-part-{e:03d}.bin") for e, n in enumerate(names)] == [True] * 3

    def test_hm_flags(self, tmp_path):
        """HM = VTM minus -v/-dph (ref :697-741)."""
        codec = HM(encoder_path="ENC", cfg_file="hm.cfg", qp=32,
                   intra_period=4, frame_rate=25, parallel_encoding=False)
        (cmd,) = codec.get_encode_cmd(tmp_path / "i.yuv", tmp_path / "o.bin",
                                      176, 144, 10, 4)
        expected = self._ref_vtm_base(
            tmp_path / "i.yuv", 176, 144, 10, 32, 25, 4, cfg="hm.cfg", hm=True
        ) + [f"--BitstreamFile={tmp_path/'o.bin'}", "--FramesToBeEncoded=10"]
        assert cmd == expected
        assert "-v" not in cmd and "-dph" not in cmd

    def test_vvenc_flags(self, tmp_path):
        """vvencapp args exactly as ref :808-836."""
        codec = VVENC(encoder_path="VVENC", qp=30, frame_rate=50)
        (cmd,) = codec.get_encode_cmd(tmp_path / "i.yuv", tmp_path / "o.bin",
                                      1920, 1080, 65, 64)
        assert cmd == [
            "VVENC", "-i", str(tmp_path / "i.yuv"), "-q", "30",
            "--output", str(tmp_path / "o.bin"), "--size", "1920x1080",
            "--framerate", "50", "--frames", "65",
            "--format", "yuv420_10", "--preset", "fast",
        ]

    def test_x264_flags(self, tmp_path):
        """ffmpeg h264 CRF args per ref codecs/ffmpeg.py:114-147: yuv444p10le
        feature frames, -bf 0, -tune, -threads 4."""
        from lmsfc_tpu.codecs.ffmpeg import X264

        codec = X264(crf=28, preset="medium", tune="psnr", frame_rate=30)
        assert codec.feature_yuv_format == "yuv444_10le"
        (cmd,) = codec.get_encode_cmd(tmp_path / "i.yuv", tmp_path / "o.mp4",
                                      352, 288, 8, 8)
        s = " ".join(cmd)
        assert "-c:v h264" in s and "-crf 28" in s and "-bf 0" in s
        assert "-tune psnr" in s and "-threads 4" in s
        assert s.count("yuv444p10le") == 2  # input decl + output pix_fmt
        # stills use framerate 1 (ref :183)
        (cmd1,) = codec.get_encode_cmd(tmp_path / "i.yuv", tmp_path / "o.mp4",
                                       352, 288, 1, 1)
        assert "-framerate 1" in " ".join(cmd1)

    def test_x265_flags(self, tmp_path):
        """ref codecs/ffmpeg.py:330-363: hevc + bframes=0 + gray10le out."""
        from lmsfc_tpu.codecs.ffmpeg import X265

        codec = X265(crf=32, preset="medium", tune="psnr", frame_rate=25)
        (cmd,) = codec.get_encode_cmd(tmp_path / "i.yuv", tmp_path / "o.mp4",
                                      176, 144, 10, 10)
        s = " ".join(cmd)
        assert "-c:v hevc" in s and "-x265-params bframes=0" in s
        assert "-pix_fmt gray10le" in s  # output decl, as the ref writes it
        assert "-bf 0" not in s

    def test_decode_cmd(self, tmp_path):
        codec = VTM(decoder_path="DEC")
        cmd = codec.get_decode_cmd(tmp_path / "b.bin", tmp_path / "d.yuv")
        assert cmd == ["DEC", "-b", str(tmp_path / "b.bin"),
                       "-o", str(tmp_path / "d.yuv"), "-d", "10"]

    def test_hm_decode_cmd_inherits_vtm(self, tmp_path):
        """HM's TAppDecoder takes the same -b/-o/-d 10 argument surface."""
        codec = HM(decoder_path="HMDEC")
        cmd = codec.get_decode_cmd(tmp_path / "b.bin", tmp_path / "d.yuv")
        assert cmd == ["HMDEC", "-b", str(tmp_path / "b.bin"),
                       "-o", str(tmp_path / "d.yuv"), "-d", "10"]

    def test_vvdec_decode_cmd(self, tmp_path):
        """vvdecapp drops the -d bitdepth flag (ref std_codecs.py:797-837)."""
        codec = VVENC(decoder_path="VVDEC")
        cmd = codec.get_decode_cmd(tmp_path / "b.bin", tmp_path / "d.yuv")
        assert cmd == ["VVDEC", "-b", str(tmp_path / "b.bin"),
                       "-o", str(tmp_path / "d.yuv")]

    def test_parcat_cmd(self, tmp_path):
        """parcat merges GOP-parallel parts IN ORDER, output path last
        (ref std_codecs.py:204-274 merge step)."""
        codec = VTM(parcat_path="PARCAT")
        parts = [tmp_path / f"o-part-{e:03d}.bin" for e in range(3)]
        cmd = codec.get_parcat_cmd(parts, tmp_path / "o.bin")
        assert cmd == ["PARCAT", *[str(p) for p in parts],
                       str(tmp_path / "o.bin")]
