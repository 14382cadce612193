"""Anchor-codec plumbing test with a stub 'identity' encoder/decoder.

No VTM/HM binaries exist in the image; a stub script standing in for
EncoderApp/DecoderApp lets the whole pack -> 10-bit quantize -> YUV ->
subprocess -> GOP-parallel merge -> header -> decode -> un-tile path run for
real (the reference's own tests also rely on fake backends, SURVEY.md §4).
"""

import os
import stat
import textwrap

import jax.numpy as jnp
import numpy as np
import pytest

from lmsfc_tpu.codecs.std_codecs import VTM


@pytest.fixture()
def stub_codec(tmp_path):
    """Identity codec: encoder copies YUV to .bin, decoder copies back."""
    enc = tmp_path / "stub_enc.py"
    enc.write_text(textwrap.dedent("""\
        #!/usr/bin/env python3
        import sys
        args = dict()
        argv = sys.argv[1:]
        i = 0
        while i < len(argv):
            if argv[i] in ("-i","-b","-o"):
                args[argv[i]] = argv[i+1]; i += 2
            else:
                i += 1
        src = args.get("-i") or args.get("-b")
        dst = args.get("-b") if "-i" in args else args.get("-o")
        with open(src,"rb") as f, open(dst,"wb") as g:
            g.write(f.read())
    """))
    enc.chmod(enc.stat().st_mode | stat.S_IEXEC)

    parcat = tmp_path / "stub_parcat.py"
    parcat.write_text(textwrap.dedent("""\
        #!/usr/bin/env python3
        import sys
        out = sys.argv[-1]
        with open(out,"wb") as g:
            for p in sys.argv[1:-1]:
                with open(p,"rb") as f:
                    g.write(f.read())
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

    def test_gop_parallel_merge(self, stub_codec, tmp_path):
        enc, dec, parcat = stub_codec
        codec = VTM(
            encoder_path=enc, decoder_path=dec, parcat_path=parcat,
            qp=37, intra_period=2, parallel_encoding=True,
            min_max_override=(-10.0, 10.0),
        )
        data = _features(n_frames=6, seed=1)
        out = codec.encode({"data": data}, tmp_path, "gop")
        # chunks were produced and merged
        chunks = list(tmp_path.glob("gop_chunk*.bin"))
        assert len(chunks) == 3
        dec_out = codec.decode(out["bitstream"], tmp_path)
        assert dec_out["data"]["p2"].shape == (6, 16, 16, 24)

    def test_header_self_decodable(self, stub_codec, tmp_path):
        """A FRESH codec instance (no dataset) can decode the bitstream."""
        enc, dec, parcat = stub_codec
        c1 = VTM(encoder_path=enc, decoder_path=dec, parcat_path=parcat,
                 min_max_override=(-5.0, 5.0), parallel_encoding=False)
        out = c1.encode({"data": _features(2, seed=2)}, tmp_path, "h")
        c2 = VTM(encoder_path=enc, decoder_path=dec, parcat_path=parcat)
        dec_out = c2.decode(out["bitstream"], tmp_path)
        assert set(dec_out["data"].keys()) == {"p2", "p3"}
