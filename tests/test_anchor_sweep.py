"""Anchor sweep scripts + CTTC output, end-to-end in CI (VERDICT r1 #10):
runs the REAL eval_on_sfu_hw_obj_vtm.sh over a tiny synthetic sequence with
stub VTM binaries across a 2-qp grid, then checks the CTTC csv and pushes
test-vs-anchor curves through the MPEG template reporter."""

import csv
import json
import os
import stat
import subprocess
import textwrap
from pathlib import Path

import numpy as np
import pytest

pytestmark = pytest.mark.slow

REPO = Path(__file__).resolve().parents[1]
SEQ = "BasketballPass_416x240_50_val"  # canonical name keyed in the script


@pytest.fixture(scope="module")
def tiny_sfu_tree(tmp_path_factory):
    import cv2

    root = tmp_path_factory.mktemp("sfu")
    seq_dir = root / SEQ
    (seq_dir / "images").mkdir(parents=True)
    (seq_dir / "annotations").mkdir()
    rng = np.random.default_rng(0)
    images, anns = [], []
    for i in range(3):
        img = rng.integers(0, 255, (64, 96, 3)).astype(np.uint8)
        cv2.imwrite(str(seq_dir / "images" / f"f{i}.png"), img)
        images.append({"id": i, "file_name": f"f{i}.png", "height": 64, "width": 96})
        anns.append({"id": i, "image_id": i, "category_id": 1,
                     "bbox": [10, 10, 30, 20], "area": 600, "iscrowd": 0})
    with open(seq_dir / "annotations" / f"{SEQ}.json", "w") as f:
        json.dump({"images": images, "annotations": anns,
                   "categories": [{"id": 1, "name": "thing"}]}, f)
    return root


@pytest.fixture(scope="module")
def stub_bins(tmp_path_factory):
    d = tmp_path_factory.mktemp("bins")
    enc = d / "stub_enc.py"
    enc.write_text(textwrap.dedent("""\
        #!/usr/bin/env python3
        import struct, sys
        argv = sys.argv[1:]; opts, kv = {}, {}
        i = 0
        while i < len(argv):
            a = argv[i]
            if a.startswith("--") and "=" in a:
                k, v = a[2:].split("=", 1); kv[k] = v; i += 1
            elif a.startswith("-") and i + 1 < len(argv):
                opts[a] = argv[i+1]; i += 2
            else: i += 1
        if "-b" in opts and "-o" in opts and "-i" not in opts:
            with open(opts["-b"], "rb") as f: f.read(8); payload = f.read()
            with open(opts["-o"], "wb") as g: g.write(payload)
            sys.exit(0)
        w, h = int(opts["-wdt"]), int(opts["-hgt"])
        fb = w * h * 2
        if kv.get("InputChromaFormat") == "420": fb = fb * 3 // 2
        skip, count = int(kv.get("FrameSkip", 0)), int(kv["FramesToBeEncoded"])
        with open(opts["-i"], "rb") as f:
            f.seek(skip * fb); payload = f.read(count * fb)
        with open(kv["BitstreamFile"], "wb") as g:
            g.write(struct.pack(">II", skip, count)); g.write(payload)
    """))
    parcat = d / "stub_parcat.py"
    parcat.write_text(textwrap.dedent("""\
        #!/usr/bin/env python3
        import struct, sys
        out = sys.argv[-1]; parts = []
        for p in sys.argv[1:-1]:
            with open(p, "rb") as f:
                s, c = struct.unpack(">II", f.read(8)); parts.append((s, c, f.read()))
        fb = max(len(d) // c for _, c, d in parts)
        total = max(s + c for s, c, _ in parts)
        buf = bytearray(total * fb)
        for s, c, d in parts: buf[s*fb : s*fb + len(d)] = d
        with open(out, "wb") as g:
            g.write(struct.pack(">II", 0, total)); g.write(bytes(buf))
    """))
    for p in (enc, parcat):
        p.chmod(p.stat().st_mode | stat.S_IEXEC)
    return str(enc), str(parcat)


def test_sfu_vtm_sweep_to_cttc(tiny_sfu_tree, stub_bins, tmp_path):
    enc, parcat = stub_bins
    out_root = tmp_path / "sweep"
    env = {
        **os.environ,
        "JAX_PLATFORMS": "cpu",
        "DATA_ROOT": str(tiny_sfu_tree),
        "OUT_ROOT": str(out_root),
        "QPS": "37 42",
        "SEQ_FILTER": "BasketballPass",
        "ARCH": "faster_rcnn_R_50_FPN_3x",
        "ENCODER_EXE": enc,
        "DECODER_EXE": enc,
        "PARCAT_EXE": parcat,
        "EXTRA_PARAMS": (
            # misc.device=cpu is LOAD-BEARING: without it the subprocesses
            # inherit the example config's device=tpu and silently run on
            # the axon relay (slow, and hangs the suite if the relay is
            # wedged) — the stub-codec CI sweep must be hermetic
            "misc.device=cpu "
            "vision_model.faster_rcnn_R_50_FPN_3x.resize_input=false "
            "codec.settings.min_max_override=[-40.0,40.0]"
        ),
    }
    proc = subprocess.run(
        ["bash", str(REPO / "scripts/evaluation/eval_on_sfu_hw_obj_vtm.sh")],
        env=env, cwd=REPO, capture_output=True, text=True, timeout=1500,
    )
    assert proc.returncode == 0, proc.stdout[-2000:] + proc.stderr[-3000:]

    cttc = out_root / "cttc.csv"
    assert cttc.exists()
    rows = list(csv.DictReader(open(cttc)))
    assert len(rows) == 2  # one per qp
    assert all(r["Sequence"] == SEQ for r in rows)
    assert {r["QP"] for r in rows} == {"37", "42"}
    assert all(float(r["Bitrate [kbps]"]) > 0 for r in rows)

    # MPEG template report: test curve vs (synthesized) anchor curve
    anchor = tmp_path / "anchor_cttc.csv"
    with open(anchor, "w", newline="") as f:
        w = csv.DictWriter(f, fieldnames=["Sequence", "QP", "Bitrate [kbps]",
                                          "End-to-end accuracy"])
        w.writeheader()
        for qp, rate, acc in ((37, 900.0, 0.41), (42, 500.0, 0.38)):
            w.writerow({"Sequence": SEQ, "QP": qp, "Bitrate [kbps]": rate,
                        "End-to-end accuracy": acc})
    # give the test curve two distinct accuracy points so BD-rate is defined
    test_csv = tmp_path / "test_cttc.csv"
    with open(test_csv, "w", newline="") as f:
        w = csv.DictWriter(f, fieldnames=["Sequence", "QP", "Bitrate [kbps]",
                                          "End-to-end accuracy"])
        w.writeheader()
        for i, r in enumerate(sorted(rows, key=lambda r: r["QP"])):
            w.writerow({"Sequence": SEQ, "QP": r["QP"],
                        "Bitrate [kbps]": r["Bitrate [kbps]"],
                        "End-to-end accuracy": 0.40 + 0.02 * i})

    from lmsfc_tpu.tools.mpeg_template import build_report

    report = build_report(test_csv, anchor, tmp_path / "report.csv")
    assert (tmp_path / "report.csv").exists()
    assert any(np.isfinite(v) for v in report.get("overall", {}).values()) or report
