"""Build the dummy-TVD tracking dataset for the MOTA-vs-rate artifact.

VERDICT r3 item 3: tracking is the reference's second pillar (ref
pipelines/split_inference/video_split_inference.py:86-249, MOT evaluators
evaluators.py:324-505), but real TVD sequences and JDE torch weights are
not downloadable here. Same environment-honest protocol as dummy-OIV6
(scripts/make_dummy_oiv6.py): procedural motion video, SELF-LABELED by the
fixed-seed JDE running UNCOMPRESSED — its tracks become MOT gt. The bypass
run then reproduces the labels by construction, and each lmsfc rate point
measures how much tracking quality (MOTA/IDF1) survives feature
compression. Swapping in real TVD + pinned JDE weights is a pure data
substitution.

Two phases (the label pass should use the final SUPERVISED head —
scripts/train_jde_head_sup.py, trained on the generator's true boxes — so
run --frames-only first, train the head, then label; pass the SAME
--conf-thres the eval sweep will use so gt and eval see one detector):

  python scripts/make_dummy_tvd.py --out data/dummy_tvd --frames-only
  python scripts/train_jde_head_sup.py ...
  python scripts/make_dummy_tvd.py --out data/dummy_tvd \
      --head checkpoints/jde_head/head.npz --conf-thres 0.8
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent))
sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from make_motion_features import motion_clip  # scripts/ sibling


def write_seq(out: Path, name: str, frames, fps: int = 30) -> None:
    import cv2

    seq = out / name
    (seq / "img1").mkdir(parents=True, exist_ok=True)
    (seq / "gt").mkdir(parents=True, exist_ok=True)
    h, w = frames[0].shape[:2]
    for i, f in enumerate(frames, start=1):
        cv2.imwrite(str(seq / "img1" / f"{i:06d}.png"), f)
    (seq / "seqinfo.ini").write_text(
        f"[Sequence]\nname={name}\nimDir=img1\nframeRate={fps}\n"
        f"seqLength={len(frames)}\nimWidth={w}\nimHeight={h}\nimExt=.png\n"
    )


def self_label(seq_dir: Path, head: str | None, hw, conf_thres: float = 0.5) -> int:
    """Run the JDE tracker on the uncompressed frames; tracks -> gt.txt."""
    import cv2

    from lmsfc_tpu.datasets.image import letterbox
    from lmsfc_tpu.models.wrappers.jde import JDE1088x608

    wrapper = JDE1088x608(splits=(36, 61, 74), weights=head, conf_thres=conf_thres)
    wrapper.reset()
    rows = []
    files = sorted((seq_dir / "img1").glob("*.png"))
    for idx, path in enumerate(files):
        img0 = cv2.imread(str(path))
        img, ratio, (padw, padh) = letterbox(img0, hw[0], hw[1])
        rgb = cv2.cvtColor(img, cv2.COLOR_BGR2RGB).astype(np.float32) / 255.0
        sample = {
            "image": np.transpose(rgb, (2, 0, 1)),
            "frame_id": idx + 1,
            "ratio": ratio,
            "pad": (padw, padh),
            "org_input_size": {"height": img0.shape[0], "width": img0.shape[1]},
        }
        tracks = wrapper.forward([sample])[0]
        for t in tracks:
            x, y, w, h = t["tlwh"]
            rows.append(
                f"{idx + 1},{t['track_id']},{x:.2f},{y:.2f},{w:.2f},{h:.2f},1,1,1"
            )
        print(f"{path.name}: {len(tracks)} tracks", flush=True)
    # frames may predate write_seq's gt/ mkdir (r4 chain stage 6 crashed here)
    (seq_dir / "gt").mkdir(parents=True, exist_ok=True)
    (seq_dir / "gt" / "gt.txt").write_text("\n".join(rows) + "\n")
    return len(rows)


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--out", default="data/dummy_tvd")
    ap.add_argument("--seqs", type=int, default=2)
    ap.add_argument("--frames", type=int, default=24)
    ap.add_argument("--hw", type=int, nargs=2, default=(320, 576),
                    help="frame size = network letterbox size (ratio 1, "
                         "pad 0 -> coordinates map 1:1)")
    ap.add_argument("--seed", type=int, default=20240817)
    ap.add_argument("--frames-only", action="store_true",
                    help="write frames + seqinfo, skip labeling")
    ap.add_argument("--conf-thres", type=float, default=0.5,
                help="detection threshold for the label pass (must match "
                     "the eval sweep's vision_model conf_thres)")
    ap.add_argument("--head", default=None,
                    help="distilled head .npz for the labeling pass")
    ap.add_argument("--device", default="cpu", choices=["cpu", "tpu"])
    args = ap.parse_args()

    if args.device == "cpu":
        import jax

        jax.config.update("jax_platforms", "cpu")

    out = Path(args.out)
    rng = np.random.default_rng(args.seed)
    h, w = args.hw
    for s in range(args.seqs):
        name = f"DTVD-{s + 1:02d}"
        if not (out / name / "seqinfo.ini").exists():
            frames = motion_clip(rng, args.frames, h, w)
            write_seq(out, name, frames)
            print(f"{name}: wrote {len(frames)} frames at {h}x{w}", flush=True)
        if not args.frames_only:
            n = self_label(out / name, args.head, (h, w), args.conf_thres)
            print(f"{name}: {n} gt rows", flush=True)


if __name__ == "__main__":
    main()
