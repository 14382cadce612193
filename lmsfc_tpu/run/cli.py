"""`lmsfc-vision` multi-command CLI — the legacy VCM app surface.

Slim, dependency-free equivalent of the reference's argparse multi-command
app (compressai_vision/run/vcm_app_cli/main.py:60-82 and its 22 subcommand
modules): dataset management maps onto the file-based catalogs (no
FiftyOne/MongoDB), evaluation onto the pipeline runner, plotting onto
tools/plot. Commands:

  info            environment + registry summary           (ref info.py)
  list-plugins    registered pipelines/codecs/models/...   (ref registers)
  dummy           fabricate a tiny COCO dataset on disk    (ref dummy.py)
  eval            split-/remote-inference run from a yaml  (ref detectron2_eval.py)
  train           RD training                              (fork delta)
  plot            R-D curves                                (ref plotter.py)
  bdrate          Bjontegaard delta vs an anchor csv
  aggregate       overall mAP / MOTA / CTTC csv            (repo-root utils)
  clean           remove run artifacts                      (ref clean.py)
  import-custom   validate+register an image-folder dataset (ref import_custom.py)
  register        register without validation               (ref register.py)
  deregister      remove a registry entry                   (ref deregister)
  list-datasets   show the registry                         (ref list.py)
  show            one dataset's details + sample files      (ref show.py)
  copy-dataset    duplicate a registry entry                (ref copy.py)
  convert-mpeg-to-oiv6  MPEG-VCM csvs -> COCO/OIV6 json     (ref convert_mpeg_to_oiv6.py)
  download        documented stub: registers already-local files (no egress)
  metrics-eval    PSNR + MS-SSIM over paired image dirs     (ref metrics_eval.py)
  make-thumbnails resize images into a thumbnail folder     (ref make_thumbnails.py)
  load-eval       re-evaluate from stashed evaluator state  (ref load_eval.py)
  auto            register a local dataset dir + evaluate   (ref auto.py)
  gen-bitstreams  encode_only bitstream generation          (ref vtm.py)

(The reference's killmongo.py has no equivalent by design: there is no
database daemon to kill — the registry is a flat JSON file. tools.py's
dataset-path helpers fold into the registry module.)

The registry is a JSON file (datasets/registry.py) — the FiftyOne/MongoDB
daemon of the reference replaced by a daemon-free artifact.
"""

from __future__ import annotations

import argparse
import json
import shutil
import sys
from pathlib import Path


def cmd_info(args) -> None:
    from .. import __version__, plugins  # noqa: F401
    from ..config.provenance import get_env

    print(f"lmsfc_tpu {__version__}")
    print(json.dumps(get_env(), indent=2))


def cmd_list_plugins(args) -> None:
    from .. import plugins  # noqa: F401
    from ..registry import CODECS, DATACATALOGS, DATASETS, EVALUATORS, PIPELINES, VISIONMODELS

    for name, table in (
        ("pipelines", PIPELINES), ("codecs", CODECS), ("vision models", VISIONMODELS),
        ("datasets", DATASETS), ("datacatalogs", DATACATALOGS), ("evaluators", EVALUATORS),
    ):
        print(f"{name}: {sorted(table)}")


def cmd_dummy(args) -> None:
    """Create a 1-image dummy dataset (ref vcm_app_cli/dummy.py)."""
    import cv2
    import numpy as np

    root = Path(args.dir)
    (root / "images").mkdir(parents=True, exist_ok=True)
    rng = np.random.default_rng(0)
    img = rng.integers(0, 255, (args.height, args.width, 3)).astype(np.uint8)
    cv2.imwrite(str(root / "images" / "dummy_0.png"), img)
    coco = {
        "images": [{"id": 0, "file_name": "dummy_0.png",
                    "height": args.height, "width": args.width}],
        "annotations": [{"id": 0, "image_id": 0, "category_id": 1,
                         "bbox": [10, 10, 40, 30], "area": 1200, "iscrowd": 0}],
        "categories": [{"id": 1, "name": "dummy"}],
    }
    (root / "ann.json").write_text(json.dumps(coco))
    print(f"dummy dataset at {root}")


def cmd_eval(args) -> None:
    from .eval_split_inference import main as eval_main

    eval_main(["--config", args.config, *args.overrides])


# ------------------------------------------------------ dataset management
def cmd_import_custom(args) -> None:
    from ..datasets import registry

    entry = registry.register(
        args.name, args.root, imgs_folder=args.imgs_folder,
        annotation_file=args.annotation_file, dataset_type=args.type,
        datacatalog=args.datacatalog, overwrite=args.overwrite,
    )
    print(f"registered {args.name!r}: {json.dumps(entry, indent=2)}")


def cmd_register(args) -> None:
    # same as import-custom; kept as a distinct verb for reference parity
    cmd_import_custom(args)


def cmd_deregister(args) -> None:
    from ..datasets import registry

    registry.deregister(args.name)
    print(f"deregistered {args.name!r}")


def cmd_list_datasets(args) -> None:
    from ..datasets import registry

    reg = registry.list_datasets()
    if not reg:
        print(f"registry empty ({registry.registry_path()})")
        return
    for name, e in sorted(reg.items()):
        print(f"{name}: {e['n_images']} imgs, {e['type']}/{e['datacatalog']}, "
              f"root={e['root']}")


def cmd_show(args) -> None:
    from ..datasets import registry

    entry = registry.get(args.name)
    print(json.dumps(entry, indent=2))
    img_dir = Path(entry["root"]) / entry["imgs_folder"]
    for i, p in enumerate(sorted(img_dir.iterdir())):
        if i >= args.n:
            print("...")
            break
        print(" ", p.name)


def cmd_copy_dataset(args) -> None:
    from ..datasets import registry

    registry.copy(args.src, args.dst)
    print(f"copied {args.src!r} -> {args.dst!r}")


def cmd_convert_mpeg_to_oiv6(args) -> None:
    from ..datasets.registry import convert_mpeg_to_oiv6_json

    stats = convert_mpeg_to_oiv6_json(
        Path(args.bbox_csv), Path(args.labels_csv), Path(args.out),
        Path(args.img_dir) if args.img_dir else None,
    )
    print(json.dumps(stats))


def cmd_convert_sfu_hw(args) -> None:
    from ..datasets.conversion import convert_sfu_hw_objects

    stats = convert_sfu_hw_objects(
        Path(args.basedir), extract_frames=args.extract_frames
    )
    print(json.dumps(stats, indent=2))


def cmd_convert_tvd_tracking(args) -> None:
    from ..datasets.conversion import convert_tvd_tracking

    stats = convert_tvd_tracking(
        Path(args.dirname), extract_frames=args.extract_frames,
        frame_rate=args.frame_rate,
    )
    print(json.dumps(stats, indent=2))


def cmd_download(args) -> None:
    """No-egress environment: document the source and register local files
    (the reference's download.py pulls from OpenImages/MPEG hosts)."""
    print(
        "This environment has no network egress. Obtain the dataset with the\n"
        "reference installer (compressai-vision scripts/install.sh) or from\n"
        "the MPEG content repository, place it locally, then run:\n"
        f"  lmsfc-vision import-custom {args.name} --root /path/to/data"
    )
    if args.root and Path(args.root).exists():
        cmd_import_custom(args)


def cmd_train(args) -> None:
    from .train import main as train_main

    train_main((["--config", args.config] if args.config else []) + args.overrides)


def cmd_plot(args) -> None:
    from ..tools.plot import main as plot_main

    sys.argv = ["plot", args.out, *args.curves]
    plot_main()


def cmd_bdrate(args) -> None:
    from ..tools.bdrate import main as bd_main

    sys.argv = ["bdrate", args.anchor, args.test]
    bd_main()


def cmd_aggregate(args) -> None:
    from ..tools.aggregate import main as agg_main

    sys.argv = ["aggregate", args.mode, args.out, *args.files]
    agg_main()


def cmd_clean(args) -> None:
    for d in args.dirs:
        p = Path(d)
        if p.exists():
            shutil.rmtree(p)
            print(f"removed {p}")


def cmd_metrics_eval(args) -> None:
    """PSNR + MS-SSIM between paired images (ref metrics_eval.py: remote-
    inference quality readout). Pairs ref/test by filename STEM (sorted
    position would silently mispair when names differ — ADVICE r2 #3);
    bpp from an optional bitstream dir, restricted to matched stems when
    any bitstream matches one, else the whole dir."""
    import cv2
    import numpy as np

    from ..ops.metrics import ms_ssim, psnr

    ref_dir, test_dir = Path(args.ref_dir), Path(args.test_dir)
    exts = {".png", ".jpg", ".jpeg", ".bmp"}
    refs = {p.stem: p for p in ref_dir.iterdir() if p.suffix.lower() in exts}
    tests = {p.stem: p for p in test_dir.iterdir() if p.suffix.lower() in exts}
    if not refs:
        raise SystemExit(f"no images in {ref_dir}")
    stems = sorted(refs.keys() & tests.keys())
    unmatched = sorted((refs.keys() | tests.keys()) - set(stems))
    if not stems:
        raise SystemExit(
            f"no filename stems in common between {ref_dir} and {test_dir}"
        )
    if unmatched:
        print(f"warning: {len(unmatched)} unmatched stem(s) skipped: "
              f"{', '.join(unmatched[:5])}{'…' if len(unmatched) > 5 else ''}",
              file=sys.stderr)
    rows, npix = [], 0
    for rp, tp in ((refs[s], tests[s]) for s in stems):
        a, b = cv2.imread(str(rp)), cv2.imread(str(tp))
        if a is None or b is None:
            raise ValueError(f"unreadable image: {rp if a is None else tp}")
        a, b = a.astype(np.float64), b.astype(np.float64)
        assert a.shape == b.shape, (rp.name, a.shape, b.shape)
        npix += a.shape[0] * a.shape[1]
        rows.append((rp.name, psnr(a, b), ms_ssim(a, b)))
    out = {
        "psnr": sum(r[1] for r in rows) / len(rows),
        "ms_ssim": sum(r[2] for r in rows) / len(rows),
        "n_images": len(rows),
    }
    if args.bitstream_dir:
        bits = [p for p in Path(args.bitstream_dir).iterdir() if p.is_file()]
        # per-image bitstreams are matched by image-stem PREFIX (covers both
        # `<stem>.bin` and suffixed names like `<stem>_bitstream.bin`, which
        # the old exact split('.')[0] match silently missed — ADVICE r3 #4);
        # longest stems first so `img_10...` never matches stem `img_1`
        stem_set = sorted(set(stems), key=len, reverse=True)
        matched = [
            p for p in bits
            if any(
                p.stem == s or p.stem.startswith(s + "_") or p.stem.startswith(s + ".")
                for s in stem_set
            )
        ]
        # otherwise (single sequence-level stream) keep the whole dir
        counted = matched if matched else bits
        out["bpp"] = sum(p.stat().st_size for p in counted) * 8 / npix
    if args.per_image:
        out["per_image"] = [
            {"name": n, "psnr": p_, "ms_ssim": m} for n, p_, m in rows
        ]
    print(json.dumps(out, indent=2))


def cmd_make_thumbnails(args) -> None:
    """Resize every image into a thumbnails folder (ref make_thumbnails.py)."""
    import cv2

    src, dst = Path(args.dir), Path(args.out or Path(args.dir) / "thumbnails")
    dst.mkdir(parents=True, exist_ok=True)
    n = 0
    written = set()
    for p in sorted(src.iterdir()):
        if p.suffix.lower() not in {".png", ".jpg", ".jpeg", ".bmp"}:
            continue
        img = cv2.imread(str(p))
        if img is None:
            print(f"skipping unreadable {p.name}")
            continue
        h, w = img.shape[:2]
        scale = args.max_size / max(h, w)
        if scale < 1.0:
            img = cv2.resize(img, (int(w * scale), int(h * scale)))
        out = dst / f"{p.stem}.jpg"
        if out in written:  # x.png + x.jpg must not clobber each other
            out = dst / f"{p.stem}{p.suffix.replace('.', '_')}.jpg"
        cv2.imwrite(str(out), img)
        written.add(out)
        n += 1
    print(f"{n} thumbnails in {dst}")


def cmd_load_eval(args) -> None:
    """Re-evaluate from stashed evaluator state without re-running the NN
    (ref load_eval.py re-evaluates saved detections). Thin wrapper over the
    aggregate machinery with a single (or many) state files."""
    from ..tools.aggregate import main as agg_main

    sys.argv = ["aggregate", args.mode, args.out, *args.files]
    agg_main()
    print(Path(args.out).read_text())


def cmd_auto(args) -> None:
    """One-shot: import/register a dataset directory then evaluate it
    (ref auto.py chains download/register/eval; no egress here, so the
    data must already be local)."""
    from ..datasets import registry

    if not args.root:
        raise SystemExit("auto: --root is required (local dataset directory)")
    registry.register(
        args.name, args.root, imgs_folder=args.imgs_folder,
        annotation_file=args.annotation_file, dataset_type=args.type,
        datacatalog=args.datacatalog, overwrite=True,
    )
    print(f"registered {args.name!r}")
    if args.config:
        from .eval_split_inference import main as eval_main

        eval_main(
            ["--config", args.config, f"dataset.config.root={args.root}",
             f"dataset.config.imgs_folder={args.imgs_folder}"]
            + ([f"dataset.config.annotation_file={args.annotation_file}"]
               if args.annotation_file else [])
            + args.overrides
        )


def cmd_gen_bitstreams(args) -> None:
    """Bitstream generation only (ref vtm.py): eval with encode_only."""
    from .eval_split_inference import main as eval_main

    eval_main(["--config", args.config, "pipeline.encode_only=true", *args.overrides])


def main(argv=None) -> None:
    ap = argparse.ArgumentParser(prog="lmsfc-vision", description=__doc__)
    sub = ap.add_subparsers(dest="command", required=True)

    sub.add_parser("info").set_defaults(fn=cmd_info)
    sub.add_parser("list-plugins").set_defaults(fn=cmd_list_plugins)

    p = sub.add_parser("dummy")
    p.add_argument("--dir", default="./dummy_dataset")
    p.add_argument("--width", type=int, default=96)
    p.add_argument("--height", type=int, default=64)
    p.set_defaults(fn=cmd_dummy)

    p = sub.add_parser("eval")
    p.add_argument("--config", required=True)
    p.add_argument("overrides", nargs="*")
    p.set_defaults(fn=cmd_eval)

    def _dataset_args(p):
        p.add_argument("name")
        p.add_argument("--root", required=False)
        p.add_argument("--imgs-folder", dest="imgs_folder", default="images")
        p.add_argument("--annotation-file", dest="annotation_file", default=None)
        p.add_argument("--type", default="Detectron2Dataset")
        p.add_argument("--datacatalog", default="COCO")
        p.add_argument("--overwrite", action="store_true")

    for verb, fn in (
        ("import-custom", cmd_import_custom),
        ("register", cmd_register),
        ("download", cmd_download),
    ):
        p = sub.add_parser(verb)
        _dataset_args(p)
        p.set_defaults(fn=fn)

    p = sub.add_parser("deregister")
    p.add_argument("name")
    p.set_defaults(fn=cmd_deregister)

    sub.add_parser("list-datasets").set_defaults(fn=cmd_list_datasets)

    p = sub.add_parser("show")
    p.add_argument("name")
    p.add_argument("-n", type=int, default=10)
    p.set_defaults(fn=cmd_show)

    p = sub.add_parser("copy-dataset")
    p.add_argument("src")
    p.add_argument("dst")
    p.set_defaults(fn=cmd_copy_dataset)

    p = sub.add_parser("convert-mpeg-to-oiv6")
    p.add_argument("bbox_csv")
    p.add_argument("labels_csv")
    p.add_argument("out")
    p.add_argument("--img-dir", dest="img_dir", default=None)
    p.set_defaults(fn=cmd_convert_mpeg_to_oiv6)

    p = sub.add_parser(
        "convert-sfu-hw",
        help="SFU-HW-Objects-v1 raw txt annotations -> per-seq COCO json",
    )
    p.add_argument("basedir")
    p.add_argument("--extract-frames", action="store_true")
    p.set_defaults(fn=cmd_convert_sfu_hw)

    p = sub.add_parser(
        "convert-tvd-tracking",
        help="raw TVD tracking csvs -> MOT gt/seqinfo layout",
    )
    p.add_argument("dirname")
    p.add_argument("--extract-frames", action="store_true")
    p.add_argument("--frame-rate", type=int, default=50)
    p.set_defaults(fn=cmd_convert_tvd_tracking)

    p = sub.add_parser("train")
    p.add_argument("--config", default=None)
    p.add_argument("overrides", nargs="*")
    p.set_defaults(fn=cmd_train)

    p = sub.add_parser("plot")
    p.add_argument("out")
    p.add_argument("curves", nargs="+", help="label=path.csv")
    p.set_defaults(fn=cmd_plot)

    p = sub.add_parser("bdrate")
    p.add_argument("anchor")
    p.add_argument("test")
    p.set_defaults(fn=cmd_bdrate)

    p = sub.add_parser("aggregate")
    p.add_argument("mode", choices=["map", "mot", "cttc"])
    p.add_argument("out")
    p.add_argument("files", nargs="+")
    p.set_defaults(fn=cmd_aggregate)

    p = sub.add_parser("clean")
    p.add_argument("dirs", nargs="+")
    p.set_defaults(fn=cmd_clean)

    p = sub.add_parser("metrics-eval")
    p.add_argument("ref_dir")
    p.add_argument("test_dir")
    p.add_argument("--bitstream-dir", dest="bitstream_dir", default=None)
    p.add_argument("--per-image", dest="per_image", action="store_true")
    p.set_defaults(fn=cmd_metrics_eval)

    p = sub.add_parser("make-thumbnails")
    p.add_argument("dir")
    p.add_argument("--out", default=None)
    p.add_argument("--max-size", dest="max_size", type=int, default=256)
    p.set_defaults(fn=cmd_make_thumbnails)

    p = sub.add_parser("load-eval")
    p.add_argument("mode", choices=["map", "mot", "cttc"])
    p.add_argument("out")
    p.add_argument("files", nargs="+")
    p.set_defaults(fn=cmd_load_eval)

    p = sub.add_parser("auto")
    _dataset_args(p)
    p.add_argument("--config", default=None)
    p.add_argument("overrides", nargs="*")
    p.set_defaults(fn=cmd_auto)

    p = sub.add_parser("gen-bitstreams")
    p.add_argument("--config", required=True)
    p.add_argument("overrides", nargs="*")
    p.set_defaults(fn=cmd_gen_bitstreams)

    args = ap.parse_args(argv)
    args.fn(args)


if __name__ == "__main__":
    main()
