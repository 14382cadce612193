"""RD training CLI: multi-rate-point L-MSFC-V2 training on a dp mesh.

The reference fork's (absent) training loop, TPU-native (SURVEY.md §2.9,
§7 phase 4): lambda*MSE+bpp per rate point, Adam + aux Adam, orbax
checkpoints per rate point, data-parallel mesh over all local devices.

CLI:
  python -m lmsfc_tpu.run.train --config cfgs/train_lmsfc.yaml \
      [training.steps=N training.lmbdas='[0.0125,0.025]' ...]
"""

from __future__ import annotations

import argparse
import json
import time
from pathlib import Path
from typing import List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..config import Config, load_config
from ..models import LMSFCv2
from ..parallel import make_mesh
from ..training import create_train_state, make_train_step
from ..training.checkpoint import CheckpointManager
from ..training.data import FeatureDumpSource, SyntheticSource

# FCM CTTC-style 4 rate points (lambda ascending = quality ascending)
DEFAULT_LMBDAS = (0.0125, 0.025, 0.05, 0.1)


def train_rate_point(
    conf: Config, lmbda: float, ckpt_dir: Path, mesh=None
) -> dict:
    t = conf.training
    channels = tuple(t.get("channels", (256, 256, 256, 256)))
    dtype = jnp.bfloat16 if t.get("dtype", "bfloat16") == "bfloat16" else jnp.float32
    temporal = bool(t.get("temporal", False))
    common = dict(
        out_channels=channels,
        num_filters=t.get("num_filters", 192),
        latent_filters=t.get("latent_filters", 192),
        hyper_filters=t.get("hyper_filters", 128),
        dtype=dtype,
    )
    if temporal:
        from ..models.lmsfc_temporal import LMSFCv2Temporal

        model = LMSFCv2Temporal(
            intra_period=t.get("intra_period", 8),
            latent_stride_div=t.get("latent_stride_div", 2), **common
        )
    else:
        model = LMSFCv2(
            remat=t.get("remat", False),
            num_rates=t.get("num_rates", 0),
            num_slices=t.get("num_slices", 0),
            lrp=t.get("lrp", False),
            latent_stride_div=t.get("latent_stride_div", 2),
            **common,
        )
    batch = t.get("batch", 8)
    base_hw = tuple(t.get("base_hw", (64, 64)))

    dump_dir = t.get("feature_dump_dir")
    if temporal:
        if dump_dir:
            from ..training.data import FeatureClipDumpSource

            source = FeatureClipDumpSource(
                Path(dump_dir), clip_len=t.get("clip_len", batch),
                base_hw=base_hw, seed=t.get("seed", 0),
                preload=bool(t.get("preload", False)),
            )
        else:
            from ..training.data import SyntheticClipSource

            source = SyntheticClipSource(
                clip_len=t.get("clip_len", batch), base_hw=base_hw,
                channels=channels, seed=t.get("seed", 0),
            )
    elif dump_dir:
        source = FeatureDumpSource(
            Path(dump_dir), batch, base_hw, seed=t.get("seed", 0),
            preload=bool(t.get("preload", False)),
        )
    else:
        source = SyntheticSource(batch, base_hw, channels, seed=t.get("seed", 0))
    # device-resident data: stage ALL dumps in HBM once and crop on device
    # inside the jitted step (relay-attached TPUs choke on per-step host
    # transfers; see training/data.device_crop_sampler)
    device_data = (
        bool(t.get("device_data", True))
        and mesh is None
        and dump_dir
        and jax.default_backend() != "cpu"
    )
    sampler = None
    levels_full = None
    if device_data:
        from ..training.data import device_clip_sampler, device_crop_sampler

        cache = source._cache
        if cache is None:
            cache = [source._sample(i) for i in range(len(source.files))]
        keys = list(cache[0].keys())
        levels_full = [
            jax.device_put(
                np.concatenate([np.transpose(c[k], (0, 2, 3, 1)) for c in cache])
            )
            for k in keys
        ]
        clip_t = cache[0][keys[0]].shape[0]  # frames per dump (1 for stills)
        del cache
        print(
            f"device data: {len(source.files)} dumps staged in HBM "
            f"({sum(l.nbytes for l in levels_full)/1e9:.2f} GB)"
        )
        if temporal:
            sampler = device_clip_sampler(base_hw, t.get("clip_len", batch), clip_t)
        else:
            sampler = device_crop_sampler(base_hw, batch)
    data_iter = iter(source)

    if device_data:
        h, w = base_hw
        example = []
        for lvl in levels_full:
            example.append(jnp.zeros((1, h, w, lvl.shape[-1]), jnp.float32))
            h, w = -(-h // 2), -(-w // 2)
    else:
        example = [jnp.asarray(f[:1]) for f in next(data_iter)]
    state = create_train_state(
        model, example,
        learning_rate=t.get("learning_rate", 1e-4),
        aux_learning_rate=t.get("aux_learning_rate", 1e-3),
        seed=t.get("seed", 0),
        freeze=tuple(t.get("freeze", ())),
    )
    mgr = CheckpointManager(ckpt_dir, max_to_keep=t.get("max_to_keep", 3))
    start_step = 0
    try:
        restored = mgr.restore(
            template={"params": state.params, "opt_state": state.opt_state}
        )
    except Exception:
        # params-only checkpoint (scripts/params_store.py import): resume the
        # weights and restart the optimizer moments rather than crashing
        restored = mgr.restore(template={"params": state.params})
        if restored is not None:
            restored = {"params": restored["params"], "opt_state": state.opt_state}
            print("params-only checkpoint: optimizer state restarted")
    if restored is not None:
        from ..utils.tree import device_pin

        # pin the restored host tree once: numpy leaves re-upload every step
        state = state.replace(
            params=device_pin(restored["params"]),
            opt_state=device_pin(restored["opt_state"]),
            step=jnp.asarray(mgr.latest_step, jnp.int32),
        )
        start_step = int(mgr.latest_step)
        print(f"resumed from step {start_step}")
    elif t.get("init_base_from", ""):
        # graft a trained intra model into the temporal model's frozen base
        # (training.freeze=[base]): the temporal codec then starts EXACTLY
        # at the intra R-D point (zero-init predictor) and training can
        # only sharpen the conditional entropy params — the fix for the
        # r4 temporal regression, where jointly-trained transforms capped
        # recon quality ~1 dB under the intra singles (RD_r04_temporal.json)
        donor_dir = Path(t["init_base_from"])
        donor = CheckpointManager(donor_dir).restore()
        assert donor is not None, f"no donor checkpoint under {donor_dir}"
        donor_params = donor["params"]
        tgt = dict(state.params)
        assert "base" in tgt, "init_base_from needs a temporal model (base/)"
        jax.tree_util.tree_map(
            lambda a, b: None
            if a.shape == b.shape
            else (_ for _ in ()).throw(
                ValueError(f"donor/base shape mismatch: {a.shape} vs {b.shape}")
            ),
            tgt["base"], donor_params,
        )
        tgt["base"] = jax.tree_util.tree_map(jnp.asarray, donor_params)
        state = state.replace(params=type(state.params)(tgt))
        print(f"base grafted from {donor_dir} (frozen={t.get('freeze', ())})")

    lmbdas_joint = t.get("lmbdas") if t.get("num_rates", 0) else None
    step_fn = make_train_step(
        model, lmbda=lmbda, mesh=None if temporal else mesh,
        lmbdas=list(lmbdas_joint) if lmbdas_joint else None,
        device_sampler=sampler,
    )
    steps = t.get("steps", 100)
    log_every = t.get("log_every", 50)
    ckpt_every = t.get("ckpt_every", 500)
    key = jax.random.key(t.get("seed", 0) + 17)

    metrics = {}
    t0 = time.perf_counter()
    # loss/bpp trajectory as a committable artifact (one JSON line per log)
    traj_path = ckpt_dir / "trajectory.jsonl"
    traj_fd = open(traj_path, "a")
    for step_i in range(start_step, steps):
        if device_data:
            feats = levels_full  # already in HBM; step crops on device
        else:
            feats = [jnp.asarray(f) for f in next(data_iter)]
        key, sub = jax.random.split(key)
        state, metrics = step_fn(state, feats, sub)
        if (step_i + 1) % log_every == 0 or step_i + 1 == steps:
            m = {k: float(v) for k, v in metrics.items()}
            rate = (step_i + 1 - start_step) * batch / (time.perf_counter() - t0)
            print(
                f"[lmbda={lmbda}] step {step_i+1}/{steps} "
                f"loss={m['loss']:.4f} mse={m['mse']:.4f} bpp={m['bpp']:.4f} "
                f"aux={m['aux']:.1f} ({rate:.1f} feat/s)",
                flush=True,
            )
            traj_fd.write(json.dumps({"step": step_i + 1, "feat_per_s": rate, **m}) + "\n")
            traj_fd.flush()
        if (step_i + 1) % ckpt_every == 0 or step_i + 1 == steps:
            mgr.save(step_i + 1, jax.device_get(state.params), jax.device_get(state.opt_state))
    traj_fd.close()
    return {k: float(v) for k, v in metrics.items()}


def main(argv: Optional[List[str]] = None) -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--config", default=None)
    ap.add_argument("overrides", nargs="*")
    args = ap.parse_args(argv)
    conf = load_config(
        args.config, args.overrides,
        defaults={"training": {"ckpt_root": "./checkpoints"}},
    )
    t = conf.training
    # training.device=cpu pins the platform (the axon sitecustomize
    # force-registers the remote TPU backend and overrides the
    # JAX_PLATFORMS env var — only the programmatic config wins; same
    # escape hatch as eval's misc.device, run/eval_split_inference.py)
    device = t.get("device", "")
    if device:
        jax.config.update("jax_platforms", device)
    lmbdas = list(t.get("lmbdas", DEFAULT_LMBDAS))
    n_dev = jax.device_count()
    batch = t.get("batch", 8)
    use_mesh = n_dev > 1 and batch % n_dev == 0
    mesh = make_mesh(dp=n_dev) if use_mesh else None
    if n_dev > 1 and not use_mesh:
        print(f"batch {batch} not divisible by {n_dev} devices; single-device run")
    print(f"devices: {n_dev} ({jax.default_backend()}), rate points: {lmbdas}")

    results = {}
    root = Path(t.get("ckpt_root", "./checkpoints"))
    if t.get("num_rates", 0):
        # gain-unit mode: ONE joint training run covers every rate point
        results["joint"] = train_rate_point(conf, lmbdas[0], root / "joint", mesh)
        lmbdas = []
    for i, lmbda in enumerate(lmbdas):
        ckpt_dir = root / f"q{i+1}_lmbda{lmbda}"
        results[str(lmbda)] = train_rate_point(conf, lmbda, ckpt_dir, mesh)
    (root / "train_results.json").write_text(json.dumps(results, indent=2))
    print(json.dumps(results, indent=2))


if __name__ == "__main__":
    main()
