"""lmsfc_tpu — TPU-native split-inference feature-compression framework.

A ground-up JAX/XLA/Pallas rebuild of the capabilities of the
herok97/L-MSFC-V2-Training stack (CompressAI-Vision + the L-MSFC-V2 learned
feature codec): vision models are split into NN-Part1 / NN-Part2, the
intermediate multi-scale features are compressed by pluggable codecs, and the
end-task accuracy (mAP / MOTA) is measured against bits spent.

Layer map (mirrors the reference's contract, re-architected for TPU):
  registry/   string-keyed plugin registries      (ref: compressai_vision/registry/registers.py:37-113)
  config/     YAML config tree + factories        (ref: compressai_vision/config/config.py:58-150)
  utils/      timing, struct/YUV IO, subprocess   (ref: compressai_vision/utils/)
  ops/        Pallas/XLA kernels (GDN, quant, tiling)
  entropy/    EntropyBottleneck / GaussianConditional (XLA) + CDF tables
  native/     C++ rANS range coder (ctypes)       (ref: CompressAI cpp_exts/rans)
  models/     Flax models: L-MSFC FENet/DRNet, ResNet-FPN R-CNN halves, Darknet/JDE
  codecs/     pluggable encode/decode: learned, bypass, VTM/HM/x26x anchors
  datasets/   data catalogs + COCO-json/tracking datasets
  evaluators/ COCO mAP, OpenImages challenge, CLEAR-MOT
  pipelines/  split-/remote-inference orchestration (ref: compressai_vision/pipelines/)
  training/   lambda*MSE+bpp RD training, sharded via pjit over a Mesh
  parallel/   mesh construction and sharding rules
  run/        CLI entry points
"""

__version__ = "0.1.0"


def _enable_compilation_cache() -> None:
    """Honor JAX_COMPILATION_CACHE_DIR (the installed jax build does not):
    a persistent XLA executable cache shared across processes. Cuts repeat
    compiles ~7x — the dominant cost of the CI suite and of sweep scripts
    that spawn one CLI process per QP."""
    import os

    cache_dir = os.environ.get("JAX_COMPILATION_CACHE_DIR")
    if not cache_dir:
        return
    import jax

    try:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    except Exception as e:  # older/newer jax without these knobs
        import warnings

        warnings.warn(
            f"JAX_COMPILATION_CACHE_DIR={cache_dir} requested but the "
            f"compilation cache could not be enabled: {e!r}"
        )


def _honor_jax_platforms_env() -> None:
    """Make the JAX_PLATFORMS env var authoritative even under the axon
    sitecustomize (which force-registers the remote-TPU backend and
    overrides the env var): a CPU-pinned helper script that silently lands
    on a wedged relay HANGS instead of running. Production TPU runs leave
    JAX_PLATFORMS unset and are unaffected."""
    import os

    platforms = os.environ.get("JAX_PLATFORMS")
    if not platforms:
        return
    import jax

    try:
        jax.config.update("jax_platforms", platforms)
    except Exception:
        pass


_enable_compilation_cache()
_honor_jax_platforms_env()
