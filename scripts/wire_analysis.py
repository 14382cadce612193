"""Operating-point wire analysis (round 4): symbol sparsity + index
entropy of the trained flagship at the bench geometry, on CPU.

Answers "what would a sparse wire / packed indexes buy?" with data from
the REAL trained asset instead of guesses; round-4 findings are recorded
in docs/round4.md (56% zeros, 93% within +-1, zero i8 overflows at q4 ->
sparse wire parked, i8 fallback is a rare-path guard).

Usage: python scripts/wire_analysis.py
"""
import sys, time, numpy as np
sys.path.insert(0, str(__import__("pathlib").Path(__file__).resolve().parents[1]))
sys.path.insert(0, str(__import__("pathlib").Path(__file__).resolve().parent))
import jax
jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp
from export_bench_params import load_bench_params
from lmsfc_tpu.codecs.learned import LMSFCCodec

params = load_bench_params("bench_assets/lmsfc_q4_params.npz")
codec = LMSFCCodec(num_filters=192, latent_filters=192, hyper_filters=128,
                   dtype="float32", chunk_frames=1, seed=0, params=params)
# half of the bench's SFU class-C geometry to keep CPU cost sane
SHAPES = [(68, 120), (34, 60), (17, 30), (9, 15)]
rng = np.random.default_rng(0)
feats = []
for (h, w) in SHAPES:
    base = rng.normal(0, 1, (1, h // 4 + 1, w // 4 + 1, 256))
    up = np.kron(base, np.ones((1, 4, 4, 1)))[:, :h, :w, :]
    x = (3.0 * (0.6 * up + 0.4 * rng.normal(0, 1, (1, h, w, 256)))).astype(np.float32)
    feats.append(jnp.asarray(x))
analysis = codec._analysis_fn(tuple(f.shape for f in feats), codec.rate_idx)
t0 = time.time()
yc, zs = analysis(codec.params, feats)
yi, mn = codec._hyper_idx_fn((yc.shape[1], yc.shape[2]))(codec.params, zs)
s8, over, s16 = codec._sym_fn()(yc, mn)
s = np.asarray(s16)
yi_np = np.asarray(yi)
print(f"analysis+sym in {time.time()-t0:.1f}s; y shape {s.shape}")
print(f"zero frac: {(s == 0).mean():.4f}; |s|<=1: {(np.abs(s) <= 1).mean():.4f}")
print(f"overflow i8: {int(np.asarray(over).sum())}")
vals, counts = np.unique(yi_np, return_counts=True)
p = counts / counts.sum()
print(f"idx: {len(vals)} distinct, mode frac {p.max():.4f}, entropy {-np.sum(p*np.log2(p)):.2f} bits")
