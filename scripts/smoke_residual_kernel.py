"""On-chip smoke for the fused residual MaxSim kernel (flat + factored).

Compares maxsim_residual_pallas compiled on the REAL backend against the
XLA decompress+einsum reference on identical gathered candidates, for
both codec layouts and both nbits widths the searcher ships. Asserts
score parity (the kernel math is bf16-exact vs the bf16 reference up to
f32 accumulation order) and exact top-10 agreement.

Run: python scripts/smoke_residual_kernel.py
"""

import sys

import numpy as np

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp

from ravqa_tpu.ops.residual import (compress, decompress,
                                    maxsim_residual_pallas, train_codec,
                                    train_codec_factored)

print("backend:", jax.default_backend(), flush=True)

DIM = 128
LD, LQ, B, C = 32, 16, 8, 128
rng = np.random.default_rng(11)
centers = rng.normal(size=(64, DIM)).astype(np.float32)
doc_cluster = rng.integers(0, 64, 4096)
toks = centers[doc_cluster][:, None, :] + 0.25 * rng.normal(
    size=(4096, LD, DIM)).astype(np.float32)
toks /= np.linalg.norm(toks, axis=-1, keepdims=True)
mask = np.ones((4096, LD), np.int8)
mask[:, -3:] = 0
q = centers[rng.integers(0, 64, B)][:, None, :] + 0.25 * rng.normal(
    size=(B, LQ, DIM)).astype(np.float32)
q /= np.linalg.norm(q, axis=-1, keepdims=True)
q = q.astype(np.float32)
cand = jnp.asarray(rng.integers(0, toks.shape[0], (B, C)))

failures = []
for name, codec in [
    ("flat_k256_nb2", train_codec(toks, mask, n_centroids=256, nbits=2,
                                  sample=16384, heldout=4096)),
    ("flat_k256_nb4", train_codec(toks, mask, n_centroids=256, nbits=4,
                                  sample=16384, heldout=4096)),
    ("fact_64x64_nb2", train_codec_factored(toks, mask, k_coarse=64,
                                            k_fine=64, nbits=2,
                                            sample=16384, heldout=4096)),
    ("fact_256x256_nb2", train_codec_factored(toks, mask, k_coarse=256,
                                              k_fine=256, nbits=2,
                                              sample=16384, heldout=4096)),
]:
    codes, packed, scales = compress(toks, mask, codec)
    cg = jnp.take(codes, cand, axis=0)
    pg = jnp.take(packed, cand, axis=0)
    sg = jnp.take(scales, cand, axis=0)
    mg = jnp.take(jnp.asarray(mask), cand, axis=0)
    rec = decompress(cg, pg, codec.centroids, codec.bucket_weights,
                     codec.nbits, dtype=jnp.bfloat16)
    s = jnp.einsum("bcld,bqd->bclq", rec,
                   jnp.asarray(q).astype(jnp.bfloat16),
                   preferred_element_type=jnp.float32)
    s = s * sg[..., None].astype(jnp.float32)
    s = jnp.where(np.asarray(mg)[..., None] > 0, s, -9999.0)
    ref = np.asarray(jnp.sum(jnp.max(s, axis=2), axis=-1))
    got = np.asarray(maxsim_residual_pallas(
        jnp.asarray(q), cg, pg, mg, codec.centroids, codec.bucket_weights,
        sg, codec.coarse, codec.fine, nbits=codec.nbits, tile_c=32))
    scale = float(np.abs(ref).max())
    err = float(np.abs(got - ref).max()) / scale
    ov = np.mean([len(set(np.argsort(-got[i])[:10].tolist())
                      & set(np.argsort(-ref[i])[:10].tolist())) / 10
                  for i in range(B)])
    ok = err < 5e-2 and ov >= 0.9
    print(f"{name}: rel_err {err:.4f}  top10_overlap {ov:.3f}"
          f"  {'OK' if ok else 'FAIL'}", flush=True)
    if not ok:
        failures.append(name)

if failures:
    sys.exit(f"FAILED: {failures}")
print("SMOKE OK", flush=True)
