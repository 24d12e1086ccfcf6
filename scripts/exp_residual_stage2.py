"""On-chip experiment: decompose the residual-codec FINE-STAGE cost and
race candidate implementations (VERDICT r2 weak #4 / next #4).

Context: at 1M docs the hierarchical residual search runs 2565-6177 QPS
vs int8's 8676-9624 — the gap is entirely stage 2 (decompress+score of
the gathered candidates). This script times, at the exact bench shape
(C=256/1024 candidates x Ld=64 tokens x dim=128, K=8192 centroids,
B=32 x Lq=32 queries):

  gathers   : the batched XLA gathers of codes/residuals/scales alone
  baseline  : the shipped _fine_stage XLA path (gather + per-query
              decompress + einsum)
  cqsplit   : distributive split — score = cq[code] + (w[bits] . q),
              with cq = centroids @ q^T computed ONCE per batch (one MXU
              matmul, no vector gather) and cq rows gathered by ONE flat
              jnp.take; residual term via unpack+batched einsum
  pallas    : fused unpack+LUT+add+scale+mask+MaxSim kernel over
              PRE-GATHERED cq scores + residual bytes (everything the
              kernel reads is dense; the only gathers left are the flat
              XLA takes feeding it)

Run: python scripts/exp_residual_stage2.py   (real TPU)
"""

import sys
import time

import numpy as np

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp

N, LD, DIM = 200_064, 64, 128
B, LQ, K = 32, 32, 10
N_CENT = 8192
NBITS = 2
PER_BYTE = 8 // NBITS
PACKED = DIM // PER_BYTE

from ravqa_tpu.ops.maxsim import NEG_INF
from ravqa_tpu.ops.residual import decompress, unpack_bits


# ---- build a synthetic compressed index directly (values irrelevant for
#      timing; shapes/dtypes match bench_1m_residual) ------------------------
@jax.jit
def build(key):
    k1, k2, k3, k4, k5 = jax.random.split(key, 5)
    codes = jax.random.randint(k1, (N, LD), 0, N_CENT, jnp.int32) \
        .astype(jnp.int16)
    resid = jax.random.randint(k2, (N, LD, PACKED), 0, 256, jnp.int32) \
        .astype(jnp.uint8)
    scales = (1.0 + 0.01 * jax.random.normal(k3, (N, LD))) \
        .astype(jnp.bfloat16)
    cent = jax.random.normal(k4, (N_CENT, DIM), jnp.float32)
    cent = cent / jnp.linalg.norm(cent, axis=-1, keepdims=True)
    q = jax.random.normal(k5, (B, LQ, DIM), jnp.float32)
    q = q / jnp.linalg.norm(q, axis=-1, keepdims=True)
    weights = jnp.array([-0.05, -0.01, 0.01, 0.05], jnp.float32)
    return codes, resid, scales, cent, q, weights


codes, resid, scales, cent, q, weights = jax.block_until_ready(build(
    jax.random.PRNGKey(0)))
mask = jnp.ones((N, LD), jnp.int8)
rngc = np.random.default_rng(1)


def make_cand(C):
    return jnp.asarray(rngc.integers(0, N, (B, C)), jnp.int32)


def timeit(name, fn, args, iters=24):
    @jax.jit
    def run(qq0, *arrs):
        def body(qq, _):
            out = fn(qq, *arrs)
            return qq + (out.reshape(-1)[0] * 1e-9).astype(qq.dtype), ()
        qq, _ = jax.lax.scan(body, qq0, None, length=iters)
        return qq[:1, :1, :1]
    _ = np.asarray(run(q, *args))
    t0 = time.perf_counter()
    _ = np.asarray(run(q, *args))
    dt = time.perf_counter() - t0
    print(f"{name}: {dt / iters * 1e3:.3f} ms/batch "
          f"({B * iters / dt:.0f} QPS)", flush=True)
    return dt / iters


# ---- variants (each returns (B, k) scores; fn(q, cand, ...)) ---------------

def v_gathers(qq, cand, codes, resid, scales, mask):
    cg = jnp.take(codes, cand, axis=0).astype(jnp.int32)
    pg = jnp.take(resid, cand, axis=0)
    mg = jnp.take(mask, cand, axis=0)
    sg = jnp.take(scales, cand, axis=0)
    return (cg.sum() + pg.astype(jnp.int32).sum() + mg.sum()
            + sg.astype(jnp.float32).sum()).reshape(1, 1)


def v_baseline(qq, cand, codes, resid, scales, mask, cent, weights):
    from ravqa_tpu.retrieval.coarse import _fine_stage
    s, _ = _fine_stage(qq, cand, None, mask, k=K,
                       scales=scales.astype(jnp.float32), codes=codes,
                       residuals=resid, centroids=cent,
                       bucket_weights=weights, nbits=NBITS)
    return s


def v_cqsplit(qq, cand, codes, resid, scales, mask, cent, weights):
    b, c = cand.shape
    cg = jnp.take(codes, cand, axis=0).astype(jnp.int32)   # (B, C, Ld)
    pg = jnp.take(resid, cand, axis=0)                     # (B, C, Ld, P)
    mg = jnp.take(mask, cand, axis=0)
    sg = jnp.take(scales, cand, axis=0).astype(jnp.float32)
    # centroid contribution: ONE matmul + ONE flat row-gather of scores
    cq = jnp.einsum("kd,bqd->bkq", cent, qq,
                    preferred_element_type=jnp.float32)    # (B, K, Lq)
    flat_idx = cg + (jnp.arange(b, dtype=jnp.int32)[:, None, None] * N_CENT)
    cqg = jnp.take(cq.reshape(b * N_CENT, LQ),
                   flat_idx.reshape(-1), axis=0) \
        .reshape(b, c, LD, LQ)                             # (B, C, Ld, Lq)
    # residual contribution
    bits = unpack_bits(pg, NBITS)                          # (B, C, Ld, DIM)
    wr = weights[bits.astype(jnp.int32)].astype(jnp.bfloat16)
    sr = jnp.einsum("bcld,bqd->bclq", wr, qq.astype(jnp.bfloat16),
                    preferred_element_type=jnp.float32)
    s = (cqg + sr) * sg[..., None]
    s = jnp.where(mg.astype(bool)[..., None], s, NEG_INF)
    sc = jnp.sum(jnp.max(s, axis=2), axis=-1)              # (B, C)
    top, _ = jax.lax.top_k(sc, K)
    return top


def _fused_kernel(q_ref, cqg_ref, bits_ref, sg_ref, mg_ref, w_ref, out_ref):
    """Per (b, c-tile): unpack->LUT->residual matmul->+cqg->scale->mask->
    MaxSim. Everything dense in VMEM; MXU does the residual term."""
    import jax.numpy as jnp
    tc = bits_ref.shape[0]
    bits = bits_ref[...]                                   # (Tc, Ld, DIM)
    w = w_ref[...]                                         # (4,) padded row
    # 2-bit LUT via selects (vector ops)
    wr = jnp.where(bits == 0, w[0, 0],
                   jnp.where(bits == 1, w[0, 1],
                             jnp.where(bits == 2, w[0, 2], w[0, 3])))
    qm = q_ref[...]                                        # (Lq, DIM)
    sr = jax.lax.dot_general(
        wr.reshape(tc * bits_ref.shape[1], bits_ref.shape[2]),
        qm, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)                # (Tc*Ld, Lq)
    s = sr.reshape(tc, bits_ref.shape[1], qm.shape[0]) + cqg_ref[...]
    s = s * sg_ref[...][..., None]
    s = jnp.where(mg_ref[...][..., None] != 0, s, NEG_INF)
    out_ref[...] = jnp.sum(jnp.max(s, axis=1), axis=-1)    # (Tc, Lq)->(Tc,)


def v_pallas(qq, cand, codes, resid, scales, mask, cent, weights):
    from jax.experimental import pallas as pl
    b, c = cand.shape
    cg = jnp.take(codes, cand, axis=0).astype(jnp.int32)
    pg = jnp.take(resid, cand, axis=0)
    mg = jnp.take(mask, cand, axis=0).astype(jnp.int32)
    sg = jnp.take(scales, cand, axis=0).astype(jnp.float32)
    cq = jnp.einsum("kd,bqd->bkq", cent, qq,
                    preferred_element_type=jnp.float32)
    flat_idx = cg + (jnp.arange(b, dtype=jnp.int32)[:, None, None] * N_CENT)
    cqg = jnp.take(cq.reshape(b * N_CENT, LQ),
                   flat_idx.reshape(-1), axis=0).reshape(b, c, LD, LQ)
    bits = unpack_bits(pg, NBITS).astype(jnp.int32)        # (B, C, Ld, DIM)
    wrow = jnp.pad(weights, (0, 124)).reshape(1, 128)      # lane-pad
    tc = 32
    grid = (b, c // tc)
    sc = pl.pallas_call(
        _fused_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((None, LQ, DIM), lambda i, j: (i, 0, 0)),
            pl.BlockSpec((None, tc, LD, LQ), lambda i, j: (i, j, 0, 0)),
            pl.BlockSpec((None, tc, LD, DIM), lambda i, j: (i, j, 0, 0)),
            pl.BlockSpec((None, tc, LD), lambda i, j: (i, j, 0)),
            pl.BlockSpec((None, tc, LD), lambda i, j: (i, j, 0)),
            pl.BlockSpec((1, 128), lambda i, j: (0, 0)),
        ],
        out_specs=pl.BlockSpec((None, tc), lambda i, j: (i, j)),
        out_shape=jax.ShapeDtypeStruct((b, c), jnp.float32),
    )(qq.astype(jnp.float32), cqg, bits, sg, mg, wrow)
    top, _ = jax.lax.top_k(sc, K)
    return top


def v_decomp_only(qq, cand, codes, resid, scales, mask, cent, weights):
    """Just the current decompress (centroid vector gather + LUT), no
    scoring — isolates the decompress cost."""
    cg = jnp.take(codes, cand, axis=0).astype(jnp.int32)
    pg = jnp.take(resid, cand, axis=0)
    tok = decompress(cg, pg, cent, weights, NBITS)
    return tok.astype(jnp.float32).sum().reshape(1, 1)


IDX = (codes, resid, scales, mask)
FULL = (codes, resid, scales, mask, cent, weights)
for C in (256, 1024):
    cand = make_cand(C)
    print(f"--- C={C} ---", flush=True)
    timeit(f"gathers_C{C}", lambda qq, cand, *a: v_gathers(qq, cand, *a),
           (cand,) + IDX)
    timeit(f"decompress_C{C}", v_decomp_only, (cand,) + FULL)
    timeit(f"baseline_C{C}", v_baseline, (cand,) + FULL)
    timeit(f"cqsplit_C{C}", v_cqsplit, (cand,) + FULL)
    try:
        timeit(f"pallas_C{C}", v_pallas, (cand,) + FULL)
    except Exception as e:
        print(f"pallas_C{C} FAILED: {type(e).__name__}: "
              f"{str(e)[:300]}", flush=True)

# numeric agreement check (top-k values baseline vs cqsplit vs pallas)
cand = make_cand(256)
sb = np.asarray(v_baseline(q, cand, *FULL))
sq = np.asarray(v_cqsplit(q, cand, *FULL))
print("baseline-vs-cqsplit max rel err:",
      float(np.max(np.abs(sb - sq) / (np.abs(sb) + 1e-6))), flush=True)
try:
    sp = np.asarray(v_pallas(q, cand, *FULL))
    print("baseline-vs-pallas max rel err:",
          float(np.max(np.abs(sb - sp) / (np.abs(sb) + 1e-6))), flush=True)
except Exception as e:
    print("pallas check FAILED:", str(e)[:200])
