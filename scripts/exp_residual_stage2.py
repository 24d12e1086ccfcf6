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
    """FROZEN copy of the round-2 production fine stage (separate-array
    batched gathers + per-query decompress/score lax.map) — the library
    has since moved to packed records, so this baseline lives here for
    reproducibility of the comparison numbers."""
    cg = jnp.take(codes, cand, axis=0).astype(jnp.int32)
    pg = jnp.take(resid, cand, axis=0)
    mg = jnp.take(mask, cand, axis=0)
    sg = jnp.take(scales, cand, axis=0).astype(jnp.float32)

    def fine_res(args):
        qi, cgi, pgi, mgi, sgi = args
        tok = decompress(cgi, pgi, cent, weights, NBITS)
        sc = jnp.einsum("cld,qd->clq", tok, qi.astype(tok.dtype),
                        preferred_element_type=jnp.float32)
        sc = sc * sgi[:, :, None]
        sc = jnp.where(mgi.astype(bool)[:, :, None], sc, NEG_INF)
        per = jnp.sum(jnp.max(sc, axis=1), axis=-1)
        top_s, _ = jax.lax.top_k(per, K)
        return top_s
    return jax.lax.map(fine_res, (qq.astype(jnp.float32), cg, pg, mg, sg))


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
import os
ROUND1 = os.environ.get("EXP_ROUND1", "0") == "1"
for C in (256, 1024) if ROUND1 else ():
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

if ROUND1:
    # numeric agreement check (baseline vs cqsplit vs pallas)
    cand = make_cand(256)
    sb = np.asarray(v_baseline(q, cand, *FULL))
    sq = np.asarray(v_cqsplit(q, cand, *FULL))
    print("baseline-vs-cqsplit max rel err:",
          float(np.max(np.abs(sb - sq) / (np.abs(sb) + 1e-6))), flush=True)


# ---------------------------------------------------------------------------
# Round 2: batched-decompress + fused Pallas candidate scorer.
# Baseline breakdown showed gathers ~1.5ms, decompress +0.4ms, and the
# per-query XLA scoring (einsum -> (C,Ld,Lq) f32 intermediate -> masked
# max/sum) adding 1.3-5.4ms. The kernel below consumes pre-decompressed
# (B, C, Ld, dim) bf16 tokens and keeps the score tensor in VMEM.
# ---------------------------------------------------------------------------

def _cand_kernel(q_ref, d_ref, m_ref, out_ref, *, tc, ld, lq):
    s = jax.lax.dot_general(
        d_ref[:], q_ref[:], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)              # (tc*Ld, Lq)
    s = jnp.where(m_ref[:] > 0, s, NEG_INF)
    s = s.reshape(tc, ld, lq)
    per_q = jnp.max(s, axis=1)                           # (tc, Lq)
    out_ref[:] = jnp.sum(per_q, axis=-1, keepdims=True)  # (tc, 1)


def maxsim_candidates_pallas(qq, tok, mask, tc=128):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    b, c, ld, dim = tok.shape
    lq = qq.shape[1]
    import functools as ft
    kernel = ft.partial(_cand_kernel, tc=tc, ld=ld, lq=lq)
    out = pl.pallas_call(
        kernel,
        grid=(b, c // tc),
        in_specs=[
            pl.BlockSpec((None, lq, dim), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((None, tc * ld, dim), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((None, tc * ld, 1), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((None, tc, 1), lambda i, j: (i, j, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, c, 1), jnp.float32),
    )(qq, tok.reshape(b, c * ld, dim),
      mask.reshape(b, c * ld, 1).astype(jnp.float32))
    return out[..., 0]                                   # (B, C)


def v_batched(qq, cand, codes, resid, scales, mask, cent, weights):
    cg = jnp.take(codes, cand, axis=0).astype(jnp.int32)
    pg = jnp.take(resid, cand, axis=0)
    mg = jnp.take(mask, cand, axis=0)
    sg = jnp.take(scales, cand, axis=0)
    tok = decompress(cg, pg, cent, weights, NBITS)       # (B,C,Ld,dim) bf16
    tok = tok * sg[..., None].astype(tok.dtype)          # fold norm scales
    sc = maxsim_candidates_pallas(qq.astype(jnp.bfloat16), tok, mg)
    top, _ = jax.lax.top_k(sc, K)
    return top


for C in ((256, 1024) if os.environ.get("EXP_ROUND2", "0") == "1" else ()):
    cand = make_cand(C)
    try:
        timeit(f"batched_pallas_C{C}", v_batched, (cand,) + FULL)
    except Exception as e:
        print(f"batched_pallas_C{C} FAILED: {type(e).__name__}: "
              f"{str(e)[:300]}", flush=True)
cand = make_cand(256)
if os.environ.get("EXP_ROUND2", "0") == "1":
  sb = np.asarray(v_baseline(q, cand, *FULL))
  try:
    sv = np.asarray(v_batched(q, cand, *FULL))
    print("baseline-vs-batched max rel err:",
          float(np.max(np.abs(sb - sv) / (np.abs(sb) + 1e-6))),
          flush=True)
  except Exception as e:
    print("batched check FAILED:", str(e)[:300])


# ---------------------------------------------------------------------------
# Round 3 (EXP_ROUND3=1): (a) ONE consolidated record gather instead of 4
# small-row gathers; (b) per-query Pallas scorer (no giant batched
# materialization). Round-2 result: batched decompress + batched kernel
# LOSES (5.8/19.0 ms vs baseline 3.1/7.4) — the (B,C,Ld,dim) bf16
# materialization + 2M-row centroid gather dominates; v_decomp_only's
# 1.9 ms was fusion-flattered (its sum() consumer fuses the gather+LUT).
# ---------------------------------------------------------------------------

# record layout: [codes int16 (Ld*2=128B) | scales bf16 (128B) |
#                 residual bytes (Ld*32=2048B)] = 2304 B/doc
REC = LD * 2 + LD * 2 + LD * PACKED


@jax.jit
def make_records(codes, scales, resid):
    cb = jax.lax.bitcast_convert_type(codes, jnp.uint8).reshape(N, -1)
    sb = jax.lax.bitcast_convert_type(scales, jnp.uint8).reshape(N, -1)
    rb = resid.reshape(N, -1)
    return jnp.concatenate([cb, sb, rb], axis=1)          # (N, 2304)


def split_records(rg):
    """(B, C, 2304) uint8 -> codes int32, scales f32, resid bytes."""
    b, c, _ = rg.shape
    cg = jax.lax.bitcast_convert_type(
        rg[..., :LD * 2].reshape(b, c, LD, 2), jnp.int16) \
        .reshape(b, c, LD).astype(jnp.int32)
    sg = jax.lax.bitcast_convert_type(
        rg[..., LD * 2:LD * 4].reshape(b, c, LD, 2), jnp.bfloat16) \
        .reshape(b, c, LD).astype(jnp.float32)
    pg = rg[..., LD * 4:].reshape(b, c, LD, PACKED)
    return cg, sg, pg


def v_record_gather(qq, cand, records):
    rg = jnp.take(records, cand, axis=0)                  # (B, C, 2304)
    cg, sg, pg = split_records(rg)
    return (cg.sum() + sg.sum()
            + pg.astype(jnp.int32).sum()).reshape(1, 1)


def v_record_baseline(qq, cand, records, mask, cent, weights):
    """Record gather + the baseline's per-query decompress/score."""
    rg = jnp.take(records, cand, axis=0)
    cg, sg, pg = split_records(rg)
    mg = jnp.take(mask, cand, axis=0)

    def fine_res(args):
        qi, cgi, pgi, mgi, sgi = args
        tok = decompress(cgi, pgi, cent, weights, NBITS)
        s = jnp.einsum("cld,qd->clq", tok, qi.astype(tok.dtype),
                       preferred_element_type=jnp.float32)
        s = s * sgi[:, :, None]
        s = jnp.where(mgi.astype(bool)[:, :, None], s, NEG_INF)
        sc = jnp.sum(jnp.max(s, axis=1), axis=-1)
        top_s, _ = jax.lax.top_k(sc, K)
        return top_s
    return jax.lax.map(fine_res, (qq.astype(jnp.float32), cg, pg, mg, sg))


def _perq_kernel(q_ref, d_ref, m_ref, out_ref, *, tc, ld, lq):
    s = jax.lax.dot_general(
        d_ref[:], q_ref[:], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)               # (tc*Ld, Lq)
    s = jnp.where(m_ref[:] > 0, s, NEG_INF)
    s = s.reshape(tc, ld, lq)
    out_ref[:] = jnp.sum(jnp.max(s, axis=1), axis=-1, keepdims=True)


def v_record_perq_pallas(qq, cand, records, mask, cent, weights, tc=128):
    """Record gather + per-query decompress (transient 16MB) + per-query
    fused Pallas scorer -> (C,) — the (C,Ld,Lq) f32 intermediate never
    touches HBM."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    import functools as ft
    b, c = cand.shape
    rg = jnp.take(records, cand, axis=0)
    cg, sg, pg = split_records(rg)
    mg = jnp.take(mask, cand, axis=0)
    kernel = ft.partial(_perq_kernel, tc=tc, ld=LD, lq=LQ)

    def fine_res(args):
        qi, cgi, pgi, mgi, sgi = args
        tok = decompress(cgi, pgi, cent, weights, NBITS)  # (C, Ld, dim)
        tok = tok * sgi[..., None].astype(tok.dtype)
        sc = pl.pallas_call(
            kernel,
            grid=(c // tc,),
            in_specs=[
                pl.BlockSpec((LQ, DIM), lambda j: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((tc * LD, DIM), lambda j: (j, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((tc * LD, 1), lambda j: (j, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((tc, 1), lambda j: (j, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((c, 1), jnp.float32),
        )(qi.astype(jnp.bfloat16), tok.reshape(c * LD, DIM),
          mgi.reshape(c * LD, 1).astype(jnp.float32))
        top_s, _ = jax.lax.top_k(sc[:, 0], K)
        return top_s
    return jax.lax.map(fine_res, (qq, cg, pg, mg, sg))


if os.environ.get("EXP_ROUND3", "0") == "1":
    records = jax.block_until_ready(make_records(codes, scales, resid))
    print(f"records: {records.shape} ({records.nbytes / 2**30:.2f} GiB)",
          flush=True)
    for C in (256, 1024):
        cand = make_cand(C)
        timeit(f"record_gather_C{C}", v_record_gather, (cand, records))
        timeit(f"record_baseline_C{C}", v_record_baseline,
               (cand, records, mask, cent, weights))
        try:
            timeit(f"record_perq_pallas_C{C}", v_record_perq_pallas,
                   (cand, records, mask, cent, weights))
        except Exception as e:
            print(f"record_perq_pallas_C{C} FAILED: {type(e).__name__}: "
                  f"{str(e)[:300]}", flush=True)
    cand = make_cand(256)
    sb = np.asarray(v_baseline(q, cand, *FULL))
    s1 = np.asarray(v_record_baseline(q, cand, records, mask, cent,
                                      weights))
    print("baseline-vs-record max rel err:",
          float(np.max(np.abs(sb - s1) / (np.abs(sb) + 1e-6))), flush=True)
    try:
        s2 = np.asarray(v_record_perq_pallas(q, cand, records, mask, cent,
                                             weights))
        print("baseline-vs-perq-pallas max rel err:",
              float(np.max(np.abs(sb - s2) / (np.abs(sb) + 1e-6))),
              flush=True)
    except Exception as e:
        print("perq pallas check FAILED:", str(e)[:300])


# ---------------------------------------------------------------------------
# Round 4 (EXP_ROUND4=1): query-GROUPED fine stage — lax.map serializes
# all 32 queries; grouping g queries per step batches the einsum (better
# MXU occupancy) while keeping the (g, C, Ld, Lq) transient bounded.
# Also: bf16 score intermediate (halves the traffic of the dominant
# (C, Ld, Lq) tensor).
# ---------------------------------------------------------------------------

def v_grouped(qq, cand, records, mask, cent, weights, g=4, sdtype=None):
    b, c = cand.shape
    rg = jnp.take(records, cand, axis=0)
    cg, sg, pg = split_records(rg)
    mg = jnp.take(mask, cand, axis=0)

    def fine_group(args):
        qi, cgi, pgi, mgi, sgi = args                    # (g, ...) each
        tok = decompress(cgi, pgi, cent, weights, NBITS)  # (g,C,Ld,dim)
        pet = jnp.float32 if sdtype is None else sdtype
        s = jnp.einsum("gcld,gqd->gclq", tok, qi.astype(tok.dtype),
                       preferred_element_type=pet)
        s = s * sgi[..., None].astype(s.dtype)
        s = jnp.where(mgi.astype(bool)[..., None], s,
                      jnp.asarray(NEG_INF, s.dtype))
        sc = jnp.sum(jnp.max(s, axis=2).astype(jnp.float32), axis=-1)
        top_s, _ = jax.lax.top_k(sc, K)
        return top_s                                     # (g, K)

    grp = lambda x: x.reshape((b // g, g) + x.shape[1:])
    out = jax.lax.map(fine_group, (grp(qq.astype(jnp.float32)), grp(cg),
                                   grp(pg), grp(mg), grp(sg)))
    return out.reshape(b, K)


if os.environ.get("EXP_ROUND4", "0") == "1":
    records = jax.block_until_ready(make_records(codes, scales, resid))
    for C in (256, 1024):
        cand = make_cand(C)
        for g in (4, 8, 32):
            timeit(f"grouped{g}_f32_C{C}", lambda qq, *a, g=g: v_grouped(
                qq, *a, g=g), (cand, records, mask, cent, weights))
        timeit(f"grouped4_bf16_C{C}", lambda qq, *a: v_grouped(
            qq, *a, g=4, sdtype=jnp.bfloat16),
            (cand, records, mask, cent, weights))
    cand = make_cand(256)
    sb = np.asarray(v_baseline(q, cand, *FULL))
    s4 = np.asarray(v_grouped(q, cand, records, mask, cent, weights, g=4))
    print("baseline-vs-grouped4 max rel err:",
          float(np.max(np.abs(sb - s4) / (np.abs(sb) + 1e-6))), flush=True)
    sbf = np.asarray(v_grouped(q, cand, records, mask, cent, weights,
                               g=4, sdtype=jnp.bfloat16))
    print("baseline-vs-grouped4-bf16 max rel err:",
          float(np.max(np.abs(sb - sbf) / (np.abs(sb) + 1e-6))),
          flush=True)


# ---------------------------------------------------------------------------
# Round 5 (EXP_ROUND5=1): fully-batched fine stage (round-4 winner at
# C=256: 1.59 ms vs 3.06 baseline) — separate gathers vs packed records,
# and the C=1024 memory-safety check (round-4 grouped4 crashed the
# worker there).
# ---------------------------------------------------------------------------

def v_batched_einsum(qq, cand, codes, resid, scales, mask, cent, weights):
    cg = jnp.take(codes, cand, axis=0).astype(jnp.int32)
    pg = jnp.take(resid, cand, axis=0)
    mg = jnp.take(mask, cand, axis=0)
    sg = jnp.take(scales, cand, axis=0).astype(jnp.float32)
    tok = decompress(cg, pg, cent, weights, NBITS)        # (B,C,Ld,dim) bf16
    s = jnp.einsum("bcld,bqd->bclq", tok, qq.astype(tok.dtype),
                   preferred_element_type=jnp.float32)
    s = s * sg[..., None]
    s = jnp.where(mg.astype(bool)[..., None], s, NEG_INF)
    sc = jnp.sum(jnp.max(s, axis=2), axis=-1)             # (B, C)
    top, _ = jax.lax.top_k(sc, K)
    return top


if os.environ.get("EXP_ROUND5", "0") == "1":
    for C in (256, 1024):
        cand = make_cand(C)
        timeit(f"batched_einsum_sepgather_C{C}", v_batched_einsum,
               (cand,) + FULL)
    records = jax.block_until_ready(make_records(codes, scales, resid))
    cand = make_cand(256)
    timeit("grouped32_records_C256", lambda qq, *a: v_grouped(
        qq, *a, g=32), (cand, records, mask, cent, weights))
    sb = np.asarray(v_baseline(q, cand, *FULL))
    sv = np.asarray(v_batched_einsum(q, cand, *FULL))
    print("baseline-vs-batched-einsum max rel err:",
          float(np.max(np.abs(sb - sv) / (np.abs(sb) + 1e-6))), flush=True)


# Round 6 (EXP_ROUND6=1): records + fully-batched at C=1024 (memory
# check) and a bf16 score-intermediate variant to halve the (B,C,Ld,Lq)
# traffic at large C.
if os.environ.get("EXP_ROUND6", "0") == "1":
    records = jax.block_until_ready(make_records(codes, scales, resid))
    cand = make_cand(1024)
    try:
        timeit("grouped32_records_C1024", lambda qq, *a: v_grouped(
            qq, *a, g=32), (cand, records, mask, cent, weights))
    except Exception as e:
        print("grouped32_records_C1024 FAILED:", str(e)[:200], flush=True)
    try:
        timeit("grouped32_records_bf16_C1024", lambda qq, *a: v_grouped(
            qq, *a, g=32, sdtype=jnp.bfloat16),
            (cand, records, mask, cent, weights))
    except Exception as e:
        print("grouped32_bf16_C1024 FAILED:", str(e)[:200], flush=True)
    cand = make_cand(256)
    sb = np.asarray(v_baseline(q, cand, *FULL))
    sbf = np.asarray(v_grouped(q, cand, records, mask, cent, weights,
                               g=32, sdtype=jnp.bfloat16))
    print("baseline-vs-g32-bf16 max rel err:",
          float(np.max(np.abs(sb - sbf) / (np.abs(sb) + 1e-6))),
          flush=True)


# ---------------------------------------------------------------------------
# Round 7 (EXP_ROUND7=1): does the records+batched win survive at the
# REAL 1M table size? (The 1M bench regressed at C=1024 after the
# integration: 15.1 ms vs 12.5 per-query/separate — table-size-dependent
# gather behavior suspected.)
# ---------------------------------------------------------------------------

def v_records_batched(qq, cand, records, mask, cent, weights):
    from ravqa_tpu.ops.residual import split_records as _sr
    b, c = cand.shape
    rg = jnp.take(records, cand, axis=0)
    cg, sg, pg = _sr(rg, LD)
    mg = jnp.take(mask, cand, axis=0)
    tok = decompress(cg, pg, cent, weights, NBITS)
    s = jnp.einsum("bcld,bqd->bclq", tok, qq.astype(tok.dtype),
                   preferred_element_type=jnp.float32)
    s = s * sg[..., None]
    s = jnp.where(mg.astype(bool)[..., None], s, NEG_INF)
    sc = jnp.sum(jnp.max(s, axis=2), axis=-1)
    top, _ = jax.lax.top_k(sc, K)
    return top


def v_records_perq(qq, cand, records, mask, cent, weights):
    from ravqa_tpu.ops.residual import split_records as _sr
    rg = jnp.take(records, cand, axis=0)
    cg, sg, pg = _sr(rg, LD)
    mg = jnp.take(mask, cand, axis=0)

    def fine(args):
        qi, cgi, pgi, mgi, sgi = args
        tok = decompress(cgi, pgi, cent, weights, NBITS)
        s = jnp.einsum("cld,qd->clq", tok, qi.astype(tok.dtype),
                       preferred_element_type=jnp.float32)
        s = s * sgi[:, :, None]
        s = jnp.where(mgi.astype(bool)[:, :, None], s, NEG_INF)
        sc = jnp.sum(jnp.max(s, axis=1), axis=-1)
        top_s, _ = jax.lax.top_k(sc, K)
        return top_s
    return jax.lax.map(fine, (qq.astype(jnp.float32), cg, pg, mg, sg))


if os.environ.get("EXP_ROUND7", "0") == "1":
    NBIG = int(os.environ.get("EXP_N", 1_000_448))
    print(f"rebuilding at N={NBIG}", flush=True)
    N = NBIG

    @jax.jit
    def build_big(key):
        k1, k2, k3 = jax.random.split(key, 3)
        codes_b = jax.random.randint(k1, (N, LD), 0, N_CENT, jnp.int32)
        resid_b = jax.random.randint(k2, (N, LD, PACKED), 0, 256,
                                     jnp.int32).astype(jnp.uint8)
        scales_b = (1.0 + 0.01 * jax.random.normal(k3, (N, LD))) \
            .astype(jnp.bfloat16)
        from ravqa_tpu.ops.residual import pack_records as pr
        return pr(codes_b, scales_b, resid_b)

    records = jax.block_until_ready(build_big(jax.random.PRNGKey(2)))
    mask = jnp.ones((N, LD), jnp.int8)
    print(f"records {records.nbytes / 2**30:.2f} GiB", flush=True)
    for C in (256, 1024):
        cand = jnp.asarray(rngc.integers(0, N, (B, C)), jnp.int32)
        timeit(f"1M_records_gather_C{C}", lambda qq, cand, recs:
               jnp.take(recs, cand, axis=0).astype(jnp.int32).sum()
               .reshape(1, 1), (cand, records))
        timeit(f"1M_records_batched_C{C}", v_records_batched,
               (cand, records, mask, cent, weights))
        timeit(f"1M_records_perq_C{C}", v_records_perq,
               (cand, records, mask, cent, weights))


# ---------------------------------------------------------------------------
# Round 8 (EXP_ROUND8=1): why does the batched fine stage regress ONLY
# when integrated? Isolated (cand = program input) it wins 2.8x; inside
# hierarchical_search it loses. Here cand is COMPUTED in-program from a
# dummy coarse score -> top_k, isolating "cand is a producer" from
# "hierarchical stages 0-1 specifically".
#
# MEASURED (v5e, 1M records): computedcand batched/perq 28.5/27.8 ms at
# C=256 and 39.7/35.2 ms at C=1024 — the dense dummy coarse dominates
# and batched is equal-or-worse, so a data-dependent candidate alone
# does NOT reproduce the integrated regression; the interaction is
# specific to the hierarchical stage-0/1 schedule. Per-query default
# stands.
# ---------------------------------------------------------------------------

if os.environ.get("EXP_ROUND8", "0") == "1":
    NBIG = 1_000_448
    N = NBIG

    @jax.jit
    def build_big(key):
        k1, k2, k3 = jax.random.split(key, 3)
        codes_b = jax.random.randint(k1, (N, LD), 0, N_CENT, jnp.int32)
        resid_b = jax.random.randint(k2, (N, LD, PACKED), 0, 256,
                                     jnp.int32).astype(jnp.uint8)
        scales_b = (1.0 + 0.01 * jax.random.normal(k3, (N, LD))) \
            .astype(jnp.bfloat16)
        from ravqa_tpu.ops.residual import pack_records as pr
        return pr(codes_b, scales_b, resid_b)

    print("round8: building 1M records...", flush=True)
    records = jax.block_until_ready(build_big(jax.random.PRNGKey(2)))
    mask = jnp.ones((N, LD), jnp.int8)
    # dummy per-doc base scores: one small matmul vs doc "keys"
    dkeys = jax.block_until_ready(jax.random.normal(
        jax.random.PRNGKey(3), (N, DIM), jnp.bfloat16))
    print("round8: built", flush=True)

    def with_computed_cand(stage2):
        def fn(qq, records, mask, cent, weights, dkeys, C):
            # (N, d) @ (d, B): summed-query key scores — cheap, no giant
            # intermediate, but cand is genuinely DATA-DEPENDENT
            qsum = jnp.sum(qq.astype(jnp.bfloat16), axis=1)    # (B, d)
            approx = jnp.einsum("nd,bd->bn", dkeys, qsum,
                                preferred_element_type=jnp.float32)
            _, cand = jax.lax.top_k(approx, C)         # computed cand
            return stage2(qq, cand, records, mask, cent, weights)
        return fn

    for C in (256, 1024):
        for name, s2 in (("batched", v_records_batched),
                         ("perq", v_records_perq)):
            timeit(f"computedcand_{name}_C{C}",
                   lambda qq, *a, s2=s2, C=C: with_computed_cand(s2)(
                       qq, *a, C), (records, mask, cent, weights, dkeys))
