"""1M-passage late-interaction retrieval on ONE v5e chip.

The BASELINE north-star targets a 1M-passage index on v5e-8; this fits it on
a single chip: int8-quantized token index (1M x 64 tokens x 128 dim = 8 GiB)
+ bf16 summary vectors (1M x 8 x 128 = 2 GiB), searched two-stage with
in-fine-stage dequantization.

HBM discipline: the index is assembled slab-by-slab into preallocated
buffers with donated dynamic_update_slice (no concat copies, no full-index
bf16 intermediate ever materializes).

Run: python scripts/bench_1m.py
"""

import functools
import os
import sys
import time

import numpy as np

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp

from ravqa_tpu.retrieval.coarse import summarize_docs, two_stage_search

N, LD, DIM = 1_000_448, 64, 128      # ~1M docs
B, LQ, K = 32, 32, 10
N_TOPICS = 8192
SLAB = 62_528                        # N / 16
dt = jnp.bfloat16


@jax.jit
def make_topics(key):
    t = jax.random.normal(key, (N_TOPICS, DIM), dt)
    return t * jax.lax.rsqrt(jnp.sum(t.astype(jnp.float32) ** 2, -1,
                                     keepdims=True) + 1e-9).astype(dt)


@jax.jit
def build_index(key):
    """Whole index in ONE program (slabbed fori_loop) — avoids the HBM
    fragmentation a host loop of donated updates leaves behind."""
    topics = make_topics(key)

    def body(i, carry):
        idx8, scl, smm = carry
        ka, kn = jax.random.split(jax.random.fold_in(key, i))
        # cluster-ordered corpus: contiguous ~N/N_TOPICS-doc runs per topic
        # (models coarse.cluster_order applied at build time; hierarchical
        # search needs coherent blocks, two-stage is order-agnostic)
        gidx = i * SLAB + jnp.arange(SLAB, dtype=jnp.int32)
        # gidx * N_TOPICS overflows int32; f32 has ample precision here
        # (values ≤ N_TOPICS with ~0.008 steps)
        assign = jnp.clip(jnp.floor(gidx.astype(jnp.float32)
                                    * (N_TOPICS / N)).astype(jnp.int32),
                          0, N_TOPICS - 1)
        t = topics[assign][:, None, :] + (0.3 * jax.random.normal(
            kn, (SLAB, LD, DIM), dt)).astype(dt)
        sq = jnp.sum(t.astype(jnp.float32) ** 2, -1, keepdims=True)
        tn = (t * jax.lax.rsqrt(sq + 1e-9).astype(dt)).astype(dt)
        t32 = tn.astype(jnp.float32)
        absmax = jnp.max(jnp.abs(t32), -1)
        sc = jnp.maximum(absmax, 1e-8) / 127.0
        q8 = jnp.round(t32 / sc[..., None]).astype(jnp.int8)
        sm = summarize_docs(tn, jnp.ones((SLAB, LD), jnp.int8),
                            n_summary=8, iters=2).astype(dt)
        start = i * SLAB
        idx8 = jax.lax.dynamic_update_slice(idx8, q8, (start, 0, 0))
        scl = jax.lax.dynamic_update_slice(scl, sc.astype(jnp.float32),
                                           (start, 0))
        smm = jax.lax.dynamic_update_slice(smm, sm, (start, 0, 0))
        return idx8, scl, smm

    init = (jnp.zeros((N, LD, DIM), jnp.int8),
            jnp.zeros((N, LD), jnp.float32),
            jnp.zeros((N, 8, DIM), dt))
    return jax.lax.fori_loop(0, N // SLAB, body, init)


t0 = time.time()
index8, scales, summ = build_index(jax.random.PRNGKey(7))
index8 = jax.block_until_ready(index8)
mask = jnp.ones((N, LD), jnp.int8)
print(f"1M index built: int8 {index8.size / 2**30:.1f} GiB + summaries "
      f"{summ.size * 2 / 2**30:.1f} GiB in {time.time() - t0:.0f}s",
      flush=True)


# queries = noisy copies of the FIRST B docs (static slice: a dynamic
# gather program here leaves a residual allocation on the axon backend
# that starves the subsequent search of HBM)
@jax.jit
def make_queries(key, index8, scales):
    base = index8[:B, :LQ].astype(jnp.float32) * scales[:B, :LQ, None]
    qt = base + 0.1 * jax.random.normal(key, (B, LQ, DIM))
    qt = qt * jax.lax.rsqrt(jnp.sum(qt ** 2, -1, keepdims=True) + 1e-9)
    return qt.astype(dt)


q = make_queries(jax.random.PRNGKey(1), index8, scales)
qidx = jnp.arange(B)
# XLA coarse would materialize an (N, S, B*Lq) f32 intermediate (~33 GiB
# at 1M docs); the chunked slot-major Pallas sweep keeps the score block
# in VMEM (ops.maxsim.coarse_sweep_pallas — 15.0 ms at this S=8 shape vs
# 59 ms XLA / ~100+ ms generic doc-major kernel).
summ_t = jax.block_until_ready(jax.jit(lambda s: jnp.swapaxes(s, 0, 1))(summ))
s, rows = two_stage_search(q, index8, mask, summ, k=K, n_candidates=1024,
                           scales=scales, use_pallas_coarse=True, approx_topk=True,
                           summaries_t=summ_t)
rows = np.asarray(rows)
top1 = float(np.mean(rows[:, 0] == np.asarray(qidx)))
print(f"self-retrieval top-1 (noisy query -> its own doc among 1M): "
      f"{top1:.2f}", flush=True)


def timeit(name, fn, args, iters=32):
    """Generic scan-chained timer: fn(q, *args) -> (scores, rows). Index
    arrays ride as jit ARGUMENTS (closure capture would serialize GiBs
    into the HLO for the remote compiler — axon pitfall)."""
    @jax.jit
    def run(qq0, *arrs):
        def body(qq, _):
            s, _ = fn(qq, *arrs)
            return qq + (s[:, 0] * 1e-9).astype(qq.dtype)[:, None, None], ()
        qq, _ = jax.lax.scan(body, qq0, None, length=iters)
        return qq[:1, :1, :1]
    _ = np.asarray(run(q, *args))
    t0 = time.perf_counter()
    _ = np.asarray(run(q, *args))
    dt_s = time.perf_counter() - t0
    print(f"{name}: {B * iters / dt_s:.0f} QPS/chip "
          f"({dt_s / iters * 1e3:.2f} ms/batch)", flush=True)


TS_ARGS = (index8, mask, summ, scales, summ_t)
for nc in (1024, 256):
    timeit(f"two_stage_1M_int8_C{nc}",
           lambda qq, idx, m, sm, sc, smt, nc=nc: two_stage_search(
               qq, idx, m, sm, k=K, n_candidates=nc, scales=sc,
               use_pallas_coarse=True, approx_topk=True,
               summaries_t=smt), TS_ARGS)

# int8 coarse sweep (MXU int8 = 2x bf16 throughput, half the HBM read;
# candidate generation only — the int8 fine stage is identical)
from ravqa_tpu.ops.quant import quantize_summaries_t_int8

st8, dsc = jax.block_until_ready(quantize_summaries_t_int8(summ_t))
_, rows_i8 = two_stage_search(q, index8, mask, summ, k=K, n_candidates=1024,
                              scales=scales, use_pallas_coarse=True,
                              approx_topk=True, summaries_t=st8,
                              summaries_t_scale=dsc)
top1_i8 = float(np.mean(np.asarray(rows_i8)[:, 0] == np.asarray(qidx)))
print(f"self-retrieval top-1 (int8 coarse): {top1_i8:.2f}", flush=True)


I8_ARGS = (index8, mask, summ, scales, st8, dsc)
for nc in (1024, 256):
    timeit(f"two_stage_1M_int8_C{nc}_int8coarse",
           lambda qq, idx, m, sm, sc, smt, ds, nc=nc: two_stage_search(
               qq, idx, m, sm, k=K, n_candidates=nc, scales=sc,
               use_pallas_coarse=True, approx_topk=True,
               summaries_t=smt, summaries_t_scale=ds), I8_ARGS)
st8.delete()
dsc.delete()
del st8, dsc, I8_ARGS

# free the slot-major copy before the hierarchical section (it is only
# used by the two-stage coarse sweep; 1.9 GiB of the 16 GiB HBM)
summ_t.delete()
del summ_t


# ---- hierarchical 3-stage over the cluster-ordered index -------------------
from ravqa_tpu.retrieval.coarse import (block_summaries, block_summaries_t,
                                        hierarchical_search)

BLOCK = 64
bsum = block_summaries(summ, block_size=BLOCK, n_block_summary=4).astype(dt)
bsum = jax.block_until_ready(bsum)
# slot-major padded copy: stage 0 rides the coarse-sweep kernel
bsum_t = jax.block_until_ready(jax.jit(block_summaries_t)(bsum))
print(f"block summaries: {bsum.shape} (+ slot-major {bsum_t.shape})",
      flush=True)

_, hrows = hierarchical_search(q, index8, mask, summ, bsum, k=K,
                               n_blocks=128, n_candidates=1024,
                               block_size=BLOCK, scales=scales,
                               approx_topk=True, block_summ_t=bsum_t)
htop1 = float(np.mean(np.asarray(hrows)[:, 0] == np.asarray(qidx)))
print(f"hierarchical self-retrieval top-1: {htop1:.2f}", flush=True)


H_ARGS = (index8, mask, summ, bsum, bsum_t, scales)
for nb_, nc in ((128, 1024), (64, 256), (32, 256)):
    timeit(f"hier_1M_int8_B{nb_}_C{nc}",
           lambda qq, idx, m, sm, bm, bmt, sc, nb_=nb_, nc=nc:
           hierarchical_search(
               qq, idx, m, sm, bm, k=K, n_blocks=nb_, n_candidates=nc,
               block_size=BLOCK, scales=sc,
               approx_topk=True, block_summ_t=bmt), H_ARGS)

# ---- stage-1 int8 summaries (coarse_int8): the stage-1 gather of the
# selected blocks' doc summaries is the dominant hierarchical pruning
# term (n_blocks*block_size*S*dim bytes/query out of HBM) — the int8
# copy (ops.quant.quantize_summaries_int8) moves half the bf16 bytes,
# with the per-doc scale applied order-exactly after the max/sum.
from ravqa_tpu.ops.quant import quantize_summaries_int8

si8, ssc = jax.block_until_ready(quantize_summaries_int8(summ))
# the bf16 summaries are dead from here on (stage 1 reads the int8
# copy, stage 0 the block summaries) — free 1 GiB of HBM
summ.delete()
del summ, H_ARGS
_, hrows_s1 = hierarchical_search(q, index8, mask, None, bsum, k=K,
                                  n_blocks=128, n_candidates=1024,
                                  block_size=BLOCK, scales=scales,
                                  approx_topk=True, block_summ_t=bsum_t,
                                  summ_int8=si8, summ_scale=ssc)
htop1_s1 = float(np.mean(np.asarray(hrows_s1)[:, 0] == np.asarray(qidx)))
print(f"hierarchical self-retrieval top-1 (int8 stage 1): {htop1_s1:.2f}",
      flush=True)
HS1_ARGS = (index8, mask, bsum, bsum_t, scales, si8, ssc)
for nb_, nc in ((128, 1024), (64, 256), (32, 256)):
    timeit(f"hier_1M_int8_B{nb_}_C{nc}_int8stage1",
           lambda qq, idx, m, bm, bmt, sc, s8, ss, nb_=nb_, nc=nc:
           hierarchical_search(
               qq, idx, m, None, bm, k=K, n_blocks=nb_, n_candidates=nc,
               block_size=BLOCK, scales=sc,
               approx_topk=True, block_summ_t=bmt,
               summ_int8=s8, summ_scale=ss), HS1_ARGS)

# ---- fused stage-1 kernel (ops.maxsim.stage1_sweep_pallas): streams
# each query's selected blocks HBM->VMEM via scalar-prefetch DMA — no
# gathered copy, no dot intermediate. int8 rows + per-doc dscale.
if os.environ.get("RAVQA_SKIP_S1K"):
    print("skipping stage-1 kernel section (RAVQA_SKIP_S1K)", flush=True)
    sys.exit(0)
from ravqa_tpu.ops.maxsim import stage1_rows

rows_i8 = jax.block_until_ready(
    jax.jit(lambda s: stage1_rows(s, BLOCK))(si8))
si8.delete()
del si8, HS1_ARGS
_, hrows_k = hierarchical_search(q, index8, mask, None, bsum, k=K,
                                 n_blocks=128, n_candidates=1024,
                                 block_size=BLOCK, scales=scales,
                                 approx_topk=True, block_summ_t=bsum_t,
                                 summ_rows=rows_i8, summ_scale=ssc)
htop1_k = float(np.mean(np.asarray(hrows_k)[:, 0] == np.asarray(qidx)))
print(f"hierarchical self-retrieval top-1 (stage-1 kernel): {htop1_k:.2f}",
      flush=True)
HK_ARGS = (index8, mask, bsum, bsum_t, scales, rows_i8, ssc)
for nb_, nc in ((128, 1024), (64, 256), (32, 256)):
    timeit(f"hier_1M_int8_B{nb_}_C{nc}_s1kernel",
           lambda qq, idx, m, bm, bmt, sc, rw, ss, nb_=nb_, nc=nc:
           hierarchical_search(
               qq, idx, m, None, bm, k=K, n_blocks=nb_, n_candidates=nc,
               block_size=BLOCK, scales=sc,
               approx_topk=True, block_summ_t=bmt,
               summ_rows=rw, summ_scale=ss), HK_ARGS)
