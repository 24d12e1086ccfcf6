"""1M-passage retrieval on ONE v5e chip with the RESIDUAL codec.

VERDICT r1 item 6: the int8 index (8 GiB at 1M x 64 x 128) caps corpus size
per chip; the residual codec (ops.residual — centroid code + nbits=2
bucketized residuals) stores the same corpus in

    records    1M x 2304 B uint8        2.15 GiB   (uint16 code + bf16
               reconstruction-norm scale + 32 residual bytes per token,
               packed per doc — ops.residual.pack_records)
    summaries  1M x 4 x 128 bf16        0.95 GiB   (coarse stage)
    ------------------------------------------------
    ~3.1 GiB   (< 4 GiB target; 7.4x vs the 16 GiB bf16 token store,
                2.7x vs int8+scales+summaries)

Search quality is reported as self-retrieval top-1 (noisy query -> its own
doc among 1M) for both pruned modes, matching scripts/bench_1m.py's metric.

Run: python scripts/bench_1m_residual.py
Capacity configuration (4M docs on one 16 GiB v5e chip, ~10.5 GiB:
records 8.59 GiB + S=2 summaries 1.91 GiB):
    BENCH_N=4001792 BENCH_NSUMM=2 python scripts/bench_1m_residual.py
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp

from ravqa_tpu.ops.residual import _kmeans, compress_flat, pack_records, record_bytes
from ravqa_tpu.retrieval.coarse import (block_summaries, block_summaries_t,
                                        hierarchical_search,
                                        summarize_docs, two_stage_search)

N, LD, DIM = int(os.environ.get("BENCH_N", 1_000_448)), 64, 128
S_SUMM = int(os.environ.get("BENCH_NSUMM", 4))
B, LQ, K = 32, 32, 10
N_TOPICS = 8192
SLAB = 62_528
assert N % SLAB == 0
NBITS = int(os.environ.get("BENCH_NBITS", 2))
# BENCH_FACTORED="256x256": train the FACTORED additive codebook
# (ops.residual.train_codec_factored math, in-graph) instead of flat
# k-means — greedy k1+k2-dot assignment makes compression ~16x cheaper
# and the fused decompress+MaxSim kernel runs at ANY effective K (its
# centroid term costs k1+k2 two-hot columns, not K), so the fused
# variants time for real instead of being gated off at K=8192.
FACTORED = os.environ.get("BENCH_FACTORED")
if FACTORED:
    K1, K2 = map(int, FACTORED.lower().split("x"))
    N_CENT = K1 * K2
    assert N_CENT <= 65536, \
        "pack_records stores codes as uint16 — k1*k2 > 65536 wraps silently"
else:
    N_CENT = int(os.environ.get("BENCH_NCENT", 8192))
dt = jnp.bfloat16


@jax.jit
def make_topics(key):
    t = jax.random.normal(key, (N_TOPICS, DIM), dt)
    return t * jax.lax.rsqrt(jnp.sum(t.astype(jnp.float32) ** 2, -1,
                                     keepdims=True) + 1e-9).astype(dt)


def slab_tokens(key, i, topics):
    """Deterministic slab of cluster-ordered doc tokens (same construction
    as scripts/bench_1m.py)."""
    kn = jax.random.fold_in(key, i)
    gidx = i * SLAB + jnp.arange(SLAB, dtype=jnp.int32)
    assign = jnp.clip(jnp.floor(gidx.astype(jnp.float32)
                                * (N_TOPICS / N)).astype(jnp.int32),
                      0, N_TOPICS - 1)
    t = topics[assign][:, None, :] + (0.3 * jax.random.normal(
        kn, (SLAB, LD, DIM), dt)).astype(dt)
    sq = jnp.sum(t.astype(jnp.float32) ** 2, -1, keepdims=True)
    return (t * jax.lax.rsqrt(sq + 1e-9).astype(dt)).astype(dt)


# ---- 1. train the codec on one slab's token sample (device k-means,
#         host quantiles) ---------------------------------------------------
t0 = time.time()
key = jax.random.PRNGKey(7)
topics = make_topics(key)


@jax.jit
def codec_sample(key, topics):
    t = slab_tokens(key, 0, topics).astype(jnp.float32)
    flat = t.reshape(-1, DIM)
    pick = jax.random.choice(jax.random.fold_in(key, 99),
                             flat.shape[0], (131072,), replace=False)
    return flat[pick]


sample = codec_sample(key, topics)
held = sample[114688:]
if FACTORED:
    from ravqa_tpu.ops.residual import (_kmeans_l2, _refine_factored,
                                        assign_factored)
    tr = sample[:114688]
    coarse_f = _kmeans(tr, K1, 8)
    resid0 = tr - coarse_f[jnp.argmax(tr @ coarse_f.T, axis=-1)]
    fine_f = _kmeans_l2(resid0, K2, 8)
    coarse_f, fine_f = _refine_factored(tr, coarse_f, fine_f, 4)
    centroids = jnp.reshape(coarse_f[:, None, :] + fine_f[None, :, :],
                            (N_CENT, DIM))
    codes_h = assign_factored(held, coarse_f, fine_f)
else:
    coarse_f = fine_f = None
    centroids = _kmeans(sample[:114688], N_CENT, 8)
    codes_h = jnp.argmax(held @ centroids.T, axis=-1)
resid = np.asarray(held - centroids[codes_h]).reshape(-1)
nb = 2 ** NBITS
cutoffs = jnp.asarray(np.quantile(resid, np.arange(1, nb) / nb)
                      .astype(np.float32))
weights = jnp.asarray(np.quantile(resid, (np.arange(nb) + 0.5) / nb)
                      .astype(np.float32))
print(f"codec trained ({N_CENT} centroids"
      + (f" = {K1}x{K2} factored" if FACTORED else "")
      + f", nbits={NBITS}) in {time.time() - t0:.0f}s", flush=True)

if FACTORED:
    # bind the codec factors once: every search call below then routes
    # its fine stage through the factored fused kernel when
    # use_pallas_residual is set (the factors are ~128 KB — fine as jit
    # closure constants, unlike the GiB index arrays)
    import functools as _ft
    two_stage_search = _ft.partial(two_stage_search,
                                   codec_coarse=coarse_f,
                                   codec_fine=fine_f)
    hierarchical_search = _ft.partial(hierarchical_search,
                                      codec_coarse=coarse_f,
                                      codec_fine=fine_f)


# ---- 2. build + compress the index in ONE jitted program -------------------
# per-doc PACKED RECORD rows [codes uint16 | scales bf16 | residual
# bytes] — the fine stage gathers candidates with one wide-row take
# (ops.residual.pack_records; measured 1.9-2.7x over separate arrays)
REC = record_bytes(LD, DIM, NBITS)


@jax.jit
def build_index(key, topics, centroids, cutoffs, weights_d):
    def body(i, carry):
        records, smm = carry
        tn = slab_tokens(key, i, topics)
        flat = tn.astype(jnp.float32).reshape(-1, DIM)
        # codec core shared with production compress (ops.residual);
        # factored codecs pre-assign greedily (k1+k2 dots vs k1*k2)
        pre = (assign_factored(flat, coarse_f, fine_f)
               if FACTORED else None)
        code, pk, scale = compress_flat(flat, centroids, cutoffs,
                                        weights_d, NBITS, codes=pre)
        rec = pack_records(code.reshape(SLAB, LD),
                           scale.reshape(SLAB, LD).astype(jnp.bfloat16),
                           pk.reshape(SLAB, LD, -1))
        sm = summarize_docs(tn, jnp.ones((SLAB, LD), jnp.int8),
                            n_summary=S_SUMM, iters=2).astype(dt)
        start = i * SLAB
        records = jax.lax.dynamic_update_slice(records, rec, (start, 0))
        smm = jax.lax.dynamic_update_slice(smm, sm, (start, 0, 0))
        return records, smm

    init = (jnp.zeros((N, REC), jnp.uint8),
            jnp.zeros((N, S_SUMM, DIM), dt))
    return jax.lax.fori_loop(0, N // SLAB, body, init)


t0 = time.time()
records, summ = build_index(key, topics, centroids, cutoffs, weights)
records = jax.block_until_ready(records)
mask = jnp.ones((N, LD), jnp.int8)
gib = (records.size + summ.size * 2) / 2 ** 30
print(f"{N} residual index built: {gib:.2f} GiB total "
      f"(records {records.size / 2**30:.2f} (uint16 codes + bf16 scales "
      f"+ nbits={NBITS} bytes) + summaries {summ.size * 2 / 2**30:.2f})"
      f" in {time.time() - t0:.0f}s", flush=True)


# ---- 3. queries = noisy reconstructions of the first B docs ---------------
@jax.jit
def make_queries(qkey, key, topics):
    base = slab_tokens(key, 0, topics)[:B, :LQ].astype(jnp.float32)
    qt = base + 0.1 * jax.random.normal(qkey, (B, LQ, DIM))
    qt = qt * jax.lax.rsqrt(jnp.sum(qt ** 2, -1, keepdims=True) + 1e-9)
    return qt.astype(dt)


q = make_queries(jax.random.PRNGKey(1), key, topics)
qidx = np.arange(B)

# slot-major summary copy for the chunked coarse-sweep kernel (9.1 ms
# at this S=4 shape vs 41-59 ms for the XLA einsum, which materializes
# the (N, S, B, Lq) f32 intermediate in HBM)
summ_t = jax.block_until_ready(jax.jit(lambda s: jnp.swapaxes(s, 0, 1))(summ))
s, rows = two_stage_search(q, None, mask, summ, k=K, n_candidates=1024,
                           use_pallas_coarse=True, approx_topk=True, summaries_t=summ_t,
                           use_pallas_residual=bool(FACTORED) or N_CENT <= 1024,
                           records=records, centroids=centroids,
                           bucket_weights=weights, nbits=NBITS)
top1 = float(np.mean(np.asarray(rows)[:, 0] == qidx))
print(f"two-stage self-retrieval top-1: {top1:.2f}", flush=True)
_, rows_cp = two_stage_search(q, None, mask, summ, k=K, n_candidates=1024,
                              use_pallas_coarse=True, approx_topk=True,
                              summaries_t=summ_t, centroid_prune=0 if FACTORED else 256,
                              use_pallas_residual=bool(FACTORED) or N_CENT <= 1024,
                              records=records, centroids=centroids,
                              bucket_weights=weights, nbits=NBITS)
top1_cp = float(np.mean(np.asarray(rows_cp)[:, 0] == qidx))
print(f"two-stage self-retrieval top-1 (centroid_prune=256): "
      f"{top1_cp:.2f}", flush=True)


def timeit(name, fn, args, iters=32):
    """fn(q, *args) -> (scores, rows). The index arrays ride as jit
    ARGUMENTS — closing over them would serialize GiBs into the HLO for
    the remote compiler (axon pitfall)."""
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


TS_ARGS = (mask, summ, records, centroids, weights, summ_t)
# the fused Pallas residual kernel is auto-gated to FLAT codebooks
# <= 1024 centroids (_fine_stage; its in-VMEM one-hot centroid matmul
# scales with N_CENT) — at this bench's flat N_CENT the fused flag would
# silently time the identical XLA path, so only run the honest variant.
# FACTORED codebooks un-gate the kernel (two-hot term: k1+k2 columns).
FUSED_MODES = (True, False) if (FACTORED or N_CENT <= 1024) else (False,)
if not FACTORED and N_CENT > 1024:
    print(f"fused residual kernel gated off (N_CENT={N_CENT} > 1024); "
          "timing the XLA fine stage only", flush=True)
for fused in FUSED_MODES:
    tag = "fused" if fused else "xla"
    # cp = PLAID-style centroid-only fine-stage cut (searcher auto: C//4)
    for nc, cp in (((1024, 0), (256, 0)) if FACTORED else
               ((1024, 0), (1024, 256), (256, 0), (256, 64))):
        timeit(f"two_stage_1M_residual_C{nc}_cp{cp}_{tag}",
               lambda qq, m, sm, recs, cent, bw, smt, nc=nc, cp=cp,
               fused=fused: two_stage_search(
                   qq, None, m, sm, k=K, n_candidates=nc,
                   # chunked slot-major sweep (coarse_sweep_pallas):
                   # 9.1 ms at this (1M x 4 summaries, B=32, Lq=32)
                   # shape vs 41-59 ms XLA einsum / 58-149 ms generic
                   # doc-major Pallas kernel
                   use_pallas_coarse=True, approx_topk=True, summaries_t=smt,
                   use_pallas_residual=fused, centroid_prune=cp,
                   records=recs, centroids=cent,
                   bucket_weights=bw, nbits=NBITS), TS_ARGS)

# int8 coarse sweep (ops.quant.quantize_summaries_t_int8 + the kernel's
# MXU int8 branch: 2x bf16 matmul throughput, half the HBM read).
# Candidate generation only — the fine stage is identical.
from ravqa_tpu.ops.quant import quantize_summaries_t_int8

st8, dsc = jax.block_until_ready(quantize_summaries_t_int8(summ_t))
_, rows_i8 = two_stage_search(q, None, mask, summ, k=K, n_candidates=1024,
                              use_pallas_coarse=True, approx_topk=True,
                              summaries_t=st8, summaries_t_scale=dsc,
                              use_pallas_residual=False,
                              records=records, centroids=centroids,
                              bucket_weights=weights, nbits=NBITS)
top1_i8 = float(np.mean(np.asarray(rows_i8)[:, 0] == qidx))
print(f"two-stage self-retrieval top-1 (int8 coarse): {top1_i8:.2f}",
      flush=True)
I8_ARGS = (mask, summ, records, centroids, weights, st8, dsc)
for nc, cp in (((1024, 0), (256, 0)) if FACTORED else
               ((1024, 0), (1024, 256), (256, 0), (256, 64))):
    timeit(f"two_stage_1M_residual_C{nc}_cp{cp}_int8coarse",
           lambda qq, m, sm, recs, cent, bw, smt, ds, nc=nc, cp=cp:
           two_stage_search(
               qq, None, m, sm, k=K, n_candidates=nc,
               use_pallas_coarse=True, approx_topk=True,
               summaries_t=smt, summaries_t_scale=ds,
               use_pallas_residual=False, centroid_prune=cp,
               records=recs, centroids=cent,
               bucket_weights=bw, nbits=NBITS), I8_ARGS)
st8.delete()
dsc.delete()
del st8, dsc, I8_ARGS

# free the slot-major copy before the hierarchical section (only the
# two-stage coarse sweep reads it; residual HBM is tighter than int8's)
summ_t.delete()
del summ_t, TS_ARGS

BLOCK = 64
bsum = block_summaries(summ, block_size=BLOCK, n_block_summary=4).astype(dt)
bsum = jax.block_until_ready(bsum)
bsum_t = jax.block_until_ready(jax.jit(block_summaries_t)(bsum))

_, hrows = hierarchical_search(q, None, mask, summ, bsum, k=K,
                               n_blocks=128, n_candidates=1024,
                               block_size=BLOCK,
                               use_pallas_residual=bool(FACTORED) or N_CENT <= 1024,
                               records=records, centroids=centroids,
                               bucket_weights=weights, nbits=NBITS,
                               approx_topk=True, block_summ_t=bsum_t)
htop1 = float(np.mean(np.asarray(hrows)[:, 0] == qidx))
print(f"hierarchical self-retrieval top-1: {htop1:.2f}", flush=True)
_, hrows_cp = hierarchical_search(q, None, mask, summ, bsum, k=K,
                                  n_blocks=128, n_candidates=1024,
                                  block_size=BLOCK, centroid_prune=0 if FACTORED else 256,
                                  use_pallas_residual=bool(FACTORED) or N_CENT <= 1024,
                                  records=records, centroids=centroids,
                                  bucket_weights=weights, nbits=NBITS,
                                  approx_topk=True, block_summ_t=bsum_t)
htop1_cp = float(np.mean(np.asarray(hrows_cp)[:, 0] == qidx))
print(f"hierarchical self-retrieval top-1 (centroid_prune=256): "
      f"{htop1_cp:.2f}", flush=True)

H_ARGS = (mask, summ, bsum, bsum_t, records, centroids, weights)
for fused in FUSED_MODES:
    tag = "fused" if fused else "xla"
    for nb_, nc, cp in (((128, 1024, 0), (64, 256, 0)) if FACTORED else
                        ((128, 1024, 0), (128, 1024, 256),
                         (64, 256, 0), (64, 256, 64))):
        timeit(f"hier_1M_residual_B{nb_}_C{nc}_cp{cp}_{tag}",
               lambda qq, m, sm, bm, bmt, recs, cent, bw, nb_=nb_,
               nc=nc, cp=cp, fused=fused: hierarchical_search(
                   qq, None, m, sm, bm, k=K, n_blocks=nb_, n_candidates=nc,
                   block_size=BLOCK, use_pallas_residual=fused,
                   records=recs, centroids=cent, centroid_prune=cp,
                   bucket_weights=bw, nbits=NBITS,
                   approx_topk=True, block_summ_t=bmt), H_ARGS)

# hierarchical stage 0 through the int8 sweep branch (the padded
# slot-major block-summary copy is tiny — 16k blocks — so this mainly
# buys at much larger corpora; measure anyway for the record)
bst8, bdsc = jax.block_until_ready(quantize_summaries_t_int8(bsum_t))
_, hrows_i8 = hierarchical_search(q, None, mask, summ, bsum, k=K,
                                  n_blocks=128, n_candidates=1024,
                                  block_size=BLOCK,
                                  use_pallas_residual=False,
                                  records=records, centroids=centroids,
                                  bucket_weights=weights, nbits=NBITS,
                                  approx_topk=True, block_summ_t=bst8,
                                  block_summ_t_scale=bdsc)
htop1_i8 = float(np.mean(np.asarray(hrows_i8)[:, 0] == qidx))
print(f"hierarchical self-retrieval top-1 (int8 stage 0): {htop1_i8:.2f}",
      flush=True)
HI8_ARGS = (mask, summ, bsum, bst8, bdsc, records, centroids, weights)
for nb_, nc in ((128, 1024), (64, 256)):
    timeit(f"hier_1M_residual_B{nb_}_C{nc}_int8stage0",
           lambda qq, m, sm, bm, bmt, ds, recs, cent, bw, nb_=nb_, nc=nc:
           hierarchical_search(
               qq, None, m, sm, bm, k=K, n_blocks=nb_, n_candidates=nc,
               block_size=BLOCK, use_pallas_residual=False,
               records=recs, centroids=cent,
               bucket_weights=bw, nbits=NBITS,
               approx_topk=True, block_summ_t=bmt,
               block_summ_t_scale=ds), HI8_ARGS)

# ---- full int8-pruning config (what the searcher's coarse_int8=True
# runs): int8 stage 0 (bst8/bdsc) + int8 stage-1 summary gather
# (quantize_summaries_int8 — half the dominant gather's bytes) +
# centroid_prune on the fine stage.
from ravqa_tpu.ops.quant import quantize_summaries_int8

si8, ssc = jax.block_until_ready(quantize_summaries_int8(summ))
# the bf16 summaries are dead from here on (stage 1 reads the int8
# copy, stage 0 the block summaries) — residual HBM is the tight one
summ.delete()
del summ, H_ARGS, HI8_ARGS
_, hrows_full = hierarchical_search(q, None, mask, None, bsum, k=K,
                                    n_blocks=128, n_candidates=1024,
                                    block_size=BLOCK, centroid_prune=0 if FACTORED else 256,
                                    use_pallas_residual=False,
                                    records=records, centroids=centroids,
                                    bucket_weights=weights, nbits=NBITS,
                                    approx_topk=True, block_summ_t=bst8,
                                    block_summ_t_scale=bdsc,
                                    summ_int8=si8, summ_scale=ssc)
htop1_full = float(np.mean(np.asarray(hrows_full)[:, 0] == qidx))
print(f"hierarchical self-retrieval top-1 (int8 s0+s1, cp=256): "
      f"{htop1_full:.2f}", flush=True)
HF_ARGS = (mask, bsum, bst8, bdsc, si8, ssc, records, centroids, weights)
for nb_, nc, cp in ((128, 1024, 0), (128, 1024, 256),
                    (64, 256, 0), (64, 256, 64)):
    timeit(f"hier_1M_residual_B{nb_}_C{nc}_cp{cp}_int8s0s1",
           lambda qq, m, bm, bmt, ds, s8, ss, recs, cent, bw,
           nb_=nb_, nc=nc, cp=cp: hierarchical_search(
               qq, None, m, None, bm, k=K, n_blocks=nb_, n_candidates=nc,
               block_size=BLOCK, use_pallas_residual=False,
               records=recs, centroids=cent, centroid_prune=cp,
               bucket_weights=bw, nbits=NBITS,
               approx_topk=True, block_summ_t=bmt,
               block_summ_t_scale=ds,
               summ_int8=s8, summ_scale=ss), HF_ARGS)

# ---- fused stage-1 kernel on the residual index (scalar-prefetch
# block DMA; int8 rows + per-doc dscale; stage 0 int8, fine stage with
# and without the centroid prune)
if os.environ.get("RAVQA_SKIP_S1K"):
    print("skipping stage-1 kernel section (RAVQA_SKIP_S1K)", flush=True)
    sys.exit(0)
from ravqa_tpu.ops.maxsim import stage1_rows

rows_i8 = jax.block_until_ready(
    jax.jit(lambda s: stage1_rows(s, BLOCK))(si8))
si8.delete()
del si8, HF_ARGS
_, hrows_k = hierarchical_search(q, None, mask, None, bsum, k=K,
                                 n_blocks=128, n_candidates=1024,
                                 block_size=BLOCK, centroid_prune=0 if FACTORED else 256,
                                 use_pallas_residual=False,
                                 records=records, centroids=centroids,
                                 bucket_weights=weights, nbits=NBITS,
                                 approx_topk=True, block_summ_t=bst8,
                                 block_summ_t_scale=bdsc,
                                 summ_rows=rows_i8, summ_scale=ssc)
htop1_k = float(np.mean(np.asarray(hrows_k)[:, 0] == qidx))
print(f"hierarchical self-retrieval top-1 (stage-1 kernel, cp=256): "
      f"{htop1_k:.2f}", flush=True)
HK_ARGS = (mask, bsum, bst8, bdsc, rows_i8, ssc, records, centroids,
           weights)
for nb_, nc, cp in (((128, 1024, 0), (64, 256, 0)) if FACTORED else
                    ((128, 1024, 0), (128, 1024, 256),
                     (64, 256, 64))):
    timeit(f"hier_1M_residual_B{nb_}_C{nc}_cp{cp}_s1kernel",
           lambda qq, m, bm, bmt, ds, rw, ss, recs, cent, bw,
           nb_=nb_, nc=nc, cp=cp: hierarchical_search(
               qq, None, m, None, bm, k=K, n_blocks=nb_, n_candidates=nc,
               block_size=BLOCK, use_pallas_residual=False,
               records=recs, centroids=cent, centroid_prune=cp,
               bucket_weights=bw, nbits=NBITS,
               approx_topk=True, block_summ_t=bmt,
               block_summ_t_scale=ds,
               summ_rows=rw, summ_scale=ss), HK_ARGS)
