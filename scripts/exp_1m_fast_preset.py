"""Time the rank-converged small-nb presets on the 1M residual index.

exp_1m_convergence.py measured PERFECT top-10 convergence (overlap
1.0000 vs nb256/C4096) all the way down to nb16/C256 at 1M docs — so
the operative question is how fast the small presets go with the full
pruning config (int8 stage-0 block sweep + fused int8 stage-1 kernel).
Stage-1 cost scales with n_blocks (it gathers nb*block_size docs'
summaries per query), so nb64 -> nb16 cuts the dominant gather 4x.

Run: python scripts/exp_1m_fast_preset.py
"""

import sys
import time

import numpy as np

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp

from ravqa_tpu.ops.maxsim import stage1_rows
from ravqa_tpu.ops.quant import (quantize_summaries_int8,
                                 quantize_summaries_t_int8)
from ravqa_tpu.ops.residual import (_kmeans, compress_flat, pack_records,
                                    record_bytes)
from ravqa_tpu.retrieval.coarse import (block_summaries, block_summaries_t,
                                        hierarchical_search, summarize_docs)

N, LD, DIM = 1_000_448, 64, 128
S_SUMM = 4
B, LQ, K = 32, 32, 10
N_TOPICS = 8192
SLAB = 62_528
NBITS = 2
N_CENT = 8192
dt = jnp.bfloat16


@jax.jit
def make_topics(key):
    t = jax.random.normal(key, (N_TOPICS, DIM), dt)
    return t * jax.lax.rsqrt(jnp.sum(t.astype(jnp.float32) ** 2, -1,
                                     keepdims=True) + 1e-9).astype(dt)


def slab_tokens(key, i, topics):
    kn = jax.random.fold_in(key, i)
    gidx = i * SLAB + jnp.arange(SLAB, dtype=jnp.int32)
    assign = jnp.clip(jnp.floor(gidx.astype(jnp.float32)
                                * (N_TOPICS / N)).astype(jnp.int32),
                      0, N_TOPICS - 1)
    t = topics[assign][:, None, :] + (0.3 * jax.random.normal(
        kn, (SLAB, LD, DIM), dt)).astype(dt)
    sq = jnp.sum(t.astype(jnp.float32) ** 2, -1, keepdims=True)
    return (t * jax.lax.rsqrt(sq + 1e-9).astype(dt)).astype(dt)


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
centroids = _kmeans(sample[:114688], N_CENT, 8)
codes_h = jnp.argmax(held @ centroids.T, axis=-1)
resid = np.asarray(held - centroids[codes_h]).reshape(-1)
nb = 2 ** NBITS
cutoffs = jnp.asarray(np.quantile(resid, np.arange(1, nb) / nb)
                      .astype(np.float32))
weights = jnp.asarray(np.quantile(resid, (np.arange(nb) + 0.5) / nb)
                      .astype(np.float32))
print(f"codec trained in {time.time() - t0:.0f}s", flush=True)

REC = record_bytes(LD, DIM, NBITS)


@jax.jit
def build_index(key, topics, centroids, cutoffs, weights_d):
    def body(i, carry):
        records, smm = carry
        tn = slab_tokens(key, i, topics)
        flat = tn.astype(jnp.float32).reshape(-1, DIM)
        code, pk, scale = compress_flat(flat, centroids, cutoffs,
                                        weights_d, NBITS)
        rec = pack_records(code.reshape(SLAB, LD),
                           scale.reshape(SLAB, LD).astype(jnp.bfloat16),
                           pk.reshape(SLAB, LD, -1))
        sm = summarize_docs(tn, jnp.ones((SLAB, LD), jnp.int8),
                            n_summary=S_SUMM, iters=2).astype(dt)
        start = i * SLAB
        return (jax.lax.dynamic_update_slice(records, rec, (start, 0)),
                jax.lax.dynamic_update_slice(smm, sm, (start, 0, 0)))
    init = (jnp.zeros((N, REC), jnp.uint8),
            jnp.zeros((N, S_SUMM, DIM), dt))
    return jax.lax.fori_loop(0, N // SLAB, body, init)


t0 = time.time()
records, summ = build_index(key, topics, centroids, cutoffs, weights)
records = jax.block_until_ready(records)
mask = jnp.ones((N, LD), jnp.int8)
print(f"index built in {time.time() - t0:.0f}s", flush=True)

BLOCK = 64
bsum = jax.block_until_ready(
    block_summaries(summ, block_size=BLOCK, n_block_summary=4).astype(dt))
bsum_t = jax.block_until_ready(jax.jit(block_summaries_t)(bsum))
bst8, bdsc = jax.block_until_ready(quantize_summaries_t_int8(bsum_t))
si8, ssc = jax.block_until_ready(quantize_summaries_int8(summ))
rows_i8 = jax.block_until_ready(
    jax.jit(lambda s: stage1_rows(s, BLOCK))(si8))
si8.delete()
summ.delete()


@jax.jit
def make_queries(qkey, key, topics):
    base = slab_tokens(key, 0, topics)[:B, :LQ].astype(jnp.float32)
    qt = base + 0.1 * jax.random.normal(qkey, (B, LQ, DIM))
    qt = qt * jax.lax.rsqrt(jnp.sum(qt ** 2, -1, keepdims=True) + 1e-9)
    return qt.astype(dt)


q = make_queries(jax.random.PRNGKey(1), key, topics)
qidx = np.arange(B)


def search(qq, m, bm, bmt, ds, rw, ss, recs, cent, bw, *, nb_, nc):
    return hierarchical_search(
        qq, None, m, None, bm, k=K, n_blocks=nb_, n_candidates=nc,
        block_size=BLOCK, use_pallas_residual=False, records=recs,
        centroids=cent, bucket_weights=bw, nbits=NBITS, approx_topk=True,
        block_summ_t=bmt, block_summ_t_scale=ds, summ_rows=rw,
        summ_scale=ss)


ARGS = (mask, bsum, bst8, bdsc, rows_i8, ssc, records, centroids, weights)

for nb_, nc in ((64, 256), (32, 256), (16, 256)):
    _, r = search(q, *ARGS, nb_=nb_, nc=nc)
    st1 = float(np.mean(np.asarray(r)[:, 0] == qidx))

    @jax.jit
    def run(qq0, *arrs, nb_=nb_, nc=nc):
        def body(qq, _):
            s, _ = search(qq, *arrs, nb_=nb_, nc=nc)
            return qq + (s[:, 0] * 1e-9).astype(qq.dtype)[:, None, None], ()
        qq, _ = jax.lax.scan(body, qq0, None, length=32)
        return qq[:1, :1, :1]

    _ = np.asarray(run(q, *ARGS))
    t0 = time.perf_counter()
    _ = np.asarray(run(q, *ARGS))
    dt_s = (time.perf_counter() - t0) / 32
    print(f"hier_1M_residual nb{nb_}/C{nc} s1kernel+int8s0: "
          f"{B / dt_s:.0f} QPS/chip ({dt_s * 1e3:.2f} ms/batch) "
          f"self_top1 {st1:.2f}", flush=True)
