"""Shared synthetic-1M-corpus machinery for the on-chip bench scripts.

One copy of the cluster-ordered topic corpus generator, codec training,
and the slabbed on-device index builders (HBM-fragmentation-safe: the
whole index is written inside ONE jitted fori_loop — see bench_1m.py).
The historical experiment scripts (exp_1m_*.py, bench_1m_residual.py)
keep their inlined copies as frozen measurement records; new scripts
import from here.
"""

import time

import numpy as np

import jax
import jax.numpy as jnp

from ravqa_tpu.ops.residual import (_kmeans, compress_flat, pack_records,
                                    record_bytes)
from ravqa_tpu.retrieval import TokenIndex
from ravqa_tpu.retrieval.coarse import block_summaries, summarize_docs

N, LD, DIM = 1_000_448, 64, 128
S_SUMM = 4
N_TOPICS = 8192
SLAB = 62_528
NBITS = 2
N_CENT = 8192
BLOCK = 64
dt = jnp.bfloat16


@jax.jit
def make_topics(key):
    t = jax.random.normal(key, (N_TOPICS, DIM), dt)
    return t * jax.lax.rsqrt(jnp.sum(t.astype(jnp.float32) ** 2, -1,
                                     keepdims=True) + 1e-9).astype(dt)


def slab_tokens(key, i, topics):
    """Slab i of the cluster-ordered corpus (contiguous ~N/N_TOPICS-doc
    runs per topic — models coarse.cluster_order applied at build
    time). gidx*N_TOPICS would overflow int32; f32 has ample precision
    here (values <= N_TOPICS with ~0.008 steps)."""
    kn = jax.random.fold_in(key, i)
    gidx = i * SLAB + jnp.arange(SLAB, dtype=jnp.int32)
    assign = jnp.clip(jnp.floor(gidx.astype(jnp.float32)
                                * (N_TOPICS / N)).astype(jnp.int32),
                      0, N_TOPICS - 1)
    t = topics[assign][:, None, :] + (0.3 * jax.random.normal(
        kn, (SLAB, LD, DIM), dt)).astype(dt)
    sq = jnp.sum(t.astype(jnp.float32) ** 2, -1, keepdims=True)
    return (t * jax.lax.rsqrt(sq + 1e-9).astype(dt)).astype(dt)


@jax.jit
def codec_sample(key, topics):
    t = slab_tokens(key, 0, topics).astype(jnp.float32)
    flat = t.reshape(-1, DIM)
    pick = jax.random.choice(jax.random.fold_in(key, 99),
                             flat.shape[0], (131072,), replace=False)
    return flat[pick]


def train_codec(key, topics):
    """(centroids, cutoffs, weights) for the nbits residual codec,
    trained on a held-out split of one corpus slab."""
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
    return centroids, cutoffs, weights


def _bsum(summ):
    return jax.jit(lambda s: block_summaries(
        s, block_size=BLOCK, n_block_summary=4).astype(dt))(summ)


def build_int8_index(key, topics, sh):
    """int8-token 1M TokenIndex (the throughput codec)."""
    @jax.jit
    def build(key, topics):
        def body(i, carry):
            idx8, scl, smm = carry
            tn = slab_tokens(key, i, topics)
            t32 = tn.astype(jnp.float32)
            sc = jnp.maximum(jnp.max(jnp.abs(t32), -1), 1e-8) / 127.0
            q8 = jnp.round(t32 / sc[..., None]).astype(jnp.int8)
            sm = summarize_docs(tn, jnp.ones((SLAB, LD), jnp.int8),
                                n_summary=S_SUMM, iters=2).astype(dt)
            start = i * SLAB
            return (jax.lax.dynamic_update_slice(idx8, q8, (start, 0, 0)),
                    jax.lax.dynamic_update_slice(
                        scl, sc.astype(jnp.float32), (start, 0)),
                    jax.lax.dynamic_update_slice(smm, sm, (start, 0, 0)))
        init = (jnp.zeros((N, LD, DIM), jnp.int8),
                jnp.zeros((N, LD), jnp.float32),
                jnp.zeros((N, S_SUMM, DIM), dt))
        return jax.lax.fori_loop(0, N // SLAB, body, init)

    t0 = time.time()
    index8, scales, summ = jax.block_until_ready(build(key, topics))
    print(f"int8 index built in {time.time() - t0:.0f}s", flush=True)
    return TokenIndex(
        tokens=jax.device_put(index8, sh),
        mask=jax.device_put(jnp.ones((N, LD), jnp.int8), sh),
        pids=np.arange(N, dtype=np.int64), num_docs=N,
        scales=jax.device_put(scales, sh),
        summaries=jax.device_put(summ, sh),
        block_summaries=jax.device_put(_bsum(summ), sh), block_size=BLOCK)


def build_residual_index(key, topics, sh):
    """nbits=2 residual-codec 1M TokenIndex (packed per-doc records)."""
    t0 = time.time()
    centroids, cutoffs, weights = train_codec(key, topics)
    print(f"codec trained in {time.time() - t0:.0f}s", flush=True)
    rec_w = record_bytes(LD, DIM, NBITS)

    @jax.jit
    def build(key, topics, centroids, cutoffs, weights_d):
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
        init = (jnp.zeros((N, rec_w), jnp.uint8),
                jnp.zeros((N, S_SUMM, DIM), dt))
        return jax.lax.fori_loop(0, N // SLAB, body, init)

    t0 = time.time()
    records, summ = build(key, topics, centroids, cutoffs, weights)
    records = jax.block_until_ready(records)
    print(f"residual index built in {time.time() - t0:.0f}s", flush=True)
    return TokenIndex(
        tokens=None, mask=jax.device_put(jnp.ones((N, LD), jnp.int8), sh),
        pids=np.arange(N, dtype=np.int64), num_docs=N,
        summaries=jax.device_put(summ, sh),
        block_summaries=jax.device_put(_bsum(summ), sh), block_size=BLOCK,
        records=jax.device_put(records, sh),
        codec_centroids=centroids, codec_weights=weights, nbits=NBITS)
