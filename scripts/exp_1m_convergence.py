"""Rank convergence of the pruned hierarchical search at 1M docs.

The 112k frontier (scripts/frontier_112k.py + frontier_tie_noise.py)
showed recall is FLAT across (n_blocks, C) — the pruning cuts are not
the loss term; the shipped preset is exactly lossless vs a
matched-numerics exact reference. This script asks the same question at
the 1M scale for the RESIDUAL codec: if the top-10 at C=256 already
equals the top-10 at C=4096+, then the fast preset (B64/C256,
8.5-9.5k QPS/chip) IS the 1M operating point and the C=1024 preset's
extra fine-stage work buys nothing.

Protocol: one flat-8192 residual index (same construction as
scripts/bench_1m_residual.py), 128 self-retrieval queries in 4 batches,
hierarchical_search at growing (n_blocks, C) presets, ALL through the
same XLA fine stage (one backend -> no bf16 tie-breaking noise between
presets, the 112k lesson). Reported per preset vs the largest preset:
top-10 overlap, top-1 agreement, self-retrieval top-1.

Run: python scripts/exp_1m_convergence.py
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp

from ravqa_tpu.ops.residual import (_kmeans, compress_flat, pack_records,
                                    record_bytes)
from ravqa_tpu.retrieval.coarse import (block_summaries, block_summaries_t,
                                        hierarchical_search, summarize_docs)

N, LD, DIM = 1_000_448, 64, 128
S_SUMM = 4
NQ, B, LQ, K = 128, 32, 32, 10
N_TOPICS = 8192
SLAB = 62_528
NBITS = 2
N_CENT = 8192
dt = jnp.bfloat16

PRESETS = ((16, 256), (32, 512), (64, 1024), (128, 2048), (256, 4096))


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


@jax.jit
def make_queries(qkey, key, topics):
    base = slab_tokens(key, 0, topics)[:NQ, :LQ].astype(jnp.float32)
    qt = base + 0.1 * jax.random.normal(qkey, (NQ, LQ, DIM))
    qt = qt * jax.lax.rsqrt(jnp.sum(qt ** 2, -1, keepdims=True) + 1e-9)
    return qt.astype(dt)


qall = np.asarray(make_queries(jax.random.PRNGKey(1), key, topics))
qidx = np.arange(NQ)

rows_by_preset = {}
for nb_, nc in PRESETS:
    t0 = time.time()
    outs = []
    for s in range(0, NQ, B):
        _, r = hierarchical_search(
            jnp.asarray(qall[s:s + B]), None, mask, summ, bsum, k=K,
            n_blocks=nb_, n_candidates=nc, block_size=BLOCK,
            use_pallas_residual=False, records=records,
            centroids=centroids, bucket_weights=weights, nbits=NBITS,
            approx_topk=True, block_summ_t=bsum_t)
        outs.append(np.asarray(r))
    rows_by_preset[(nb_, nc)] = np.concatenate(outs)
    print(f"nb{nb_}/C{nc} done in {time.time() - t0:.0f}s", flush=True)

ref = rows_by_preset[PRESETS[-1]]
print(f"\npreset           vs nb{PRESETS[-1][0]}/C{PRESETS[-1][1]}:"
      "  top10_overlap  top1_agree  self_top1", flush=True)
for p in PRESETS:
    rows = rows_by_preset[p]
    ov = np.mean([len(set(rows[i, :10]) & set(ref[i, :10])) / 10
                  for i in range(NQ)])
    t1 = float(np.mean(rows[:, 0] == ref[:, 0]))
    st1 = float(np.mean(rows[:, 0] == qidx))
    print(f"nb{p[0]:>3}/C{p[1]:<5}      {ov:.4f}        {t1:.3f}      "
          f"{st1:.3f}", flush=True)
