"""Recall/QPS frontier at the 112k headline shape (VERDICT r3 next-8).

Sweeps the hierarchical pruning knobs (n_blocks, n_candidates) on the
exact bench.py corpus/protocol (cluster-ordered 112640 x 128 x 128 bf16,
S=8 doc summaries, block 64, stage-0 coarse-sweep kernel + approx cuts),
measuring recall@10 / top-1 vs EXACT fused-MaxSim over 128 queries and
QPS/chip over scan-chained batches of 32. Goal: a >= 0.995 recall@10
operating point and the 3-point frontier table for README.

Run: python scripts/frontier_112k.py    (real TPU)
"""

import sys
import time

import numpy as np

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp

from ravqa_tpu.ops.maxsim import maxsim_search_pallas, stage1_rows
from ravqa_tpu.retrieval.coarse import (block_summaries, block_summaries_t,
                                        hierarchical_search, summarize_docs)

N, LD, DIM = 112_640, 128, 128
B, LQ, K = 32, 32, 10
N_TOPICS, BLOCK, S = 2048, 64, 8
ITERS = 64
dt = jnp.bfloat16


@jax.jit
def make_index(key):
    kt, kn, ka = jax.random.split(key, 3)
    topics = jax.random.normal(kt, (N_TOPICS, DIM), dt)
    topics = topics * jax.lax.rsqrt(
        jnp.sum(topics.astype(jnp.float32) ** 2, -1,
                keepdims=True) + 1e-9).astype(dt)
    assign = jnp.sort(jax.random.randint(ka, (N,), 0, N_TOPICS))
    t = topics[assign][:, None, :] + (0.3 * jax.random.normal(
        kn, (N, LD, DIM), dt)).astype(dt)
    sq = jnp.sum(t.astype(jnp.float32) ** 2, -1, keepdims=True)
    return (t * jax.lax.rsqrt(sq + 1e-9).astype(dt)).astype(dt)


@jax.jit
def make_queries(key, index):
    ki, kn = jax.random.split(key)
    qidx = jax.random.randint(ki, (B,), 0, N)
    qt = index[qidx, :LQ].astype(jnp.float32) \
        + 0.1 * jax.random.normal(kn, (B, LQ, DIM))
    qt = qt * jax.lax.rsqrt(jnp.sum(qt ** 2, -1, keepdims=True) + 1e-9)
    return qt.astype(dt)


t0 = time.time()
index = jax.block_until_ready(make_index(jax.random.PRNGKey(0)))
mask = jnp.ones((N, LD), jnp.float32)
summ = summarize_docs(index, mask, n_summary=S, iters=4).astype(dt)
bsum = jax.block_until_ready(
    block_summaries(summ, block_size=BLOCK, n_block_summary=4).astype(dt))
bsum_t = jax.block_until_ready(jax.jit(block_summaries_t)(bsum))
rows_bf16 = jax.block_until_ready(
    jax.jit(stage1_rows, static_argnums=1)(summ, BLOCK))
print(f"112k index + summaries built in {time.time() - t0:.0f}s",
      flush=True)

# 4 independent query batches (128 queries) for the recall estimate;
# batch 0 also drives the timing
qs = [jax.block_until_ready(make_queries(jax.random.PRNGKey(1 + i), index))
      for i in range(4)]
exact_tops = []
for q in qs:
    es = np.asarray(maxsim_search_pallas(q, index, mask, tile_d=64))
    exact_tops.append(np.argsort(-es, 1)[:, :K])


def measure(name, nb, c, kernel):
    kw = dict(k=K, n_blocks=nb, n_candidates=c, block_size=BLOCK,
              approx_topk=True, block_summ_t=bsum_t)
    if kernel:
        fn = lambda qq, idx, m, bm, bmt, rw: hierarchical_search(
            qq, idx, m, None, bm, block_summ_t=bmt, summ_rows=rw, **{
                kk: vv for kk, vv in kw.items() if kk != "block_summ_t"})
        args = (index, mask, bsum, bsum_t, rows_bf16)
    else:
        fn = lambda qq, idx, m, sm, bm, bmt: hierarchical_search(
            qq, idx, m, sm, bm, block_summ_t=bmt, **{
                kk: vv for kk, vv in kw.items() if kk != "block_summ_t"})
        args = (index, mask, summ, bsum, bsum_t)
    hits = t1 = cnt = 0
    for q, et in zip(qs, exact_tops):
        rws = np.asarray(fn(q, *args)[1])
        hits += sum(len(set(rws[i]) & set(et[i])) for i in range(B))
        t1 += int((rws[:, 0] == et[:, 0]).sum())
        cnt += B
    recall, top1 = hits / (cnt * K), t1 / cnt

    @jax.jit
    def run(qq0, *arrs):
        def body(qq, _):
            s, _ = fn(qq, *arrs)
            return qq + (s[:, 0] * 1e-9).astype(qq.dtype)[:, None, None], ()
        qq, _ = jax.lax.scan(body, qq0, None, length=ITERS)
        return qq[:1, :1, :1]

    _ = np.asarray(run(qs[0], *args))
    t0 = time.perf_counter()
    _ = np.asarray(run(qs[0], *args))
    dt_s = time.perf_counter() - t0
    qps = B * ITERS / dt_s
    print(f"{name}: recall@10={recall:.4f} top1={top1:.3f} "
          f"{qps:.0f} QPS/chip ({dt_s / ITERS * 1e3:.2f} ms/batch)",
          flush=True)
    return recall, top1, qps


print("== hierarchical frontier (nb, C) x stage-1 {xla, kernel} ==",
      flush=True)
for nb, c in ((16, 256), (32, 512), (64, 1024), (128, 2048)):
    measure(f"hier_nb{nb}_C{c}", nb, c, kernel=False)
    measure(f"hier_nb{nb}_C{c}_s1k", nb, c, kernel=True)
