"""Frontier part 2: where does the flat 0.9945 recall@10 loss live?

Part 1 (scripts/frontier_112k.py) measured recall@10 = 0.9945 IDENTICAL
across (nb, C) from (16,256) to (128,2048) — the loss is not the block or
candidate cuts. Suspects: (a) the approx_max_k stage-0 cut
(recall_target=0.95 default), (b) the S=8 summary sweep itself missing
docs. This sweeps approx_recall / exact cuts on the shipped preset and
runs a two-stage diagnostic with an exact (B, N) top_k cut, which removes
(a) entirely.

Run: python scripts/frontier_112k_part2.py    (real TPU)
"""

import sys
import time

import numpy as np

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp

from ravqa_tpu.ops.maxsim import maxsim_search_pallas, stage1_rows
from ravqa_tpu.retrieval.coarse import (block_summaries, block_summaries_t,
                                        hierarchical_search, summarize_docs,
                                        two_stage_search)

N, LD, DIM = 112_640, 128, 128
B, LQ, K = 32, 32, 10
N_TOPICS, BLOCK = 2048, 64
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


def build_summ(s, iters):
    sm = summarize_docs(index, mask, n_summary=s, iters=iters).astype(dt)
    bm = jax.block_until_ready(
        block_summaries(sm, block_size=BLOCK, n_block_summary=4).astype(dt))
    bmt = jax.block_until_ready(jax.jit(block_summaries_t)(bm))
    rw = jax.block_until_ready(
        jax.jit(stage1_rows, static_argnums=1)(sm, BLOCK))
    return sm, bm, bmt, rw


summ, bsum, bsum_t, rows_bf16 = build_summ(8, 4)
print(f"built in {time.time() - t0:.0f}s", flush=True)

qs = [jax.block_until_ready(make_queries(jax.random.PRNGKey(1 + i), index))
      for i in range(4)]
exact_tops = []
for q in qs:
    es = np.asarray(maxsim_search_pallas(q, index, mask, tile_d=64))
    exact_tops.append(np.argsort(-es, 1)[:, :K])


def measure(name, fn, args, time_it=True):
    hits = t1 = cnt = 0
    for q, et in zip(qs, exact_tops):
        rws = np.asarray(fn(q, *args)[1])
        hits += sum(len(set(rws[i]) & set(et[i])) for i in range(B))
        t1 += int((rws[:, 0] == et[:, 0]).sum())
        cnt += B
    recall, top1 = hits / (cnt * K), t1 / cnt
    qps = 0.0
    if time_it:
        @jax.jit
        def run(qq0, *arrs):
            def body(qq, _):
                s, _ = fn(qq, *arrs)
                return (qq + (s[:, 0] * 1e-9).astype(qq.dtype)[:, None,
                                                               None]), ()
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
    else:
        print(f"{name}: recall@10={recall:.4f} top1={top1:.3f}",
              flush=True)
    return recall, top1, qps


def hier(ar, at, rw=None, sm=None, bm=None, bmt=None, nb=16, c=256):
    sm = summ if sm is None else sm
    bm = bsum if bm is None else bm
    bmt = bsum_t if bmt is None else bmt
    if rw is not None:
        return (lambda qq, idx, m, b_, bt, r_: hierarchical_search(
            qq, idx, m, None, b_, k=K, n_blocks=nb, n_candidates=c,
            block_size=BLOCK, approx_topk=at, approx_recall=ar,
            block_summ_t=bt, summ_rows=r_),
            (index, mask, bm, bmt, rw))
    return (lambda qq, idx, m, s_, b_, bt: hierarchical_search(
        qq, idx, m, s_, b_, k=K, n_blocks=nb, n_candidates=c,
        block_size=BLOCK, approx_topk=at, approx_recall=ar,
        block_summ_t=bt), (index, mask, sm, bm, bmt))


print("== (a) stage-0 cut precision, shipped preset nb16/C256 ==",
      flush=True)
for ar, at, tag in ((0.95, True, "ar0.95"), (0.99, True, "ar0.99"),
                    (0.95, False, "exact_cut")):
    fn, args = hier(ar, at, rw=rows_bf16)
    measure(f"hier_nb16_C256_s1k_{tag}", fn, args)

print("== (b) summary-stage quality: two-stage C1024, exact cut ==",
      flush=True)
fn2 = lambda qq, idx, m, s_, st: two_stage_search(
    qq, idx, m, s_, k=K, n_candidates=1024, use_pallas_coarse=True,
    approx_topk=False, summaries_t=st)
summ_t = jax.block_until_ready(
    jax.jit(lambda s: jnp.swapaxes(s, 0, 1))(summ))
measure("two_stage_C1024_exactcut", fn2, (index, mask, summ, summ_t),
        time_it=False)

print("== (c) stronger summaries: S=12, iters=8, nb16/C256 s1k ==",
      flush=True)
summ2, bsum2, bsum_t2, rows2 = build_summ(12, 8)
fn, args = hier(0.95, True, rw=rows2, bm=bsum2, bmt=bsum_t2)
measure("hier_nb16_C256_s1k_S12", fn, args)
