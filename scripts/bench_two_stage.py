"""Two-stage search bench on a structured (clustered) 112k-doc index:
measures recall vs exact AND throughput. Run: python scripts/bench_two_stage.py"""

import functools
import sys
import time

import numpy as np

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp

from ravqa_tpu.ops import maxsim_search_pallas
from ravqa_tpu.retrieval.coarse import summarize_docs, two_stage_search

n, ld, dim = 112640, 128, 128
b, lq, k = 32, 32, 10
n_topics = 2048
dt = jnp.bfloat16


@jax.jit
def make_index(key):
    kt, kn, ka = jax.random.split(key, 3)
    topics = jax.random.normal(kt, (n_topics, dim), dt)
    topics = topics * jax.lax.rsqrt(
        jnp.sum(topics.astype(jnp.float32) ** 2, -1,
                keepdims=True) + 1e-9).astype(dt)
    assign = jax.random.randint(ka, (n,), 0, n_topics)
    t = topics[assign][:, None, :] + (0.3 * jax.random.normal(
        kn, (n, ld, dim), dt)).astype(dt)
    sq = jnp.sum(t.astype(jnp.float32) ** 2, -1, keepdims=True)
    return (t * jax.lax.rsqrt(sq + 1e-9).astype(dt)).astype(dt)


@jax.jit
def make_queries(key, index):
    ki, kn = jax.random.split(key)
    qidx = jax.random.randint(ki, (b,), 0, n)
    qt = index[qidx, :lq].astype(jnp.float32) + 0.1 * jax.random.normal(
        kn, (b, lq, dim))
    qt = qt * jax.lax.rsqrt(jnp.sum(qt ** 2, -1, keepdims=True) + 1e-9)
    return qt.astype(dt)


index = make_index(jax.random.PRNGKey(0))
mask = jnp.ones((n, ld), jnp.float32)
q = make_queries(jax.random.PRNGKey(1), index)
t0 = time.time()
summ = summarize_docs(index, mask, n_summary=8, iters=4).astype(dt)
summ = jax.block_until_ready(summ)
_ = np.asarray(summ[:1])
print(f"setup ok; summaries in {time.time() - t0:.1f}s", flush=True)

summ_t = jax.block_until_ready(jax.jit(lambda s: jnp.swapaxes(s, 0, 1))(summ))
exact = np.asarray(maxsim_search_pallas(q, index, mask, tile_d=16))
exact_top = np.argsort(-exact, 1)[:, :k]
for C in (256, 1024):
    for tag, kw in (("xla+topk", {}),
                    ("kernel+approx", dict(use_pallas_coarse=True,
                                           approx_topk=True,
                                           summaries_t=summ_t))):
        _, r2 = two_stage_search(q, index, mask, summ, k=k,
                                 n_candidates=C, **kw)
        r2 = np.asarray(r2)
        rec = np.mean([len(set(r2[i]) & set(exact_top[i])) / k
                       for i in range(b)])
        print(f"C={C} {tag}: recall@{k} vs exact = {rec:.3f}, top1 = "
              f"{np.mean(r2[:, 0] == exact_top[:, 0]):.2f}", flush=True)


def timeit(name, fn, args, iters=8):
    @jax.jit
    def run(q, *args):
        def body(qq, _):
            s = fn(qq, *args)
            qq = qq + (s[:, 0] * 1e-9).astype(qq.dtype)[:, None, None]
            return qq, ()
        qq, _ = jax.lax.scan(body, q, None, length=iters)
        return qq[:1, :1, :1]

    t0 = time.time()
    _ = np.asarray(run(q, *args))
    print(f"{name}: compile+first {time.time() - t0:.1f}s", flush=True)
    t0 = time.perf_counter()
    _ = np.asarray(run(q, *args))
    dt_s = time.perf_counter() - t0
    print(f"{name}: {b * iters / dt_s:.0f} QPS/chip "
          f"({dt_s / iters * 1e3:.2f} ms/batch)", flush=True)


for C in (1024, 256):
    timeit(f"two_stage_C{C}_xla_topk",
           lambda qq, idx, m, sm, C=C: two_stage_search(
               qq, idx, m, sm, k=k, n_candidates=C)[0],
           (index, mask, summ))
    timeit(f"two_stage_C{C}_kernel_approx",
           lambda qq, idx, m, sm, smt, C=C: two_stage_search(
               qq, idx, m, sm, k=k, n_candidates=C,
               use_pallas_coarse=True, approx_topk=True,
               summaries_t=smt)[0],
           (index, mask, summ, summ_t))
