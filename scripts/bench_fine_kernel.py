"""Benchmark the Pallas gather+MaxSim fine stage vs the lax.map fine stage
on the real TPU. Run: python scripts/bench_fine_kernel.py"""

import functools
import sys
import time

import numpy as np

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp

from ravqa_tpu.retrieval.coarse import summarize_docs, two_stage_search

n, ld, dim = 112640, 128, 128
b, lq, k = 32, 32, 10
dt = jnp.bfloat16


@functools.partial(jax.jit, static_argnames=("shape",))
def gen(key, shape):
    t = jax.random.normal(key, shape, dt)
    sq = jnp.sum(t.astype(jnp.float32) ** 2, -1, keepdims=True)
    return (t * jax.lax.rsqrt(sq + 1e-9).astype(dt)).astype(dt)


index = gen(jax.random.PRNGKey(0), (n, ld, dim))
mask = jnp.ones((n, ld), jnp.float32)
q = gen(jax.random.PRNGKey(1), (b, lq, dim))
summ = summarize_docs(index, mask, n_summary=8, iters=2).astype(dt)
summ = jax.block_until_ready(summ)
print("setup ok", flush=True)

s1, r1 = two_stage_search(q, index, mask, summ, k=k, n_candidates=256)
print("two-stage ok:", np.asarray(s1).shape, flush=True)


def timeit(name, fn, args, iters=8):
    @jax.jit
    def run(q, *args):
        def body(qq, _):
            s = fn(qq, *args)
            qq = qq + (s[:, 0] * 1e-9).astype(qq.dtype)[:, None, None]
            return qq, ()
        qq, _ = jax.lax.scan(body, q, None, length=iters)
        return qq[:1, :1, :1]

    _ = np.asarray(run(q, *args))
    t0 = time.perf_counter()
    _ = np.asarray(run(q, *args))
    dt_s = time.perf_counter() - t0
    print(f"{name}: {b * iters / dt_s:.0f} QPS/chip "
          f"({dt_s / iters * 1e3:.2f} ms/batch)", flush=True)


for C in (256, 1024):
    timeit(f"vec_fine_C{C}",
           lambda qq, idx, m, sm, C=C: two_stage_search(
               qq, idx, m, sm, k=k, n_candidates=C)[0],
           (index, mask, summ))
