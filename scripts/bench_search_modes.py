"""Compare search-mode throughput on the real TPU: exact bf16 Pallas,
fused int8 Pallas, two-stage coarse->fine.

NOTE: big device buffers must be ARGUMENTS of the jitted chain, not closure
captures — captured constants get serialized into the HLO and shipped to the
remote compiler (3.4GB -> multi-hour compiles through the axon tunnel).
"""

import functools
import sys
import time

import numpy as np

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp

from ravqa_tpu.ops import maxsim_search_pallas
from ravqa_tpu.ops.quant import (maxsim_search_int8_pallas,
                                 quantize_index_int8, quantize_queries_int8)
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
print("setup ok", flush=True)


def timeit(name, fn, args, iters=4):
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


timeit("exact_bf16",
       lambda qq, idx, m: maxsim_search_pallas(qq, idx, m, tile_d=16),
       (index, mask))

d8, dsc = quantize_index_int8(index, mask)
d8 = jax.block_until_ready(d8)
index_f32_free = None  # keep HBM headroom: bf16 index + int8 copy coexist


def int8_fn(qq, d8, dsc):
    q8_, qs_ = quantize_queries_int8(qq.astype(jnp.float32))
    return maxsim_search_int8_pallas(q8_, qs_, d8, dsc, tile_d=16)


timeit("exact_int8", int8_fn, (d8, dsc))

s_bf = np.asarray(maxsim_search_pallas(q, index, mask, tile_d=16))
s_i8 = np.asarray(int8_fn(q, d8, dsc))
t_bf = np.argsort(-s_bf, 1)[:, :k]
t_i8 = np.argsort(-s_i8, 1)[:, :k]
print("int8 vs bf16 top-10 overlap:",
      np.mean([len(set(t_bf[i]) & set(t_i8[i])) / k for i in range(b)]),
      flush=True)

summ = summarize_docs(index, mask, n_summary=8, iters=2).astype(dt)
summ = jax.block_until_ready(summ)
timeit("two_stage_C1024",
       lambda qq, idx, m, sm: two_stage_search(qq, idx, m, sm, k=k,
                                               n_candidates=1024)[0],
       (index, mask, summ))
timeit("two_stage_C4096",
       lambda qq, idx, m, sm: two_stage_search(qq, idx, m, sm, k=k,
                                               n_candidates=4096)[0],
       (index, mask, summ))
