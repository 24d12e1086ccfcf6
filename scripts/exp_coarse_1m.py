"""Coarse-sweep cost at 1M docs: XLA einsum vs fused Pallas MaxSim at
several doc-tile sizes. The two_stage 1M bottleneck is this sweep
(42-49 ms/batch measured inside the bench = ~8x off roofline: the XLA
path materializes per-tile (N, S, B*Lq) f32; the round-2 Pallas try used
tile_d=128 = tiny 64 KB blocks, all grid overhead).

Run: python scripts/exp_coarse_1m.py  (real TPU)
"""
import sys, time
import numpy as np
sys.path.insert(0, ".")
import jax, jax.numpy as jnp

N, S, DIM, B, LQ = 1_000_448, 4, 128, 32, 32
dt = jnp.bfloat16

@jax.jit
def build(key):
    k1, k2 = jax.random.split(key)
    sm = jax.random.normal(k1, (N, S, DIM), dt)
    sm = sm * jax.lax.rsqrt(jnp.sum(sm.astype(jnp.float32)**2, -1, keepdims=True) + 1e-9).astype(dt)
    q = jax.random.normal(k2, (B, LQ, DIM), dt)
    q = q * jax.lax.rsqrt(jnp.sum(q.astype(jnp.float32)**2, -1, keepdims=True) + 1e-9).astype(dt)
    return sm, q

print("building...", flush=True)
summ, q = jax.block_until_ready(build(jax.random.PRNGKey(0)))
ones = jnp.ones(summ.shape[:2], jnp.float32)
print("built", flush=True)

def timeit(name, fn, iters=8):
    @jax.jit
    def run(qq0):
        def body(qq, _):
            out = fn(qq)
            return qq + (out.reshape(-1)[0] * 1e-9).astype(qq.dtype), ()
        qq, _ = jax.lax.scan(body, qq0, None, length=iters)
        return qq[:1, :1, :1]
    print(f"compiling {name}...", flush=True)
    _ = np.asarray(run(q))
    t0 = time.perf_counter()
    _ = np.asarray(run(q))
    dts = time.perf_counter() - t0
    print(f"{name}: {dts / iters * 1e3:.2f} ms/batch", flush=True)

from ravqa_tpu.retrieval.coarse import coarse_scores
from ravqa_tpu.ops.maxsim import maxsim_search_pallas

import os
if os.environ.get("EXP_COARSE_XLA", "0") == "1":
    timeit("coarse_xla", lambda qq: coarse_scores(qq, summ))
for td in (512, 1024):
    if N % td:
        continue
    try:
        timeit(f"coarse_pallas_tile{td}",
               lambda qq, td=td: maxsim_search_pallas(qq, summ, ones,
                                                      tile_d=td))
    except Exception as e:
        print(f"tile{td} FAILED: {str(e)[:200]}", flush=True)

# agreement
a = np.asarray(coarse_scores(q, summ))
b = np.asarray(maxsim_search_pallas(q, summ, ones, tile_d=512))
if b is not None:
    print("xla-vs-pallas max abs err:", float(np.abs(a - b).max()), flush=True)
