"""Race the fused coarse-sweep kernel (ops.maxsim.coarse_sweep_pallas)
against the XLA einsum and the generic MaxSim Pallas kernel at the 1M
two-stage shapes.

The two-stage 1M cost is the coarse sweep: XLA materializes the
(N, S, B, Lq) f32 intermediate (41-59 ms/batch measured, ~8x off
roofline), and the generic maxsim_search_pallas kernel computes the
whole (tile*S, B*Lq) f32 score block at once — at useful tiles that
spills VMEM (58-149 ms). coarse_sweep_pallas chunks the query columns
so the score block stays a few MB.

Roofline at B=32, Lq=32, dim=128: S=4 -> 1.05 TFLOP ~ 5.3 ms bf16;
S=8 -> 2.1 TFLOP ~ 10.7 ms (compute-bound; the 1-2 GiB summary read is
cheaper).

Run: python scripts/exp_coarse_kernel.py   (real TPU)
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp

from ravqa_tpu.ops.maxsim import coarse_sweep_pallas, maxsim_search_pallas
from ravqa_tpu.retrieval.coarse import coarse_scores

B, LQ, DIM = 32, 32, 128
dt = jnp.bfloat16


def build(n, s, key):
    @jax.jit
    def go(key):
        k1, k2 = jax.random.split(key)
        sm = jax.random.normal(k1, (n, s, DIM), dt)
        sm = sm * jax.lax.rsqrt(jnp.sum(
            sm.astype(jnp.float32) ** 2, -1,
            keepdims=True) + 1e-9).astype(dt)
        q = jax.random.normal(k2, (B, LQ, DIM), jnp.float32)
        q = q / jnp.linalg.norm(q, axis=-1, keepdims=True)
        # slot-major (S, N, dim) copy for the sweep kernel's layout
        return sm, jnp.swapaxes(sm, 0, 1), q.astype(dt)
    return jax.block_until_ready(go(key))


def timeit(name, fn, q, args, iters=16):
    @jax.jit
    def run(qq0, *arrs):
        def body(qq, _):
            out = fn(qq, *arrs)
            return qq + (out.reshape(-1)[0] * 1e-9).astype(qq.dtype), ()
        qq, _ = jax.lax.scan(body, qq0, None, length=iters)
        return qq[:1, :1, :1]
    _ = np.asarray(run(q, *args))
    t0 = time.perf_counter()
    _ = np.asarray(run(q, *args))
    dts = time.perf_counter() - t0
    print(f"{name}: {dts / iters * 1e3:.2f} ms/batch", flush=True)


for S in (4, 8):
    N = 1_000_448
    print(f"--- N={N} S={S} ---", flush=True)
    summ, summ_t, q = build(N, S, jax.random.PRNGKey(S))
    if os.environ.get("EXP_XLA", "0") == "1":
        timeit("coarse_xla", coarse_scores, q, (summ,), iters=4)
    for tile_n in (256, 512, 1024):
        for qpc in (4, 8):
            try:
                timeit(f"sweep_t{tile_n}_q{qpc}",
                       lambda qq, smt, t=tile_n, c=qpc: coarse_sweep_pallas(
                           qq, smt, tile_n=t, queries_per_chunk=c),
                       q, (summ_t,))
            except Exception as e:
                print(f"sweep_t{tile_n}_q{qpc} FAILED: {type(e).__name__}:"
                      f" {str(e)[:200]}", flush=True)
    # candidate cuts over the (B, N) coarse scores: exact top_k vs the
    # TPU PartialReduce approx_max_k (what two_stage_search(approx_topk=
    # True) uses); at 1M docs the exact cut dominates the whole search
    scores = jax.block_until_ready(
        coarse_sweep_pallas(q, summ_t, tile_n=512))
    for C in (256, 1024):
        timeit(f"cut_topk_C{C}",
               lambda _q, sc, C=C: jax.lax.top_k(sc, C)[0],
               q, (scores,))
        timeit(f"cut_approx_C{C}",
               lambda _q, sc, C=C: jax.lax.approx_max_k(sc, C)[0],
               q, (scores,))
        ex = np.asarray(jax.lax.top_k(scores, 10)[1])
        ap = np.asarray(jax.lax.approx_max_k(scores, C)[1])
        cont = np.mean([len(set(ex[i]) & set(ap[i])) / 10
                        for i in range(ex.shape[0])])
        print(f"  top-10 containment in approx top-{C}: {cont:.4f}",
              flush=True)
    del scores
    # int8 sweep branch (quantized summaries + queries; v5e MXU int8 =
    # 2x bf16 throughput, half the HBM read). Candidate-gen-only path —
    # check top-10 ranking containment vs the bf16 sweep alongside.
    from ravqa_tpu.ops.quant import quantize_summaries_t_int8
    st8, dsc = jax.block_until_ready(quantize_summaries_t_int8(summ_t))
    # tiles must be distinct AFTER the wrapper's VMEM clamp: the int8
    # path's extra f32 score block caps tile_n at 512 for this shape,
    # so sweep downward (1024+ would silently re-time 512)
    for tile_n in (128, 256, 512):
        try:
            timeit(f"sweep_int8_t{tile_n}",
                   lambda qq, smt, ds, t=tile_n: coarse_sweep_pallas(
                       qq, smt, tile_n=t, dscale=ds),
                   q, (st8, dsc))
        except Exception as e:
            print(f"sweep_int8_t{tile_n} FAILED: {type(e).__name__}:"
                  f" {str(e)[:200]}", flush=True)
    sc_bf = np.asarray(jax.lax.top_k(
        coarse_sweep_pallas(q, summ_t, tile_n=512), 10)[1])
    sc_i8 = np.asarray(jax.lax.top_k(
        coarse_sweep_pallas(q, st8, tile_n=512, dscale=dsc), 1024)[1])
    cont = np.mean([len(set(sc_bf[i]) & set(sc_i8[i])) / 10
                    for i in range(sc_bf.shape[0])])
    print(f"  bf16 top-10 containment in int8 top-1024: {cont:.4f}",
          flush=True)
    del st8, dsc, sc_bf, sc_i8
    # old generic kernel, best-known tile
    ones = jnp.ones(summ.shape[:2], jnp.float32)
    try:
        timeit("generic_pallas_t512",
               lambda qq, sm, m: maxsim_search_pallas(qq, sm, m,
                                                      tile_d=512),
               q, (summ, ones))
    except Exception as e:
        print(f"generic_pallas FAILED: {str(e)[:200]}", flush=True)
    del summ, summ_t, ones

# numeric agreement at a small shape (vs the XLA reference path)
summ, summ_t, q = build(4096, 4, jax.random.PRNGKey(0))
a = np.asarray(coarse_scores(q, summ))
b = np.asarray(coarse_sweep_pallas(q, summ_t, tile_n=256))
err = np.max(np.abs(a - b) / (np.abs(a) + 1e-6))
print("xla-vs-sweep max rel err:", float(err), flush=True)
assert err < 5e-3
