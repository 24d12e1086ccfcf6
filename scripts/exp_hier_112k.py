"""Headline-shape experiment: can the 112k hierarchical search (bench.py:
~17.6k QPS, 1.8 ms/batch32) go faster by cutting lax.map iteration count?

The shipped hierarchical_search runs TWO per-query lax.maps (stage 1 block
sweep, stage 2 fine re-score) = 64 sequential tiny programs per batch. At
this scale each program's work is ~100 us of bandwidth/MXU, so fixed
per-iteration overhead may dominate. Variants:

  lib       shipped hierarchical_search                      [control]
  merged    ONE lax.map per query doing stage1+stage2 (32 iterations)
  group4/8  lax.map over query groups of g (batched inside; 8/4 iterations)
  batched   no lax.map at all (g=32)
  probe     lax.map of 32 trivial bodies — isolates per-iteration overhead

All on the exact bench.py shape: 112640 docs x Ld=128 bf16 tokens, S=8
summaries, block 64, n_blocks=16, C=256, B=32, Lq=32, k=10.

Run: python scripts/exp_hier_112k.py   (real TPU)
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp

from ravqa_tpu.ops.maxsim import NEG_INF
from ravqa_tpu.retrieval.coarse import hierarchical_search

N, LD, DIM = 112_640, 128, 128
B, LQ, K = 32, 32, 10
S, BS, NBSUM = 8, 64, 4
NB = N // BS
NBLK, C = 16, 256
dt = jnp.bfloat16


@jax.jit
def build(key):
    k1, k2, k3, k4 = jax.random.split(key, 4)
    tok = jax.random.normal(k1, (N, LD, DIM), dt)
    tok = tok * jax.lax.rsqrt(jnp.sum(
        tok.astype(jnp.float32) ** 2, -1, keepdims=True) + 1e-9).astype(dt)
    summ = jax.random.normal(k2, (N, S, DIM), dt)
    summ = summ * jax.lax.rsqrt(jnp.sum(
        summ.astype(jnp.float32) ** 2, -1, keepdims=True) + 1e-9).astype(dt)
    bsum = jax.random.normal(k3, (NB, NBSUM, DIM), dt)
    bsum = bsum * jax.lax.rsqrt(jnp.sum(
        bsum.astype(jnp.float32) ** 2, -1, keepdims=True) + 1e-9).astype(dt)
    q = jax.random.normal(k4, (B, LQ, DIM), jnp.float32)
    q = q / jnp.linalg.norm(q, axis=-1, keepdims=True)
    return tok, summ, bsum, q


print("building 112k index...", flush=True)
tokens, summ, bsum, q = jax.block_until_ready(build(jax.random.PRNGKey(0)))
mask = jnp.ones((N, LD), jnp.int8)
print("built", flush=True)


def stage0(qq, bsum):
    s0 = jnp.einsum("nsd,bqd->nsbq", bsum, qq.astype(dt),
                    preferred_element_type=jnp.float32)
    s0 = jnp.sum(jnp.max(s0, axis=1), axis=-1).T          # (B, NB)
    return jax.lax.top_k(s0, NBLK)[1]                     # (B, NBLK)


def v_lib(qq, tokens, mask, summ, bsum):
    return hierarchical_search(qq, tokens, mask, summ, bsum, k=K,
                               n_blocks=NBLK, n_candidates=C,
                               block_size=BS)[0]


def v_merged(qq, tokens, mask, summ, bsum):
    """Stages 1+2 in ONE per-query lax.map body."""
    summ_blocks = summ.reshape(NB, BS, S, DIM)
    blk = stage0(qq, bsum)

    def per_q(args):
        qi, blk_i = args                                  # (Lq, d) f32
        sg = jnp.take(summ_blocks, blk_i, axis=0)         # (NBLK,BS,S,d)
        s1 = jnp.einsum("nbsd,qd->nbsq", sg.astype(jnp.float32), qi,
                        preferred_element_type=jnp.float32)
        approx = jnp.sum(jnp.max(s1, axis=2), axis=-1).reshape(-1)
        _, loc = jax.lax.top_k(approx, C)
        cand = blk_i[loc // BS] * BS + (loc % BS)         # (C,)
        tok = jnp.take(tokens, cand, axis=0)              # (C, Ld, d)
        s = jnp.einsum("cld,qd->clq", tok.astype(jnp.float32), qi,
                       preferred_element_type=jnp.float32)
        s = jnp.sum(jnp.max(s, axis=1), axis=-1)          # (C,)
        return jax.lax.top_k(s, K)[0]

    return jax.lax.map(per_q, (qq.astype(jnp.float32), blk))


def v_grouped(qq, tokens, mask, summ, bsum, g):
    summ_blocks = summ.reshape(NB, BS, S, DIM)
    blk = stage0(qq, bsum)

    def per_group(args):
        qi, blk_i = args                                  # (g, Lq, d) f32
        sg = jnp.take(summ_blocks, blk_i, axis=0)         # (g,NBLK,BS,S,d)
        s1 = jnp.einsum("gnbsd,gqd->gnbsq", sg.astype(dt), qi.astype(dt),
                        preferred_element_type=jnp.float32)
        approx = jnp.sum(jnp.max(s1, axis=3), axis=-1) \
            .reshape(g, NBLK * BS)
        _, loc = jax.lax.top_k(approx, C)
        cand = jnp.take_along_axis(blk_i, loc // BS, axis=1) * BS \
            + (loc % BS)                                  # (g, C)
        tok = jnp.take(tokens, cand, axis=0)              # (g, C, Ld, d)
        s = jnp.einsum("gcld,gqd->gclq", tok.astype(dt), qi.astype(dt),
                       preferred_element_type=jnp.float32)
        s = jnp.sum(jnp.max(s, axis=2), axis=-1)          # (g, C)
        return jax.lax.top_k(s, K)[0]

    grp = lambda x: x.reshape((B // g, g) + x.shape[1:])
    out = jax.lax.map(per_group, (grp(qq.astype(jnp.float32)), grp(blk)))
    return out.reshape(B, K)


def v_batched(qq, tokens, mask, summ, bsum):
    summ_blocks = summ.reshape(NB, BS, S, DIM)
    blk = stage0(qq, bsum)
    sg = jnp.take(summ_blocks, blk, axis=0)               # (B,NBLK,BS,S,d)
    s1 = jnp.einsum("Bnbsd,Bqd->Bnbsq", sg.astype(dt), qq.astype(dt),
                    preferred_element_type=jnp.float32)
    approx = jnp.sum(jnp.max(s1, axis=3), axis=-1).reshape(B, NBLK * BS)
    _, loc = jax.lax.top_k(approx, C)
    cand = jnp.take_along_axis(blk, loc // BS, axis=1) * BS + (loc % BS)
    tok = jnp.take(tokens, cand, axis=0)                  # (B, C, Ld, d)
    s = jnp.einsum("bcld,bqd->bclq", tok.astype(dt), qq.astype(dt),
                   preferred_element_type=jnp.float32)
    s = jnp.sum(jnp.max(s, axis=2), axis=-1)
    return jax.lax.top_k(s, K)[0]


def v_probe(qq, tokens, mask, summ, bsum):
    """32 trivial map iterations — upper-bounds per-iteration overhead."""
    def per_q(qi):
        return jax.lax.top_k(jnp.sum(qi, axis=-1), K)[0]
    return jax.lax.map(per_q, qq.astype(jnp.float32))


def timeit(name, fn, args, iters=64):
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
    print(f"{name}: {dts / iters * 1e3:.3f} ms/batch "
          f"({B * iters / dts:.0f} QPS)", flush=True)


ARGS = (tokens, mask, summ, bsum)
timeit("probe_trivial_map32", v_probe, ARGS)
timeit("lib", v_lib, ARGS)
timeit("merged", v_merged, ARGS)
for g in (4, 8):
    timeit(f"group{g}", lambda qq, *a, g=g: v_grouped(qq, *a, g), ARGS)
timeit("batched", v_batched, ARGS)

# agreement: same algorithm, same candidates -> same top-k scores
sa = np.asarray(v_lib(q, *ARGS))
sm = np.asarray(v_merged(q, *ARGS))
sb = np.asarray(v_batched(q, *ARGS))
print("lib-vs-merged max abs err:", float(np.abs(sa - sm).max()), flush=True)
print("lib-vs-batched max abs err:", float(np.abs(sa - sb).max()),
      flush=True)
