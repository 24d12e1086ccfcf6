"""Follow-up to exp_hier_112k: pick the query-group size for the
hierarchical merged stage-1+2 map across index types.

exp_hier_112k measured (112k bf16, B=32): lib 1.88 ms, merged(g=1) 1.78,
group4 1.61, group8 1.57, batched(g=32) 2.12 — grouping wins because
each lax.map iteration carries ~18 us fixed overhead (probe: 0.57 ms for
32 trivial iterations). Here: g=16 at 112k, and the same grouped design
at the 1M residual-records shape (round 4 once saw a pathological
grouped path there — re-test with the merged stage-1+2 body).

Run: EXP=112k|res python scripts/exp_group_sweep.py   (real TPU)
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp

from ravqa_tpu.ops.maxsim import NEG_INF
from ravqa_tpu.ops.residual import decompress, pack_records, split_records

EXP = os.environ.get("EXP", "112k")
B, LQ, K = 32, 32, 10
DIM = 128
dt = jnp.bfloat16

if EXP == "112k":
    N, LD, S, BS, NBSUM = 112_640, 128, 8, 64, 4
    NBLK, C = 16, 256
    RES = False
else:
    N, LD, S, BS, NBSUM = 1_000_448, 64, 4, 64, 4
    NBLK, C = 128, 1024
    RES = True
NB = N // BS
N_CENT, NBITS = 8192, 2
PER_BYTE = 8 // NBITS
PACKED = DIM // PER_BYTE


@jax.jit
def build(key):
    ks = jax.random.split(key, 6)

    def unit(k, shape):
        x = jax.random.normal(k, shape, dt)
        return x * jax.lax.rsqrt(jnp.sum(
            x.astype(jnp.float32) ** 2, -1, keepdims=True) + 1e-9).astype(dt)

    summ = unit(ks[0], (N, S, DIM))
    bsum = unit(ks[1], (NB, NBSUM, DIM))
    q = jax.random.normal(ks[2], (B, LQ, DIM), jnp.float32)
    q = q / jnp.linalg.norm(q, axis=-1, keepdims=True)
    if RES:
        codes = jax.random.randint(ks[3], (N, LD), 0, N_CENT, jnp.int32)
        resid = jax.random.randint(ks[4], (N, LD, PACKED), 0, 256,
                                   jnp.int32).astype(jnp.uint8)
        scales = (1.0 + 0.01 * jax.random.normal(ks[5], (N, LD))).astype(dt)
        store = pack_records(codes, scales, resid)
    else:
        store = unit(ks[3], (N, LD, DIM))
    return store, summ, bsum, q


print(f"building {EXP} index...", flush=True)
store, summ, bsum, q = jax.block_until_ready(build(jax.random.PRNGKey(0)))
mask = jnp.ones((N, LD), jnp.int8)
cent = jax.block_until_ready(
    jax.jit(lambda k: jax.random.normal(k, (N_CENT, DIM), jnp.float32))(
        jax.random.PRNGKey(9)))
weights = jnp.array([-0.05, -0.01, 0.01, 0.05], jnp.float32)
print("built", flush=True)


def stage0(qq, bsum):
    s0 = jnp.einsum("nsd,bqd->nsbq", bsum, qq.astype(dt),
                    preferred_element_type=jnp.float32)
    s0 = jnp.sum(jnp.max(s0, axis=1), axis=-1).T
    return jax.lax.top_k(s0, NBLK)[1]


def v_grouped(qq, store, mask, summ, bsum, g):
    """Merged stage-1+2 lax.map over query groups of g."""
    summ_blocks = summ.reshape(NB, BS, S, DIM)
    blk = stage0(qq, bsum)

    def per_group(args):
        qi, blk_i = args                                  # (g, Lq, d) f32
        sg_ = jnp.take(summ_blocks, blk_i, axis=0)        # (g,NBLK,BS,S,d)
        s1 = jnp.einsum("gnbsd,gqd->gnbsq", sg_.astype(dt), qi.astype(dt),
                        preferred_element_type=jnp.float32)
        approx = jnp.sum(jnp.max(s1, axis=3), axis=-1) \
            .reshape(g, NBLK * BS)
        _, loc = jax.lax.top_k(approx, C)
        cand = jnp.take_along_axis(blk_i, loc // BS, axis=1) * BS \
            + (loc % BS)                                  # (g, C)
        if RES:
            rg = jnp.take(store, cand, axis=0)            # (g, C, REC)
            cg, sc_, pg = split_records(rg, LD)
            tok = decompress(cg, pg, cent, weights, NBITS)  # (g,C,Ld,d)
            s = jnp.einsum("gcld,gqd->gclq", tok, qi.astype(tok.dtype),
                           preferred_element_type=jnp.float32)
            s = s * sc_[..., None]
        else:
            tok = jnp.take(store, cand, axis=0)           # (g, C, Ld, d)
            s = jnp.einsum("gcld,gqd->gclq", tok.astype(dt), qi.astype(dt),
                           preferred_element_type=jnp.float32)
        s = jnp.sum(jnp.max(s, axis=2), axis=-1)          # (g, C)
        return jax.lax.top_k(s, K)[0]

    grp = lambda x: x.reshape((B // g, g) + x.shape[1:])
    out = jax.lax.map(per_group, (grp(qq.astype(jnp.float32)), grp(blk)))
    return out.reshape(B, K)


def v_lib(qq, store, mask, summ, bsum):
    from ravqa_tpu.retrieval.coarse import hierarchical_search
    kw = dict(k=K, n_blocks=NBLK, n_candidates=C, block_size=BS)
    if RES:
        return hierarchical_search(qq, None, mask, summ, bsum,
                                   records=store, centroids=cent,
                                   bucket_weights=weights, nbits=NBITS,
                                   **kw)[0]
    return hierarchical_search(qq, store, mask, summ, bsum, **kw)[0]


def timeit(name, fn, args, iters=32):
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


ARGS = (store, mask, summ, bsum)
timeit("lib", v_lib, ARGS)
GS = (16,) if EXP == "112k" else (1, 2, 4, 8)
for g in GS:
    try:
        timeit(f"group{g}", lambda qq, *a, g=g: v_grouped(qq, *a, g), ARGS)
    except Exception as e:
        print(f"group{g} FAILED: {type(e).__name__}: {str(e)[:200]}",
              flush=True)

sa = np.asarray(v_lib(q, *ARGS))
sb = np.asarray(v_grouped(q, *ARGS, GS[-1]))
print(f"lib-vs-group{GS[-1]} max abs err:", float(np.abs(sa - sb).max()),
      flush=True)
