"""Round 9: WHY does the batched residual fine stage regress only when
integrated into hierarchical_search? (STATUS.md "root cause still open".)

Isolated (cand supplied) the batched decompress+einsum fine stage wins
2.8x over per-query; integrated after hierarchical stages 0-1 it LOSES
(15.1 vs 11.0 ms at B128/C1024, 1M docs). Round 8 showed a computed
(data-dependent) cand alone does NOT reproduce the regression, so the
interaction is specific to the stage-0/1 schedule. Hypothesis tested
here: XLA's scheduler fuses/reorders the stage-1 lax.map with the big
batched stage-2 intermediate, degrading both. If true,
`jax.lax.optimization_barrier` between stage 1 and stage 2 should
restore the isolated-batched win.

Variants (1M docs, residual nbits=2, K=8192 centroids, B=32 x Lq=32):
  perq             shipped hierarchical (per-query stages 1+2)  [control]
  batched          shipped stages 0-1 + batched fine            [regression repro]
  batched_barrier  same + optimization_barrier(q, cand) before stage 2
  perq_barrier     per-query fine + barrier                     [barrier-cost control]
  allbatched       batched stage-1 (block gather + einsum over all B)
                   + batched fine (no lax.map anywhere)
  allbatched_barrier

Run: python scripts/exp_hier_integration.py   (real TPU)
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

N, LD, DIM = 1_000_448, 64, 128
B, LQ, K = 32, 32, 10
N_CENT = 8192
NBITS = 2
PER_BYTE = 8 // NBITS
PACKED = DIM // PER_BYTE
S, BS, NBSUM = 4, 64, 4          # summaries/doc, block size, block summaries
NB = N // BS
dt = jnp.bfloat16


@jax.jit
def build(key):
    k1, k2, k3, k4, k5, k6, k7 = jax.random.split(key, 7)
    codes = jax.random.randint(k1, (N, LD), 0, N_CENT, jnp.int32)
    resid = jax.random.randint(k2, (N, LD, PACKED), 0, 256,
                               jnp.int32).astype(jnp.uint8)
    scales = (1.0 + 0.01 * jax.random.normal(k3, (N, LD))).astype(dt)
    records = pack_records(codes, scales, resid)
    summ = jax.random.normal(k4, (N, S, DIM), dt)
    summ = summ * jax.lax.rsqrt(jnp.sum(
        summ.astype(jnp.float32) ** 2, -1, keepdims=True) + 1e-9).astype(dt)
    bsum = jax.random.normal(k5, (NB, NBSUM, DIM), dt)
    bsum = bsum * jax.lax.rsqrt(jnp.sum(
        bsum.astype(jnp.float32) ** 2, -1, keepdims=True) + 1e-9).astype(dt)
    cent = jax.random.normal(k6, (N_CENT, DIM), jnp.float32)
    cent = cent / jnp.linalg.norm(cent, axis=-1, keepdims=True)
    q = jax.random.normal(k7, (B, LQ, DIM), jnp.float32)
    q = q / jnp.linalg.norm(q, axis=-1, keepdims=True)
    return records, summ, bsum, cent, q


print("building 1M index...", flush=True)
records, summ, bsum, cent, q = jax.block_until_ready(
    build(jax.random.PRNGKey(0)))
mask = jnp.ones((N, LD), jnp.int8)
weights = jnp.array([-0.05, -0.01, 0.01, 0.05], jnp.float32)
print(f"built ({records.nbytes / 2**30:.2f} GiB records)", flush=True)


def stages01(qq, summ, bsum, mask, n_blocks, n_cand):
    """Inline copy of hierarchical_search stages 0-1 (coarse.py) so stage-2
    variants can be spliced in."""
    summ_blocks = summ.reshape(NB, BS, S, DIM)
    s0 = jnp.einsum("nsd,bqd->nsbq", bsum, qq.astype(dt),
                    preferred_element_type=jnp.float32)
    s0 = jnp.sum(jnp.max(s0, axis=1), axis=-1).T           # (B, NB)
    _, blk = jax.lax.top_k(s0, n_blocks)

    def per_q(args):
        qi, blk_i = args
        sg = jnp.take(summ_blocks, blk_i, axis=0)
        s1 = jnp.einsum("nbsd,qd->nbsq", sg.astype(jnp.float32), qi,
                        preferred_element_type=jnp.float32)
        approx = jnp.sum(jnp.max(s1, axis=2), axis=-1).reshape(-1)
        _, loc = jax.lax.top_k(approx, n_cand)
        return blk_i[loc // BS] * BS + (loc % BS)

    return jax.lax.map(per_q, (qq.astype(jnp.float32), blk))


def stages01_batched(qq, summ, bsum, mask, n_blocks, n_cand):
    """Stage 1 batched over all queries (no lax.map)."""
    summ_blocks = summ.reshape(NB, BS, S, DIM)
    s0 = jnp.einsum("nsd,bqd->nsbq", bsum, qq.astype(dt),
                    preferred_element_type=jnp.float32)
    s0 = jnp.sum(jnp.max(s0, axis=1), axis=-1).T
    _, blk = jax.lax.top_k(s0, n_blocks)                   # (B, n_blocks)
    sg = jnp.take(summ_blocks, blk, axis=0)                # (B,nb,BS,S,d)
    s1 = jnp.einsum("Bnbsd,Bqd->Bnbsq", sg.astype(dt), qq.astype(dt),
                    preferred_element_type=jnp.float32)
    approx = jnp.sum(jnp.max(s1, axis=3), axis=-1) \
        .reshape(B, n_blocks * BS)
    _, loc = jax.lax.top_k(approx, n_cand)
    return jnp.take_along_axis(blk, loc // BS, axis=1) * BS + (loc % BS)


def fine_perq(qq, cand, records, mask, cent, weights):
    rg = jnp.take(records, cand, axis=0)
    cg, sg, pg = split_records(rg, LD)
    mg = jnp.take(mask, cand, axis=0)

    def fine(args):
        qi, cgi, pgi, mgi, sgi = args
        tok = decompress(cgi, pgi, cent, weights, NBITS)
        s = jnp.einsum("cld,qd->clq", tok, qi.astype(tok.dtype),
                       preferred_element_type=jnp.float32)
        s = s * sgi[:, :, None]
        s = jnp.where(mgi.astype(bool)[:, :, None], s, NEG_INF)
        sc = jnp.sum(jnp.max(s, axis=1), axis=-1)
        return jax.lax.top_k(sc, K)[0]
    return jax.lax.map(fine, (qq.astype(jnp.float32), cg, pg, mg, sg))


def fine_batched(qq, cand, records, mask, cent, weights):
    rg = jnp.take(records, cand, axis=0)
    cg, sg, pg = split_records(rg, LD)
    mg = jnp.take(mask, cand, axis=0)
    tok = decompress(cg, pg, cent, weights, NBITS)
    s = jnp.einsum("bcld,bqd->bclq", tok, qq.astype(tok.dtype),
                   preferred_element_type=jnp.float32)
    s = s * sg[..., None]
    s = jnp.where(mg.astype(bool)[..., None], s, NEG_INF)
    sc = jnp.sum(jnp.max(s, axis=2), axis=-1)
    return jax.lax.top_k(sc, K)[0]


def make_variant(s01, fine, barrier):
    def fn(qq, records, summ, bsum, mask, cent, weights, n_blocks, n_cand):
        cand = s01(qq, summ, bsum, mask, n_blocks, n_cand)
        if barrier:
            qq, cand = jax.lax.optimization_barrier((qq, cand))
        return fine(qq, cand, records, mask, cent, weights)
    return fn


VARIANTS = {
    "perq": make_variant(stages01, fine_perq, False),
    "batched": make_variant(stages01, fine_batched, False),
    "batched_barrier": make_variant(stages01, fine_batched, True),
    "perq_barrier": make_variant(stages01, fine_perq, True),
    "allbatched": make_variant(stages01_batched, fine_batched, False),
    "allbatched_barrier": make_variant(stages01_batched, fine_batched, True),
}


def timeit(name, fn, args, iters=24):
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
    print(f"{name}: {dts / iters * 1e3:.2f} ms/batch "
          f"({B * iters / dts:.0f} QPS)", flush=True)


ARGS = (records, summ, bsum, mask, cent, weights)
only = os.environ.get("EXP_ONLY", "")
for nb_, nc in ((128, 1024), (64, 256)):
    print(f"--- n_blocks={nb_} C={nc} ---", flush=True)
    for name, fn in VARIANTS.items():
        if only and name not in only.split(","):
            continue
        try:
            timeit(f"hier_{name}_B{nb_}_C{nc}",
                   lambda qq, *a, fn=fn, nb_=nb_, nc=nc: fn(
                       qq, *a, nb_, nc), ARGS)
        except Exception as e:
            print(f"hier_{name}_B{nb_}_C{nc} FAILED: {type(e).__name__}: "
                  f"{str(e)[:200]}", flush=True)

# numeric agreement (same stages, same candidates => identical scores)
sa = np.asarray(VARIANTS["perq"](q, *ARGS, 64, 256))
sb = np.asarray(VARIANTS["batched_barrier"](q, *ARGS, 64, 256))
print("perq-vs-batched_barrier max rel err:",
      float(np.max(np.abs(sa - sb) / (np.abs(sa) + 1e-6))), flush=True)


# ---------------------------------------------------------------------------
# Round 10 (EXP_ROUND10=1): was the "isolated batched fine-stage win"
# (1.49/2.60 ms vs per-query 4.9/7.2) a TIMING ARTIFACT? In the isolated
# harness `cand` is a loop-invariant jit argument, so the record gather
# AND the decompress (neither depends on the scanned query) are
# loop-invariant code XLA can hoist out of the lax.scan timing loop —
# but only in the BATCHED variant, where they sit at top level. In the
# per-query variant they live inside lax.map over (q, ...) tuples and
# cannot be hoisted. Here we re-time both with (inv) loop-invariant cand
# reproducing the old numbers and (dep) cand made data-dependent on the
# scanned query via an optimization_barrier'd zero offset, defeating
# hoisting while gathering THE SAME rows.
# ---------------------------------------------------------------------------

if os.environ.get("EXP_ROUND10", "0") == "1":
    rng10 = np.random.default_rng(5)
    for C in (256, 1024):
        cand0 = jnp.asarray(rng10.integers(0, N, (B, C)), jnp.int32)

        def dep_cand(qq, cand0):
            # float*0 is NOT foldable (NaN semantics) and the barrier
            # hides qq's provenance, so the add defeats hoisting without
            # changing the gathered rows
            d = jax.lax.optimization_barrier(qq)[0, 0, 0]
            return cand0 + (d * 0.0).astype(jnp.int32)

        for name, fine in (("batched", fine_batched), ("perq", fine_perq)):
            timeit(f"iso_{name}_inv_C{C}",
                   lambda qq, cand0, recs, m, ct, w, fine=fine: fine(
                       qq, cand0, recs, m, ct, w),
                   (cand0, records, mask, cent, weights))
            timeit(f"iso_{name}_dep_C{C}",
                   lambda qq, cand0, recs, m, ct, w, fine=fine: fine(
                       qq, dep_cand(qq, cand0), recs, m, ct, w),
                   (cand0, records, mask, cent, weights))
