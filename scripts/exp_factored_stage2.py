"""Decompose the FACTORED residual stage-2 cost on the real chip.

Round-4 finding (bench_1m_residual BENCH_FACTORED=256x256): the factored
two-hot fused kernel runs at K=65536 but does NOT beat the XLA per-query
decompress fine stage (hier B128/C1024: 2862 vs 3118 QPS). This script
isolates where the fused path's time goes:

  a)  XLA fine stage (per-query lax.map decompress+einsum)  [baseline]
  a2) XLA fine, factored decompress: coarse[hi] + fine[lo] from two
      128 KB tables instead of centroids[code] from the 33 MB product
      table. MEASURED SLOWER (11.6 vs 8.3 ms at C=1024): two per-token
      row gathers + adds cost more than one big-table gather — XLA's
      gather cost here is per-op overhead, not table-size bound.
  a3) XLA fine, bucket_weights[bits] replaced by a 2^nbits select
      chain (what the Pallas kernel does). MEASURED 2x SLOWER
      (15.5 ms at C=1024): XLA lowers the 4-entry per-element lookup
      well; jnp.full + 3 wheres over (C, Ld, dim) f32 does not pay.
  b) full fused path: gather records -> split -> stack mask2 -> kernel
  c) kernel ONLY on pre-gathered/pre-staged inputs
  d) the gather+split+stack WITHOUT the kernel (feeds a cheap reduction)

All timing uses data-dependent candidates inside the scan (prior-round
lesson: loop-invariant candidates let XLA hoist the gather/decompress out
of the timing loop — scripts/exp_hier_integration.py).

Measured decomposition (one v5e chip, 256x256 factored, nbits=2, B=32):

  C=256 :  a) 2.65  b) 3.04  c) 2.37  d) 1.19   ms/batch
  C=1024:  a) 8.08  b) 9.46  c) 6.94  d) 2.26   ms/batch

So the fused path loses to XLA at 256x256 because the KERNEL itself is
the dominant term, not the staging. CAVEAT on leg (d): it stages the
PRE-aca4572 3-lane side-band (validity+codes+scales f32) while the
production path now builds 2 lanes, so (d) OVERSTATES staging cost and
the kernel's share is if anything larger — the conclusion only
strengthens; legs (a)-(c) are unaffected. NEGATIVE RESULT (A/B'd in
isolation): rewriting the per-plane unpack to one full-lane-width
(T, dim) select chain + a single full-K residual matmul REGRESSES ~7%
(C1024 4.66 -> 5.01 ms isolated) — the narrow per-plane matmuls were
never the bottleneck. The dominant kernel term is the TWO-HOT selector
construction: (T, k1+k2) iota/compare lanes scale with k1+k2, i.e.
B*C*Ld*(k1+k2) VPU lanes per batch (~1.1G at 256x256/C1024). See the
k1/k2 scaling sweep in scripts/micro_factored_k.py.

Run: python scripts/exp_factored_stage2.py            (defaults 256x256)
     BENCH_FACTORED=64x128 python scripts/exp_factored_stage2.py
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp

from ravqa_tpu.ops.residual import (_kmeans, _kmeans_l2, _refine_factored,
                                    assign_factored, compress_flat,
                                    decompress, maxsim_residual_pallas,
                                    pack_records, record_bytes,
                                    split_records)

N, LD, DIM = 1_000_448, 64, 128
B, LQ = 32, 32
N_TOPICS = 8192
SLAB = 62_528
NBITS = 2
K1, K2 = map(int, os.environ.get("BENCH_FACTORED", "256x256")
             .lower().split("x"))
assert K1 * K2 <= 65536, \
    "pack_records stores codes as uint16 — k1*k2 > 65536 wraps silently"
dt = jnp.bfloat16


@jax.jit
def make_topics(key):
    t = jax.random.normal(key, (N_TOPICS, DIM), dt)
    return t * jax.lax.rsqrt(jnp.sum(t.astype(jnp.float32) ** 2, -1,
                                     keepdims=True) + 1e-9).astype(dt)


def slab_tokens(key, i, topics):
    kn = jax.random.fold_in(key, i)
    gidx = i * SLAB + jnp.arange(SLAB, dtype=jnp.int32)
    assign = jnp.clip(jnp.floor(gidx.astype(jnp.float32)
                                * (N_TOPICS / N)).astype(jnp.int32),
                      0, N_TOPICS - 1)
    t = topics[assign][:, None, :] + (0.3 * jax.random.normal(
        kn, (SLAB, LD, DIM), dt)).astype(dt)
    sq = jnp.sum(t.astype(jnp.float32) ** 2, -1, keepdims=True)
    return (t * jax.lax.rsqrt(sq + 1e-9).astype(dt)).astype(dt)


t0 = time.time()
key = jax.random.PRNGKey(7)
topics = make_topics(key)


@jax.jit
def codec_sample(key, topics):
    t = slab_tokens(key, 0, topics).astype(jnp.float32)
    flat = t.reshape(-1, DIM)
    pick = jax.random.choice(jax.random.fold_in(key, 99),
                             flat.shape[0], (131072,), replace=False)
    return flat[pick]


sample = codec_sample(key, topics)
tr, held = sample[:114688], sample[114688:]
coarse = _kmeans(tr, K1, 8)
fine = _kmeans_l2(tr - coarse[jnp.argmax(tr @ coarse.T, -1)], K2, 8)
coarse, fine = _refine_factored(tr, coarse, fine, 4)
centroids = jnp.reshape(coarse[:, None, :] + fine[None, :, :],
                        (K1 * K2, DIM))
codes_h = assign_factored(held, coarse, fine)
resid = np.asarray(held - centroids[codes_h]).reshape(-1)
nb = 2 ** NBITS
cutoffs = jnp.asarray(np.quantile(resid, np.arange(1, nb) / nb)
                      .astype(np.float32))
weights = jnp.asarray(np.quantile(resid, (np.arange(nb) + 0.5) / nb)
                      .astype(np.float32))
print(f"factored codec {K1}x{K2} trained in {time.time() - t0:.0f}s",
      flush=True)

REC = record_bytes(LD, DIM, NBITS)


@jax.jit
def build_records(key, topics, coarse, fine, centroids, cutoffs, weights_d):
    def body(i, records):
        tn = slab_tokens(key, i, topics)
        flat = tn.astype(jnp.float32).reshape(-1, DIM)
        pre = assign_factored(flat, coarse, fine)
        code, pk, scale = compress_flat(flat, centroids, cutoffs,
                                        weights_d, NBITS, codes=pre)
        rec = pack_records(code.reshape(SLAB, LD),
                           scale.reshape(SLAB, LD).astype(jnp.bfloat16),
                           pk.reshape(SLAB, LD, -1))
        return jax.lax.dynamic_update_slice(records, rec, (i * SLAB, 0))
    return jax.lax.fori_loop(0, N // SLAB, body,
                             jnp.zeros((N, REC), jnp.uint8))


t0 = time.time()
records = jax.block_until_ready(build_records(key, topics, coarse, fine,
                                              centroids, cutoffs, weights))
print(f"records built {records.size / 2**30:.2f} GiB "
      f"in {time.time() - t0:.0f}s", flush=True)

mask = jnp.ones((N, LD), jnp.int8)


@jax.jit
def make_queries(qkey, key, topics):
    base = slab_tokens(key, 0, topics)[:B, :LQ].astype(jnp.float32)
    qt = base + 0.1 * jax.random.normal(qkey, (B, LQ, DIM))
    qt = qt * jax.lax.rsqrt(jnp.sum(qt ** 2, -1, keepdims=True) + 1e-9)
    return qt.astype(jnp.float32)


q = make_queries(jax.random.PRNGKey(1), key, topics)


def timeit(name, fn, args, iters=32):
    @jax.jit
    def run(qq0, *arrs):
        def body(carry, _):
            qq, seed = carry
            # DATA-DEPENDENT candidates: defeat loop-invariant hoisting
            s = fn(qq, seed, *arrs)                     # (B,) reduced
            return (qq + (s * 1e-9).astype(qq.dtype)[:, None, None],
                    seed + jnp.int32(1)), ()
        (qq, _), _ = jax.lax.scan(body, (qq0, jnp.int32(0)), None,
                                  length=iters)
        return qq[:1, :1, :1]
    _ = np.asarray(run(q, *args))
    t0 = time.perf_counter()
    _ = np.asarray(run(q, *args))
    dt_s = time.perf_counter() - t0
    print(f"{name}: {dt_s / iters * 1e3:.2f} ms/batch", flush=True)


def make_cand(seed, c):
    """(B, C) pseudo-random data-dependent candidate rows."""
    base = jax.random.randint(jax.random.PRNGKey(0), (B, c), 0, N - 7)
    return (base + seed.astype(jnp.int32)) % (N - 1)


for C in (256, 1024):
    def xla_fine(qq, seed, recs, cent, bw):
        cand = make_cand(seed, C)
        rg = jnp.take(recs, cand, axis=0)
        cg, sg, pg = split_records(rg, LD)

        def fine_res(args):
            qi, cgi, pgi, sgi = args
            tok = decompress(cgi, pgi, cent, bw, NBITS)
            s = jnp.einsum("cld,qd->clq", tok, qi.astype(tok.dtype),
                           preferred_element_type=jnp.float32)
            s = s * sgi[:, :, None]
            return jnp.sum(jnp.max(s, axis=1), axis=-1)    # (C,)
        sc = jax.lax.map(fine_res, (qq, cg, pg, sg))
        return jnp.max(sc, axis=1)

    def fused_full(qq, seed, recs, cent, bw, cf, ff):
        cand = make_cand(seed, C)
        rg = jnp.take(recs, cand, axis=0)
        cg, sg, pg = split_records(rg, LD)
        mg = jnp.ones((B, C, LD), jnp.int8)
        sc = maxsim_residual_pallas(qq, cg, pg, mg, cent, bw, sg,
                                    cf, ff, nbits=NBITS, tile_c=32)
        return jnp.max(sc, axis=1)

    def gather_only(qq, seed, recs, cent, bw):
        # the fused path's XLA-side staging WITHOUT the kernel: gather,
        # split, and the same f32 stack the kernel input needs
        cand = make_cand(seed, C)
        rg = jnp.take(recs, cand, axis=0)
        cg, sg, pg = split_records(rg, LD)
        m2 = jnp.stack([jnp.ones((B, C, LD), jnp.float32),
                        cg.astype(jnp.float32),
                        sg.astype(jnp.float32)], axis=-1)
        return (jnp.sum(m2[..., 0], axis=(1, 2))
                + jnp.sum(pg[..., 0].astype(jnp.float32), axis=(1, 2)))

    def xla_fine_factored(qq, seed, recs, cf, ff, bw):
        # decompress via the TWO SMALL factor tables (k1+k2 rows, cache/
        # VMEM-resident) instead of the materialized (k1*k2, dim) product
        # table — same math, 256x smaller gather working set
        cand = make_cand(seed, C)
        rg = jnp.take(recs, cand, axis=0)
        cg, sg, pg = split_records(rg, LD)
        from ravqa_tpu.ops.residual import unpack_bits

        def fine_res(args):
            qi, cgi, pgi, sgi = args
            bits = unpack_bits(pgi, NBITS)
            tok = (cf[cgi >> K2.bit_length() - 1]
                   + ff[cgi & (K2 - 1)]
                   + bw[bits.astype(jnp.int32)]).astype(jnp.bfloat16)
            s = jnp.einsum("cld,qd->clq", tok, qi.astype(tok.dtype),
                           preferred_element_type=jnp.float32)
            s = s * sgi[:, :, None]
            return jnp.sum(jnp.max(s, axis=1), axis=-1)    # (C,)
        sc = jax.lax.map(fine_res, (qq, cg, pg, sg))
        return jnp.max(sc, axis=1)

    def xla_fine_selectw(qq, seed, recs, cent, bw):
        # bucket_weights[bits] is a per-ELEMENT gather (C*Ld*dim = 8.4M
        # scalars per query); replace it with a 2^nbits select chain
        # (what the fused kernel does) and keep the big-table centroid
        # row gather
        cand = make_cand(seed, C)
        rg = jnp.take(recs, cand, axis=0)
        cg, sg, pg = split_records(rg, LD)
        from ravqa_tpu.ops.residual import unpack_bits

        def fine_res(args):
            qi, cgi, pgi, sgi = args
            bits = unpack_bits(pgi, NBITS)
            w = jnp.full(bits.shape, bw[0], jnp.float32)
            for v in range(1, 2 ** NBITS):
                w = jnp.where(bits == v, bw[v], w)
            tok = (cent[cgi] + w).astype(jnp.bfloat16)
            s = jnp.einsum("cld,qd->clq", tok, qi.astype(tok.dtype),
                           preferred_element_type=jnp.float32)
            s = s * sgi[:, :, None]
            return jnp.sum(jnp.max(s, axis=1), axis=-1)    # (C,)
        sc = jax.lax.map(fine_res, (qq, cg, pg, sg))
        return jnp.max(sc, axis=1)

    timeit(f"C{C}_a_xla_fine", xla_fine, (records, centroids, weights))
    timeit(f"C{C}_a3_xla_fine_selectw", xla_fine_selectw,
           (records, centroids, weights))
    timeit(f"C{C}_a2_xla_fine_factored", xla_fine_factored,
           (records, coarse, fine, weights))
    timeit(f"C{C}_b_fused_full", fused_full,
           (records, centroids, weights, coarse, fine))
    timeit(f"C{C}_d_gather_split_stack", gather_only,
           (records, centroids, weights))

# c) kernel ONLY: pre-gathered inputs, candidates vary but gather outside
#    the timed region is impossible in-scan; instead pre-stage ONE
#    gathered batch and rotate queries (kernel cost is query-independent)
for C in (256, 1024):
    cand0 = jax.random.randint(jax.random.PRNGKey(2), (B, C), 0, N - 1)
    rg = jnp.take(records, cand0, axis=0)
    cg0, sg0, pg0 = split_records(rg, LD)
    mg0 = jnp.ones((B, C, LD), jnp.int8)

    def kernel_only(qq, seed, cg, pg, mg, sg, cent, bw, cf, ff):
        qv = qq + (seed.astype(jnp.float32) * 1e-9)
        sc = maxsim_residual_pallas(qv, cg, pg, mg, cent, bw, sg,
                                    cf, ff, nbits=NBITS, tile_c=32)
        return jnp.max(sc, axis=1)

    timeit(f"C{C}_c_kernel_only", kernel_only,
           (cg0, pg0, mg0, sg0, centroids, weights, coarse, fine))
