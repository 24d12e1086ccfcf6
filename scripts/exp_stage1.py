"""Decompose hierarchical STAGE 1 (doc-summary sweep over the selected
blocks) in isolation at the 1M bench shapes, to size the headroom of a
fused gather-sweep Pallas kernel before building one.

Stage 1 gathers (B, n_blocks, block_size, S, dim) doc summaries out of
HBM and reduces them to (B, n_blocks*block_size) approx scores. The XLA
path materializes BOTH the gathered copy and the (g, nb, bs, S, Lq) f32
dot intermediate; a fused kernel would stream blocks straight to VMEM
and write only the (B, nb*bs) scores. Variants measured (all grouped
lax.map, g=8, data-dependent block ids so nothing hoists — the round-10
lesson):

  bf16     gather bf16 summaries, f32 einsum   (the pre-round-3 path)
  int8     gather int8 + post-hoc scale        (coarse_int8 stage 1)
  noop     gather only (einsum replaced by a slice-sum) — bounds the
           gather share vs the dot/intermediate share

Run: python scripts/exp_stage1.py   (real TPU; ~2 GiB HBM)
Config: N=1M docs via 15625 blocks of 64; S=4, dim=128; n_blocks in
{128, 1024} selected per query from a uniform shuffle.
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp

from ravqa_tpu.ops.quant import quantize_summaries_int8

B, LQ, DIM, S = 32, 32, 128, 4
BS = 64                       # block_size
NB_TOT = int(os.environ.get("EXP_NB_TOT", 15_625))   # 1M docs / 64
ITERS = int(os.environ.get("EXP_ITERS", 32))
G = 8
dt = jnp.bfloat16


@jax.jit
def build(key):
    k1, k2 = jax.random.split(key)
    sm = jax.random.normal(k1, (NB_TOT * BS, S, DIM), dt)
    sm = sm * jax.lax.rsqrt(jnp.sum(sm.astype(jnp.float32) ** 2, -1,
                                    keepdims=True) + 1e-9).astype(dt)
    q = jax.random.normal(k2, (B, LQ, DIM), jnp.float32)
    q = q / jnp.linalg.norm(q, axis=-1, keepdims=True)
    return sm, q.astype(jnp.float32)


def stage1_fn(n_blocks, variant):
    """Returns fn(q, blk, summ_blocks[, scale_blocks]) ->
    (B, n_blocks*BS) f32 approx scores. The big arrays ride as jit
    ARGUMENTS (closure capture would serialize GiBs into the HLO for
    the remote compiler — axon pitfall)."""

    def per_group(summ_blocks, scale_blocks, args):
        qi, blk_i = args                        # (g, Lq, d), (g, n_blocks)
        sg = jnp.take(summ_blocks, blk_i, axis=0)   # (g, nb, bs, S, d)
        if variant == "noop":
            # gather-only bound: the cheapest reduction that still READS
            # every gathered byte (a partial slice would let XLA shrink
            # the gather's slice_sizes and under-state the bound)
            return jnp.sum(sg.astype(jnp.float32), axis=(3, 4)) \
                .reshape(qi.shape[0], n_blocks * BS)
        if variant == "int8":
            s1 = jnp.einsum("gnbsd,gqd->gnbsq", sg.astype(jnp.bfloat16),
                            qi.astype(jnp.bfloat16),
                            preferred_element_type=jnp.float32)
            raw = jnp.sum(jnp.max(s1, axis=3), axis=-1)
            scl = jnp.take(scale_blocks, blk_i, axis=0)
            return (raw * scl).reshape(qi.shape[0], n_blocks * BS)
        s1 = jnp.einsum("gnbsd,gqd->gnbsq", sg.astype(jnp.float32), qi,
                        preferred_element_type=jnp.float32)
        return jnp.sum(jnp.max(s1, axis=3), axis=-1) \
            .reshape(qi.shape[0], n_blocks * BS)

    def fn(q, blk, summ_blocks, scale_blocks=None):
        import functools
        grp = lambda x: x.reshape((x.shape[0] // G, G) + x.shape[1:])
        out = jax.lax.map(
            functools.partial(per_group, summ_blocks, scale_blocks),
            (grp(q), grp(blk)))
        return out.reshape(B, n_blocks * BS)

    return fn


def timeit(name, fn, q, blk, extra, iters=ITERS):
    @jax.jit
    def run(qq0, blk_, *arrs):
        def body(qq, _):
            # data-dependent candidates: rotate blk by a value derived
            # from qq so XLA cannot hoist the gather out of the scan
            shift = (qq[0, 0, 0] * 0).astype(jnp.int32)
            out = fn(qq, blk_ + shift, *arrs)
            return qq + (out[:, 0] * 1e-9).astype(qq.dtype)[:, None, None], ()
        qq, _ = jax.lax.scan(body, qq0, None, length=iters)
        return qq[:1, :1, :1]
    _ = np.asarray(run(q, blk, *extra))
    t0 = time.perf_counter()
    _ = np.asarray(run(q, blk, *extra))
    dt_s = time.perf_counter() - t0
    print(f"{name}: {dt_s / iters * 1e3:.2f} ms/batch "
          f"({B * iters / dt_s:.0f} QPS)", flush=True)


def main():
    print(f"backend={jax.default_backend()}", flush=True)
    summ, q = jax.block_until_ready(build(jax.random.PRNGKey(0)))
    summ_blocks = summ.reshape(NB_TOT, BS, S, DIM)
    si8, ssc = jax.block_until_ready(quantize_summaries_int8(summ))
    si8_blocks = si8.reshape(NB_TOT, BS, S, DIM)
    ssc_blocks = ssc.reshape(NB_TOT, BS)
    del summ, si8, ssc

    rng = np.random.default_rng(0)
    for n_blocks in (min(128, NB_TOT), min(1024, NB_TOT)):
        blk = jnp.asarray(
            np.stack([rng.permutation(NB_TOT)[:n_blocks]
                      for _ in range(B)]).astype(np.int32))
        gib = B * n_blocks * BS * S * DIM / 2 ** 30
        print(f"-- n_blocks={n_blocks}: gathered {gib * 2:.2f} GiB bf16 "
              f"/ {gib:.2f} GiB int8 per batch", flush=True)
        timeit(f"s1_nb{n_blocks}_bf16",
               stage1_fn(n_blocks, "bf16"), q, blk, (summ_blocks,))
        timeit(f"s1_nb{n_blocks}_int8",
               stage1_fn(n_blocks, "int8"), q, blk,
               (si8_blocks, ssc_blocks))
        timeit(f"s1_nb{n_blocks}_gatheronly",
               stage1_fn(n_blocks, "noop"), q, blk, (summ_blocks,))
        timeit(f"s1_nb{n_blocks}_gatheronly_int8",
               stage1_fn(n_blocks, "noop"), q, blk, (si8_blocks,))
        # fused scalar-prefetch kernel (ops.maxsim.stage1_sweep_pallas):
        # streams the selected blocks HBM->VMEM, writes only the scores
        if jax.default_backend() == "tpu" \
                and not os.environ.get("RAVQA_SKIP_S1K"):
            from ravqa_tpu.ops.maxsim import stage1_rows, \
                stage1_sweep_pallas
            rows_bf = jax.block_until_ready(jax.jit(
                lambda sb: stage1_rows(
                    sb.reshape(NB_TOT * BS, S, DIM), BS))(summ_blocks))
            rows_i8 = jax.block_until_ready(jax.jit(
                lambda sb: stage1_rows(
                    sb.reshape(NB_TOT * BS, S, DIM), BS))(si8_blocks))
            for tb in (8, 16):
                timeit(f"s1_nb{n_blocks}_kernel_bf16_tb{tb}",
                       lambda qq, bl, r, tb=tb:
                       stage1_sweep_pallas(qq, r, bl, tile_b=tb),
                       q, blk, (rows_bf,))
                timeit(f"s1_nb{n_blocks}_kernel_int8_tb{tb}",
                       lambda qq, bl, r, ds, tb=tb:
                       stage1_sweep_pallas(qq, r, bl, tile_b=tb,
                                           dscale=ds),
                       q, blk, (rows_i8, ssc_blocks.reshape(-1)))
            rows_bf.delete()
            rows_i8.delete()


if __name__ == "__main__":
    main()
