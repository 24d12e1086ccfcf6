"""Late-interaction (ColBERT/FLMR) MaxSim scoring ops.

Semantics match the reference engine's scoring
(/root/reference/third_party/ColBERT/colbert/modeling/colbert.py:235-286):
per query token, take the max dot-product over a candidate document's token
embeddings (padded doc positions filled with -9999 before the max), then sum
over query tokens. Zeroed query rows (FLMR masks query embeddings to zero,
/root/reference/src/models/retriever/FLMR.py:73-99) contribute a max of at
most 0 and are additionally suppressed by the optional ``q_mask``.

Two implementations:

- ``maxsim_*_xla``: pure jax.numpy; runs anywhere (CPU tests, autodiff in
  training losses). XLA fuses the matmul + masked max + sum reasonably well.
- ``maxsim_search_pallas``: a fused Pallas TPU kernel for the serving path —
  a tiled D@Qᵀ on the MXU with the masked max-reduce and query-token sum done
  in VMEM, so the (doc_tokens × query_tokens) score matrix never touches HBM.
  This replaces the reference's segmented_maxsim.cpp / filter_pids.cpp /
  decompress_residuals.cpp C++ search path (SURVEY.md §2.4 N1/N4/N5).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

NEG_INF = -9999.0  # the reference's padding fill value (colbert.py:240)


# ---------------------------------------------------------------------------
# Pure-XLA reference implementations
# ---------------------------------------------------------------------------

def maxsim_reduce(scores: jax.Array, d_mask: jax.Array,
                  q_mask: jax.Array | None = None) -> jax.Array:
    """Reduce a token-score tensor to per-pair scores.

    Args:
      scores: (..., Ld, Lq) dot products between doc tokens and query tokens.
      d_mask: (..., Ld) 1/True for valid doc tokens.
      q_mask: optional (..., Lq) 1/True for valid query tokens.

    Returns:
      (...,) MaxSim scores: sum over query tokens of max over doc tokens.
    """
    d_mask = d_mask.astype(bool)[..., :, None]          # (..., Ld, 1)
    scores = jnp.where(d_mask, scores, NEG_INF)
    per_q = jnp.max(scores, axis=-2)                    # (..., Lq)
    if q_mask is not None:
        per_q = per_q * q_mask.astype(per_q.dtype)
    return jnp.sum(per_q, axis=-1)


def maxsim_pair_xla(q: jax.Array, d: jax.Array, d_mask: jax.Array,
                    q_mask: jax.Array | None = None) -> jax.Array:
    """Paired MaxSim: query i scores doc i.

    Args:
      q: (B, Lq, dim) query token embeddings (L2-normalized).
      d: (B, Ld, dim) doc token embeddings.
      d_mask: (B, Ld).
    Returns: (B,) scores.
    """
    scores = jnp.einsum("bld,bqd->blq", d, q,
                        preferred_element_type=jnp.float32)
    return maxsim_reduce(scores, d_mask, q_mask)


def maxsim_all_pairs_xla(q: jax.Array, d: jax.Array, d_mask: jax.Array,
                         q_mask: jax.Array | None = None) -> jax.Array:
    """All-pairs MaxSim score matrix (training in-batch negatives).

    Args:
      q: (Bq, Lq, dim); d: (Bd, Ld, dim); d_mask: (Bd, Ld); q_mask: (Bq, Lq).
    Returns: (Bq, Bd) scores.
    """
    # (Bd, Ld, Bq, Lq)
    scores = jnp.einsum("nld,bqd->nlbq", d, q,
                        preferred_element_type=jnp.float32)
    scores = jnp.where(d_mask.astype(bool)[:, :, None, None], scores, NEG_INF)
    per_q = jnp.max(scores, axis=1)                     # (Bd, Bq, Lq)
    if q_mask is not None:
        per_q = per_q * q_mask.astype(per_q.dtype)[None, :, :]
    return jnp.sum(per_q, axis=-1).T                    # (Bq, Bd)


def maxsim_all_pairs_blocked(q: jax.Array, d: jax.Array, d_mask: jax.Array,
                             q_mask: jax.Array | None = None, *,
                             block_n: int = 0,
                             compute_dtype=None) -> jax.Array:
    """All-pairs MaxSim without the full (Bd, Ld, Bq, Lq) HBM intermediate.

    Identical math to maxsim_all_pairs_xla, restructured for training
    (the in-batch-negative loss, reference colbert.py:82-113): a lax.map
    over doc blocks with jax.checkpoint on each block, so both the
    forward intermediate AND the autodiff residuals are bounded by one
    block's (block_n, Ld, Bq, Lq) tensor — the unblocked path saves the
    entire token-score tensor for the max's backward (e.g. 253 MB f32 at
    the reference bs30/nway5 config, 3.3 GB at the 9-ROI Lq=832 shape).

    Args:
      q: (Bq, Lq, dim); d: (Bd, Ld, dim); d_mask: (Bd, Ld).
      block_n: docs per block (0 -> one block, i.e. just remat). Bd is
        padded up to a multiple internally; padded docs are masked out.
      compute_dtype: dtype for the dot (e.g. jnp.bfloat16 to ride the
        MXU's native path — the reference scores docs in fp16 on GPU,
        colbert.py:204). None keeps the input dtype; accumulation is
        always f32.
    Returns: (Bq, Bd) f32 scores.
    """
    bd, ld, dim = d.shape
    bq = q.shape[0]
    qc = q.astype(compute_dtype) if compute_dtype is not None else q
    if block_n <= 0 or block_n >= bd:
        block_n = bd
    pad = (-bd) % block_n
    if pad:
        d = jnp.pad(d, ((0, pad), (0, 0), (0, 0)))
        d_mask = jnp.pad(d_mask, ((0, pad), (0, 0)))
    nb = d.shape[0] // block_n

    @jax.checkpoint
    def score_block(d_blk, m_blk):
        dc = d_blk.astype(compute_dtype) if compute_dtype is not None \
            else d_blk
        s = jnp.einsum("nld,bqd->nlbq", dc, qc,
                       preferred_element_type=jnp.float32)
        s = jnp.where(m_blk[:, :, None, None], s, NEG_INF)
        per_q = jnp.max(s, axis=1)                       # (blk, Bq, Lq)
        if q_mask is not None:
            per_q = per_q * q_mask.astype(per_q.dtype)[None]
        return jnp.sum(per_q, axis=-1).T                 # (Bq, blk)

    d_blocks = d.reshape(nb, block_n, ld, dim)
    m_blocks = d_mask.astype(bool).reshape(nb, block_n, ld)
    if nb == 1:
        out = score_block(d_blocks[0], m_blocks[0])
    else:
        out = jax.lax.map(lambda a: score_block(*a), (d_blocks, m_blocks))
        out = jnp.moveaxis(out, 0, 1).reshape(bq, nb * block_n)
    return out[:, :bd]


def maxsim_search_xla(q: jax.Array, index_tokens: jax.Array,
                      index_mask: jax.Array,
                      q_mask: jax.Array | None = None) -> jax.Array:
    """Score a query batch against every doc in a (padded) index. XLA path.

    Args:
      q: (B, Lq, dim); index_tokens: (N, Ld, dim); index_mask: (N, Ld).
    Returns: (B, N) float32 scores.
    """
    return maxsim_all_pairs_xla(q, index_tokens, index_mask, q_mask)


# ---------------------------------------------------------------------------
# Pallas TPU kernel: fused search over an HBM-resident index
# ---------------------------------------------------------------------------

def _maxsim_kernel(q_ref, d_ref, m_ref, out_ref, *, tile_d: int, ld: int,
                   b: int, lq: int):
    """One grid step: score all B queries against TILE_D docs.

    q_ref: (B*Lq, dim) VMEM — the full (flattened) query batch.
    d_ref: (TILE_D*Ld, dim) VMEM — this tile's doc tokens, flattened.
    m_ref: (TILE_D*Ld, 1) VMEM — validity mask, pre-flattened on host
      (Mosaic cannot shape-cast (TILE_D, Ld) -> (TILE_D*Ld, 1) in-kernel).
    out_ref: (TILE_D, B) VMEM — output scores tile (doc-major so the block's
      trailing dim equals the full array dim, per TPU tiling rules).
    """
    # MXU: (TILE_D*Ld, dim) @ (dim, B*Lq) -> (TILE_D*Ld, B*Lq)
    s = jax.lax.dot_general(
        d_ref[:], q_ref[:],
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    s = jnp.where(m_ref[:] > 0, s, NEG_INF)
    s = s.reshape(tile_d, ld, b * lq)
    per_q = jnp.max(s, axis=1)                          # (TILE_D, B*Lq)
    # Sum per_q over each query's Lq columns. Mosaic can't shape-cast the
    # lane dim (B*Lq) -> (B, Lq), so do it as a matmul with a block-diagonal
    # 0/1 selector: out[t, b] = sum_c per_q[t, c] * [c // Lq == b].
    row = jax.lax.broadcasted_iota(jnp.int32, (b * lq, b), 0)
    col = jax.lax.broadcasted_iota(jnp.int32, (b * lq, b), 1)
    sel = (row // lq == col).astype(jnp.float32)
    out_ref[:] = jax.lax.dot_general(
        per_q, sel,
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )                                                   # (TILE_D, B)


@functools.partial(jax.jit, static_argnames=("tile_d",))
def maxsim_search_pallas(q: jax.Array, index_tokens: jax.Array,
                         index_mask: jax.Array, tile_d: int = 16) -> jax.Array:
    """Fused MaxSim search on TPU.

    Args:
      q: (B, Lq, dim) query token embeddings (bf16 or f32). Masked-out query
         rows must be zero vectors (they then contribute max(q·d)=0 ≤ any
         valid contribution only when scores are ≥0; FLMR normalizes rows so
         zero rows give exactly 0, matching the reference searcher's
         remove_zero_tensors handling when summed).
      index_tokens: (N, Ld, dim), N divisible by tile_d (pad with masked docs).
      index_mask: (N, Ld) int/bool, 0 on padded doc tokens.
      tile_d: docs per grid step; tile_d*Ld*dim*2B must fit VMEM comfortably.

    Returns: (B, N) float32 scores.
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    b, lq, dim = q.shape
    n, ld, dim2 = index_tokens.shape
    assert dim == dim2
    assert n % tile_d == 0, f"pad index to multiple of tile_d={tile_d}"

    q_flat = q.reshape(b * lq, dim)
    d_flat = index_tokens.reshape(n * ld, dim)
    mask = index_mask.astype(jnp.float32).reshape(n * ld, 1)

    kernel = functools.partial(_maxsim_kernel, tile_d=tile_d, ld=ld, b=b,
                               lq=lq)
    grid = (n // tile_d,)
    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((b * lq, dim), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_d * ld, dim), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_d * ld, 1), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tile_d, b), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, b), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=2 * n * ld * b * lq * dim,
            bytes_accessed=(d_flat.size * d_flat.dtype.itemsize
                            + q_flat.size * q_flat.dtype.itemsize
                            + b * n * 4),
            transcendentals=0,
        ),
    )(q_flat, d_flat, mask)
    return out.T  # (B, N)


def _coarse_sweep_kernel(q_ref, d_ref, v_ref, out_ref, *, s: int, lq: int,
                         qc: int):
    """One grid step: MaxSim of all queries against TILE_N docs' summary
    vectors, written DIRECTLY in (B, TILE_N) layout with padded docs
    masked to NEG_INF in-kernel. (The earlier (TILE_N, B) variant forced
    the caller to transpose + mask the (B, N) scores on the host side of
    the custom call — a ~7 ms/batch materialization at 1M docs that
    dwarfed the downstream approx_max_k cut.)

    q_ref: (B*Lq, dim) VMEM; d_ref: (S, TILE_N, dim) VMEM — summary-
    slot-major so the max over S is S-1 aligned elementwise maximums of
    (qc, TILE_N) matmul outputs, never a strided sublane reduce (the
    (TILE_N*S, dim) interleaved variant ran ~2x slower at S=4);
    v_ref: (1, TILE_N) f32 doc validity; out_ref: (B, TILE_N) VMEM.
    Query columns are processed in chunks of `qc` rows so the f32 score
    block stays a few MB of VMEM.
    """
    parts = []
    for c in range(q_ref.shape[0] // qc):        # static chunk loop
        qblk = q_ref[c * qc:(c + 1) * qc, :]     # (qc, dim)
        m = jax.lax.dot_general(
            qblk, d_ref[0], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)  # (qc, TILE_N)
        for si in range(1, s):
            m = jnp.maximum(m, jax.lax.dot_general(
                qblk, d_ref[si], (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32))
        # sum each query's Lq rows via a block-diagonal 0/1 selector
        # matmul (Mosaic cannot shape-cast qc -> (nq, Lq) and a strided
        # sublane reduce would be slow anyway)
        row = jax.lax.broadcasted_iota(jnp.int32, (qc // lq, qc), 0)
        col = jax.lax.broadcasted_iota(jnp.int32, (qc // lq, qc), 1)
        sel = (col // lq == row).astype(jnp.float32)
        parts.append(jax.lax.dot_general(
            sel, m, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32))  # (qc/Lq, TILE_N)
    out = parts[0] if len(parts) == 1 \
        else jnp.concatenate(parts, axis=0)      # (B, TILE_N)
    out_ref[:] = jnp.where(v_ref[0][None, :] > 0, out, NEG_INF)


def _coarse_sweep_int8_kernel(q_ref, qs_ref, d_ref, ds_ref, v_ref, out_ref,
                              *, s: int, lq: int, qc: int):
    """int8 variant of _coarse_sweep_kernel: the (qc, TILE_N) score blocks
    ride the MXU's int8 path (2x bf16 throughput on v5e, int32
    accumulation). The output is FULLY dequantized — it equals the float
    sweep up to int8 rounding error — via two scale applications:

      - PER-DOC summary scales (constant across the S slots, so the
        int32 max over S stays order-correct) multiply the
        f32-converted block as one (1, TILE_N) broadcast AFTER the max;
      - PER-QUERY-TOKEN scales fold into the Lq-sum selector matmul —
        the 0/1 block-diagonal selector's entries become the token's
        scale, so the sum over Lq applies them for free.

    q_ref (B*Lq, dim) int8; qs_ref (1, B*Lq) f32 query-token scales;
    d_ref (S, TILE_N, dim) int8; ds_ref (1, TILE_N) f32 per-doc scales;
    v_ref (1, TILE_N) f32 validity; out_ref (B, TILE_N) f32.
    """
    dsc = ds_ref[0][None, :]                     # (1, TILE_N)
    parts = []
    for c in range(q_ref.shape[0] // qc):        # static chunk loop
        qblk = q_ref[c * qc:(c + 1) * qc, :]     # (qc, dim) int8
        m = jax.lax.dot_general(
            qblk, d_ref[0], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.int32)    # (qc, TILE_N) int32
        for si in range(1, s):
            m = jnp.maximum(m, jax.lax.dot_general(
                qblk, d_ref[si], (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.int32))
        mf = m.astype(jnp.float32) * dsc         # per-doc scale, post-max
        row = jax.lax.broadcasted_iota(jnp.int32, (qc // lq, qc), 0)
        col = jax.lax.broadcasted_iota(jnp.int32, (qc // lq, qc), 1)
        sel = (col // lq == row).astype(jnp.float32) \
            * qs_ref[0, c * qc:(c + 1) * qc][None, :]
        parts.append(jax.lax.dot_general(
            sel, mf, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32))  # (qc/Lq, TILE_N)
    out = parts[0] if len(parts) == 1 \
        else jnp.concatenate(parts, axis=0)      # (B, TILE_N)
    out_ref[:] = jnp.where(v_ref[0][None, :] > 0, out, NEG_INF)


@functools.partial(jax.jit, static_argnames=("tile_n", "queries_per_chunk"))
def coarse_sweep_pallas(q: jax.Array, summaries_t: jax.Array,
                        valid: jax.Array | None = None,
                        tile_n: int = 1024,
                        queries_per_chunk: int = 32,
                        dscale: jax.Array | None = None) -> jax.Array:
    """Fused coarse summary sweep: (B, Lq, dim) x (S, N, dim) -> (B, N)
    approximate MaxSim scores. `valid` ((N,) bool/float, optional): docs
    whose entry is falsy score NEG_INF — masked in-kernel, so no (B, N)
    where-pass materializes after the sweep.

    Replaces coarse_scores' XLA einsum on TPU for LARGE N: XLA cannot
    reassociate the einsum -> max-over-S -> sum-over-Lq chain into the
    matmul, so it materializes the (N, S, B, Lq) f32 intermediate in HBM
    (~16-33 GiB of traffic at 1M docs — the entire two-stage 1M cost:
    41-59 ms/batch vs 9.1 ms (S=4) / 15.0 ms (S=8) here, within 1.4-1.7x
    of the bf16 compute roofline; scripts/exp_coarse_kernel.py).

    summaries_t: summary vectors in SLOT-MAJOR layout (S, N, dim) —
    jnp.swapaxes(summaries, 0, 1) of the (N, S, dim) build layout,
    transposed ONCE at searcher construction (TokenIndex layout is
    unchanged; hierarchical block gathers need doc-major).
    tile_n: docs per grid step; queries_per_chunk: query-column chunk =
    queries_per_chunk * Lq lanes (both robust +/-5% across 256-1024).
    dscale: (N,) f32 per-doc summary scales — REQUIRED when summaries_t
    is int8 (ops.quant.quantize_summaries_t_int8). The int8 path rides
    the MXU's 2x int8 throughput and halves the sweep's HBM traffic;
    queries are quantized per-token on entry. Output scores are fully
    dequantized — they equal the float sweep up to int8 rounding error
    (well within what the downstream candidate cuts tolerate).
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    b, lq, dim = q.shape
    s, n, dim2 = summaries_t.shape
    assert dim == dim2
    int8_path = summaries_t.dtype == jnp.int8
    if int8_path:
        assert dscale is not None, "int8 summaries_t requires dscale"
    while n % tile_n:
        tile_n //= 2
    qc = min(queries_per_chunk, b) * lq
    while (b * lq) % qc:
        qc -= lq

    # shrink tile_n until the per-step VMEM footprint fits the ~16 MiB
    # scoped limit (double-buffered summary block + resident q + f32
    # score block + selector + out). Matters for f32 summaries — the
    # bf16 defaults fit, f32 at tile_n=1024 overflows by ~0.6 MiB.
    isz = summaries_t.dtype.itemsize
    def _vmem(tn):
        # two live f32 score blocks when s > 1: the running-max
        # accumulator plus the fresh dot result (measured: f32 summaries
        # at tile_n=1024 need 16.57 MiB, exactly this model's 16.8).
        # int8: int32 accumulator pair + the f32 converted block.
        nblk = (2 if s > 1 else 1) + (1 if int8_path else 0)
        return (2 * s * tn * dim * isz          # summary block (dbuf)
                + b * lq * dim * isz            # q (resident)
                + nblk * tn * qc * 4            # score blocks
                + qc * (qc // lq) * 4           # selector
                + tn * b * 4)                   # out tile
    while tile_n > 8 and _vmem(tile_n) > 12 * 2 ** 20:
        tile_n //= 2

    if valid is None:
        valid_row = jnp.ones((1, n), jnp.float32)
    else:
        valid_row = (valid != 0).astype(jnp.float32).reshape(1, n)

    q_common = [
        pl.BlockSpec((b * lq, dim), lambda i: (0, 0),
                     memory_space=pltpu.VMEM),
    ]
    tail_specs = [
        pl.BlockSpec((s, tile_n, dim), lambda i: (0, i, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, tile_n), lambda i: (0, i),
                     memory_space=pltpu.VMEM),
    ]
    cost = pl.CostEstimate(
        flops=2 * n * s * b * lq * dim,
        bytes_accessed=(summaries_t.size * summaries_t.dtype.itemsize
                        + b * lq * dim * isz + n * b * 4),
        transcendentals=0,
    )

    if int8_path:
        # per-token symmetric query quantization (zero rows stay zero,
        # scale eps — they contribute ~0, matching the float path);
        # lazy import: ops.quant imports NEG_INF from this module
        from .quant import quantize_queries_int8
        qi, qsc = quantize_queries_int8(q.astype(jnp.float32))
        q_flat = qi.reshape(b * lq, dim)
        qs_row = qsc.reshape(1, b * lq)
        ds_row = dscale.astype(jnp.float32).reshape(1, n)
        kernel = functools.partial(_coarse_sweep_int8_kernel, s=s, lq=lq,
                                   qc=qc)
        return pl.pallas_call(
            kernel,
            grid=(n // tile_n,),
            in_specs=q_common + [
                pl.BlockSpec((1, b * lq), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
                tail_specs[0],
                pl.BlockSpec((1, tile_n), lambda i: (0, i),
                             memory_space=pltpu.VMEM),
                tail_specs[1],
            ],
            out_specs=pl.BlockSpec((b, tile_n), lambda i: (0, i),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((b, n), jnp.float32),
            cost_estimate=cost,
        )(q_flat, qs_row, summaries_t, ds_row, valid_row)  # (B, N)

    q_flat = q.reshape(b * lq, dim).astype(summaries_t.dtype)
    kernel = functools.partial(_coarse_sweep_kernel, s=s, lq=lq, qc=qc)
    return pl.pallas_call(
        kernel,
        grid=(n // tile_n,),
        in_specs=q_common + tail_specs,
        out_specs=pl.BlockSpec((b, tile_n), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, n), jnp.float32),
        cost_estimate=cost,
    )(q_flat, summaries_t, valid_row)  # (B, N)


def _stage1_sweep_kernel(blk_ref, q_ref, *refs, s: int, lq: int, tb: int):
    """Fused gathered stage-1 sweep body (see stage1_sweep_pallas).

    blk_ref: (B, n_blocks) int32 scalar-prefetch (consumed by the
    index_maps — the kernel body never reads it); q_ref (1, Lq, dim);
    refs[:-1]: tb views of summ_rows, each (1, S, bs, dim) — the k-th
    spec's index_map DMAs block blk[b, t*tb+k]; refs[-1]: out
    (1, 1, 1, tb*bs) f32 raw scores (4-D so the block's last two dims
    exactly match the array dims — Mosaic rejects a (1, tb*bs) block
    over a (B, n_blocks*bs) array because the sublane dim is neither
    divisible by 8 nor full).

    Same compute pattern as _coarse_sweep_kernel: the max over S is S-1
    aligned elementwise maximums of (Lq, tb*bs) matmul outputs (never a
    strided sublane reduce), and the sum over Lq is one (1, Lq) ones
    matmul.
    """
    del blk_ref
    out_ref = refs[-1]
    d_refs = refs[:-1]
    q = q_ref[0]                                    # (Lq, dim)
    m = None
    for si in range(s):
        cols = [jax.lax.dot_general(
            q, d_refs[k][0, si].astype(q.dtype),
            (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32) for k in range(tb)]
        msi = cols[0] if tb == 1 else jnp.concatenate(cols, axis=1)
        m = msi if m is None else jnp.maximum(m, msi)  # (Lq, tb*bs)
    ones = jnp.ones((1, lq), jnp.float32)
    red = jax.lax.dot_general(
        ones, m, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)         # (1, tb*bs)
    out_ref[:] = red.reshape(out_ref.shape)


def stage1_rows(summaries: jax.Array, block_size: int) -> jax.Array:
    """(N, S, dim) doc summaries -> (N/bs, S, bs, dim) block-slot-major
    rows for stage1_sweep_pallas (each block's slot-s summaries are one
    contiguous (bs, dim) tile, mirroring coarse_sweep_pallas's
    slot-major layout)."""
    n, s, d = summaries.shape
    nb = n // block_size
    return jnp.swapaxes(summaries.reshape(nb, block_size, s, d), 1, 2)


@functools.partial(jax.jit, static_argnames=("tile_b",))
def stage1_sweep_pallas(q: jax.Array, summ_rows: jax.Array,
                        blk: jax.Array, tile_b: int = 8,
                        dscale: jax.Array | None = None) -> jax.Array:
    """Fused hierarchical stage-1 sweep: score each query against the
    doc summaries of ITS OWN selected blocks, streaming the blocks from
    HBM straight into VMEM via scalar-prefetch indexed DMA.

    q (B, Lq, dim); summ_rows (NB, S, bs, dim) — stage1_rows layout,
    bf16 or int8; blk (B, n_blocks) int32 stage-0 winners;
    dscale ((NB*bs,) f32 per-doc scales, required for int8 summ_rows —
    ops.quant.quantize_summaries_int8). Returns (B, n_blocks*bs) f32
    approx scores in gathered order (caller applies doc-validity
    masking, exactly like the XLA stage-1 path).

    Replaces the XLA stage-1 (jnp.take + einsum inside lax.map), which
    materializes BOTH the gathered summary copy and the
    (g, nb, bs, S, Lq) f32 dot intermediate in HBM; here only the
    (B, n_blocks*bs) scores are written. tile_b: blocks DMA'd per grid
    step (tb BlockSpecs over the same operand — no copies, one
    index_map each reading blk[b, t*tb+k]); bigger tiles amortize the
    per-step grid overhead, clamped so tb*bs stays lane-aligned and
    divides n_blocks.
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    import math

    b, lq, dim = q.shape
    nb, s, bs, dim2 = summ_rows.shape
    assert dim == dim2
    n_blocks = blk.shape[1]
    int8_path = summ_rows.dtype == jnp.int8
    if int8_path:
        assert dscale is not None, "int8 summ_rows requires dscale"
    # tb*bs must be a multiple of 128 lanes (out block constraint) and
    # divide n_blocks
    req = 128 // math.gcd(bs, 128)
    if n_blocks % req:
        # (previously this fell into a ZeroDivisionError in the tb
        # search below — give the caller the actual constraint instead)
        raise ValueError(
            f"stage1_sweep_pallas: n_blocks={n_blocks} must be a "
            f"multiple of 128/gcd(block_size={bs}, 128) = {req} (the "
            "output block is tb*bs lanes); round the selected-block "
            "count or use the XLA stage 1")
    tb = max(tile_b - tile_b % req, req)
    while n_blocks % tb:
        tb -= req
    assert tb >= req and n_blocks % tb == 0, (n_blocks, bs, tile_b)

    cdt = jnp.bfloat16 if summ_rows.dtype != jnp.float32 else jnp.float32
    qc = q.astype(cdt)

    kernel = functools.partial(_stage1_sweep_kernel, s=s, lq=lq, tb=tb)
    summ_specs = [
        pl.BlockSpec((1, s, bs, dim),
                     (lambda b_, t, blk_ref, k=k:
                      (blk_ref[b_, t * tb + k], 0, 0, 0)),
                     memory_space=pltpu.VMEM)
        for k in range(tb)
    ]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(b, n_blocks // tb),
        in_specs=[
            pl.BlockSpec((1, lq, dim), lambda b_, t, blk_ref: (b_, 0, 0),
                         memory_space=pltpu.VMEM),
        ] + summ_specs,
        out_specs=pl.BlockSpec((1, 1, 1, tb * bs),
                               lambda b_, t, blk_ref: (b_, t, 0, 0),
                               memory_space=pltpu.VMEM),
    )
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((b, n_blocks // tb, 1, tb * bs),
                                       jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=2 * b * n_blocks * bs * s * lq * dim,
            bytes_accessed=(b * n_blocks * bs * s * dim
                            * summ_rows.dtype.itemsize
                            + q.size * 2 + b * n_blocks * bs * 4),
            transcendentals=0,
        ),
    )(blk.astype(jnp.int32), qc, *([summ_rows] * tb))
    out = out.reshape(b, n_blocks * bs)
    if dscale is not None:
        scl = jnp.take(dscale.reshape(nb, bs), blk, axis=0)  # (B, nbl, bs)
        out = out * scl.reshape(b, n_blocks * bs)
    return out


def stage1_sweep_xla(q: jax.Array, summ_rows: jax.Array, blk: jax.Array,
                     dscale: jax.Array | None = None) -> jax.Array:
    """XLA twin of stage1_sweep_pallas — identical math over the same
    stage1_rows layout (gather + bf16 dot + max-over-slots +
    sum-over-query + post-hoc per-doc dscale), for non-TPU backends.
    Keeps the summ_rows program portable: the sharded search built with
    use_summ_rows runs everywhere, the fused kernel lowers only where
    Mosaic does (interpret-mode pallas inside an 8-device CPU shard_map
    deadlocks in jax 0.9's io_callback — measured, do not revisit)."""
    b = q.shape[0]
    nb, s, bs, d = summ_rows.shape
    cdt = jnp.bfloat16 if summ_rows.dtype != jnp.float32 else jnp.float32
    sg = jnp.take(summ_rows, blk, axis=0)           # (B, nbl, S, bs, d)
    s1 = jnp.einsum("gnsbd,gqd->gnbsq", sg.astype(cdt), q.astype(cdt),
                    preferred_element_type=jnp.float32)
    out = jnp.sum(jnp.max(s1, axis=3), axis=-1).reshape(b, -1)
    if dscale is not None:
        scl = jnp.take(dscale.reshape(nb, bs), blk, axis=0)
        out = out * scl.reshape(b, -1)
    return out


def maxsim_search(q: jax.Array, index_tokens: jax.Array,
                  index_mask: jax.Array,
                  q_mask: jax.Array | None = None,
                  tile_d: int = 16) -> jax.Array:
    """Dispatch: Pallas on TPU, XLA elsewhere. Returns (B, N) f32 scores."""
    platform = jax.default_backend()
    if platform == "tpu" and q_mask is None and (index_tokens.shape[0]
                                                 % tile_d == 0):
        return maxsim_search_pallas(q, index_tokens, index_mask,
                                    tile_d=tile_d)
    return maxsim_search_xla(q, index_tokens, index_mask, q_mask)


# ---------------------------------------------------------------------------
# FLIPR interaction (PreFLMR): partial top-K sums over query-token maxima
# ---------------------------------------------------------------------------

def flipr_reduce(scores: jax.Array, d_mask: jax.Array,
                 query_part_len: int, k1: int, k2: int) -> jax.Array:
    """FLIPR interaction (reference colbert.py:248-261): split query tokens
    into [question-part | context-part], keep top-k1 of the question-part
    per-token maxima and top-k2 of the context-part, sum both.

    Args:
      scores: (..., Ld, Lq); d_mask: (..., Ld).
    """
    d_mask = d_mask.astype(bool)[..., :, None]
    scores = jnp.where(d_mask, scores, NEG_INF)
    per_q = jnp.max(scores, axis=-2)                     # (..., Lq)
    first = per_q[..., :query_part_len]
    rest = per_q[..., query_part_len:]
    top1, _ = jax.lax.top_k(first, min(k1, first.shape[-1]))
    out = jnp.sum(top1, axis=-1)
    # Reference edge case (colbert.py:258): the context-part sum is added
    # only when at least k2 context tokens exist; a shorter context part
    # contributes NOTHING (not a partial top-k).
    if k2 > 0 and rest.shape[-1] >= k2:
        top2, _ = jax.lax.top_k(rest, k2)
        out = out + jnp.sum(top2, axis=-1)
    return out
