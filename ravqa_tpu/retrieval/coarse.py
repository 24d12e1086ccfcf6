"""Two-stage (coarse -> fine) late-interaction search.

The reference prunes candidates with an IVF over k-means centroids plus
threshold stages (candidate_generation.py, index_storage.py:100-182 —
ragged CPU/C++ machinery). The TPU-native replacement is dense: each doc
gets `n_summary` summary vectors (per-doc spherical k-means of its token
embeddings); the coarse stage scores ALL docs against the summaries
(a small MaxSim — n_summary << Ld tokens), takes the top `n_candidates`,
gathers only those docs' full token embeddings, and re-scores exactly.
Static shapes, pure matmul+top_k+gather: no IVF, no raggedness, no
recompilation.

Cost per query ≈ 2·N·S·Lq·dim (coarse) + 2·C·Ld·Lq·dim (fine), an
(Ld/S)·(N/C)-fold FLOP reduction over exhaustive search at a measured
coarse-recall cost (tested; tune n_summary / n_candidates per corpus).

The reference's query-truncation trick (only the first query_maxlen tokens
drive candidate generation, index_storage.py:68-77) is exposed as
`coarse_query_len`.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp

from ..ops.maxsim import NEG_INF, maxsim_search_xla


@functools.partial(jax.jit, static_argnames=("n_summary", "iters"))
def summarize_docs(tokens: jax.Array, mask: jax.Array, n_summary: int = 8,
                   iters: int = 6) -> jax.Array:
    """Per-doc spherical k-means over token embeddings.

    tokens: (N, Ld, dim) L2-normalized; mask (N, Ld).
    Returns (N, n_summary, dim) L2-normalized summary vectors. Docs with
    fewer valid tokens than n_summary get duplicated centroids (harmless:
    max over duplicates equals max over one).
    """
    n, ld, dim = tokens.shape
    mask_f = mask.astype(jnp.float32)

    def per_doc(tok, m):
        tok = tok.astype(jnp.float32)  # upcast per block, not whole index
        # init: first n_summary valid tokens (valid-first stable ordering)
        order = jnp.argsort(-m)                     # valid tokens first
        cent = tok[order[:n_summary]]               # (S, dim)

        def step(c, _):
            sims = tok @ c.T                        # (Ld, S)
            assign = jnp.argmax(sims, -1)
            onehot = jax.nn.one_hot(assign, n_summary,
                                    dtype=jnp.float32) * m[:, None]
            tot = onehot.T @ tok                    # (S, dim)
            cnt = jnp.sum(onehot, 0)[:, None]
            new = jnp.where(cnt > 0, tot, c)
            norm = jnp.linalg.norm(new, axis=-1, keepdims=True)
            new = new / jnp.maximum(norm, 1e-9)
            return new, ()
        cent, _ = jax.lax.scan(step, cent, None, length=iters)
        return cent

    return jax.vmap(per_doc)(tokens, mask_f)


def coarse_scores(q: jax.Array, summaries: jax.Array,
                  coarse_query_len: Optional[int] = None) -> jax.Array:
    """(B, Lq, dim) x (N, S, dim) -> (B, N) approx MaxSim (all summaries
    valid)."""
    if coarse_query_len is not None:
        q = q[:, :coarse_query_len]
    s = jnp.einsum("nsd,bqd->nsbq", summaries, q,
                   preferred_element_type=jnp.float32)
    per_q = jnp.max(s, axis=1)                      # (N, B, Lq)
    return jnp.sum(per_q, axis=-1).T                # (B, N)


# Fully-batched residual fine stage gate. ISOLATED (candidates supplied
# externally) the batched decompress+einsum wins big on v5e — 1.5/2.6 ms
# vs per-query 4.9/7.2 ms at C=256/1024 on a 1M index — but INTEGRATED
# inside hierarchical_search it consistently REGRESSES the whole program
# (15.1 vs 11.0 ms at B128/C1024; 4.8 vs 4.4 at B64/C256, 1M docs):
# XLA's schedule/layout for stages 0-1 degrades around the big batched
# intermediate. Default is therefore the per-query path (0); set
# RAVQA_FINE_BATCH_BUDGET (bytes allowed for the (B,C,Ld,Lq) f32 score
# intermediate) to enable batching when profiling shows it wins for a
# given deployment. Numbers: scripts/exp_residual_stage2.py rounds 3-7.
import os as _os
_FINE_BATCH_BUDGET = int(_os.environ.get("RAVQA_FINE_BATCH_BUDGET", 0))


def _fine_stage(q, cand, tokens, mask, *, k: int,
                scales=None, records=None, centroids=None,
                bucket_weights=None, nbits: int = 0,
                use_pallas_residual: bool = False):
    """Exact re-score of per-query candidate sets -> (scores (B,k), rows).

    Shared by two_stage_search (fine stage) and hierarchical_search
    (stage 2). q: (B, Lq, dim); cand: (B, C) candidate rows. Residual
    indexes pass `records` — the packed per-doc [codes|scales|residual
    bytes] rows (ops.residual.pack_records).
    """
    if records is not None:
        # residual codec. ONE wide-row gather of the packed records
        # (gathering codes/scales/bytes as separate arrays measured
        # ~2.5x slower — small-row gather overhead,
        # scripts/exp_residual_stage2.py), then decompress+score.
        from ..ops.residual import (decompress, maxsim_residual_pallas,
                                    split_records)
        b, c = cand.shape
        ld = mask.shape[1]
        lq = q.shape[1]
        rg = jnp.take(records, cand, axis=0)                 # (B, C, RB)
        cg, sg, pg = split_records(rg, ld)
        mg = jnp.take(mask, cand, axis=0)

        if use_pallas_residual and centroids.shape[0] <= 1024:
            # fused decompress+MaxSim kernel: candidates stay packed all
            # the way into VMEM (ops.residual.maxsim_residual_pallas).
            # Gated to small codebooks — its in-VMEM one-hot centroid
            # matmul scales with K; the batched XLA path wins at K=8192.
            tc = 32
            while c % tc:
                tc //= 2
            sc = maxsim_residual_pallas(
                q.astype(jnp.float32), cg, pg, mg, centroids,
                bucket_weights, sg, nbits=nbits, tile_c=tc)
            top_s, sel = jax.lax.top_k(sc, k)
            return top_s, jnp.take_along_axis(cand, sel, axis=1)

        if b * c * ld * lq * 4 <= _FINE_BATCH_BUDGET:
            # decompress to bf16, MXU bf16 x bf16 (f32 accum): bucket-
            # quantization error >> bf16 rounding. Reconstruction-norm
            # scales carry the reference's post-decompress L2
            # normalization (residual.py:273-276) into the scores.
            tok = decompress(cg, pg, centroids, bucket_weights, nbits)
            s = jnp.einsum("bcld,bqd->bclq", tok, q.astype(tok.dtype),
                           preferred_element_type=jnp.float32)
            s = s * sg[..., None]
            s = jnp.where(mg.astype(bool)[..., None], s, NEG_INF)
            sc = jnp.sum(jnp.max(s, axis=2), axis=-1)        # (B, C)
            top_s, sel = jax.lax.top_k(sc, k)
            return top_s, jnp.take_along_axis(cand, sel, axis=1)

        def fine_res(args):                                  # large-C path
            qi, cand_i, cgi, pgi, mgi, sgi = args
            tok = decompress(cgi, pgi, centroids, bucket_weights, nbits)
            s = jnp.einsum("cld,qd->clq", tok, qi.astype(tok.dtype),
                           preferred_element_type=jnp.float32)
            s = s * sgi[:, :, None]
            s = jnp.where(mgi.astype(bool)[:, :, None], s, NEG_INF)
            sc = jnp.sum(jnp.max(s, axis=1), axis=-1)        # (C,)
            top_s, top_i = jax.lax.top_k(sc, k)
            return top_s, jnp.take(cand_i, top_i)

        return jax.lax.map(fine_res,
                           (q.astype(jnp.float32), cand, cg, pg, mg, sg))

    # Per-query fine stage via lax.map: XLA fuses the gather + einsum + max
    # per query without materializing the (B, C, Ld, Lq) tensor. Measured
    # faster than the fully-vectorized batched einsum (whose HBM-resident
    # f32 intermediate costs more bandwidth than the serialization saves):
    # C=256: 3486 vs 3215 QPS; C=1024: 2664 vs 2001 QPS on v5e. The big
    # bf16/int8 token rows stay per-query too: batching THEIR gather would
    # materialize (B, C, Ld, dim) — hundreds of MB — for an overhead saving
    # that only matters for small compressed rows.
    def fine_one(args):
        qi, cand_i = args
        tok = jnp.take(tokens, cand_i, axis=0)               # (C, Ld, dim)
        s = jnp.einsum("cld,qd->clq", tok.astype(jnp.float32), qi,
                       preferred_element_type=jnp.float32)
        msk = jnp.take(mask, cand_i, axis=0)
        if scales is not None:                               # int8 index
            scl = jnp.take(scales, cand_i, axis=0)           # (C, Ld)
            s = s * scl[:, :, None]
        s = jnp.where(msk.astype(bool)[:, :, None], s, NEG_INF)
        sc = jnp.sum(jnp.max(s, axis=1), axis=-1)            # (C,)
        top_s, top_i = jax.lax.top_k(sc, k)
        return top_s, jnp.take(cand_i, top_i)

    return jax.lax.map(fine_one, (q.astype(jnp.float32), cand))


@functools.partial(jax.jit, static_argnames=("k", "n_candidates",
                                             "coarse_query_len",
                                             "use_pallas_coarse",
                                             "use_pallas_residual", "nbits"))
def two_stage_search(q: jax.Array, tokens: Optional[jax.Array],
                     mask: jax.Array,
                     summaries: jax.Array, *, k: int,
                     n_candidates: int = 1024,
                     coarse_query_len: Optional[int] = None,
                     use_pallas_coarse: bool = False,
                     use_pallas_residual: bool = False,
                     scales: Optional[jax.Array] = None,
                     records: Optional[jax.Array] = None,
                     centroids: Optional[jax.Array] = None,
                     bucket_weights: Optional[jax.Array] = None,
                     nbits: int = 0):
    """Returns (scores (B, k), rows (B, k)) — exact scores on the coarse
    stage's top `n_candidates` docs.

    use_pallas_coarse: run the coarse summary sweep through the fused
    Pallas MaxSim kernel (TPU) instead of the XLA einsum.
    use_pallas_residual: re-score residual-codec candidates with the fused
    decompress+MaxSim Pallas kernel (TPU; ops.residual).
    scales: per-token f32 scales when `tokens` is an int8-quantized index
    (ops.quant.quantize_index_int8) — dequantization happens inside the
    fine stage, so a 1M-passage index fits one chip's HBM.
    records/centroids/bucket_weights/nbits: residual-codec index
    (ops.residual; tokens=None) — `records` holds the packed per-doc
    [codes|scales|residual bytes] rows; candidates decompress inside the
    fine stage, nothing ever materializes at full precision.
    """
    if use_pallas_coarse:
        from ..ops.maxsim import maxsim_search_pallas
        qc = q if coarse_query_len is None else q[:, :coarse_query_len]
        ones = jnp.ones(summaries.shape[:2], jnp.float32)
        approx = maxsim_search_pallas(qc, summaries, ones, tile_d=128)
    else:
        approx = coarse_scores(q, summaries, coarse_query_len)  # (B, N)
    # padded index rows have all-zero summaries scoring exactly 0, which
    # would outrank real docs with negative coarse scores and burn
    # candidate slots — mask them to NEG_INF
    doc_valid = jnp.any(mask != 0, axis=1)                   # (N,)
    approx = jnp.where(doc_valid[None, :], approx, NEG_INF)
    _, cand = jax.lax.top_k(approx, n_candidates)            # (B, C)

    return _fine_stage(q, cand, tokens, mask, k=k, scales=scales,
                       records=records, centroids=centroids,
                       bucket_weights=bucket_weights, nbits=nbits,
                       use_pallas_residual=use_pallas_residual)


# ---------------------------------------------------------------------------
# Hierarchical (3-stage) search for very large corpora (Infoseek scale)
# ---------------------------------------------------------------------------

@functools.partial(jax.jit, static_argnames=("block_size", "n_block_summary",
                                             "iters"))
def block_summaries(summaries: jax.Array, block_size: int = 64,
                    n_block_summary: int = 4, iters: int = 4) -> jax.Array:
    """Second summary level: k-means over each BLOCK of docs' summary
    vectors. summaries (N, S, dim) with N % block_size == 0 ->
    (N/block_size, n_block_summary, dim)."""
    n, s, d = summaries.shape
    blocks = summaries.reshape(n // block_size, block_size * s, d)
    ones = jnp.ones(blocks.shape[:2], jnp.int8)
    return summarize_docs(blocks, ones, n_summary=n_block_summary,
                          iters=iters)


@functools.partial(jax.jit, static_argnames=("k", "n_blocks", "n_candidates",
                                             "block_size",
                                             "coarse_query_len",
                                             "use_pallas_residual", "nbits"))
def hierarchical_search(q: jax.Array, tokens: Optional[jax.Array],
                        mask: jax.Array,
                        summaries: jax.Array, block_summ: jax.Array, *,
                        k: int, n_blocks: int = 1024,
                        n_candidates: int = 1024, block_size: int = 64,
                        scales: Optional[jax.Array] = None,
                        coarse_query_len: Optional[int] = None,
                        use_pallas_residual: bool = False,
                        records: Optional[jax.Array] = None,
                        centroids: Optional[jax.Array] = None,
                        bucket_weights: Optional[jax.Array] = None,
                        nbits: int = 0):
    """3-stage search: block summaries -> doc summaries -> exact MaxSim.

    Cuts the dominant coarse matmul by ~block_size/n_blocks-fold vs
    two_stage_search at very large N: stage-0 scores N/block_size block
    summaries densely; stage-1 scores only the top-n_blocks blocks' doc
    summaries (gathered); stage-2 re-scores top n_candidates docs exactly
    (int8 scales / residual codec / fused Pallas residual kernel supported).
    coarse_query_len: only the first L query tokens drive stages 0-1, full Q
    scores stage 2 (the reference's candidate-generation truncation,
    index_storage.py:68-77).
    Returns (scores (B, k), rows (B, k)).
    """
    n, s, d = summaries.shape
    nb = n // block_size
    summ_blocks = summaries.reshape(nb, block_size, s, d)
    # per-doc validity, blocked — pad rows' zero summaries must not win
    # coarse slots (see two_stage_search)
    doc_valid_blocks = jnp.any(mask != 0, axis=1).reshape(nb, block_size)

    # stage 0: dense over block summaries (small); fully-padded blocks out
    s0 = coarse_scores(q, block_summ, coarse_query_len)  # (B, nb)
    s0 = jnp.where(jnp.any(doc_valid_blocks, axis=1)[None, :], s0, NEG_INF)
    _, blk = jax.lax.top_k(s0, n_blocks)              # (B, n_blocks)

    # stage 1: doc summaries of the selected blocks, per query via lax.map.
    # The block gather stays PER-QUERY: block rows are large contiguous
    # slices (bs*S*d bf16, ~64 KiB) so the gather is bandwidth- not
    # overhead-bound, and batching it materializes a (B, n_blocks, bs, S,
    # d) array — measured 25-30% SLOWER at the 1M scale (unlike the small
    # compressed-row gathers in _fine_stage, which batching speeds up).
    def per_q(args):
        qi, blk_i = args                              # (Lq, d), (n_blocks,)
        qc = qi if coarse_query_len is None else qi[:coarse_query_len]
        sg = jnp.take(summ_blocks, blk_i, axis=0)     # (n_blocks, bs, S, d)
        s1 = jnp.einsum("nbsd,qd->nbsq", sg.astype(jnp.float32), qc,
                        preferred_element_type=jnp.float32)
        per_tok = jnp.max(s1, axis=2)                 # (n_blocks, bs, Lq)
        approx = jnp.sum(per_tok, axis=-1).reshape(-1)  # (n_blocks*bs,)
        valid = jnp.take(doc_valid_blocks, blk_i, axis=0).reshape(-1)
        approx = jnp.where(valid, approx, NEG_INF)
        _, loc = jax.lax.top_k(approx, n_candidates)
        return blk_i[loc // block_size] * block_size \
            + (loc % block_size)                      # (n_candidates,)

    cand = jax.lax.map(per_q, (q.astype(jnp.float32), blk))  # (B, C)
    # stage 2: exact on gathered candidates (full query)
    return _fine_stage(q, cand, tokens, mask, k=k, scales=scales,
                       records=records, centroids=centroids,
                       bucket_weights=bucket_weights, nbits=nbits,
                       use_pallas_residual=use_pallas_residual)


@functools.partial(jax.jit, static_argnames=("n_clusters", "iters",
                                             "chunk"))
def cluster_order(summaries: jax.Array, n_clusters: int = 1024,
                  iters: int = 4, chunk: int = 65536) -> jax.Array:
    """Doc ordering that makes hierarchical_search's blocks coherent:
    global spherical k-means over per-doc mean-summary vectors, then sort
    docs by cluster id. Returns the permutation (apply it to tokens/mask/
    scales/summaries before block_summaries).

    Assignment is chunked (lax.map over slabs) so the (N, n_clusters) score
    matrix never fully materializes at 1M+ docs.
    """
    n, s, d = summaries.shape
    doc_vec = jnp.mean(summaries.astype(jnp.float32), axis=1)
    doc_vec = doc_vec * jax.lax.rsqrt(
        jnp.sum(doc_vec ** 2, -1, keepdims=True) + 1e-9)
    pad = (-n) % chunk
    dv = jnp.pad(doc_vec, ((0, pad), (0, 0)))
    slabs = dv.reshape(-1, chunk, d)

    stride = max(n // n_clusters, 1)
    cent = doc_vec[::stride][:n_clusters]

    def assign_slab(c):
        def one(sl):
            return jnp.argmax(sl @ c.T, axis=-1)
        return jax.lax.map(one, slabs).reshape(-1)[:n]

    def step(c, _):
        a = assign_slab(c)
        onehot_sum = jnp.zeros((n_clusters, d), jnp.float32)
        cnt = jnp.zeros((n_clusters,), jnp.float32)
        onehot_sum = onehot_sum.at[a].add(doc_vec)
        cnt = cnt.at[a].add(1.0)
        new = jnp.where(cnt[:, None] > 0, onehot_sum, c)
        new = new * jax.lax.rsqrt(jnp.sum(new ** 2, -1,
                                          keepdims=True) + 1e-9)
        return new, ()

    cent, _ = jax.lax.scan(step, cent, None, length=iters)
    assign = assign_slab(cent)
    return jnp.argsort(assign)
