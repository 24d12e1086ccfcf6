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


# A fully-batched residual fine stage (one (B,C,...) decompress+einsum
# instead of the per-query lax.map) was prototyped in rounds 3-8 and
# looked 2.7-3.3x faster ISOLATED but regressed INTEGRATED. Round 10
# (scripts/exp_hier_integration.py) closed the mystery: the isolated win
# was a TIMING ARTIFACT — with loop-invariant candidates, XLA hoists the
# candidate gather AND decompress (neither depends on the scanned query)
# out of the timing loop, which is only possible in the batched variant
# (the per-query work sits inside lax.map and cannot be hoisted). With
# data-dependent candidates — i.e. any real search — per-query wins at
# every measured shape (1M docs, v5e: 3.6 vs 4.1 ms at C=256, 9.1 vs
# 13.3 ms at C=1024), so the batched path was removed.


def _resolve_group(group_size: int, b: int) -> int:
    """Static query-group size for the grouped lax.map fine stages.

    0 -> auto (8): each lax.map iteration carries ~18 us fixed overhead
    on v5e (probe in scripts/exp_hier_112k.py), so queries are scored in
    groups — g=8 measured fastest at the 112k bench shape (20.4k QPS vs
    17.0k per-query), while g=16 and full batching (g=B) regress (the
    bigger gathered-token / score intermediates cost more HBM bandwidth
    than the map overhead they save). Explicit or auto sizes are clamped
    to a divisor of the query batch."""
    if group_size <= 0:
        group_size = 8
    g = min(group_size, b)
    while b % g:
        g -= 1
    return g


def _score_group_tokens(qi, cand_i, tokens, mask, scales):
    """(g, Lq, dim) f32 queries x (g, C) candidate rows -> (g, C) exact
    MaxSim over the gathered full-resolution (bf16/int8) token rows."""
    tok = jnp.take(tokens, cand_i, axis=0)               # (g, C, Ld, dim)
    s = jnp.einsum("gcld,gqd->gclq", tok.astype(jnp.float32), qi,
                   preferred_element_type=jnp.float32)
    msk = jnp.take(mask, cand_i, axis=0)
    if scales is not None:                               # int8 index
        scl = jnp.take(scales, cand_i, axis=0)           # (g, C, Ld)
        s = s * scl[..., None]
    s = jnp.where(msk.astype(bool)[..., None], s, NEG_INF)
    return jnp.sum(jnp.max(s, axis=2), axis=-1)          # (g, C)


def _fine_stage(q, cand, tokens, mask, *, k: int,
                scales=None, records=None, centroids=None,
                bucket_weights=None, nbits: int = 0,
                use_pallas_residual: bool = False,
                group_size: int = 0, centroid_prune: int = 0,
                codec_coarse=None, codec_fine=None):
    """Exact re-score of per-query candidate sets -> (scores (B,k), rows).

    Shared by two_stage_search (fine stage) and hierarchical_search
    (stage 2). q: (B, Lq, dim); cand: (B, C) candidate rows. Residual
    indexes pass `records` — the packed per-doc [codes|scales|residual
    bytes] rows (ops.residual.pack_records). centroid_prune (residual
    indexes only): PLAID-style intermediate cut — score all C candidates
    from their centroid ids alone (a (B, K, Lq) q@centroidsᵀ table +
    per-token lookups; no residual decompress), keep the top
    `centroid_prune`, and decompress only the survivors. Mirrors the
    reference's approximate scoring stage (IndexScorer.score_pids ranks
    by centroid scores before decompressing residuals,
    third_party/ColBERT/colbert/search/index_storage.py:141-171).
    """
    if records is not None:
        # residual codec. ONE wide-row gather of the packed records
        # (gathering codes/scales/bytes as separate arrays measured
        # ~2.5x slower — small-row gather overhead,
        # scripts/exp_residual_stage2.py), then decompress+score.
        from ..ops.residual import (decompress, maxsim_residual_pallas,
                                    split_records)
        c = cand.shape[1]
        ld = mask.shape[1]
        rg = jnp.take(records, cand, axis=0)                 # (B, C, RB)
        cg, sg, pg = split_records(rg, ld)
        mg = jnp.take(mask, cand, axis=0)

        cp = min(centroid_prune, c) if centroid_prune else 0
        if cp and cp < c:
            # centroid-only approximate scores: tok ≈ centroid[code], so
            # score ≈ sum_q max_d scale * (centroid[code_d] · q). The
            # q@centroidsᵀ table is one small matmul; per candidate token
            # the score column is a row lookup. bf16 throughout — the
            # cut only has to rank, the survivors re-score exactly.
            table = jnp.einsum("bqd,kd->bkq", q.astype(jnp.float32),
                               centroids,
                               preferred_element_type=jnp.float32) \
                .astype(jnp.bfloat16)                        # (B, K, Lq)

            def prune_one(args):
                ti, cgi, sgi, mgi = args
                s = jnp.take(ti, cgi.reshape(-1), axis=0) \
                    .reshape(c, ld, -1)                      # (C, Ld, Lq)
                s = s * sgi.astype(jnp.bfloat16)[:, :, None]
                s = jnp.where(mgi.astype(bool)[:, :, None], s,
                              jnp.bfloat16(NEG_INF))
                sc = jnp.sum(jnp.max(s, axis=1).astype(jnp.float32),
                             axis=-1)                        # (C,)
                _, sel = jax.lax.top_k(sc, cp)
                return sel

            sel = jax.lax.map(prune_one, (table, cg, sg, mg))  # (B, cp)
            cand = jnp.take_along_axis(cand, sel, axis=1)
            cg = jnp.take_along_axis(cg, sel[:, :, None], axis=1)
            sg = jnp.take_along_axis(sg, sel[:, :, None], axis=1)
            mg = jnp.take_along_axis(mg, sel[:, :, None], axis=1)
            pg = jnp.take_along_axis(pg, sel[:, :, None, None], axis=1)
            c = cp

        if use_pallas_residual and (codec_coarse is not None
                                    or centroids.shape[0] <= 1024):
            # fused decompress+MaxSim kernel: candidates stay packed all
            # the way into VMEM (ops.residual.maxsim_residual_pallas).
            # Flat codecs gate to <= 1024 centroids — the in-VMEM one-hot
            # centroid matmul scales with K and the XLA path wins at
            # K=8192; a FACTORED codec (codec_coarse/codec_fine,
            # train_codec_factored) lifts the gate: its two-hot term
            # costs k1+k2 columns regardless of K = k1*k2.
            tc = 32
            while c % tc:
                tc //= 2
            sc = maxsim_residual_pallas(
                q.astype(jnp.float32), cg, pg, mg, centroids,
                bucket_weights, sg, codec_coarse, codec_fine,
                nbits=nbits, tile_c=tc)
            top_s, sel = jax.lax.top_k(sc, k)
            return top_s, jnp.take_along_axis(cand, sel, axis=1)

        def fine_res(args):
            # decompress to bf16, MXU bf16 x bf16 (f32 accum): bucket-
            # quantization error >> bf16 rounding. Reconstruction-norm
            # scales carry the reference's post-decompress L2
            # normalization (residual.py:273-276) into the scores.
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

    # Grouped fine stage via lax.map: XLA fuses the gather + einsum + max
    # per group without materializing the full (B, C, Ld, Lq) tensor, and
    # grouping amortizes the ~18 us/iteration lax.map overhead
    # (_resolve_group). The fully-vectorized batched einsum regresses
    # (15.1k vs 20.4k QPS at the 112k shape): its HBM-resident f32 score
    # intermediate costs more bandwidth than the serialization it saves.
    g = _resolve_group(group_size, q.shape[0])
    grp = lambda x: x.reshape((x.shape[0] // g, g) + x.shape[1:])

    def fine_group(args):
        qi, cand_i = args
        sc = _score_group_tokens(qi, cand_i, tokens, mask, scales)
        top_s, sel = jax.lax.top_k(sc, k)
        return top_s, jnp.take_along_axis(cand_i, sel, axis=1)

    top_s, top_r = jax.lax.map(fine_group,
                               (grp(q.astype(jnp.float32)), grp(cand)))
    return top_s.reshape(-1, k), top_r.reshape(-1, k)


@functools.partial(jax.jit, static_argnames=("k", "n_candidates",
                                             "coarse_query_len",
                                             "use_pallas_coarse",
                                             "use_pallas_residual", "nbits",
                                             "group_size", "approx_topk",
                                             "approx_recall",
                                             "centroid_prune"))
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
                     nbits: int = 0,
                     group_size: int = 0,
                     summaries_t: Optional[jax.Array] = None,
                     approx_topk: bool = False,
                     approx_recall: float = 0.95,
                     centroid_prune: int = 0,
                     summaries_t_scale: Optional[jax.Array] = None,
                     codec_coarse: Optional[jax.Array] = None,
                     codec_fine: Optional[jax.Array] = None):
    """Returns (scores (B, k), rows (B, k)) — exact scores on the coarse
    stage's top `n_candidates` docs.

    use_pallas_coarse: run the coarse summary sweep through a fused
    Pallas kernel (TPU) instead of the XLA einsum. Pass `summaries_t` —
    the summaries transposed to slot-major (S, N, dim), once, at
    searcher/bench setup — to use the fast chunked sweep kernel
    (ops.maxsim.coarse_sweep_pallas: 4.5-6.5x over the XLA einsum at 1M
    docs, which materializes the (N, S, B, Lq) f32 intermediate in HBM);
    without it the generic doc-major MaxSim kernel is used (slower, but
    still avoids the XLA blow-up).
    use_pallas_residual: re-score residual-codec candidates with the fused
    decompress+MaxSim Pallas kernel (TPU; ops.residual).
    scales: per-token f32 scales when `tokens` is an int8-quantized index
    (ops.quant.quantize_index_int8) — dequantization happens inside the
    fine stage, so a 1M-passage index fits one chip's HBM.
    records/centroids/bucket_weights/nbits: residual-codec index
    (ops.residual; tokens=None) — `records` holds the packed per-doc
    [codes|scales|residual bytes] rows; candidates decompress inside the
    fine stage, nothing ever materializes at full precision.
    approx_topk: cut candidates with jax.lax.approx_max_k (the TPU
    PartialReduce unit) instead of exact top_k. At 1M docs the exact
    (B, N) top_k costs 27-100+ ms/batch and dwarfs the coarse matmul;
    approx_max_k does the same cut in ~8 ms at recall_target=0.95
    (measured top-10-containment in the top-1024 candidates: see
    scripts/exp_coarse_kernel.py). The fine stage re-scores exactly, so
    this only perturbs the candidate tail — same approximation class as
    the summary pruning itself (and as the reference's IVF candidate
    generation, candidate_generation.py). approx_recall: approx_max_k
    recall_target — raise toward 1.0 for a stricter (slower) cut.
    centroid_prune (residual indexes): intermediate PLAID-style cut of
    the fine stage — candidates are first ranked by centroid-only scores
    (no residual decompress) and only the top `centroid_prune` are
    decompressed + scored exactly (see _fine_stage). 0 = off.
    summaries_t_scale: (N,) f32 per-doc scales when summaries_t is int8
    (ops.quant.quantize_summaries_t_int8) — the sweep then rides the
    MXU's 2x int8 throughput; its dequantized scores match the float
    sweep up to int8 rounding, well within what the candidate cut
    tolerates.
    """
    _cut = (functools.partial(jax.lax.approx_max_k,
                              recall_target=approx_recall)
            if approx_topk else jax.lax.top_k)
    if use_pallas_coarse and summaries_t is not None:
        from ..ops.maxsim import coarse_sweep_pallas
        qc = q if coarse_query_len is None else q[:, :coarse_query_len]
        # validity folds into the kernel: a host-side where over the
        # (B, N) scores costs ~7 ms/batch at 1M (it materializes the
        # custom-call output an extra time)
        approx = coarse_sweep_pallas(qc, summaries_t,
                                     jnp.any(mask != 0, axis=1),
                                     dscale=summaries_t_scale)
        _, cand = _cut(approx, n_candidates)
        return _fine_stage(q, cand, tokens, mask, k=k, scales=scales,
                           records=records, centroids=centroids,
                           bucket_weights=bucket_weights, nbits=nbits,
                           use_pallas_residual=use_pallas_residual,
                           group_size=group_size,
                           centroid_prune=centroid_prune,
                           codec_coarse=codec_coarse,
                           codec_fine=codec_fine)
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
    _, cand = _cut(approx, n_candidates)                     # (B, C)

    return _fine_stage(q, cand, tokens, mask, k=k, scales=scales,
                       records=records, centroids=centroids,
                       bucket_weights=bucket_weights, nbits=nbits,
                       use_pallas_residual=use_pallas_residual,
                       group_size=group_size,
                       centroid_prune=centroid_prune,
                       codec_coarse=codec_coarse,
                       codec_fine=codec_fine)


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


def block_summaries_t(block_summ: jax.Array,
                      pad_multiple: int = 1024) -> jax.Array:
    """Slot-major (S, NB_pad, dim) copy of (NB, S, dim) block summaries
    for hierarchical_search's stage-0 coarse-sweep kernel, zero-padded on
    the block dim so the kernel tiles well (NB is rarely a nice power of
    two — 1M/64 = 15632 = 16*977 would force a 16-wide tile). Padded
    blocks are suppressed in-kernel via the validity row."""
    bt = jnp.swapaxes(block_summ, 0, 1)
    pad = (-bt.shape[1]) % pad_multiple
    if pad:
        bt = jnp.pad(bt, ((0, 0), (0, pad), (0, 0)))
    return bt


@functools.partial(jax.jit, static_argnames=("k", "n_blocks", "n_candidates",
                                             "block_size",
                                             "coarse_query_len",
                                             "use_pallas_residual", "nbits",
                                             "group_size", "approx_topk",
                                             "approx_recall",
                                             "centroid_prune",
                                             "stage1_tile_b"))
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
                        nbits: int = 0,
                        group_size: int = 0,
                        approx_topk: bool = False,
                        approx_recall: float = 0.95,
                        block_summ_t: Optional[jax.Array] = None,
                        centroid_prune: int = 0,
                        block_summ_t_scale: Optional[jax.Array] = None,
                        summ_int8: Optional[jax.Array] = None,
                        summ_scale: Optional[jax.Array] = None,
                        summ_rows: Optional[jax.Array] = None,
                        stage1_tile_b: int = 8,
                        codec_coarse: Optional[jax.Array] = None,
                        codec_fine: Optional[jax.Array] = None,
                        block_summ_int8: Optional[jax.Array] = None,
                        block_summ_scale: Optional[jax.Array] = None):
    """3-stage search: block summaries -> doc summaries -> exact MaxSim.

    Cuts the dominant coarse matmul by ~block_size/n_blocks-fold vs
    two_stage_search at very large N: stage-0 scores N/block_size block
    summaries densely; stage-1 scores only the top-n_blocks blocks' doc
    summaries (gathered); stage-2 re-scores top n_candidates docs exactly
    (int8 scales / residual codec / fused Pallas residual kernel supported).
    coarse_query_len: only the first L query tokens drive stages 0-1, full Q
    scores stage 2 (the reference's candidate-generation truncation,
    index_storage.py:68-77).
    block_summ_t: optional slot-major (S, NB_pad, dim) copy of block_summ
    (block_summaries_t) — stage 0 then uses the coarse-sweep Pallas
    kernel instead of the XLA einsum (which materializes the
    (NB, S, B, Lq) f32 intermediate in HBM — ~1 GiB/batch at 1M docs,
    B=128).
    centroid_prune (residual indexes): intermediate PLAID-style cut of
    stage 2 — candidates ranked by centroid-only scores first, only the
    top `centroid_prune` decompressed + scored exactly (_fine_stage).
    block_summ_t_scale: (NB_pad,) f32 per-block scales when block_summ_t
    is int8 (quantize_summaries_t_int8 on the padded slot-major copy) —
    stage 0 then rides the MXU int8 path (see two_stage_search).
    summ_int8/summ_scale: int8 doc-major summary copy + (N,) per-doc
    scales (ops.quant.quantize_summaries_int8) — stage 1 then gathers
    the int8 copy (HALF the HBM traffic of the bf16 gather, the dominant
    term of the hierarchical pruning cost at 1M docs) and applies the
    per-doc scale after the max/sum, which is order-exact. `summaries`
    may be None when summ_int8 is given (it would be unused).
    summ_rows (+ stage1_tile_b): TPU-only alternative stage 1 — the
    fused ops.maxsim.stage1_sweep_pallas kernel streams each query's
    selected blocks HBM->VMEM via scalar-prefetch DMA (stage1_rows
    layout, bf16 or int8 with summ_scale as dscale) and writes only the
    scores; summaries/summ_int8 must be None.
    Returns (scores (B, k), rows (B, k)).
    """
    if summ_rows is not None:
        # kernel stage 1 (ops.maxsim.stage1_sweep_pallas, stage1_rows
        # layout): summaries/summ_int8 are unused — pass None; for int8
        # summ_rows, summ_scale carries the per-doc dscale
        nb, s, bs_, d = summ_rows.shape
        assert bs_ == block_size, (bs_, block_size)
        n = nb * block_size
        assert (summ_rows.dtype == jnp.int8) == (summ_scale is not None), \
            "int8 summ_rows requires summ_scale (and float forbids it)"
        summ_blocks = scale_blocks = None
    else:
        assert (summ_int8 is None) == (summ_scale is None), \
            "summ_int8 and summ_scale must be passed together"
        src = summaries if summ_int8 is None else summ_int8
        n, s, d = src.shape
        nb = n // block_size
        summ_blocks = src.reshape(nb, block_size, s, d)
        scale_blocks = (None if summ_scale is None
                        else summ_scale.reshape(nb, block_size))

    def _stage1_scores(qc, blk_i):
        """(g, Lqc, dim) f32 queries x (g, n_blocks) block rows ->
        (g, n_blocks*block_size) validity-masked approx doc scores."""
        g_ = qc.shape[0]
        sg = jnp.take(summ_blocks, blk_i, axis=0)   # (g, nb, bs, S, d)
        if scale_blocks is None:
            s1 = jnp.einsum("gnbsd,gqd->gnbsq", sg.astype(jnp.float32),
                            qc, preferred_element_type=jnp.float32)
            approx = jnp.sum(jnp.max(s1, axis=3), axis=-1) \
                .reshape(g_, n_blocks * block_size)
        else:
            # int8 stage-1: the dot runs bf16 (exact for int8 values);
            # the strictly-positive per-doc scale commutes with the
            # max-over-slots and sum-over-query (quantize_summaries_int8)
            s1 = jnp.einsum("gnbsd,gqd->gnbsq", sg.astype(jnp.bfloat16),
                            qc.astype(jnp.bfloat16),
                            preferred_element_type=jnp.float32)
            raw = jnp.sum(jnp.max(s1, axis=3), axis=-1)   # (g, nb, bs)
            scl = jnp.take(scale_blocks, blk_i, axis=0)
            approx = (raw * scl).reshape(g_, n_blocks * block_size)
        valid = jnp.take(doc_valid_blocks, blk_i, axis=0).reshape(g_, -1)
        return jnp.where(valid, approx, NEG_INF)
    # per-doc validity, blocked — pad rows' zero summaries must not win
    # coarse slots (see two_stage_search)
    doc_valid_blocks = jnp.any(mask != 0, axis=1).reshape(nb, block_size)
    blk_valid = jnp.any(doc_valid_blocks, axis=1)        # (nb,)

    # stage 0: dense over block summaries; fully-padded blocks out
    if block_summ_t is not None:
        from ..ops.maxsim import coarse_sweep_pallas
        qc = q if coarse_query_len is None else q[:, :coarse_query_len]
        nb_pad = block_summ_t.shape[1]
        v = blk_valid if nb_pad == nb \
            else jnp.pad(blk_valid, (0, nb_pad - nb))
        s0 = coarse_sweep_pallas(qc, block_summ_t, v,    # (B, nb_pad)
                                 dscale=block_summ_t_scale)
    elif block_summ_int8 is not None:
        # int8 stage 0 (the sharded program's XLA path): bf16 dot over
        # the int8 values is exact; the strictly-positive per-block
        # scale commutes with the max-over-slots and sum-over-query
        # (same argument as the stage-1 int8 path above)
        qc = q if coarse_query_len is None else q[:, :coarse_query_len]
        s = jnp.einsum("nsd,bqd->nsbq",
                       block_summ_int8.astype(jnp.bfloat16),
                       qc.astype(jnp.bfloat16),
                       preferred_element_type=jnp.float32)
        s0 = jnp.sum(jnp.max(s, axis=1), axis=-1).T \
            * block_summ_scale[None, :]
        s0 = jnp.where(blk_valid[None, :], s0, NEG_INF)
    else:
        s0 = coarse_scores(q, block_summ, coarse_query_len)  # (B, nb)
        s0 = jnp.where(blk_valid[None, :], s0, NEG_INF)
    # approx_topk applies ONLY to this stage-0 (B, nb) cut (see two_
    # stage_search's doc). The stage-1 cuts inside the lax.map bodies
    # stay exact: their arrays are just n_blocks*block_size (<= ~8k)
    # elements where PartialReduce buys nothing, and approx_max_k nested
    # in lax.map stalls the TPU compiler (>40 min, observed on the 1M
    # residual bench; compiles in <1 s on CPU).
    _cut = (functools.partial(jax.lax.approx_max_k,
                              recall_target=approx_recall)
            if approx_topk else jax.lax.top_k)
    _, blk = _cut(s0, n_blocks)                       # (B, n_blocks)
    # padded stage-0 columns are NEG_INF and can only surface when
    # n_blocks exceeds the valid-block count; clamp so the stage-1
    # gathers stay in range (duplicate losing blocks are harmless)
    blk = jnp.minimum(blk, nb - 1)

    if summ_rows is not None:
        # fused stage 1: one batched kernel sweep over each query's own
        # selected blocks (no gathered HBM copy, no dot intermediate),
        # then the ordinary exact fine stage on the survivors. Non-TPU
        # backends run the XLA twin of the kernel (same math/layout) so
        # the summ_rows program stays portable/testable everywhere.
        from ..ops.maxsim import stage1_sweep_pallas, stage1_sweep_xla
        qc = q if coarse_query_len is None else q[:, :coarse_query_len]
        if jax.default_backend() == "tpu":
            approx = stage1_sweep_pallas(qc, summ_rows, blk,
                                         tile_b=stage1_tile_b,
                                         dscale=summ_scale)
        else:
            approx = stage1_sweep_xla(qc, summ_rows, blk,
                                      dscale=summ_scale)
        valid = jnp.take(doc_valid_blocks, blk, axis=0) \
            .reshape(q.shape[0], -1)
        approx = jnp.where(valid, approx, NEG_INF)
        _, loc = jax.lax.top_k(approx, n_candidates)
        cand = jnp.take_along_axis(blk, loc // block_size, axis=1) \
            * block_size + (loc % block_size)          # (B, n_candidates)
        return _fine_stage(q, cand, tokens, mask, k=k, scales=scales,
                           records=records, centroids=centroids,
                           bucket_weights=bucket_weights, nbits=nbits,
                           use_pallas_residual=use_pallas_residual,
                           group_size=group_size,
                           centroid_prune=centroid_prune,
                           codec_coarse=codec_coarse,
                           codec_fine=codec_fine)

    if records is None:
        # token (bf16/int8) index: stages 1+2 MERGED into one grouped
        # lax.map — merging the two maps and grouping g queries per
        # iteration amortizes the ~18 us/iteration map overhead (probe in
        # scripts/exp_hier_112k.py). Measured at the 112k bench shape:
        # per-query two-map 17.0k QPS, merged 18.0k, merged g=8 20.4k;
        # g=16 and full batching regress. Residual-records indexes stay
        # on the two-map per-query path below: grouping their
        # decompress-bearing stage 2 (g >= 2) crashes the TPU worker at
        # C=1024 (scripts/exp_group_sweep.py).
        g = _resolve_group(group_size, q.shape[0])
        grp = lambda x: x.reshape((x.shape[0] // g, g) + x.shape[1:])

        def per_group(args):
            qi, blk_i = args                 # (g, Lq, d) f32, (g, n_blocks)
            qc = qi if coarse_query_len is None \
                else qi[:, :coarse_query_len]
            approx = _stage1_scores(qc, blk_i)
            _, loc = jax.lax.top_k(approx, n_candidates)
            cand_i = jnp.take_along_axis(blk_i, loc // block_size, axis=1) \
                * block_size + (loc % block_size)      # (g, n_candidates)
            sc = _score_group_tokens(qi, cand_i, tokens, mask, scales)
            top_s, sel = jax.lax.top_k(sc, k)
            return top_s, jnp.take_along_axis(cand_i, sel, axis=1)

        top_s, top_r = jax.lax.map(per_group,
                                   (grp(q.astype(jnp.float32)), grp(blk)))
        return top_s.reshape(-1, k), top_r.reshape(-1, k)

    # stage 1: doc summaries of the selected blocks, GROUPED lax.map
    # (g queries per iteration, _resolve_group) — the same einsum+top_k
    # grouping the merged token path uses; only stage 2 stays per-query
    # for residual indexes (grouping its decompress crashes the TPU
    # worker at C=1024, scripts/exp_group_sweep.py). Per-group math is
    # per-query-identical, so results match the ungrouped path.
    g = _resolve_group(group_size, q.shape[0])
    grp = lambda x: x.reshape((x.shape[0] // g, g) + x.shape[1:])

    def per_group_s1(args):
        qi, blk_i = args                 # (g, Lq, d) f32, (g, n_blocks)
        qc = qi if coarse_query_len is None else qi[:, :coarse_query_len]
        approx = _stage1_scores(qc, blk_i)
        _, loc = jax.lax.top_k(approx, n_candidates)
        return jnp.take_along_axis(blk_i, loc // block_size, axis=1) \
            * block_size + (loc % block_size)      # (g, n_candidates)

    cand = jax.lax.map(per_group_s1,
                       (grp(q.astype(jnp.float32)), grp(blk)))
    cand = cand.reshape(-1, n_candidates)                     # (B, C)
    # stage 2: exact on gathered candidates (full query)
    return _fine_stage(q, cand, tokens, mask, k=k, scales=scales,
                       records=records, centroids=centroids,
                       bucket_weights=bucket_weights, nbits=nbits,
                       use_pallas_residual=use_pallas_residual,
                       centroid_prune=centroid_prune,
                       codec_coarse=codec_coarse,
                       codec_fine=codec_fine)


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
