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


@functools.partial(jax.jit, static_argnames=("k", "n_candidates",
                                             "coarse_query_len",
                                             "use_pallas_fine",
                                             "use_pallas_coarse"))
def two_stage_search(q: jax.Array, tokens: jax.Array, mask: jax.Array,
                     summaries: jax.Array, *, k: int,
                     n_candidates: int = 1024,
                     coarse_query_len: Optional[int] = None,
                     use_pallas_fine: bool = False,
                     use_pallas_coarse: bool = False,
                     scales: Optional[jax.Array] = None):
    """Returns (scores (B, k), rows (B, k)) — exact scores on the coarse
    stage's top `n_candidates` docs.

    use_pallas_coarse: run the coarse summary sweep through the fused
    Pallas MaxSim kernel (TPU) instead of the XLA einsum.
    use_pallas_fine: re-score candidates with the scalar-prefetch
    gather+MaxSim Pallas kernel (experimental, see ops.maxsim).
    scales: per-token f32 scales when `tokens` is an int8-quantized index
    (ops.quant.quantize_index_int8) — dequantization happens inside the
    fine stage, so a 1M-passage index fits one chip's HBM.
    """
    b = q.shape[0]
    if use_pallas_coarse:
        from ..ops.maxsim import maxsim_search_pallas
        qc = q if coarse_query_len is None else q[:, :coarse_query_len]
        ones = jnp.ones(summaries.shape[:2], jnp.float32)
        approx = maxsim_search_pallas(qc, summaries, ones, tile_d=128)
    else:
        approx = coarse_scores(q, summaries, coarse_query_len)  # (B, N)
    _, cand = jax.lax.top_k(approx, n_candidates)            # (B, C)

    if use_pallas_fine:
        from ..ops.maxsim import maxsim_gather_pallas
        sc = maxsim_gather_pallas(q, tokens, mask, cand)     # (B, C)
        top_s, sel = jax.lax.top_k(sc, k)
        return top_s, jnp.take_along_axis(cand, sel, axis=1)

    # Per-query fine stage via lax.map: XLA fuses the gather + einsum + max
    # per query without materializing the (B, C, Ld, Lq) tensor. Measured
    # faster than the fully-vectorized batched einsum (whose HBM-resident
    # f32 intermediate costs more bandwidth than the serialization saves):
    # C=256: 3486 vs 3215 QPS; C=1024: 2664 vs 2001 QPS on v5e.
    def fine_one(args):
        qi, cand_i = args
        tok = jnp.take(tokens, cand_i, axis=0)               # (C, Ld, dim)
        msk = jnp.take(mask, cand_i, axis=0)
        s = jnp.einsum("cld,qd->clq", tok.astype(jnp.float32), qi,
                       preferred_element_type=jnp.float32)
        if scales is not None:                               # int8 index
            scl = jnp.take(scales, cand_i, axis=0)           # (C, Ld)
            s = s * scl[:, :, None]
        s = jnp.where(msk.astype(bool)[:, :, None], s, NEG_INF)
        sc = jnp.sum(jnp.max(s, axis=1), axis=-1)            # (C,)
        top_s, top_i = jax.lax.top_k(sc, k)
        return top_s, jnp.take(cand_i, top_i)

    scores, rows = jax.lax.map(fine_one, (q.astype(jnp.float32), cand))
    return scores, rows
