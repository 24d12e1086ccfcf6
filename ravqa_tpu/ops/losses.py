"""Training losses for late-interaction retrieval and RAG generation.

Mirrors the reference's loss semantics:
- nway contrastive loss over (query, [pos, neg_1..neg_{nway-1}]) doc groups
  (/root/reference/third_party/ColBERT/colbert/modeling/colbert.py:64-80);
- in-batch-negative cross-entropy over the full (Bq x Bq*nway) MaxSim score
  matrix with the positive at column i*nway (colbert.py:82-113,
  `compute_ib_loss_new`);
- DPR dot-product in-batch CE (/root/reference/src/models/retriever/
  retriever_dpr.py:102-157);
RAG losses (RAG-sequence NLL + pseudo-relevance Approach1-6/NoPR,
rag_model_blip.py:826-1026) live in ravqa_tpu.models.rag
.rag_loss_components — the single, reference-verified implementation.

All are pure functions of arrays -> scalar, differentiable, jit/pjit-safe.
Cross-device in-batch negatives: all_gather the doc/query embeddings over the
data-parallel mesh axis before calling these (see ravqa_tpu.parallel).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import optax

from .maxsim import maxsim_all_pairs_xla, maxsim_pair_xla


def nway_ce_loss(q: jax.Array, d: jax.Array, d_mask: jax.Array,
                 nway: int, q_mask: jax.Array | None = None,
                 interaction: str = "colbert",
                 flipr_query_part_len: int = 0, flipr_k1: int = 0,
                 flipr_k2: int = 0):
    """Contrastive CE over nway docs per query; positive at position 0.

    Args:
      q: (B, Lq, dim); d: (B*nway, Ld, dim) grouped per query; d_mask likewise.
      interaction: "colbert" (sum of per-token maxima) or "flipr" (PreFLMR
        partial top-k1/top-k2 sums, reference colbert.py:248-261).
    Returns: (loss, scores (B, nway)).
    """
    from .maxsim import flipr_reduce

    b = q.shape[0]
    ld, dim = d.shape[-2:]
    d_g = d.reshape(b, nway, ld, dim)
    m_g = d_mask.reshape(b, nway, ld)
    q_rep = jnp.broadcast_to(q[:, None], (b, nway) + q.shape[1:])
    q_flat = q_rep.reshape(b * nway, *q.shape[1:])
    d_flat = d_g.reshape(b * nway, ld, dim)
    m_flat = m_g.reshape(b * nway, ld)
    if interaction == "flipr":
        s = jnp.einsum("bld,bqd->blq", d_flat, q_flat,
                       preferred_element_type=jnp.float32)
        scores = flipr_reduce(s, m_flat, flipr_query_part_len, flipr_k1,
                              flipr_k2).reshape(b, nway)
    else:
        qm_rep = None
        if q_mask is not None:
            qm_rep = jnp.broadcast_to(
                q_mask[:, None], (b, nway) + q_mask.shape[1:])
            qm_rep = qm_rep.reshape(b * nway, -1)
        scores = maxsim_pair_xla(q_flat, d_flat, m_flat,
                                 qm_rep).reshape(b, nway)
    labels = jnp.zeros((b,), dtype=jnp.int32)
    loss = optax.softmax_cross_entropy_with_integer_labels(scores, labels)
    return jnp.mean(loss), scores


def in_batch_negative_loss(q: jax.Array, d: jax.Array, d_mask: jax.Array,
                           nway: int, q_mask: jax.Array | None = None,
                           block_n: int = 0, compute_dtype=None):
    """Full cross-batch CE: every query vs every doc in the batch.

    Args:
      q: (B, Lq, dim); d: (B*nway, Ld, dim); positive doc of query i is row
         i*nway (reference colbert.py:96-101).
      block_n: >0 scores in doc blocks with per-block rematerialization
        (maxsim_all_pairs_blocked) — bounds both the forward intermediate
        and the autodiff residuals to one block instead of the full
        (B*nway, Ld, B, Lq) token-score tensor.
      compute_dtype: dot dtype (jnp.bfloat16 = the MXU-native path,
        matching the reference's fp16-on-GPU doc scoring, colbert.py:204).
    Returns: (loss, score matrix (B, B*nway)).
    """
    if block_n or compute_dtype is not None:
        from .maxsim import maxsim_all_pairs_blocked
        scores = maxsim_all_pairs_blocked(q, d, d_mask, q_mask,
                                          block_n=block_n,
                                          compute_dtype=compute_dtype)
    else:
        scores = maxsim_all_pairs_xla(q, d, d_mask, q_mask)  # (B, B*nway)
    b = q.shape[0]
    labels = jnp.arange(b, dtype=jnp.int32) * nway
    loss = optax.softmax_cross_entropy_with_integer_labels(scores, labels)
    return jnp.mean(loss), scores


def dpr_in_batch_loss(q_pooled: jax.Array, d_pooled: jax.Array, nway: int):
    """DPR dual-encoder in-batch CE over pooled embeddings.

    Args:
      q_pooled: (B, dim); d_pooled: (B*nway, dim), positive at i*nway.
    """
    scores = q_pooled @ d_pooled.T                       # (B, B*nway)
    b = q_pooled.shape[0]
    labels = jnp.arange(b, dtype=jnp.int32) * nway
    loss = optax.softmax_cross_entropy_with_integer_labels(scores, labels)
    return jnp.mean(loss), scores
