"""PLAID-style centroid-only pruning of the residual fine stage
(retrieval.coarse._fine_stage centroid_prune): candidates are ranked by
centroid scores alone and only the survivors decompress + re-score
exactly — the same approximate-scoring-then-decompress staging as the
reference's IndexScorer.score_pids
(third_party/ColBERT/colbert/search/index_storage.py:141-171)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from ravqa_tpu.retrieval import (LateInteractionSearcher,
                                 build_index_from_embeddings)

DIM = 64


@pytest.fixture(scope="module")
def clustered():
    rng = np.random.default_rng(3)
    centers = rng.normal(size=(32, DIM)).astype(np.float32)
    doc_cluster = rng.integers(0, 32, 2048)
    toks = centers[doc_cluster][:, None, :] + 0.25 * rng.normal(
        size=(2048, 12, DIM)).astype(np.float32)
    toks /= np.linalg.norm(toks, axis=-1, keepdims=True)
    mask = np.ones((2048, 12), np.int8)
    mask[:, -2:] = 0
    q_cluster = rng.integers(0, 32, 8)
    q = centers[q_cluster][:, None, :] + 0.25 * rng.normal(
        size=(8, 8, DIM)).astype(np.float32)
    q /= np.linalg.norm(q, axis=-1, keepdims=True)
    return toks, mask, q.astype(np.float32), q_cluster, doc_cluster


def _residual_index(toks, mask, mode):
    idx = build_index_from_embeddings(toks, mask, pad_multiple=64,
                                      dtype=jnp.float32)
    idx.build_summaries(n_summary=2)
    if mode == "hierarchical":
        idx.build_block_summaries(block_size=16)
    idx.quantize_residual(n_centroids=64, nbits=4)
    return idx


@pytest.mark.parametrize("mode", ["two_stage", "hierarchical"])
def test_centroid_prune_preserves_ranking(clustered, mode):
    """Pruned (C=256 -> 64 survivors) vs unpruned residual search: the
    final k come from exact re-scoring either way, so top-1 must agree
    and the top-10 overlap must stay high."""
    toks, mask, q, _, _ = clustered
    idx = _residual_index(toks, mask, mode)
    base = LateInteractionSearcher(idx, mode=mode, use_pallas=False,
                                   n_candidates=256, centroid_prune=0)
    _, rows0 = base.search_device(jnp.asarray(q), k=10)
    pruned = LateInteractionSearcher(idx, mode=mode, use_pallas=False,
                                     n_candidates=256, centroid_prune=64)
    _, rows1 = pruned.search_device(jnp.asarray(q), k=10)
    rows0, rows1 = np.asarray(rows0), np.asarray(rows1)
    assert (rows0[:, 0] == rows1[:, 0]).all(), "top-1 drifted under prune"
    overlap = np.mean([len(set(rows0[i]) & set(rows1[i])) / 10
                       for i in range(rows0.shape[0])])
    assert overlap >= 0.8, f"top-10 overlap {overlap}"


def test_centroid_prune_relevance(clustered):
    """Same gate as test_residual_index_relevance_success, pruned path."""
    toks, mask, q, q_cluster, doc_cluster = clustered
    idx = _residual_index(toks, mask, "two_stage")
    s = LateInteractionSearcher(idx, mode="two_stage", use_pallas=False,
                                n_candidates=256, centroid_prune=64)
    _, rows = s.search_device(jnp.asarray(q), k=10)
    hits = 0
    for i, row in enumerate(np.asarray(rows)):
        hits += any(doc_cluster[r] == q_cluster[i]
                    for r in row.tolist() if r < len(doc_cluster))
    assert hits / len(q) == 1.0


def test_centroid_prune_resolution(clustered):
    toks, mask, q, _, _ = clustered
    # non-residual index: always off, whatever was requested
    idx_full = build_index_from_embeddings(toks, mask, pad_multiple=64,
                                           dtype=jnp.float32)
    idx_full.build_summaries(n_summary=2)
    s = LateInteractionSearcher(idx_full, mode="two_stage",
                                use_pallas=False, centroid_prune=64)
    assert s.resolve_centroid_prune(10, 256) == 0
    idx = _residual_index(toks, mask, "two_stage")
    # auto (None) is OFF: on-chip 1M measurements showed the cut regresses
    # throughput 10-19% at every preset shape (STATUS.md round-4 table)
    s = LateInteractionSearcher(idx, mode="two_stage", use_pallas=False)
    assert s.resolve_centroid_prune(10, 1024) == 0
    assert s.resolve_centroid_prune(10, 128) == 0
    # explicit values clamp and disable when not cutting
    s = LateInteractionSearcher(idx, mode="two_stage", use_pallas=False,
                                centroid_prune=512)
    assert s.resolve_centroid_prune(10, 256) == 0
    s = LateInteractionSearcher(idx, mode="two_stage", use_pallas=False,
                                centroid_prune=32)
    assert s.resolve_centroid_prune(10, 256) == 32


def test_centroid_prune_sharded(clustered):
    """8-device sharded residual search with the pruned fine stage."""
    from ravqa_tpu.parallel import make_mesh
    toks, mask, q, q_cluster, doc_cluster = clustered
    mesh = make_mesh({"data": 8})
    idx = build_index_from_embeddings(toks, mask, pad_multiple=64,
                                      dtype=jnp.float32, mesh=mesh,
                                      axis="data")
    idx.build_summaries(n_summary=2, mesh=mesh, axis="data")
    idx.quantize_residual(n_centroids=64, nbits=4, mesh=mesh, axis="data")
    s = LateInteractionSearcher(idx, mesh=mesh, axis="data",
                                mode="two_stage", use_pallas=False,
                                n_candidates=256, centroid_prune=128)
    _, rows = s.search_device(jnp.asarray(q), k=10)
    hits = 0
    for i, row in enumerate(np.asarray(rows)):
        hits += any(doc_cluster[r] == q_cluster[i]
                    for r in row.tolist() if r < len(doc_cluster))
    assert hits / len(q) == 1.0
