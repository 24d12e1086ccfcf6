"""Recall CI gate: pruned search modes must track exact search on a
100k-doc clustered corpus (VERDICT r1: the recall-vs-exact evidence lived
only in bench scripts; this fails if a kernel/pruning change drops recall).
Also covers the k-dependent auto presets (reference searcher.py:91-118)."""

import numpy as np
import jax.numpy as jnp
import pytest

from ravqa_tpu.retrieval import (LateInteractionSearcher,
                                 build_index_from_embeddings)

N_DOCS = 100_000
LD, DIM, B, LQ = 8, 32, 8, 8
N_CLUSTERS = 256


@pytest.fixture(scope="module")
def corpus():
    """Clustered corpus: doc tokens = cluster center + noise (the realistic
    regime for pruned search; bench_1m.py uses the same construction)."""
    rng = np.random.default_rng(0)
    centers = rng.normal(size=(N_CLUSTERS, DIM)).astype(np.float32)
    assign = rng.integers(0, N_CLUSTERS, N_DOCS)
    toks = centers[assign][:, None, :] + 0.3 * rng.normal(
        size=(N_DOCS, LD, DIM)).astype(np.float32)
    toks /= np.linalg.norm(toks, axis=-1, keepdims=True)
    mask = np.ones((N_DOCS, LD), np.int8)
    q = centers[rng.integers(0, N_CLUSTERS, B)][:, None, :] \
        + 0.3 * rng.normal(size=(B, LQ, DIM)).astype(np.float32)
    q /= np.linalg.norm(q, axis=-1, keepdims=True)
    index = build_index_from_embeddings(toks, mask, pad_multiple=64,
                                        dtype=jnp.float32)
    index.build_summaries(n_summary=2)
    return index, jnp.asarray(q.astype(np.float32))


def _recall(rows_approx, rows_exact, k):
    hits = sum(len(set(a[:k].tolist()) & set(e[:k].tolist()))
               for a, e in zip(rows_approx, rows_exact))
    return hits / (len(rows_exact) * k)


@pytest.fixture(scope="module")
def exact_rows(corpus):
    index, q = corpus
    s = LateInteractionSearcher(index, mode="exact", use_pallas=False)
    _, rows = s.search_device(q, k=10)
    return np.asarray(rows)


def test_two_stage_recall_gate(corpus, exact_rows):
    index, q = corpus
    s = LateInteractionSearcher(index, mode="two_stage", use_pallas=False)
    assert s.resolve_candidates(10) == 1024        # auto preset
    _, rows = s.search_device(q, k=10)
    r = _recall(np.asarray(rows), exact_rows, 10)
    assert r >= 0.95, f"two-stage recall@10 vs exact = {r}"
    # top-1 must match exactly on a clustered corpus
    assert (np.asarray(rows)[:, 0] == exact_rows[:, 0]).mean() >= 0.99


@pytest.fixture(scope="module")
def hier_index(corpus):
    """Cluster-ordered index for hierarchical mode (the documented
    production recipe: coarse.cluster_order makes blocks coherent).
    Returns (index, perm) — map retrieved rows through perm to get
    original doc ids."""
    from ravqa_tpu.retrieval.coarse import cluster_order
    index, _ = corpus
    perm = np.asarray(cluster_order(index.summaries[:N_DOCS],
                                    n_clusters=N_CLUSTERS))
    toks = np.asarray(index.tokens)[:N_DOCS][perm]
    mask = np.asarray(index.mask)[:N_DOCS][perm]
    idx2 = build_index_from_embeddings(toks, mask, pad_multiple=64,
                                       dtype=jnp.float32)
    idx2.build_summaries(n_summary=2)
    idx2.build_block_summaries(block_size=64)
    return idx2, perm


def test_hierarchical_recall_gate(corpus, exact_rows, hier_index):
    idx2, perm = hier_index
    _, q = corpus
    s = LateInteractionSearcher(idx2, mode="hierarchical",
                                use_pallas=False)
    _, rows = s.search_device(q, k=10)
    rows = perm[np.asarray(rows)]                  # map back to original ids
    r = _recall(rows, exact_rows, 10)
    assert r >= 0.9, f"hierarchical recall@10 vs exact = {r}"


def test_hierarchical_coarse_int8_recall_gate_100k(corpus, exact_rows,
                                                   hier_index):
    """Gate the int8 STAGE-1 summary gather at scale (coarse_int8 in
    hierarchical mode builds the quantize_summaries_int8 copy; on CPU
    with use_pallas=False only that stage-1 path differs from the float
    searcher). Recall@10 vs exact must hold the float hierarchical
    gate's floor minus 1pt (the same tolerance the codec gates use for
    quantization rounding), and top-1 must agree with the float
    hierarchical searcher — the final stage re-scores exactly either
    way, so only candidate-tail perturbation is tolerated."""
    idx2, perm = hier_index
    _, q = corpus
    ref = LateInteractionSearcher(idx2, mode="hierarchical",
                                  use_pallas=False)
    _, rows_f = ref.search_device(q, k=10)
    s = LateInteractionSearcher(idx2, mode="hierarchical",
                                use_pallas=False, coarse_int8=True)
    assert s._summ_i8 is not None          # the stage-1 copy was built
    _, rows = s.search_device(q, k=10)
    rows_f, rows = np.asarray(rows_f), np.asarray(rows)
    assert (rows[:, 0] == rows_f[:, 0]).mean() >= 0.99, \
        "int8 stage-1 flipped hierarchical top-1"
    r = _recall(perm[rows], exact_rows, 10)
    assert r >= 0.89, f"hier coarse_int8 recall@10 vs exact = {r}"


def test_fast_preset_recall_gate_100k(corpus, exact_rows, hier_index):
    """Gate the shipped fast preset at scale: preset='fast' (C=256,
    nb=32, int8 stage-1 rows through the stage-1 sweep — the XLA twin
    on CPU, same math as the TPU kernel) must hold the float
    hierarchical gate's floor minus 1pt vs exact, and its top-1 must
    agree with the reference-preset hierarchical searcher (the fine
    stage re-scores exactly either way). On-chip the same preset
    measured top-10 overlap 1.0000 vs the reference preset at 112k and
    1M docs (STATUS.md round-4)."""
    idx2, perm = hier_index
    _, q = corpus
    ref = LateInteractionSearcher(idx2, mode="hierarchical",
                                  use_pallas=False)
    _, rows_f = ref.search_device(q, k=10)
    s = LateInteractionSearcher(idx2, mode="hierarchical",
                                use_pallas=False, preset="fast")
    assert s.resolve_candidates(10) == 256
    assert s.resolve_blocks(10) == 32
    assert s._summ_rows is not None and s._summ_rows.dtype == jnp.int8
    _, rows = s.search_device(q, k=10)
    rows_f, rows = np.asarray(rows_f), np.asarray(rows)
    assert (rows[:, 0] == rows_f[:, 0]).mean() >= 0.99, \
        "fast preset flipped hierarchical top-1"
    r = _recall(perm[rows], exact_rows, 10)
    assert r >= 0.89, f"fast-preset recall@10 vs exact = {r}"


def test_auto_presets_scale_with_k(corpus):
    index, q = corpus
    s = LateInteractionSearcher(index, mode="two_stage", use_pallas=False)
    assert s.resolve_candidates(5) == 1024
    assert s.resolve_candidates(100) == 1024
    assert s.resolve_candidates(500) == 4096       # max(4k, 4096)
    assert s.resolve_candidates(2000) == 8000
    s2 = LateInteractionSearcher(index, mode="two_stage", use_pallas=False,
                                 n_candidates=64)
    assert s2.resolve_candidates(2000) == 64       # explicit wins


def test_pad_rows_never_win_coarse_slots():
    """ADVICE r1: all-zero pad summaries used to score 0 and beat real docs
    with negative coarse scores."""
    rng = np.random.default_rng(1)
    # adversarial: every real doc scores NEGATIVELY against the query
    toks = -np.abs(rng.normal(size=(48, 4, DIM))).astype(np.float32)
    toks /= np.linalg.norm(toks, axis=-1, keepdims=True)
    mask = np.ones((48, 4), np.int8)
    index = build_index_from_embeddings(toks, mask, pad_multiple=64)
    assert index.n_pad == 64                       # 16 pad rows
    index.build_summaries(n_summary=2)
    q = np.abs(rng.normal(size=(2, 4, DIM))).astype(np.float32)
    q /= np.linalg.norm(q, axis=-1, keepdims=True)
    s = LateInteractionSearcher(index, mode="two_stage", use_pallas=False,
                                n_candidates=16)
    _, rows = s.search_device(jnp.asarray(q), k=10)
    assert (np.asarray(rows) < 48).all(), "pad row won a candidate slot"
    index.build_block_summaries(block_size=8)
    sh = LateInteractionSearcher(index, mode="hierarchical",
                                 use_pallas=False, n_candidates=16,
                                 n_blocks=4)
    _, rows_h = sh.search_device(jnp.asarray(q), k=10)
    assert (np.asarray(rows_h) < 48).all()


# ---------------------------------------------------------------------------
# Codec recall gates at the same 100k scale (VERDICT r2 weak #3: int8 and
# residual modes were recall-gated only at toy scale — a codec regression
# at scale passed CI). Thresholds are the measured CPU-mesh baselines
# minus 1pt; a codec/kernel change that drops recall below them fails CI.
# ---------------------------------------------------------------------------

def _codec_recall(index, q, exact_rows, n_candidates=1024):
    s = LateInteractionSearcher(index, mode="two_stage", use_pallas=False,
                                n_candidates=n_candidates)
    _, rows = s.search_device(q, k=10)
    rows = np.asarray(rows)
    t1in10 = np.mean([e[0] in set(a.tolist())
                      for a, e in zip(rows, exact_rows)])
    return _recall(rows, exact_rows, 10), t1in10


def test_int8_recall_gate_100k(corpus, exact_rows):
    """Measured baseline (CPU mesh, this corpus): recall@10 = 0.90,
    exact-top-1 surfaced in top-10 for every query."""
    index, q = corpus
    idx8 = build_index_from_embeddings(
        np.asarray(index.tokens)[:N_DOCS], np.asarray(index.mask)[:N_DOCS],
        pad_multiple=64, dtype=jnp.float32)
    idx8.build_summaries(n_summary=2)
    idx8.quantize_int8()
    r, t1in10 = _codec_recall(idx8, q, exact_rows)
    assert r >= 0.89, f"int8 recall@10 vs exact = {r}"
    assert t1in10 >= 0.99, f"int8 exact-top1-in-top10 = {t1in10}"


def test_int8_coarse_cut_gate_100k(corpus, exact_rows):
    """Gate the int8 COARSE sweep's candidate generation at scale
    (coarse_int8 / ops.maxsim coarse_sweep_pallas int8 branch): every
    exact top-10 doc must survive the int8-quantized top-1024 cut. The
    kernel itself is interpret-tested bit-for-bit elsewhere; this replays
    its quantized math in XLA (dequantized f32 einsum is numerically the
    integer dot x scales) so the 100k gate runs in CI without Mosaic."""
    from ravqa_tpu.ops.quant import quantize_summaries_t_int8
    index, q = corpus
    st = jnp.swapaxes(index.summaries, 0, 1).astype(jnp.bfloat16)
    st8, dsc = quantize_summaries_t_int8(st)
    q32 = np.asarray(q, np.float32)
    qs = np.maximum(np.abs(q32).max(-1, keepdims=True), 1e-8) / 127.0
    q8 = np.round(q32 / qs)
    deq = np.asarray(st8, np.float32) \
        * np.asarray(dsc, np.float32)[None, :, None]      # (S, N, dim)
    s = np.einsum("bqd,snd->bsnq", q8 * qs, deq)
    scores = s.max(axis=1).sum(axis=-1)                    # (B, N)
    valid = np.asarray(jnp.any(index.mask != 0, axis=1))
    scores = np.where(valid[None, :], scores, -1e9)
    cand = np.argsort(-scores, axis=1)[:, :1024]
    containment = np.mean([len(set(e[:10].tolist())
                               & set(c.tolist())) / 10
                           for e, c in zip(exact_rows, cand)])
    assert containment >= 0.99, \
        f"exact top-10 containment in int8 top-1024 = {containment}"


@pytest.mark.parametrize("nbits,floor,t1floor", [(2, 0.37, 0.3),
                                                 (8, 0.82, 0.99)])
def test_residual_recall_gate_100k(corpus, exact_rows, nbits, floor,
                                   t1floor):
    """nbits=8 is the published OK-VQA index setting (measured here:
    recall@10 = 0.8375, exact-top-1 always in top-10). nbits=2 is the
    CAPACITY setting, and this corpus is its documented worst case: all 8
    tokens of a doc sit in ONE tight cluster (sigma = 0.3), so within-
    cluster score gaps are smaller than the 2-bit reconstruction error
    and near-ties shuffle freely (measured recall@10 = 0.3875). That is
    regime-inherent quantization loss, not an engine defect — the same
    codec at nbits=2 holds self-retrieval top-1 = 1.00 on the 1M bench
    corpus, whose docs mix tokens across clusters. The gate pins the
    measured numbers (-1pt) so a CODEC regression still fails CI; use
    nbits >= 4 when the corpus is tight-cluster."""
    index, q = corpus
    idxr = build_index_from_embeddings(
        np.asarray(index.tokens)[:N_DOCS], np.asarray(index.mask)[:N_DOCS],
        pad_multiple=64, dtype=jnp.float32)
    idxr.build_summaries(n_summary=2)
    idxr.quantize_residual(n_centroids=N_CLUSTERS, nbits=nbits)
    r, t1in10 = _codec_recall(idxr, q, exact_rows)
    assert r >= floor, f"residual nbits={nbits} recall@10 vs exact = {r}"
    assert t1in10 >= t1floor, \
        f"residual nbits={nbits} exact-top1-in-top10 = {t1in10}"
