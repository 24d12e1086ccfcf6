"""Searcher presets: "reference" (the reference's quality-first ndocs
rule, searcher.py:91-118) vs "fast" (the measured rank-converged
operating point from the on-chip sweeps — STATUS.md round-4,
scripts/exp_1m_convergence.py / frontier_112k.py: C = max(256, 4k),
n_blocks covering C (>= 32), int8 pruning-stage summaries, fused
stage-1 kernel). The fast preset is candidate generation only — the
final stage still re-scores exactly — so on a separated corpus its
ranking must match the reference preset."""

import warnings

import numpy as np
import jax.numpy as jnp
import pytest

from ravqa_tpu.retrieval import (LateInteractionSearcher,
                                 build_index_from_embeddings)
from ravqa_tpu.retrieval.coarse import cluster_order, summarize_docs


def normed(x):
    return x / np.linalg.norm(x, axis=-1, keepdims=True)


def make_corpus(rng, n_docs=512, ld=8, dim=64, n_topics=32, noise=0.15):
    topics = normed(rng.normal(size=(n_topics, dim)))
    doc_topic = rng.integers(n_topics, size=n_docs)
    toks = topics[doc_topic][:, None, :] + noise * rng.normal(
        size=(n_docs, ld, dim))
    toks = normed(toks).astype(np.float32)
    mask = np.ones((n_docs, ld), np.float32)
    # cluster-order (the hierarchical build recipe) so block pruning is
    # coherent and self-retrieval is a meaningful oracle
    summ = summarize_docs(jnp.asarray(toks), jnp.asarray(mask),
                          n_summary=4, iters=4)
    perm = np.asarray(cluster_order(summ, n_clusters=16, iters=4,
                                    chunk=256))
    return toks[perm], mask[perm]


def queries_from(rng, toks, n=4, lq=8):
    qsrc = rng.integers(toks.shape[0], size=n)
    q = normed(toks[qsrc, :lq]
               + 0.05 * rng.normal(size=(n, lq, toks.shape[2])))
    return q.astype(np.float32), qsrc


def build_hier(toks, mask, mesh=None, block_size=64, residual=False):
    idx = build_index_from_embeddings(
        toks, mask, pad_multiple=(128 if mesh is not None else 64),
        dtype=jnp.float32, mesh=mesh)
    idx.build_summaries(n_summary=4, iters=4, mesh=mesh)
    idx.build_block_summaries(block_size=block_size, mesh=mesh)
    if residual:
        idx.quantize_residual(n_centroids=64, nbits=4, mesh=mesh)
    return idx


def test_invalid_preset_raises():
    rng = np.random.default_rng(0)
    toks, mask = make_corpus(rng, n_docs=128)
    idx = build_index_from_embeddings(toks, mask, dtype=jnp.float32)
    with pytest.raises(ValueError, match="preset"):
        LateInteractionSearcher(idx, use_pallas=False, preset="turbo")


def test_fast_preset_resolves_knobs():
    """fast = C max(256,4k), covering n_blocks >= 32, int8 stage-1 rows
    via the fused kernel (all derived, none explicit)."""
    rng = np.random.default_rng(1)
    toks, mask = make_corpus(rng)
    s = LateInteractionSearcher(build_hier(toks, mask),
                                mode="hierarchical", use_pallas=False,
                                preset="fast")
    assert s.resolve_candidates(10) == 256
    assert s.resolve_candidates(1000) == 4000      # deep k scales 4k/chip
    assert s.resolve_blocks(10) == 32              # max(32, ceil(256/64))
    assert s.resolve_blocks(5000) == 313           # ceil(4*5000/64)
    # int8 pruning summaries ride the stage-1 rows layout
    assert s._summ_rows is not None
    assert s._summ_rows.dtype == jnp.int8
    assert s._summ_rows_scale is not None
    ref = LateInteractionSearcher(build_hier(toks, mask),
                                  mode="hierarchical", use_pallas=False)
    assert ref.preset == "reference"
    assert ref.resolve_candidates(10) == 1024
    assert ref.resolve_blocks(10) == 512
    assert ref._summ_rows is None and ref._summ_i8 is None


def test_explicit_knobs_override_preset():
    rng = np.random.default_rng(2)
    toks, mask = make_corpus(rng)
    s = LateInteractionSearcher(build_hier(toks, mask),
                                mode="hierarchical", use_pallas=False,
                                preset="fast", coarse_int8=False,
                                stage1_kernel=False, n_candidates=96,
                                n_blocks=7)
    assert s._summ_rows is None and s._summ_i8 is None
    assert s.resolve_candidates(10) == 96
    assert s.resolve_blocks(10) == 7


@pytest.mark.parametrize("residual", [False, True])
def test_fast_preset_ranking_matches_reference(residual):
    """The fast preset's cuts are measured rank-converged; on a separated
    corpus top-1 must equal the reference preset's (and self-retrieve)."""
    rng = np.random.default_rng(3)
    toks, mask = make_corpus(rng)
    q, qsrc = queries_from(rng, toks)
    ref = LateInteractionSearcher(
        build_hier(toks, mask, residual=residual), mode="hierarchical",
        use_pallas=False)
    _, want = ref.search(q, k=5)
    # off-TPU the summ_rows stage 1 runs stage1_sweep_xla, the kernel's
    # XLA twin (identical math/layout; the Pallas kernel itself is
    # covered by the on-chip benches + test_maxsim interpret tests)
    s = LateInteractionSearcher(
        build_hier(toks, mask, residual=residual),
        mode="hierarchical", use_pallas=False, preset="fast")
    assert s._summ_rows is not None
    _, got = s.search(q, k=5)
    assert (got[:, 0] == want[:, 0]).all()
    assert (got[:, 0] == qsrc).all()


def test_fast_preset_two_stage_cpu_keeps_int8_off():
    """Off-TPU two_stage has no int8 coarse path; the fast preset must
    not enable coarse_int8 there (and must not warn)."""
    rng = np.random.default_rng(4)
    toks, mask = make_corpus(rng)
    q, qsrc = queries_from(rng, toks)
    idx = build_index_from_embeddings(toks, mask, pad_multiple=64,
                                      dtype=jnp.float32)
    idx.build_summaries(n_summary=4, iters=4)
    with warnings.catch_warnings():
        warnings.simplefilter("error")
        s = LateInteractionSearcher(idx, mode="two_stage",
                                    use_pallas=False, preset="fast")
    assert not s.coarse_int8
    assert s.resolve_candidates(10) == 256
    _, got = s.search(q, k=5)
    assert (got[:, 0] == qsrc).all()


def test_fast_preset_exact_mode_is_a_noop():
    """mode="exact" has no pruning stages; the preset must not warn or
    change results."""
    rng = np.random.default_rng(5)
    toks, mask = make_corpus(rng, n_docs=128)
    q, qsrc = queries_from(rng, toks)
    idx = build_index_from_embeddings(toks, mask, dtype=jnp.float32)
    with warnings.catch_warnings():
        warnings.simplefilter("error")
        s = LateInteractionSearcher(idx, use_pallas=False, preset="fast")
    _, got = s.search(q, k=5)
    assert (got[:, 0] == qsrc).all()


@pytest.mark.parametrize("residual", [False, True])
def test_fast_preset_sharded(residual):
    """8-device sharded hierarchical under the fast preset: the stage-1
    rows shard over the index axis (boundaries align to blocks by the
    build recipe) and ranking matches the sharded reference preset —
    for the token index AND the residual codec (whose sharded fine
    stage decompresses from sharded packed records)."""
    from ravqa_tpu.parallel import make_mesh
    rng = np.random.default_rng(6)
    # 8192 docs over 8 shards = 1024 docs/shard: the preset's per-shard
    # cuts are REAL here — stage 0 keeps 32 of 64 blocks/shard and the
    # candidate cut keeps 256 of the 512 covered docs (at 2048 docs
    # both cuts were exhaustive and the test could not catch
    # candidate-cut bugs)
    toks, mask = make_corpus(rng, n_docs=8192, n_topics=64)
    q, qsrc = queries_from(rng, toks)
    mesh = make_mesh({"index": 8})
    # true reference-preset defaults (an explicitly-thin C=128/nb=64 cut
    # spread over 8 shards = 16 docs/shard measurably LOSES queries this
    # preset finds — the fast preset matched the exact oracle there)
    ref = LateInteractionSearcher(
        build_hier(toks, mask, mesh=mesh, block_size=16,
                   residual=residual), mesh=mesh,
        mode="hierarchical", use_pallas=False)
    _, want = ref.search(q, k=5)
    s = LateInteractionSearcher(
        build_hier(toks, mask, mesh=mesh, block_size=16,
                   residual=residual), mesh=mesh,
        mode="hierarchical", use_pallas=False, preset="fast")
    assert s._summ_rows is not None          # aligned -> kernel stage 1
    assert s._summ_rows.dtype == jnp.int8
    _, got = s.search(q, k=5)
    assert (got[:, 0] == want[:, 0]).all()
    assert (got[:, 0] == qsrc).all()


def test_sharded_large_k_covers_blocks():
    """k above the per-shard block coverage: the sharded program must
    widen the stage-1 block cut to cover k docs per shard (it used to
    clamp c_local below k_local and crash the fine stage's top_k) —
    for the fast preset AND an explicitly-thin reference-preset cut."""
    from ravqa_tpu.parallel import make_mesh
    rng = np.random.default_rng(8)
    toks, mask = make_corpus(rng, n_docs=8192, n_topics=64)
    q, qsrc = queries_from(rng, toks)
    mesh = make_mesh({"index": 8})
    k = 600   # > fast preset's 32*16=512-doc default coverage per shard
    s = LateInteractionSearcher(
        build_hier(toks, mask, mesh=mesh, block_size=16), mesh=mesh,
        mode="hierarchical", use_pallas=False, preset="fast")
    _, got = s.search(q, k=k)
    assert got.shape == (q.shape[0], k)
    assert (got[:, 0] == qsrc).all()
    # explicit thin blocks (8 blocks = 16 docs/shard << k): the
    # make_sharded_search coverage floor must widen them
    thin = LateInteractionSearcher(
        build_hier(toks, mask, mesh=mesh, block_size=16), mesh=mesh,
        mode="hierarchical", use_pallas=False, n_candidates=1024,
        n_blocks=8)
    _, got2 = thin.search(q, k=k)
    assert got2.shape == (q.shape[0], k)
    assert (got2[:, 0] == qsrc).all()
