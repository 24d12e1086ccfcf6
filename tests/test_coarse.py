"""Two-stage search tests: summary k-means sanity and coarse-stage recall on
structured (clustered) corpora."""

import numpy as np
import jax
import jax.numpy as jnp

from ravqa_tpu.ops import maxsim_search_xla
from ravqa_tpu.retrieval.coarse import (coarse_scores, summarize_docs,
                                        two_stage_search)


def normed(x):
    return x / np.linalg.norm(x, axis=-1, keepdims=True)


def make_clustered_corpus(rng, n_docs=128, ld=16, dim=32, n_topics=10,
                          noise=0.15):
    """Each doc's tokens = its topic vector + noise (structured corpus).
    noise=0.15 in 32-d keeps the topic dominant (|noise| ~ 0.85 < 1)."""
    topics = normed(rng.normal(size=(n_topics, dim)))
    doc_topic = rng.integers(n_topics, size=n_docs)
    toks = topics[doc_topic][:, None, :] + noise * rng.normal(
        size=(n_docs, ld, dim))
    toks = normed(toks).astype(np.float32)
    mask = np.ones((n_docs, ld), np.float32)
    return toks, mask, doc_topic, topics


def test_summarize_docs_represents_tokens():
    rng = np.random.default_rng(0)
    toks, mask, _, _ = make_clustered_corpus(rng, n_docs=8)
    summ = np.asarray(summarize_docs(jnp.array(toks), jnp.array(mask),
                                     n_summary=4))
    assert summ.shape == (8, 4, 32)
    np.testing.assert_allclose(np.linalg.norm(summ, axis=-1), 1.0,
                               atol=1e-5)
    # each token should be close to its best summary vector
    # token->nearest-summary similarity: with noise 0.15 in 32-d the
    # expected token-to-topic cosine is ~0.88; 4 centroids recover ~0.85
    sims = np.einsum("nld,nsd->nls", toks, summ).max(-1)
    assert sims.mean() > 0.8
    # and summaries beat a single random token as doc representation
    rand_rep = np.einsum("nld,nd->nl", toks, toks[:, 0])
    assert sims.mean() > rand_rep.mean()


def test_two_stage_matches_exact_on_clustered_data():
    rng = np.random.default_rng(1)
    toks, mask, doc_topic, topics = make_clustered_corpus(
        rng, n_docs=256, ld=16, dim=32)
    # queries: noisy copies of a random doc's tokens
    qidx = rng.integers(256, size=6)
    q = normed(toks[qidx, :8] + 0.1 * rng.normal(size=(6, 8, 32))).astype(
        np.float32)

    summ = summarize_docs(jnp.array(toks), jnp.array(mask), n_summary=4)
    s2, r2 = two_stage_search(jnp.array(q), jnp.array(toks),
                              jnp.array(mask), summ, k=5, n_candidates=64)
    exact = np.asarray(maxsim_search_xla(jnp.array(q), jnp.array(toks),
                                         jnp.array(mask)))
    want = np.argsort(-exact, axis=1)[:, :5]
    got = np.asarray(r2)
    # top-1 must match; top-5 overlap high
    np.testing.assert_array_equal(got[:, 0], want[:, 0])
    overlap = np.mean([len(set(got[i]) & set(want[i])) / 5
                       for i in range(6)])
    assert overlap > 0.9, overlap
    # fine-stage scores are exact for retrieved docs
    np.testing.assert_allclose(
        np.asarray(s2), np.take_along_axis(exact, got, axis=1), rtol=1e-4)


def test_coarse_query_len_truncation():
    rng = np.random.default_rng(2)
    toks, mask, _, _ = make_clustered_corpus(rng, n_docs=32)
    q = normed(rng.normal(size=(2, 8, 32))).astype(np.float32)
    summ = summarize_docs(jnp.array(toks), jnp.array(mask), n_summary=2)
    full = np.asarray(coarse_scores(jnp.array(q), summ))
    trunc = np.asarray(coarse_scores(jnp.array(q), summ,
                                     coarse_query_len=4))
    q4 = np.asarray(coarse_scores(jnp.array(q[:, :4]), summ))
    np.testing.assert_allclose(trunc, q4, rtol=1e-6)
    assert not np.allclose(full, trunc)


def test_searcher_two_stage_modes():
    """LateInteractionSearcher mode='two_stage', single-device and sharded."""
    import jax
    from jax.sharding import Mesh
    from ravqa_tpu.retrieval import (LateInteractionSearcher,
                                     build_index_from_embeddings)
    rng = np.random.default_rng(5)
    toks, mask, _, _ = make_clustered_corpus(rng, n_docs=256, ld=16, dim=32)
    qidx = rng.integers(256, size=4)
    q = normed(toks[qidx, :8] + 0.05 * rng.normal(size=(4, 8, 32))).astype(
        np.float32)

    idx = build_index_from_embeddings(toks, mask, pad_multiple=8,
                                      dtype=jnp.float32)
    idx.build_summaries(n_summary=4, iters=4)
    s1 = LateInteractionSearcher(idx, mode="two_stage", n_candidates=64,
                                 use_pallas=False)
    scores, pids = s1.search(q, k=5)
    assert (pids[:, 0] == qidx).all()

    mesh = Mesh(np.array(jax.devices()), ("index",))
    idx2 = build_index_from_embeddings(toks, mask, pad_multiple=8,
                                       dtype=jnp.float32, mesh=mesh)
    idx2.build_summaries(n_summary=4, iters=4, mesh=mesh)
    s2 = LateInteractionSearcher(idx2, mesh=mesh, mode="two_stage",
                                 n_candidates=64, use_pallas=False)
    scores2, pids2 = s2.search(q, k=5)
    assert (pids2[:, 0] == qidx).all()


def test_searcher_two_stage_int8_sharded():
    """Sharded two-stage over an int8-quantized index (1M-scale recipe)."""
    import jax
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
    from ravqa_tpu.ops.quant import quantize_index_int8
    from ravqa_tpu.retrieval import (LateInteractionSearcher, TokenIndex,
                                     build_index_from_embeddings)
    rng = np.random.default_rng(6)
    toks, mask, _, _ = make_clustered_corpus(rng, n_docs=128, ld=16, dim=32)
    qidx = rng.integers(128, size=4)
    q = normed(toks[qidx, :8] + 0.05 * rng.normal(size=(4, 8, 32))).astype(
        np.float32)
    mesh = Mesh(np.array(jax.devices()), ("index",))
    idx = build_index_from_embeddings(toks, mask, pad_multiple=8,
                                      dtype=jnp.float32, mesh=mesh)
    idx.build_summaries(n_summary=4, iters=4, mesh=mesh)
    q8, scales = quantize_index_int8(idx.tokens, idx.mask.astype(jnp.float32))
    sh = NamedSharding(mesh, P("index"))
    idx_q = TokenIndex(tokens=jax.device_put(q8, sh), mask=idx.mask,
                       pids=idx.pids, num_docs=idx.num_docs,
                       scales=jax.device_put(scales, sh),
                       summaries=idx.summaries)
    s = LateInteractionSearcher(idx_q, mesh=mesh, mode="two_stage",
                                n_candidates=64, use_pallas=False)
    scores, pids = s.search(q, k=5)
    assert (pids[:, 0] == qidx).all()


def test_hierarchical_search_with_cluster_order():
    """3-stage search over cluster-ordered blocks: exact top-1 on
    clustered data (Infoseek-scale recipe)."""
    from ravqa_tpu.retrieval.coarse import (block_summaries, cluster_order,
                                            hierarchical_search)
    rng = np.random.default_rng(0)
    n, ld, dim, S = 512, 16, 32, 4
    toks, mask, _, _ = make_clustered_corpus(rng, n_docs=n, ld=ld, dim=dim,
                                             n_topics=24)
    qidx = rng.integers(n, size=16)
    q = normed(toks[qidx, :8] + 0.05 * rng.normal(size=(16, 8, dim))
               ).astype(np.float32)
    summ = summarize_docs(jnp.array(toks), jnp.array(mask), n_summary=S,
                          iters=4)
    perm = np.asarray(cluster_order(summ, n_clusters=16, iters=4,
                                    chunk=128))
    toks_o, mask_o = toks[perm], mask[perm]
    summ_o = np.asarray(summ)[perm]
    bs = block_summaries(jnp.array(summ_o), block_size=32,
                         n_block_summary=4)
    _, r3 = hierarchical_search(
        jnp.array(q), jnp.array(toks_o), jnp.array(mask_o),
        jnp.array(summ_o), bs, k=5, n_blocks=8, n_candidates=64,
        block_size=32)
    got = perm[np.asarray(r3)[:, 0]]
    assert (got == qidx).mean() >= 0.9


def test_searcher_hierarchical_mode():
    from ravqa_tpu.retrieval import (LateInteractionSearcher,
                                     build_index_from_embeddings)
    from ravqa_tpu.retrieval.coarse import cluster_order, summarize_docs
    rng = np.random.default_rng(7)
    toks, mask, _, _ = make_clustered_corpus(rng, n_docs=256, ld=16, dim=32,
                                             n_topics=16)
    summ = summarize_docs(jnp.array(toks), jnp.array(mask), n_summary=4,
                          iters=4)
    perm = np.asarray(cluster_order(summ, n_clusters=8, iters=4, chunk=128))
    toks, mask = toks[perm], mask[perm]
    qsrc = rng.integers(256, size=4)
    q = normed(toks[qsrc, :8] + 0.05 * rng.normal(size=(4, 8, 32))
               ).astype(np.float32)
    idx = build_index_from_embeddings(toks, mask, pad_multiple=8,
                                      dtype=jnp.float32)
    idx.build_summaries(n_summary=4, iters=4)
    idx.build_block_summaries(block_size=32, n_block_summary=4)
    s = LateInteractionSearcher(idx, mode="hierarchical", n_candidates=64,
                                use_pallas=False)
    scores, pids = s.search(q, k=5)
    assert (pids[:, 0] == qsrc).all()


def test_searcher_hierarchical_sharded():
    """Hierarchical mode over an 8-way sharded index: each shard runs the
    3-stage search on its slice, then the cross-shard top-k merge."""
    import jax
    from jax.sharding import Mesh
    from ravqa_tpu.retrieval import (LateInteractionSearcher,
                                     build_index_from_embeddings)
    from ravqa_tpu.retrieval.coarse import cluster_order, summarize_docs
    rng = np.random.default_rng(8)
    toks, mask, _, _ = make_clustered_corpus(rng, n_docs=256, ld=16, dim=32,
                                             n_topics=16)
    summ = summarize_docs(jnp.array(toks), jnp.array(mask), n_summary=4,
                          iters=4)
    perm = np.asarray(cluster_order(summ, n_clusters=8, iters=4, chunk=128))
    toks, mask = toks[perm], mask[perm]
    qsrc = rng.integers(256, size=4)
    q = normed(toks[qsrc, :8] + 0.05 * rng.normal(size=(4, 8, 32))
               ).astype(np.float32)
    mesh = Mesh(np.array(jax.devices()), ("index",))
    idx = build_index_from_embeddings(toks, mask, pad_multiple=8,
                                      dtype=jnp.float32, mesh=mesh)
    idx.build_summaries(n_summary=4, iters=4, mesh=mesh)
    idx.build_block_summaries(block_size=16, n_block_summary=4, mesh=mesh)
    s = LateInteractionSearcher(idx, mesh=mesh, mode="hierarchical",
                                n_candidates=64, n_blocks=16,
                                use_pallas=False)
    scores, pids = s.search(q, k=5)
    assert (pids[:, 0] == qsrc).all()


def test_searcher_coarse_query_len():
    """The reference's candidate-generation query truncation
    (index_storage.py:68-77) exposed through the Searcher: truncated Q
    drives pruning, full Q scores the final stage exactly."""
    from ravqa_tpu.retrieval import (LateInteractionSearcher,
                                     build_index_from_embeddings)
    rng = np.random.default_rng(9)
    toks, mask, _, _ = make_clustered_corpus(rng, n_docs=128, ld=16, dim=32)
    qidx = rng.integers(128, size=4)
    q = normed(toks[qidx, :8] + 0.05 * rng.normal(size=(4, 8, 32))
               ).astype(np.float32)
    idx = build_index_from_embeddings(toks, mask, pad_multiple=8,
                                      dtype=jnp.float32)
    idx.build_summaries(n_summary=4, iters=4)
    s = LateInteractionSearcher(idx, mode="two_stage", n_candidates=32,
                                use_pallas=False, coarse_query_len=4)
    scores, pids = s.search(q, k=5)
    assert (pids[:, 0] == qidx).all()
    # final scores are full-query exact scores for the retrieved docs
    exact = np.asarray(maxsim_search_xla(jnp.array(q), jnp.array(toks),
                                         jnp.array(mask)))
    rows = np.asarray(pids)  # pids == rows here (no padding reorder)
    np.testing.assert_allclose(
        scores, np.take_along_axis(exact, rows, axis=1), rtol=1e-4)


def test_searcher_hierarchical_int8_sharded():
    """Sharded hierarchical over an int8-quantized index (the 1M-on-a-mesh
    recipe: block summaries bf16, tokens int8 with in-stage dequant)."""
    import jax
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
    from ravqa_tpu.ops.quant import quantize_index_int8
    from ravqa_tpu.retrieval import (LateInteractionSearcher, TokenIndex,
                                     build_index_from_embeddings)
    from ravqa_tpu.retrieval.coarse import cluster_order, summarize_docs
    rng = np.random.default_rng(11)
    toks, mask, _, _ = make_clustered_corpus(rng, n_docs=256, ld=16, dim=32,
                                             n_topics=16)
    summ = summarize_docs(jnp.array(toks), jnp.array(mask), n_summary=4,
                          iters=4)
    perm = np.asarray(cluster_order(summ, n_clusters=8, iters=4, chunk=128))
    toks, mask = toks[perm], mask[perm]
    qsrc = rng.integers(256, size=4)
    q = normed(toks[qsrc, :8] + 0.05 * rng.normal(size=(4, 8, 32))
               ).astype(np.float32)
    mesh = Mesh(np.array(jax.devices()), ("index",))
    idx = build_index_from_embeddings(toks, mask, pad_multiple=8,
                                      dtype=jnp.float32, mesh=mesh)
    idx.build_summaries(n_summary=4, iters=4, mesh=mesh)
    q8, scales = quantize_index_int8(idx.tokens, idx.mask.astype(jnp.float32))
    sh = NamedSharding(mesh, P("index"))
    idx_q = TokenIndex(tokens=jax.device_put(q8, sh), mask=idx.mask,
                       pids=idx.pids, num_docs=idx.num_docs,
                       scales=jax.device_put(scales, sh),
                       summaries=idx.summaries)
    idx_q.build_block_summaries(block_size=16, n_block_summary=4, mesh=mesh)
    s = LateInteractionSearcher(idx_q, mesh=mesh, mode="hierarchical",
                                n_candidates=64, n_blocks=16,
                                use_pallas=False)
    scores, pids = s.search(q, k=5)
    assert (pids[:, 0] == qsrc).all()


def test_hierarchical_block_summ_t_kernel_stage0_matches_xla():
    """Stage 0 via the coarse-sweep Pallas kernel (slot-major padded
    block_summ_t, interpret mode) must rank identically to the XLA
    einsum stage 0, including block-dim padding suppression."""
    from jax.experimental.pallas import tpu as pltpu
    from ravqa_tpu.retrieval.coarse import (block_summaries,
                                            block_summaries_t,
                                            cluster_order,
                                            hierarchical_search)
    rng = np.random.default_rng(3)
    n, ld, dim, S = 512, 16, 128, 4
    toks, mask, _, _ = make_clustered_corpus(rng, n_docs=n, ld=ld, dim=dim,
                                             n_topics=24)
    # a fully-padded tail block exercises the validity mask end-to-end
    mask[-32:] = 0
    qidx = rng.integers(n - 32, size=8)
    q = normed(toks[qidx, :8] + 0.05 * rng.normal(size=(8, 8, dim))
               ).astype(np.float32)
    summ = summarize_docs(jnp.array(toks), jnp.array(mask), n_summary=S,
                          iters=4)
    perm = np.asarray(cluster_order(summ, n_clusters=16, iters=4,
                                    chunk=128))
    toks_o, mask_o = toks[perm], mask[perm]
    summ_o = jnp.array(np.asarray(summ)[perm])
    bs = block_summaries(summ_o, block_size=32, n_block_summary=4)
    # pad 16 blocks -> 24 on the block dim (any multiple works)
    bst = block_summaries_t(bs, pad_multiple=24)
    assert bst.shape == (4, 24, dim)
    args = (jnp.array(q), jnp.array(toks_o), jnp.array(mask_o), summ_o, bs)
    kw = dict(k=5, n_blocks=8, n_candidates=64, block_size=32)
    _, want = hierarchical_search(*args, **kw)
    with pltpu.force_tpu_interpret_mode():
        _, got = hierarchical_search(*args, **kw, block_summ_t=bst)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_searcher_hierarchical_coarse_int8_interpret():
    """Hierarchical searcher with coarse_int8=True: stage 0 rides the
    int8 branch of the coarse-sweep kernel over the quantized padded
    block-summary copy; top-1 must match the float searcher."""
    from jax.experimental.pallas import tpu as pltpu
    from ravqa_tpu.retrieval import (LateInteractionSearcher,
                                     build_index_from_embeddings)
    from ravqa_tpu.retrieval.coarse import cluster_order, summarize_docs
    rng = np.random.default_rng(13)
    toks, mask, _, _ = make_clustered_corpus(rng, n_docs=256, ld=16,
                                             dim=128, n_topics=16)
    summ = summarize_docs(jnp.array(toks), jnp.array(mask), n_summary=4,
                          iters=4)
    perm = np.asarray(cluster_order(summ, n_clusters=8, iters=4, chunk=128))
    toks, mask = toks[perm], mask[perm]
    qsrc = rng.integers(256, size=4)
    q = normed(toks[qsrc, :8] + 0.05 * rng.normal(size=(4, 8, 128))
               ).astype(np.float32)
    idx = build_index_from_embeddings(toks, mask, pad_multiple=8,
                                      dtype=jnp.float32)
    idx.build_summaries(n_summary=4, iters=4)
    idx.build_block_summaries(block_size=32, n_block_summary=4)
    ref = LateInteractionSearcher(idx, mode="hierarchical", n_candidates=64,
                                  use_pallas=False)
    _, want = ref.search(q, k=5)
    with pltpu.force_tpu_interpret_mode():
        s = LateInteractionSearcher(idx, mode="hierarchical",
                                    n_candidates=64, use_pallas=True,
                                    coarse_int8=True)
        assert s._bsum_t is not None and s._bsum_t.dtype == jnp.int8
        assert s._bsum_t_scale is not None
        assert s._bsum_t_scale.shape == (s._bsum_t.shape[1],)
        _, got = s.search(q, k=5)
    np.testing.assert_array_equal(got[:, 0], want[:, 0])


def test_searcher_hierarchical_bsum_t_interpret():
    """Single-device hierarchical searcher with use_pallas=True builds the
    bf16 slot-major block-summary copy and ranks like use_pallas=False
    (top-1 must hold; bf16 stage-0 can flip far-tail candidates)."""
    from jax.experimental.pallas import tpu as pltpu
    from ravqa_tpu.retrieval import (LateInteractionSearcher,
                                     build_index_from_embeddings)
    from ravqa_tpu.retrieval.coarse import cluster_order, summarize_docs
    rng = np.random.default_rng(11)
    toks, mask, _, _ = make_clustered_corpus(rng, n_docs=256, ld=16,
                                             dim=128, n_topics=16)
    summ = summarize_docs(jnp.array(toks), jnp.array(mask), n_summary=4,
                          iters=4)
    perm = np.asarray(cluster_order(summ, n_clusters=8, iters=4, chunk=128))
    toks, mask = toks[perm], mask[perm]
    qsrc = rng.integers(256, size=4)
    q = normed(toks[qsrc, :8] + 0.05 * rng.normal(size=(4, 8, 128))
               ).astype(np.float32)
    idx = build_index_from_embeddings(toks, mask, pad_multiple=8,
                                      dtype=jnp.float32)
    idx.build_summaries(n_summary=4, iters=4)
    idx.build_block_summaries(block_size=32, n_block_summary=4)
    ref = LateInteractionSearcher(idx, mode="hierarchical", n_candidates=64,
                                  use_pallas=False)
    _, want = ref.search(q, k=5)
    with pltpu.force_tpu_interpret_mode():
        s = LateInteractionSearcher(idx, mode="hierarchical",
                                    n_candidates=64, use_pallas=True)
        assert s._bsum_t is not None
        assert s._bsum_t.dtype == jnp.bfloat16
        _, got = s.search(q, k=5)
    np.testing.assert_array_equal(got[:, 0], want[:, 0])
