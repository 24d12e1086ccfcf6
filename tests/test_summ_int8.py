"""int8 stage-1 summaries for hierarchical search (coarse_int8).

Hierarchical stage 1 gathers the selected blocks' doc-major summaries out
of HBM every batch — the dominant pruning-cost term at 1M docs. With
coarse_int8=True the searcher builds an int8 copy + per-doc scales
(ops.quant.quantize_summaries_int8) and stage 1 gathers HALF the bytes;
the strictly-positive per-doc scale is applied after the max-over-slots /
sum-over-query, which is order-exact. Candidate generation only — the
final stage still re-scores exactly — the same approximation class as the
reference's IVF candidate generation (third_party/ColBERT/colbert/search/
candidate_generation.py)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from ravqa_tpu.ops.quant import quantize_summaries_int8
from ravqa_tpu.retrieval import (LateInteractionSearcher, TokenIndex,
                                 build_index_from_embeddings)
from ravqa_tpu.retrieval.coarse import (cluster_order, hierarchical_search,
                                        summarize_docs)


def normed(x):
    return x / np.linalg.norm(x, axis=-1, keepdims=True)


def make_corpus(rng, n_docs=256, ld=16, dim=64, n_topics=16, noise=0.15):
    topics = normed(rng.normal(size=(n_topics, dim)))
    doc_topic = rng.integers(n_topics, size=n_docs)
    toks = topics[doc_topic][:, None, :] + noise * rng.normal(
        size=(n_docs, ld, dim))
    return normed(toks).astype(np.float32), np.ones((n_docs, ld),
                                                    np.float32)


def test_quantize_summaries_int8_roundtrip():
    """Dequantized int8 summaries reconstruct the input to int8 rounding;
    the per-doc scale is shared across a doc's slots; all-zero (padded)
    docs stay exactly zero."""
    rng = np.random.default_rng(0)
    summ = normed(rng.normal(size=(32, 4, 64))).astype(np.float32)
    summ[-3:] = 0.0                                  # padded docs
    si8, scale = quantize_summaries_int8(jnp.asarray(summ))
    assert si8.dtype == jnp.int8 and si8.shape == summ.shape
    assert scale.shape == (32,)
    recon = np.asarray(si8, np.float32) * np.asarray(scale)[:, None, None]
    np.testing.assert_allclose(recon[:-3], summ[:-3], atol=1.0 / 127)
    assert (np.asarray(si8[-3:]) == 0).all()
    # order-exactness of the post-hoc rescale: scoring the RAW int8
    # codes and scaling after the max/sum must equal scoring the
    # dequantized floats (scale * sum_q max_s x == sum_q max_s scale*x)
    q = normed(rng.normal(size=(8, 64))).astype(np.float32)
    raw = np.einsum("nsd,qd->nsq", np.asarray(si8, np.float32), q)
    post = raw.max(1).sum(-1) * np.asarray(scale)         # (n,)
    deq = np.einsum("nsd,qd->nsq", recon, q).max(1).sum(-1)
    np.testing.assert_allclose(post, deq, rtol=1e-5, atol=1e-6)


def test_hierarchical_summ_int8_matches_float_token_path():
    """Direct hierarchical_search with summ_int8 (summaries=None) vs the
    float stage-1: top-1 must agree on a separated corpus, final scores
    are exact either way."""
    rng = np.random.default_rng(1)
    toks, mask = make_corpus(rng)
    summ = summarize_docs(jnp.asarray(toks), jnp.asarray(mask),
                          n_summary=4, iters=4)
    perm = np.asarray(cluster_order(summ, n_clusters=8, iters=4,
                                    chunk=128))
    toks, mask = toks[perm], mask[perm]
    summ = jnp.asarray(np.asarray(summ)[perm])
    from ravqa_tpu.retrieval.coarse import block_summaries
    bsum = block_summaries(summ, block_size=32, n_block_summary=4)
    qsrc = rng.integers(256, size=4)
    q = normed(toks[qsrc, :8] + 0.05 * rng.normal(size=(4, 8, 64))
               ).astype(np.float32)
    args = (jnp.asarray(q), jnp.asarray(toks), jnp.asarray(mask))
    kw = dict(k=5, n_blocks=4, n_candidates=64, block_size=32)
    s_f, r_f = hierarchical_search(*args, summ, bsum, **kw)
    si8, ss = quantize_summaries_int8(summ)
    s_q, r_q = hierarchical_search(*args, None, bsum, summ_int8=si8,
                                   summ_scale=ss, **kw)
    assert (np.asarray(r_q)[:, 0] == np.asarray(r_f)[:, 0]).all()
    # survivors re-score exactly: scores of agreeing rows are identical
    agree = np.asarray(r_q) == np.asarray(r_f)
    np.testing.assert_allclose(np.asarray(s_q)[agree],
                               np.asarray(s_f)[agree], rtol=1e-5)


def test_searcher_hierarchical_residual_coarse_int8_cpu():
    """Residual index + coarse_int8 on CPU (use_pallas=False): only the
    stage-1 int8 copy applies (no Pallas sweep) and must not disturb
    top-1 vs the float searcher."""
    rng = np.random.default_rng(2)
    toks, mask = make_corpus(rng, n_docs=512, dim=64)
    qsrc = rng.integers(512, size=4)
    q = normed(toks[qsrc, :8] + 0.05 * rng.normal(size=(4, 8, 64))
               ).astype(np.float32)

    def build():
        idx = build_index_from_embeddings(toks, mask, pad_multiple=64,
                                          dtype=jnp.float32)
        idx.build_summaries(n_summary=2)
        idx.build_block_summaries(block_size=16)
        idx.quantize_residual(n_centroids=64, nbits=4)
        return idx

    ref = LateInteractionSearcher(build(), mode="hierarchical",
                                  use_pallas=False, n_candidates=128)
    _, want = ref.search(q, k=5)
    s = LateInteractionSearcher(build(), mode="hierarchical",
                                use_pallas=False, n_candidates=128,
                                coarse_int8=True)
    assert s._summ_i8 is not None and s._summ_i8.dtype == jnp.int8
    assert s._summ_i8_scale.shape == (s._summ_i8.shape[0],)
    _, got = s.search(q, k=5)
    assert (got[:, 0] == want[:, 0]).all()
    assert (got[:, 0] == qsrc).all()


@pytest.mark.parametrize("quantized", [False, True])
def test_sharded_hierarchical_coarse_int8(quantized):
    """8-device sharded hierarchical + coarse_int8: the int8 summary
    copy and its per-doc scales shard over the index axis; ranking must
    match the float sharded searcher (token paths, bf16/int8 index)."""
    from jax.sharding import NamedSharding, PartitionSpec as P
    from ravqa_tpu.parallel import make_mesh
    rng = np.random.default_rng(3)
    toks, mask = make_corpus(rng, dim=64)
    summ0 = summarize_docs(jnp.asarray(toks), jnp.asarray(mask),
                           n_summary=4, iters=4)
    perm = np.asarray(cluster_order(summ0, n_clusters=8, iters=4,
                                    chunk=128))
    toks, mask = toks[perm], mask[perm]
    qsrc = rng.integers(256, size=4)
    q = normed(toks[qsrc, :8] + 0.05 * rng.normal(size=(4, 8, 64))
               ).astype(np.float32)
    mesh = make_mesh({"index": 8})

    def build():
        idx = build_index_from_embeddings(toks, mask, pad_multiple=8,
                                          dtype=jnp.float32, mesh=mesh)
        idx.build_summaries(n_summary=4, iters=4, mesh=mesh)
        if quantized:
            from ravqa_tpu.ops.quant import quantize_index_int8
            q8, scales = quantize_index_int8(
                idx.tokens, idx.mask.astype(jnp.float32))
            sh = NamedSharding(mesh, P("index"))
            idx = TokenIndex(tokens=jax.device_put(q8, sh), mask=idx.mask,
                             pids=idx.pids, num_docs=idx.num_docs,
                             scales=jax.device_put(scales, sh),
                             summaries=idx.summaries)
        idx.build_block_summaries(block_size=16, n_block_summary=4,
                                  mesh=mesh)
        return idx

    ref = LateInteractionSearcher(build(), mesh=mesh, mode="hierarchical",
                                  n_candidates=64, n_blocks=16,
                                  use_pallas=False)
    _, want = ref.search(q, k=5)
    s = LateInteractionSearcher(build(), mesh=mesh, mode="hierarchical",
                                n_candidates=64, n_blocks=16,
                                use_pallas=False, coarse_int8=True)
    assert s._summ_i8 is not None
    # round 5: coarse_int8 on a mesh also int8-quantizes the stage-0
    # block-summary sweep (per-block scales, order-exact rescale)
    assert s._bsum_i8 is not None and s._bsum_i8_scale is not None
    _, got = s.search(q, k=5)
    assert (got[:, 0] == want[:, 0]).all()
    assert (got[:, 0] == qsrc).all()


def test_sharded_hierarchical_residual_coarse_int8():
    """8-device sharded residual hierarchical + coarse_int8 compiles and
    keeps top-1 vs its float counterpart."""
    from ravqa_tpu.parallel import make_mesh
    rng = np.random.default_rng(4)
    toks, mask = make_corpus(rng, n_docs=512, dim=64)
    qsrc = rng.integers(512, size=4)
    q = normed(toks[qsrc, :8] + 0.05 * rng.normal(size=(4, 8, 64))
               ).astype(np.float32)
    mesh = make_mesh({"index": 8})

    def build():
        idx = build_index_from_embeddings(toks, mask, pad_multiple=64,
                                          dtype=jnp.float32, mesh=mesh)
        idx.build_summaries(n_summary=2, mesh=mesh)
        idx.build_block_summaries(block_size=8, mesh=mesh)
        idx.quantize_residual(n_centroids=64, nbits=4, mesh=mesh)
        return idx

    ref = LateInteractionSearcher(build(), mesh=mesh, mode="hierarchical",
                                  use_pallas=False, n_candidates=128)
    _, want = ref.search(q, k=5)
    s = LateInteractionSearcher(build(), mesh=mesh, mode="hierarchical",
                                use_pallas=False, n_candidates=128,
                                coarse_int8=True)
    assert s._summ_i8 is not None
    _, got = s.search(q, k=5)
    assert (got[:, 0] == want[:, 0]).all()
    assert (got[:, 0] == qsrc).all()


@pytest.mark.parametrize("int8", [False, True])
def test_hierarchical_summ_rows_kernel_matches_xla(int8):
    """hierarchical_search with the fused stage-1 kernel (summ_rows,
    interpret mode) must rank like the XLA stage-1 paths — both end in
    the same exact fine stage, so rows must match exactly on a
    separated corpus."""
    from jax.experimental.pallas import tpu as pltpu
    from ravqa_tpu.ops.maxsim import stage1_rows
    from ravqa_tpu.ops.quant import quantize_index_int8
    from ravqa_tpu.retrieval.coarse import (block_summaries,
                                            hierarchical_search,
                                            summarize_docs)
    rng = np.random.default_rng(7)
    toks, mask = make_corpus(rng, n_docs=512, dim=128)
    summ = summarize_docs(jnp.asarray(toks), jnp.asarray(mask),
                          n_summary=4, iters=4)
    perm = np.asarray(cluster_order(summ, n_clusters=8, iters=4,
                                    chunk=128))
    toks, mask = toks[perm], mask[perm]
    summ = jnp.asarray(np.asarray(summ)[perm])
    bsum = block_summaries(summ, block_size=64, n_block_summary=4)
    qsrc = rng.integers(512, size=4)
    q = normed(toks[qsrc, :8] + 0.05 * rng.normal(size=(4, 8, 128))
               ).astype(np.float32)
    args = (jnp.asarray(q), jnp.asarray(toks), jnp.asarray(mask))
    kw = dict(k=5, n_blocks=4, n_candidates=64, block_size=64)
    _, want = hierarchical_search(*args, summ, bsum, **kw)
    if int8:
        si8, ssc = quantize_summaries_int8(summ)
        rows, dsc = stage1_rows(si8, 64), ssc
    else:
        rows, dsc = stage1_rows(summ.astype(jnp.bfloat16), 64), None
    with pltpu.force_tpu_interpret_mode():
        _, got = hierarchical_search(*args, None, bsum, summ_rows=rows,
                                     summ_scale=dsc, stage1_tile_b=2,
                                     **kw)
    got, want = np.asarray(got), np.asarray(want)
    assert (got[:, 0] == want[:, 0]).all()
    assert (got[:, 0] == qsrc).all()
    overlap = np.mean([len(set(a) & set(b)) / 5
                       for a, b in zip(got.tolist(), want.tolist())])
    assert overlap >= 0.8, overlap


@pytest.mark.parametrize("int8", [False, True])
def test_searcher_stage1_kernel(int8):
    """LateInteractionSearcher(stage1_kernel=True) routes stage 1
    through the fused kernel (interpret mode); top-1 must match the XLA
    searcher, with and without coarse_int8."""
    from jax.experimental.pallas import tpu as pltpu
    rng = np.random.default_rng(8)
    toks, mask = make_corpus(rng, n_docs=512, dim=128)
    qsrc = rng.integers(512, size=4)
    q = normed(toks[qsrc, :8] + 0.05 * rng.normal(size=(4, 8, 128))
               ).astype(np.float32)

    def build():
        idx = build_index_from_embeddings(toks, mask, pad_multiple=64,
                                          dtype=jnp.float32)
        idx.build_summaries(n_summary=4, iters=4)
        idx.build_block_summaries(block_size=64)
        return idx

    ref = LateInteractionSearcher(build(), mode="hierarchical",
                                  use_pallas=False, n_candidates=64,
                                  n_blocks=4)
    _, want = ref.search(q, k=5)
    with pltpu.force_tpu_interpret_mode():
        s = LateInteractionSearcher(build(), mode="hierarchical",
                                    use_pallas=False, n_candidates=64,
                                    n_blocks=4, stage1_kernel=True,
                                    coarse_int8=int8)
        assert s._summ_rows is not None
        assert (s._summ_rows.dtype == jnp.int8) == int8
        assert (s._summ_rows_scale is not None) == int8
        assert s._summ_i8 is None            # rows subsume the copy
        _, got = s.search(q, k=5)
    # contract: the kernel changes nothing vs the XLA searcher (this
    # corpus is not cluster-ordered, so absolute self-retrieval is not
    # guaranteed by either searcher)
    assert (got[:, 0] == want[:, 0]).all()


@pytest.mark.parametrize("coarse_int8", [False, True])
def test_sharded_hierarchical_stage1_kernel(coarse_int8):
    """8-device sharded hierarchical + stage1_kernel: each shard sweeps
    its own stage1_rows slice (bf16 rows, or int8 rows + per-doc dscale
    when coarse_int8); on CPU the XLA twin of the kernel runs (same
    math/layout — stage1_sweep_xla); ranking must match the sharded
    XLA-stage-1 searcher."""
    from ravqa_tpu.parallel import make_mesh
    rng = np.random.default_rng(5)
    toks, mask = make_corpus(rng, n_docs=2048, ld=8, dim=64, n_topics=32)
    summ0 = summarize_docs(jnp.asarray(toks), jnp.asarray(mask),
                           n_summary=4, iters=4)
    perm = np.asarray(cluster_order(summ0, n_clusters=16, iters=4,
                                    chunk=256))
    toks, mask = toks[perm], mask[perm]
    qsrc = rng.integers(2048, size=4)
    q = normed(toks[qsrc, :8] + 0.05 * rng.normal(size=(4, 8, 64))
               ).astype(np.float32)
    mesh = make_mesh({"index": 8})

    def build():
        idx = build_index_from_embeddings(toks, mask, pad_multiple=128,
                                          dtype=jnp.float32, mesh=mesh)
        idx.build_summaries(n_summary=4, iters=4, mesh=mesh)
        idx.build_block_summaries(block_size=16, n_block_summary=4,
                                  mesh=mesh)
        return idx

    ref = LateInteractionSearcher(build(), mesh=mesh, mode="hierarchical",
                                  n_candidates=128, n_blocks=64,
                                  use_pallas=False,
                                  coarse_int8=coarse_int8)
    _, want = ref.search(q, k=5)
    s = LateInteractionSearcher(build(), mesh=mesh, mode="hierarchical",
                                n_candidates=128, n_blocks=64,
                                use_pallas=False, coarse_int8=coarse_int8,
                                stage1_kernel=True)
    assert s._summ_rows is not None
    assert (s._summ_rows.dtype == jnp.int8) == coarse_int8
    assert (s._summ_rows_scale is not None) == coarse_int8
    _, got = s.search(q, k=5)
    assert (got[:, 0] == want[:, 0]).all()
    assert (got[:, 0] == qsrc).all()


def test_sharded_hierarchical_residual_stage1_kernel():
    """8-device sharded residual hierarchical + stage1_kernel + coarse_int8:
    the rows ride the summaries slot of the residual leg; top-1 must
    match the XLA-stage-1 sharded searcher."""
    from ravqa_tpu.parallel import make_mesh
    rng = np.random.default_rng(6)
    toks, mask = make_corpus(rng, n_docs=2048, ld=8, dim=64, n_topics=32)
    qsrc = rng.integers(2048, size=4)
    q = normed(toks[qsrc, :8] + 0.05 * rng.normal(size=(4, 8, 64))
               ).astype(np.float32)
    mesh = make_mesh({"index": 8})

    def build():
        idx = build_index_from_embeddings(toks, mask, pad_multiple=128,
                                          dtype=jnp.float32, mesh=mesh)
        idx.build_summaries(n_summary=2, mesh=mesh)
        idx.build_block_summaries(block_size=16, mesh=mesh)
        idx.quantize_residual(n_centroids=64, nbits=4, mesh=mesh)
        return idx

    ref = LateInteractionSearcher(build(), mesh=mesh, mode="hierarchical",
                                  use_pallas=False, n_candidates=128,
                                  n_blocks=64, coarse_int8=True)
    _, want = ref.search(q, k=5)
    s = LateInteractionSearcher(build(), mesh=mesh, mode="hierarchical",
                                use_pallas=False, n_candidates=128,
                                n_blocks=64, coarse_int8=True,
                                stage1_kernel=True)
    assert s._summ_rows is not None and s._summ_rows.dtype == jnp.int8
    _, got = s.search(q, k=5)
    assert (got[:, 0] == want[:, 0]).all()
    assert (got[:, 0] == qsrc).all()
