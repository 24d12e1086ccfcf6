"""Factored additive residual codec (ops.residual.train_codec_factored):
centroid[h*k_fine+l] = coarse[h] + fine[l]. Same index format as the flat
codec; the fused decompress+MaxSim kernel's in-VMEM centroid term becomes
a (k1+k2)-column "two-hot" matmul, un-gating it at the large codebooks
(K=8192) the 1M-doc indexes use (the flat one-hot is gated to K <= 1024).
Reference analogue: the ResidualCodec's flat centroid table
(third_party/ColBERT/colbert/indexing/codecs/residual.py:169-278) —
factoring is the TPU-native redesign that maps its decompress gather
(decompress_residuals.cpp/.cu) onto the MXU."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from ravqa_tpu.ops.residual import (compress, decompress,
                                    maxsim_residual_pallas,
                                    train_codec, train_codec_factored)
from ravqa_tpu.retrieval import (LateInteractionSearcher,
                                 build_index_from_embeddings, load_index,
                                 save_index)

DIM = 64


@pytest.fixture(scope="module")
def clustered():
    rng = np.random.default_rng(11)
    centers = rng.normal(size=(32, DIM)).astype(np.float32)
    doc_cluster = rng.integers(0, 32, 2048)
    toks = centers[doc_cluster][:, None, :] + 0.25 * rng.normal(
        size=(2048, 12, DIM)).astype(np.float32)
    toks /= np.linalg.norm(toks, axis=-1, keepdims=True)
    mask = np.ones((2048, 12), np.int8)
    mask[:, -2:] = 0
    q_cluster = rng.integers(0, 32, 6)
    q = centers[q_cluster][:, None, :] + 0.25 * rng.normal(
        size=(6, 8, DIM)).astype(np.float32)
    q /= np.linalg.norm(q, axis=-1, keepdims=True)
    return toks, mask, q.astype(np.float32), q_cluster, doc_cluster


def test_factored_table_is_additive(clustered):
    toks, mask, _, _, _ = clustered
    codec = train_codec_factored(toks, mask, k_coarse=8, k_fine=16,
                                 nbits=2, sample=8192, heldout=2048)
    assert codec.factored
    k1, k2 = codec.coarse.shape[0], codec.fine.shape[0]
    table = np.asarray(codec.coarse)[:, None, :] \
        + np.asarray(codec.fine)[None, :, :]
    np.testing.assert_allclose(np.asarray(codec.centroids),
                               table.reshape(k1 * k2, DIM), rtol=1e-6)


def test_factored_reconstruction_competitive(clustered):
    """At a representative sizing (coarse >= the data's cluster count, as
    1M-doc deployments use), the factored codebook must reconstruct no
    worse than a flat codebook of k1+k2 centroids and stay within 1.5x of
    an UNCONSTRAINED flat k-means of the same effective size — the
    fixture's 32 true clusters with shared isotropic noise is exactly the
    structure residual-VQ factorization models."""
    toks, mask, _, _, _ = clustered

    def recon_err(codec):
        codes, packed, _ = compress(toks, mask, codec)
        rec = np.asarray(decompress(codes, packed, codec.centroids,
                                    codec.bucket_weights, codec.nbits,
                                    dtype=jnp.float32))
        valid = mask > 0
        return np.linalg.norm((rec - toks)[valid], axis=-1).mean()

    fact = recon_err(train_codec_factored(toks, mask, k_coarse=64,
                                          k_fine=16, nbits=4,
                                          sample=8192, heldout=2048))
    flat_small = recon_err(train_codec(toks, mask, n_centroids=80,
                                       nbits=4, sample=8192,
                                       heldout=2048))
    flat_big = recon_err(train_codec(toks, mask, n_centroids=1024,
                                     nbits=4, sample=8192, heldout=2048))
    assert fact <= flat_small + 1e-3, (fact, flat_small)
    assert fact <= 1.5 * flat_big, (fact, flat_big)


@pytest.mark.parametrize("nbits", [2, 4])
def test_factored_fused_kernel_parity(clustered, nbits):
    """maxsim_residual_pallas with factored tables (interpret mode) ==
    decompress + MaxSim on the flat table — the two-hot centroid term is
    mathematically identical to the one-hot/gather."""
    toks, mask, q, _, _ = clustered
    codec = train_codec_factored(toks, mask, k_coarse=8, k_fine=16,
                                 nbits=nbits, sample=8192, heldout=2048)
    codes, packed, scales = compress(toks, mask, codec)
    rng = np.random.default_rng(3)
    cand = jnp.asarray(rng.integers(0, toks.shape[0], (6, 64)))
    cg = jnp.take(codes, cand, axis=0)
    pg = jnp.take(packed, cand, axis=0)
    sg = jnp.take(scales, cand, axis=0)
    mg = jnp.take(jnp.asarray(mask), cand, axis=0)
    rec = decompress(cg, pg, codec.centroids, codec.bucket_weights, nbits,
                     dtype=jnp.float32)
    s = jnp.einsum("bcld,bqd->bclq", rec, jnp.asarray(q))
    s = s * sg[..., None]
    s = jnp.where(np.asarray(mg)[..., None] > 0, s, -9999.0)
    ref = np.asarray(jnp.sum(jnp.max(s, axis=2), axis=-1))
    got = np.asarray(maxsim_residual_pallas(
        jnp.asarray(q), cg, pg, mg, codec.centroids, codec.bucket_weights,
        sg, codec.coarse, codec.fine, nbits=nbits, tile_c=16,
        interpret=True))
    np.testing.assert_allclose(got, ref, atol=0.05, rtol=0.02)


def test_factored_large_codebook_not_gated():
    """A factored codec with K = k1*k2 > 1024 effective centroids must run
    through the fused kernel (the flat kernel asserts at K > 1024)."""
    rng = np.random.default_rng(4)
    toks = rng.standard_normal((512, 8, DIM)).astype(np.float32)
    toks /= np.linalg.norm(toks, axis=-1, keepdims=True)
    mask = np.ones((512, 8), np.int8)
    codec = train_codec_factored(toks, mask, k_coarse=33, k_fine=64,
                                 nbits=2, sample=4096, heldout=1024)
    assert codec.centroids.shape[0] == 33 * 64 > 1024
    codes, packed, scales = compress(toks, mask, codec)
    cand = jnp.asarray(rng.integers(0, 512, (2, 32)))
    got = maxsim_residual_pallas(
        jnp.asarray(toks[:2, :4]), jnp.take(codes, cand, axis=0),
        jnp.take(packed, cand, axis=0),
        jnp.take(jnp.asarray(mask), cand, axis=0),
        codec.centroids, codec.bucket_weights,
        jnp.take(scales, cand, axis=0), codec.coarse, codec.fine,
        nbits=2, tile_c=16, interpret=True)
    assert np.isfinite(np.asarray(got)).all()
    # the flat path stays gated
    with pytest.raises(AssertionError, match="FACTORED"):
        maxsim_residual_pallas(
            jnp.asarray(toks[:2, :4]), jnp.take(codes, cand, axis=0),
            jnp.take(packed, cand, axis=0),
            jnp.take(jnp.asarray(mask), cand, axis=0),
            codec.centroids, codec.bucket_weights,
            nbits=2, tile_c=16, interpret=True)


@pytest.mark.parametrize("mode", ["two_stage", "hierarchical"])
def test_factored_index_search(clustered, mode):
    """quantize_residual(n_centroids=(k1, k2)) end-to-end: relevance
    success matches exact search; searcher rankings agree between the XLA
    fine stage and the path that would use the fused kernel on TPU."""
    toks, mask, q, q_cluster, doc_cluster = clustered
    idx = build_index_from_embeddings(toks, mask, pad_multiple=64,
                                      dtype=jnp.float32)
    idx.build_summaries(n_summary=2)
    if mode == "hierarchical":
        idx.build_block_summaries(block_size=16)
    idx.quantize_residual(n_centroids=(8, 16), nbits=4)
    assert idx.codec_coarse is not None and idx.codec_fine is not None
    s = LateInteractionSearcher(idx, mode=mode, use_pallas=False,
                                n_candidates=256)
    _, rows = s.search_device(jnp.asarray(q), k=10)
    hits = sum(any(doc_cluster[r] == q_cluster[i]
                   for r in row.tolist() if r < len(doc_cluster))
               for i, row in enumerate(np.asarray(rows)))
    assert hits == len(q)


def test_factored_sharded_search(clustered):
    """8-device sharded residual legs carry the replicated codec factors."""
    from ravqa_tpu.parallel import make_mesh
    toks, mask, q, _, _ = clustered
    mesh = make_mesh({"data": 8})
    idx = build_index_from_embeddings(toks, mask, pad_multiple=64,
                                      dtype=jnp.float32, mesh=mesh,
                                      axis="data")
    idx.build_summaries(n_summary=2, mesh=mesh, axis="data")
    idx.build_block_summaries(block_size=16, mesh=mesh, axis="data")
    idx.quantize_residual(n_centroids=(8, 16), nbits=4, mesh=mesh,
                          axis="data")
    idx1 = build_index_from_embeddings(toks, mask, pad_multiple=64,
                                       dtype=jnp.float32)
    idx1.build_summaries(n_summary=2)
    idx1.build_block_summaries(block_size=16)
    idx1.quantize_residual(n_centroids=(8, 16), nbits=4)
    for mode in ("two_stage", "hierarchical"):
        s = LateInteractionSearcher(idx, mesh=mesh, axis="data", mode=mode,
                                    use_pallas=False, n_candidates=256)
        _, rows = s.search_device(jnp.asarray(q), k=5)
        s1 = LateInteractionSearcher(idx1, mode=mode, use_pallas=False,
                                     n_candidates=256)
        _, rows1 = s1.search_device(jnp.asarray(q), k=5)
        overlap = np.mean([len(set(a.tolist()) & set(b.tolist())) / 5
                           for a, b in zip(np.asarray(rows),
                                           np.asarray(rows1))])
        assert overlap >= 0.8, (mode, overlap)


def test_factored_index_save_load(clustered, tmp_path):
    toks, mask, q, _, _ = clustered
    idx = build_index_from_embeddings(toks, mask, pad_multiple=64,
                                      dtype=jnp.float32)
    idx.build_summaries(n_summary=2)
    idx.quantize_residual(n_centroids=(8, 16), nbits=2)
    s = LateInteractionSearcher(idx, mode="two_stage", use_pallas=False,
                                n_candidates=128)
    _, rows0 = s.search_device(jnp.asarray(q), k=5)
    save_index(idx, str(tmp_path / "fidx"))
    idx2 = load_index(str(tmp_path / "fidx"), dtype=jnp.float32)
    assert idx2.codec_coarse is not None
    np.testing.assert_allclose(np.asarray(idx2.codec_coarse),
                               np.asarray(idx.codec_coarse))
    s2 = LateInteractionSearcher(idx2, mode="two_stage", use_pallas=False,
                                 n_candidates=128)
    _, rows2 = s2.search_device(jnp.asarray(q), k=5)
    np.testing.assert_array_equal(np.asarray(rows0), np.asarray(rows2))
