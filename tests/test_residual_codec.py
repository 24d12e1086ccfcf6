"""Residual codec (ops.residual): pack/unpack exactness, compression ratio,
reconstruction quality, search-path integration (single-device + 8-device
sharded), and save/load round-trip. Reference scheme: residual.py:169-278."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from ravqa_tpu.ops.residual import (compress, decompress, train_codec,
                                    unpack_bits)
from ravqa_tpu.retrieval import (LateInteractionSearcher,
                                 build_index_from_embeddings, load_index,
                                 save_index)

DIM = 64


@pytest.fixture(scope="module")
def clustered():
    """2048 docs in 32 clusters; queries drawn from known clusters (cluster
    ids returned so tests can check relevance success)."""
    rng = np.random.default_rng(0)
    centers = rng.normal(size=(32, DIM)).astype(np.float32)
    doc_cluster = rng.integers(0, 32, 2048)
    toks = centers[doc_cluster][:, None, :] + 0.25 * rng.normal(
        size=(2048, 12, DIM)).astype(np.float32)
    toks /= np.linalg.norm(toks, axis=-1, keepdims=True)
    mask = np.ones((2048, 12), np.int8)
    mask[:, -2:] = 0                       # some padding tokens
    q_cluster = rng.integers(0, 32, 6)
    q = centers[q_cluster][:, None, :] + 0.25 * rng.normal(
        size=(6, 8, DIM)).astype(np.float32)
    q /= np.linalg.norm(q, axis=-1, keepdims=True)
    return toks, mask, q.astype(np.float32), q_cluster, doc_cluster


@pytest.mark.parametrize("nbits", [2, 4, 8])
def test_pack_unpack_roundtrip(nbits):
    rng = np.random.default_rng(1)
    vals = rng.integers(0, 2 ** nbits, (5, 7, DIM)).astype(np.uint8)
    per_byte = 8 // nbits
    shifts = np.arange(per_byte, dtype=np.uint32) * nbits
    # planar layout: plane p of byte j holds dim p*(DIM/per_byte)+j
    packed = np.sum(
        vals.reshape(5, 7, per_byte, DIM // per_byte).astype(np.uint32)
        << shifts[:, None], axis=-2).astype(np.uint8)
    got = np.asarray(unpack_bits(jnp.asarray(packed), nbits))
    np.testing.assert_array_equal(got, vals)


@pytest.mark.parametrize("nbits,min_ratio", [(2, 6.0), (4, 3.5)])
def test_compression_ratio(clustered, nbits, min_ratio):
    toks, mask, _, _, _ = clustered
    codec = train_codec(toks, mask, n_centroids=64, nbits=nbits,
                        sample=8192, heldout=2048)
    codes, packed, scales = compress(toks, mask, codec)
    bf16_bytes = toks.size * 2
    # stored footprint: int16 code + packed residual bytes + bf16
    # reconstruction-norm scale per token (quantize_residual's layout)
    codec_bytes = codes.size * 2 + packed.size + scales.size * 2
    assert bf16_bytes / codec_bytes >= min_ratio


def test_reconstruction_and_masked_tokens(clustered):
    toks, mask, _, _, _ = clustered
    codec = train_codec(toks, mask, n_centroids=64, nbits=4,
                        sample=8192, heldout=2048)
    codes, packed, scales = compress(toks, mask, codec)
    rec = np.asarray(decompress(codes, packed, codec.centroids,
                                codec.bucket_weights, 4))
    valid = mask > 0
    err = np.linalg.norm((rec - toks)[valid], axis=-1)
    assert err.mean() < 0.35               # clustered data reconstructs well
    # masked tokens compress to code 0 / zero bits deterministically
    assert (np.asarray(codes)[~valid] == 0).all()
    assert (np.asarray(packed)[~valid] == 0).all()


@pytest.mark.parametrize("nbits,n_cent", [(2, 64), (4, 32)])
def test_fused_residual_maxsim_kernel(clustered, nbits, n_cent):
    """maxsim_residual_pallas (interpret mode) == decompress + MaxSim."""
    from ravqa_tpu.ops.residual import maxsim_residual_pallas
    toks, mask, q, _, _ = clustered
    codec = train_codec(toks, mask, n_centroids=n_cent, nbits=nbits,
                        sample=8192, heldout=2048)
    codes, packed, scales = compress(toks, mask, codec)
    rng = np.random.default_rng(7)
    cand = jnp.asarray(rng.integers(0, toks.shape[0], (6, 64)))
    cg = jnp.take(codes, cand, axis=0)
    pg = jnp.take(packed, cand, axis=0)
    mg = jnp.take(jnp.asarray(mask), cand, axis=0)
    rec = decompress(cg, pg, codec.centroids, codec.bucket_weights, nbits,
                     dtype=jnp.float32)
    s = jnp.einsum("bcld,bqd->bclq", rec, jnp.asarray(q))
    s = jnp.where(np.asarray(mg)[..., None] > 0, s, -9999.0)
    ref = np.asarray(jnp.sum(jnp.max(s, axis=2), axis=-1))
    got = np.asarray(maxsim_residual_pallas(
        jnp.asarray(q), cg, pg, mg, codec.centroids, codec.bucket_weights,
        nbits=nbits, tile_c=16, interpret=True))
    # bf16 matmuls inside the kernel vs f32 reference
    np.testing.assert_allclose(got, ref, atol=0.05, rtol=0.02)


@pytest.mark.parametrize("mode", ["two_stage", "hierarchical"])
def test_residual_index_relevance_success(clustered, mode):
    """The codec must not lose the RELEVANT docs (the reference's own gate
    is Success@5 on relevant passages, e2e_test.py:80 — depth-10 agreement
    with exact search is noise-dominated on synthetic gaussians, where the
    tail of the top-10 is near-tied)."""
    toks, mask, q, q_cluster, doc_cluster = clustered

    def success(rows):
        # fraction of queries whose top-10 contains a same-cluster doc
        hits = 0
        for i, row in enumerate(rows):
            hits += any(doc_cluster[r] == q_cluster[i]
                        for r in row.tolist() if r < len(doc_cluster))
        return hits / len(rows)

    idx_full = build_index_from_embeddings(toks, mask, pad_multiple=64,
                                           dtype=jnp.float32)
    s_exact = LateInteractionSearcher(idx_full, mode="exact",
                                      use_pallas=False)
    _, exact_rows = s_exact.search_device(jnp.asarray(q), k=10)
    base = success(np.asarray(exact_rows))
    assert base == 1.0                      # sanity: exact finds them all

    idx = build_index_from_embeddings(toks, mask, pad_multiple=64,
                                      dtype=jnp.float32)
    idx.build_summaries(n_summary=2)
    if mode == "hierarchical":
        idx.build_block_summaries(block_size=16)
    idx.quantize_residual(n_centroids=64, nbits=4)
    assert idx.tokens is None
    s = LateInteractionSearcher(idx, mode=mode, use_pallas=False,
                                n_candidates=256)
    _, rows = s.search_device(jnp.asarray(q), k=10)
    got = success(np.asarray(rows))
    assert got >= base - 0.05, f"{mode} residual success@10 = {got}"


def test_residual_sharded_search(clustered):
    from ravqa_tpu.parallel import make_mesh
    toks, mask, q, _, _ = clustered
    mesh = make_mesh({"data": 8})
    idx = build_index_from_embeddings(toks, mask, pad_multiple=64,
                                      dtype=jnp.float32, mesh=mesh,
                                      axis="data")
    idx.build_summaries(n_summary=2, mesh=mesh, axis="data")
    idx.build_block_summaries(block_size=16, mesh=mesh, axis="data")
    idx.quantize_residual(n_centroids=64, nbits=4, mesh=mesh, axis="data")
    for mode in ("two_stage", "hierarchical"):
        s = LateInteractionSearcher(idx, mesh=mesh, axis="data", mode=mode,
                                    use_pallas=False, n_candidates=256)
        scores, rows = s.search_device(jnp.asarray(q), k=5)
        assert np.asarray(rows).shape == (6, 5)
        assert np.isfinite(np.asarray(scores)).all()
        # agreement with the single-device residual searcher
        idx1 = build_index_from_embeddings(toks, mask, pad_multiple=64,
                                           dtype=jnp.float32)
        idx1.build_summaries(n_summary=2)
        idx1.build_block_summaries(block_size=16)
        idx1.quantize_residual(n_centroids=64, nbits=4)
        s1 = LateInteractionSearcher(idx1, mode=mode, use_pallas=False,
                                     n_candidates=256)
        _, rows1 = s1.search_device(jnp.asarray(q), k=5)
        overlap = np.mean([len(set(a.tolist()) & set(b.tolist())) / 5
                           for a, b in zip(np.asarray(rows),
                                           np.asarray(rows1))])
        assert overlap >= 0.8, (mode, overlap)


def test_residual_index_save_load(clustered, tmp_path):
    toks, mask, q, _, _ = clustered
    idx = build_index_from_embeddings(toks, mask, pad_multiple=64,
                                      dtype=jnp.float32)
    idx.build_summaries(n_summary=2)
    idx.quantize_residual(n_centroids=64, nbits=2)
    s = LateInteractionSearcher(idx, mode="two_stage", use_pallas=False,
                                n_candidates=128)
    _, rows0 = s.search_device(jnp.asarray(q), k=5)
    save_index(idx, str(tmp_path / "ridx"))
    idx2 = load_index(str(tmp_path / "ridx"), dtype=jnp.float32)
    assert idx2.nbits == 2 and idx2.tokens is None
    s2 = LateInteractionSearcher(idx2, mode="two_stage", use_pallas=False,
                                 n_candidates=128)
    _, rows2 = s2.search_device(jnp.asarray(q), k=5)
    np.testing.assert_array_equal(np.asarray(rows0), np.asarray(rows2))


def test_rag_executor_with_residual_index(clustered):
    """RagExecutor.retrieve gathers decompressed doc tokens."""
    from ravqa_tpu.retrieval.index import TokenIndex  # noqa: F401
    toks, mask, q, _, _ = clustered
    idx = build_index_from_embeddings(toks, mask, pad_multiple=64,
                                      dtype=jnp.float32)
    idx.build_summaries(n_summary=2)
    idx.quantize_residual(n_centroids=64, nbits=4)
    rows = jnp.asarray([0, 3, 5])
    g = np.asarray(idx.gather_tokens(rows))
    assert g.shape == (3, 12, DIM)
    # reconstruction of gathered rows matches direct decompression
    valid = mask[np.asarray(rows)] > 0
    err = np.linalg.norm((g - toks[np.asarray(rows)])[valid], axis=-1)
    assert err.mean() < 0.35


def test_nbits8_end_to_end():
    """nbits=8 is the reference's published OK-VQA FLMR index setting
    (FLMR_base_preload_vision_features.jsonnet:142) — per_byte=1 planar
    packing must round-trip through search."""
    rng = np.random.default_rng(5)
    toks = rng.standard_normal((256, 12, DIM)).astype(np.float32)
    toks /= np.linalg.norm(toks, axis=-1, keepdims=True)
    mask = np.ones((256, 12), np.int8)
    idx = build_index_from_embeddings(toks, mask, pad_multiple=64,
                                      dtype=jnp.float32)
    idx.build_summaries(n_summary=2)
    idx.quantize_residual(n_centroids=64, nbits=8)
    s = LateInteractionSearcher(idx, mode="two_stage", use_pallas=False,
                                n_candidates=128)
    q = jnp.asarray(toks[:6, :8])
    _, rows = s.search_device(q, k=5)
    assert float(np.mean(np.asarray(rows)[:, 0] == np.arange(6))) == 1.0


def test_hierarchical_stage1_grouping_is_exact(clustered):
    """The grouped stage-1 sweep (g queries per lax.map iteration) is a
    pure reshape of the per-query math — results must be bit-identical
    across group sizes, with and without the centroid-prune cut."""
    from ravqa_tpu.retrieval.coarse import (block_summaries,
                                            hierarchical_search,
                                            summarize_docs)
    toks, mask, q, _, _ = clustered
    codec_idx = build_index_from_embeddings(toks, mask, pad_multiple=64,
                                            dtype=jnp.float32)
    codec_idx.build_summaries(n_summary=2)
    codec_idx.quantize_residual(n_centroids=64, nbits=4)
    summ = codec_idx.summaries
    bsum = block_summaries(summ, block_size=16, n_block_summary=2)
    kw = dict(k=5, n_blocks=8, n_candidates=32, block_size=16,
              records=codec_idx.records, centroids=codec_idx.codec_centroids,
              bucket_weights=codec_idx.codec_weights, nbits=4)
    qj = jnp.asarray(q)
    base_s, base_r = hierarchical_search(qj, None, codec_idx.mask, summ,
                                         bsum, group_size=1, **kw)
    for gs in (2, 3, 8):
        s, r = hierarchical_search(qj, None, codec_idx.mask, summ, bsum,
                                   group_size=gs, **kw)
        np.testing.assert_array_equal(np.asarray(r), np.asarray(base_r))
        np.testing.assert_allclose(np.asarray(s), np.asarray(base_s),
                                   rtol=1e-6)
    # composes with the centroid-prune fine-stage cut
    _, r_cp = hierarchical_search(qj, None, codec_idx.mask, summ, bsum,
                                  group_size=2, centroid_prune=16, **kw)
    assert np.asarray(r_cp).shape == (q.shape[0], 5)


def test_quantize_residual_tiny_corpus():
    """train_codec must not crash when the corpus has fewer valid tokens
    than the default heldout split (2^14) — small CLI/test corpora."""
    rng = np.random.default_rng(3)
    toks = rng.standard_normal((64, 8, DIM)).astype(np.float32)
    toks /= np.linalg.norm(toks, axis=-1, keepdims=True)
    mask = np.ones((64, 8), np.int8)
    idx = build_index_from_embeddings(toks, mask, pad_multiple=64,
                                      dtype=jnp.float32)
    idx.build_summaries(n_summary=2)
    idx.quantize_residual(n_centroids=16, nbits=2)   # crashed before fix
    assert idx.tokens is None and idx.records is not None


def test_load_rejects_legacy_residual_layout(clustered, tmp_path):
    """Residual indexes saved with the pre-planar bit-pack layout (no
    residual_layout marker) must be refused, not silently mis-decoded."""
    import json
    import os
    toks, mask, _, _, _ = clustered
    idx = build_index_from_embeddings(toks, mask, pad_multiple=64,
                                      dtype=jnp.float32)
    idx.build_summaries(n_summary=2)
    idx.quantize_residual(n_centroids=64, nbits=2)
    path = str(tmp_path / "legacy")
    save_index(idx, path)
    meta_path = os.path.join(path, "metadata.json")
    with open(meta_path) as f:
        meta = json.load(f)
    assert meta["residual_layout"] == "planar"
    del meta["residual_layout"]                      # simulate an old save
    with open(meta_path, "w") as f:
        json.dump(meta, f)
    with pytest.raises(ValueError, match="bit-pack layout"):
        load_index(path, dtype=jnp.float32)


def test_load_migrates_legacy_separate_array_save(clustered, tmp_path):
    """Round-2 saves stored codes/residuals/scales as SEPARATE npz
    arrays; load_index must repack them into record rows and search
    identically."""
    import json
    import os
    toks, mask, q, _, _ = clustered
    idx = build_index_from_embeddings(toks, mask, pad_multiple=64,
                                      dtype=jnp.float32)
    idx.build_summaries(n_summary=2)
    idx.quantize_residual(n_centroids=64, nbits=2)
    s = LateInteractionSearcher(idx, mode="two_stage", use_pallas=False,
                                n_candidates=128)
    _, rows0 = s.search_device(jnp.asarray(q), k=5)

    # write the ROUND-2 on-disk layout by hand from the unpacked arrays
    codes, scales, packed = idx.unpack_residual()
    path = str(tmp_path / "legacy2")
    os.makedirs(path)
    np.savez(os.path.join(path, "index.npz"),
             mask=np.asarray(idx.mask, np.int8), pids=idx.pids,
             scales=np.asarray(scales.astype(jnp.bfloat16))
             .view(np.uint16),
             codes=np.asarray(codes, np.int16),
             residuals=np.asarray(packed, np.uint8),
             codec_centroids=np.asarray(idx.codec_centroids, np.float32),
             codec_weights=np.asarray(idx.codec_weights, np.float32),
             summaries=np.asarray(idx.summaries, np.float32))
    with open(os.path.join(path, "metadata.json"), "w") as f:
        json.dump({"num_docs": idx.num_docs, "quantized": True,
                   "scales_dtype": "bfloat16", "nbits": 2,
                   "residual_layout": "planar", "dim": idx.dim}, f)

    idx2 = load_index(path, dtype=jnp.float32)
    assert idx2.records is not None
    np.testing.assert_array_equal(np.asarray(idx2.records),
                                  np.asarray(idx.records))
    s2 = LateInteractionSearcher(idx2, mode="two_stage", use_pallas=False,
                                 n_candidates=128)
    _, rows2 = s2.search_device(jnp.asarray(q), k=5)
    np.testing.assert_array_equal(np.asarray(rows0), np.asarray(rows2))
