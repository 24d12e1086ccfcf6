"""Cross-ENGINE ranking parity: the reference's fully assembled 4-stage
searcher vs ravqa_tpu's LateInteractionSearcher on the same corpus with
IDENTICAL codec data.

The component golden-parity gates (tests/test_reference_parity.py) pin the
pieces — scoring, reduce, tokenizers, the ResidualCodec math. This file
pins the ASSEMBLED pipelines: we build a small index in the reference's
own on-disk format (centroids.pt / buckets.pt / chunk codes+residuals /
doclens / token-level ivf.pt, index_saver.py:80-90 layout — faiss k-means
is bypassed by training centroids with ravqa_tpu's train_codec and
compressing through the reference's OWN ResidualCodec.compress), then
drive the reference's `Searcher.dense_search` -> `IndexScorer.rank`
(searcher.py:91-132, index_storage.py:86-182: IVF candidate generation ->
centroid-score pruning via the compiled filter_pids.cpp -> cpp residual
decompression -> segmented_maxsim scoring) against our searcher built
from the SAME embeddings and the SAME codec. Drift in candidate
generation, threshold/preset rules, or fine-stage scoring shows up as a
recall/top-k mismatch here that no component gate can catch.

The reference CPU pipeline runs its two compiled C++ kernels for real
(filter_pids.cpp, decompress_residuals.cpp — built on first use by
torch.utils.cpp_extension, like the segmented_maxsim gate)."""

import json
import os

import numpy as np
import jax.numpy as jnp
import pytest

torch = pytest.importorskip("torch")

from _reference_loader import load_reference_colbert  # noqa: E402

from ravqa_tpu.ops.residual import train_codec  # noqa: E402
from ravqa_tpu.retrieval import (LateInteractionSearcher,  # noqa: E402
                                 build_index_from_embeddings)

DIM = 64          # dim * nbits must be byte-divisible (residual.py:194-195)
NBITS = 2
N_DOCS = 1024
N_CENTROIDS = 64
LQ = 8
N_QUERIES = 64


@pytest.fixture(scope="module")
def world():
    """Clustered unit-vector corpus with known self-retrieval structure:
    each doc's tokens orbit one of 64 planted directions; query i's tokens
    are noisy copies of doc i's tokens."""
    rng = np.random.default_rng(11)
    planted = rng.normal(size=(N_CENTROIDS, DIM)).astype(np.float32)
    planted /= np.linalg.norm(planted, axis=-1, keepdims=True)
    doclens = rng.integers(4, 13, size=N_DOCS)
    ld = int(doclens.max())
    toks = np.zeros((N_DOCS, ld, DIM), np.float32)
    mask = np.zeros((N_DOCS, ld), np.int8)
    for i in range(N_DOCS):
        c = planted[rng.integers(N_CENTROIDS, size=doclens[i])]
        t = c + 0.22 * rng.normal(size=c.shape).astype(np.float32)
        toks[i, :doclens[i]] = t / np.linalg.norm(t, axis=-1, keepdims=True)
        mask[i, :doclens[i]] = 1
    q = np.zeros((N_QUERIES, LQ, DIM), np.float32)
    for i in range(N_QUERIES):
        src = toks[i, rng.integers(doclens[i], size=LQ)]
        src = src + 0.12 * rng.normal(size=src.shape).astype(np.float32)
        q[i] = src / np.linalg.norm(src, axis=-1, keepdims=True)
    # ONE codec for both engines: our k-means/quantile training, the
    # reference's own compression below
    codec = train_codec(toks, mask, n_centroids=N_CENTROIDS, nbits=NBITS,
                        seed=0)
    # exact ground truth: f64 MaxSim on the uncompressed embeddings
    flatmask = mask[:, :, None].astype(np.float64)
    sim = np.einsum("qld,ntd->qnlt", q.astype(np.float64),
                    toks.astype(np.float64) * flatmask)
    sim = np.where(mask[None, :, None, :] > 0, sim, -np.inf)
    exact = sim.max(-1).sum(-1)                       # (Q, N)
    exact_rank = np.argsort(-exact, axis=-1)
    return dict(toks=toks, mask=mask, doclens=doclens, q=q, codec=codec,
                exact_rank=exact_rank)


@pytest.fixture(scope="module")
def ref_index(world, tmp_path_factory):
    """Reference-format index dir + IndexScorer (CPU: compiles
    filter_pids.cpp + decompress_residuals.cpp)."""
    colbert = load_reference_colbert()  # noqa: F841
    from colbert.indexing.codecs.residual import ResidualCodec as RefCodec
    from colbert.infra.config.config import ColBERTConfig

    d = tmp_path_factory.mktemp("ref_index")
    codec, toks, mask = world["codec"], world["toks"], world["mask"]
    centroids = torch.from_numpy(np.asarray(codec.centroids, np.float32))
    cutoffs = torch.from_numpy(np.asarray(codec.bucket_cutoffs, np.float32))
    weights = torch.from_numpy(np.asarray(codec.bucket_weights, np.float32))
    torch.save(centroids, os.path.join(d, "centroids.pt"))
    torch.save((cutoffs, weights), os.path.join(d, "buckets.pt"))
    torch.save(torch.tensor(0.05), os.path.join(d, "avg_residual.pt"))

    doclens = world["doclens"]
    flat = np.concatenate([toks[i, :doclens[i]] for i in range(N_DOCS)])
    n_emb = len(flat)
    with open(os.path.join(d, "metadata.json"), "w") as f:
        json.dump({"config": {"dim": DIM, "nbits": NBITS,
                              "query_maxlen": LQ},
                   "num_chunks": 2, "num_embeddings": n_emb}, f)

    cfg = ColBERTConfig(dim=DIM, nbits=NBITS, query_maxlen=LQ)
    cfg.configure(total_visible_gpus=0)
    ref_codec = RefCodec(config=cfg, centroids=centroids,
                         avg_residual=0.05, bucket_cutoffs=cutoffs,
                         bucket_weights=weights)
    comp = ref_codec.compress(torch.from_numpy(flat))

    # two chunks split at a doc boundary (multi-chunk load path)
    half_docs = N_DOCS // 2
    half_emb = int(doclens[:half_docs].sum())
    spans = [(0, half_emb, 0, half_docs),
             (half_emb, n_emb, half_docs, N_DOCS)]
    for ci, (e0, e1, d0, d1) in enumerate(spans):
        torch.save(comp.codes[e0:e1], os.path.join(d, f"{ci}.codes.pt"))
        torch.save(comp.residuals[e0:e1],
                   os.path.join(d, f"{ci}.residuals.pt"))
        with open(os.path.join(d, f"doclens.{ci}.json"), "w") as f:
            json.dump([int(x) for x in doclens[d0:d1]], f)

    # token-level ivf.pt (embedding ids grouped by centroid code);
    # IndexLoader._load_ivf runs the reference's own optimize_ivf to
    # produce the pid-level ivf.pid.pt from it
    codes_np = comp.codes.numpy()
    order = np.argsort(codes_np, kind="stable")
    lengths = np.bincount(codes_np, minlength=N_CENTROIDS)
    torch.save((torch.from_numpy(order.astype(np.int64)),
                torch.from_numpy(lengths.astype(np.int64))),
               os.path.join(d, "ivf.pt"))

    # the CPU scoring path calls ColBERT.segmented_maxsim, whose extension
    # normally compiles when a ColBERT model is constructed — load it the
    # way the reference itself does (colbert.py:44-60)
    from colbert.modeling.colbert import ColBERT
    ColBERT.try_load_torch_extensions(use_gpu=False)

    from colbert.search.index_storage import IndexScorer
    scorer = IndexScorer(str(d), use_gpu=False)
    return scorer


def ref_dense_search(scorer, q_np, k):
    """Drive the reference's own Searcher.dense_search (its k-dependent
    ncells/threshold/ndocs preset rule, searcher.py:91-118) over a fresh
    config per call — Searcher.encode is bypassed (Q is supplied
    directly), everything downstream is the reference's code."""
    from colbert.infra.config.config import ColBERTConfig
    from colbert.searcher import Searcher

    s = Searcher.__new__(Searcher)
    s.config = ColBERTConfig(dim=DIM, nbits=NBITS, query_maxlen=LQ)
    s.config.configure(total_visible_gpus=0)
    s.ranker = scorer
    pids, _, scores = s.dense_search(
        torch.from_numpy(q_np[None].astype(np.float32)), k)
    return np.array(pids), np.array(scores)


@pytest.fixture(scope="module")
def our_searchers(world):
    codec, toks, mask = world["codec"], world["toks"], world["mask"]
    idx = build_index_from_embeddings(toks, mask,
                                      pids=list(range(N_DOCS)))
    idx.build_summaries(4)
    idx.build_block_summaries()
    idx.quantize_residual(codec=codec)
    return {
        "two_stage": LateInteractionSearcher(idx, use_pallas=False,
                                             mode="two_stage"),
        "hierarchical": LateInteractionSearcher(idx, use_pallas=False,
                                                mode="hierarchical"),
    }


def _recall_vs_exact(topk, exact_rank, k):
    """Mean overlap between engine top-k and the exact top-k."""
    hits = [len(set(topk[i][:k]) & set(exact_rank[i][:k].tolist())) / k
            for i in range(len(topk))]
    return float(np.mean(hits))


@pytest.mark.parametrize("k,ov_floor", [(10, 0.80), (100, 0.60)])
def test_cross_engine_ranking_parity(world, ref_index, our_searchers, k,
                                     ov_floor):
    """Both assembled engines, fed identical embeddings + codec, across
    the reference's k-preset tiers. Measured baselines (pinned -2pts):

      k=10 : ref recall@10 vs exact 0.484, ours 0.525, top-1 agree 1.000,
             top-k overlap 0.844
      k=100: ref 0.519, ours 0.659, top-1 agree 1.000, overlap 0.658

    Absolute recall-vs-exact is LOW BY REGIME here — nbits=2 codec error
    shuffles quantization near-ties (see test_recall_gate's residual
    gate) — and the tail overlap reflects the engines' different
    candidate machinery: the reference exact-scores only its IVF
    candidates pruned to ndocs//4 = 256 docs (index_storage.py:148),
    ours exact-scores the full n_candidates = 1024, so ours strictly
    dominates on recall. The parity claims that hold and that this gate
    pins: identical top-1 on every query, our recall NEVER below the
    reference's, and tail overlap at its measured level — drift in our
    candidate generation, presets, or scoring semantics breaks one of
    these."""
    q, exact_rank = world["q"], world["exact_rank"]

    ref_top = [ref_dense_search(ref_index, q[i], k)[0].tolist()
               for i in range(N_QUERIES)]
    ours = {}
    for name, searcher in our_searchers.items():
        _, rows = searcher.search(q, k=k)
        ours[name] = np.asarray(rows).tolist()

    ref_recall = _recall_vs_exact(ref_top, exact_rank, k)
    assert ref_recall > 0.4, f"reference engine sanity: {ref_recall}"
    for name, top in ours.items():
        r = _recall_vs_exact(top, exact_rank, k)
        assert r >= ref_recall - 0.02, \
            f"{name}@{k}: ours {r:.4f} vs reference {ref_recall:.4f}"
        # top-1 must agree with the reference engine itself on nearly
        # every query (both engines see identical codec reconstructions)
        agree = np.mean([top[i][0] == ref_top[i][0]
                         for i in range(N_QUERIES)])
        assert agree >= 0.95, f"{name}@{k} top-1 agreement {agree}"
        # engine-vs-engine top-k overlap: candidate-generation or preset
        # drift (thresholds, ndocs rules) collapses this
        overlap = np.mean([
            len(set(top[i][:k]) & set(ref_top[i][:k])) / min(k, N_DOCS)
            for i in range(N_QUERIES)])
        assert overlap >= ov_floor, f"{name}@{k} overlap {overlap}"


def test_cross_engine_scores_match(world, ref_index, our_searchers):
    """The top-1 MaxSim SCORES agree numerically: the reference
    L2-normalizes decompressed embeddings (index_storage.py:173), ours
    folds the same normalization in via reconstruction-norm scales —
    same math, different factorization."""
    q = world["q"]
    for i in range(8):
        ref_pids, ref_scores = ref_dense_search(ref_index, q[i], 5)
        sc, rows = our_searchers["two_stage"].search(q[i:i + 1], k=5)
        assert int(np.asarray(rows)[0, 0]) == int(ref_pids[0])
        np.testing.assert_allclose(float(np.asarray(sc)[0, 0]),
                                   float(ref_scores[0]), rtol=2e-2)
