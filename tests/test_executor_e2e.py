"""End-to-end slice: config -> tokenize -> train tiny FLMR -> index ->
search -> Recall@K. Mirrors the reference's sanity-check path
(FLMR_executor num_sanity_val_steps over a truncated corpus)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
from jax.sharding import Mesh

from ravqa_tpu.config import Config, apply_overrides, merge_patch
from ravqa_tpu.executors import FLMRExecutor, TrainConfig
from ravqa_tpu.models import FLMRModelConfig, FLMRRetriever
from ravqa_tpu.tokenization import (DocTokenizer, QueryTokenizer,
                                    WordPieceTokenizer, make_tiny_vocab)

WORDS = ["cat", "dog", "sky", "sun", "tree", "fish", "bird", "car", "red",
         "blue", "big", "old", "hot", "wet", "sad", "fast", "tall", "round"]


@pytest.fixture(scope="module")
def world():
    """Synthetic retrieval world: each passage is a bag of words; the query
    repeats words of its positive passage."""
    rng = np.random.default_rng(0)
    vocab = make_tiny_vocab(WORDS)
    tok = WordPieceTokenizer(vocab)
    qt = QueryTokenizer(tok, query_maxlen=12)
    dt = DocTokenizer(tok, doc_maxlen=12)
    n_docs = 32
    passages = [" ".join(rng.choice(WORDS, size=4, replace=False))
                for _ in range(n_docs)]
    queries = [" ".join(p.split()[:3]) for p in passages]  # positive = same i
    vision_dim = 8
    image_feats = rng.normal(size=(n_docs, vision_dim)).astype(np.float32)
    return Config(dict(tok=tok, qt=qt, dt=dt, passages=passages,
                       queries=queries, image_feats=image_feats,
                       vision_dim=vision_dim, n_docs=n_docs, rng=rng))


def make_model(world, seed=0):
    cfg = FLMRModelConfig.tiny(
        bert=__import__("ravqa_tpu.models", fromlist=["BertConfig"])
        .BertConfig.tiny(vocab_size=world.tok.vocab_size + 10),
        vision_dim=world.vision_dim, prefix_len=2, dim=16, nway=2)
    model = FLMRRetriever(cfg)
    qi, qm = world.qt.tensorize(world.queries[:2])
    di, dm = world.dt.tensorize(world.passages[:4])
    params = model.init(
        jax.random.PRNGKey(seed),
        query_input_ids=jnp.array(qi), query_attention_mask=jnp.array(qm),
        image_features=jnp.array(world.image_feats[:2]),
        doc_input_ids=jnp.array(di),
        doc_attention_mask=jnp.array(dm))["params"]
    return cfg, model, params


def train_batches(world, n_steps, bsize=8, nway=2):
    rng = np.random.default_rng(7)
    for _ in range(n_steps):
        qidx = rng.choice(world.n_docs, size=bsize, replace=False)
        qi, qm = world.qt.tensorize([world.queries[i] for i in qidx])
        docs = []
        for i in qidx:
            docs.append(world.passages[i])  # positive first
            neg = rng.integers(world.n_docs)
            while neg == i:
                neg = rng.integers(world.n_docs)
            docs.append(world.passages[neg])
        di, dm = world.dt.tensorize(docs)
        yield dict(query_input_ids=jnp.array(qi),
                   query_attention_mask=jnp.array(qm),
                   image_features=jnp.array(world.image_feats[qidx]),
                   doc_input_ids=jnp.array(di),
                   doc_attention_mask=jnp.array(dm))


def eval_recall(ex, world, ks=(1, 5)):
    qi, qm = world.qt.tensorize(world.queries)
    di, dm = world.dt.tensorize(world.passages)
    qb = [dict(query_input_ids=jnp.array(qi),
               query_attention_mask=jnp.array(qm),
               image_features=jnp.array(world.image_feats))]
    db = [dict(doc_input_ids=jnp.array(di), doc_attention_mask=jnp.array(dm))]
    m = ex.evaluate_retrieval(
        qb, db, passage_ids=[f"GS_{i}" for i in range(world.n_docs)],
        passage_contents=world.passages,
        answers=[[p.split()[0]] for p in world.passages],
        pos_item_ids=[[f"GS_{i}"] for i in range(world.n_docs)], ks=ks)
    return m


def test_config_system():
    base = {"model": {"dim": 16, "nway": 2}, "train": {"lr": 1e-4}}
    patch = {"model": {"nway": 4}, "train": {"schedule": "cosine"}}
    merged = merge_patch(base, patch)
    assert merged["model"] == {"dim": 16, "nway": 4}
    cfg = apply_overrides(Config(merged), ["train.lr=0.01", "model.name=x"])
    assert cfg.train.lr == 0.01 and cfg.model.name == "x"
    assert cfg.train.schedule == "cosine"


def test_train_loop_learns(world):
    cfg, model, params = make_model(world)
    ex = FLMRExecutor(model, params,
                      TrainConfig(lr=3e-3, total_steps=60), quiet=True)
    before = eval_recall(ex, world)
    first = ex.train_step(next(iter(train_batches(world, 1))))
    losses = [float(first["loss"])]
    for batch in train_batches(world, 59):
        losses.append(float(ex.train_step(batch)["loss"]))
    assert losses[-1] < losses[0] * 0.7, (losses[0], losses[-1])
    after = eval_recall(ex, world)
    assert after["pos_item_ids_recall_at_5"] >= \
        before["pos_item_ids_recall_at_5"]
    assert after["pos_item_ids_recall_at_5"] > 5 / world.n_docs  # > chance
    assert 0 <= after["recall_at_5"] <= 1


def test_freeze_flags_keep_params_fixed(world):
    cfg, model, params = make_model(world)
    tc = TrainConfig(lr=1e-2, modules=("freeze_mapping_network",))
    ex = FLMRExecutor(model, params, tc, quiet=True)
    before = jax.device_get(ex.state.params["vision_projection"])
    for batch in train_batches(world, 3):
        ex.train_step(batch)
    after = jax.device_get(ex.state.params["vision_projection"])
    for a, b in zip(jax.tree.leaves(before), jax.tree.leaves(after)):
        np.testing.assert_array_equal(a, b)
    # non-frozen params did move
    d0 = jax.tree.leaves(params["linear"])[0]
    d1 = jax.tree.leaves(jax.device_get(ex.state.params["linear"]))[0]
    assert np.abs(d0 - d1).max() > 0


def test_sharded_training_on_mesh(world):
    from ravqa_tpu.parallel import make_mesh
    mesh = make_mesh({"data": 8})
    cfg, model, params = make_model(world)
    ex = FLMRExecutor(model, params, TrainConfig(lr=1e-3), mesh=mesh,
                      quiet=True)
    losses = [float(ex.train_step(b)["loss"])
              for b in train_batches(world, 6, bsize=8)]
    assert all(np.isfinite(losses))
    m = eval_recall(ex, world)
    assert "pos_item_ids_recall_at_5" in m


def test_checkpoint_roundtrip(tmp_path, world):
    cfg, model, params = make_model(world)
    ex = FLMRExecutor(model, params, TrainConfig(lr=1e-3), quiet=True)
    for batch in train_batches(world, 2):
        ex.train_step(batch)
    ex.save_checkpoint(str(tmp_path / "ckpt"))
    ex2 = FLMRExecutor(model, params, TrainConfig(lr=1e-3), quiet=True)
    ex2.load_checkpoint(str(tmp_path / "ckpt"))
    l1 = jax.tree.leaves(jax.device_get(ex.state.params))
    l2 = jax.tree.leaves(jax.device_get(ex2.state.params))
    for a, b in zip(l1, l2):
        np.testing.assert_array_equal(a, b)
    assert int(ex2.state.step) == 2


def test_orbax_checkpoint_roundtrip(tmp_path, world):
    cfg, model, params = make_model(world)
    ex = FLMRExecutor(model, params, TrainConfig(lr=1e-3), quiet=True)
    for batch in train_batches(world, 2):
        ex.train_step(batch)
    ex.save_checkpoint(str(tmp_path / "ock"), backend="orbax")
    ex2 = FLMRExecutor(model, params, TrainConfig(lr=1e-3), quiet=True)
    ex2.load_checkpoint_orbax(str(tmp_path / "ock"))
    for a, b in zip(jax.tree.leaves(jax.device_get(ex.state.params)),
                    jax.tree.leaves(jax.device_get(ex2.state.params))):
        np.testing.assert_array_equal(a, b)
    assert int(ex2.state.step) == 2


def test_evaluate_retrieval_two_stage(world):
    cfg, model, params = make_model(world)
    ex = FLMRExecutor(model, params, TrainConfig(lr=1e-3), quiet=True)
    qi, qm = world.qt.tensorize(world.queries)
    di, dm = world.dt.tensorize(world.passages)
    m = ex.evaluate_retrieval(
        [dict(query_input_ids=jnp.array(qi),
              query_attention_mask=jnp.array(qm),
              image_features=jnp.array(world.image_feats))],
        [dict(doc_input_ids=jnp.array(di), doc_attention_mask=jnp.array(dm))],
        passage_ids=[f"GS_{i}" for i in range(world.n_docs)],
        pos_item_ids=[[f"GS_{i}"] for i in range(world.n_docs)],
        ks=[1, 5], search_mode="two_stage", n_candidates=16)
    assert "pos_item_ids_recall_at_5" in m


def test_evaluate_retrieval_two_stage_coarse_int8_flag(world):
    """coarse_int8 plumbs through evaluate_retrieval. On the CPU backend
    use_pallas is off, so the flag cannot take effect — the searcher
    must WARN instead of silently swallowing it (the int8 kernel path
    itself is interpret-tested at the searcher level)."""
    import warnings
    cfg, model, params = make_model(world)
    ex = FLMRExecutor(model, params, TrainConfig(lr=1e-3), quiet=True)
    qi, qm = world.qt.tensorize(world.queries)
    di, dm = world.dt.tensorize(world.passages)
    with warnings.catch_warnings(record=True) as rec:
        warnings.simplefilter("always")
        m = ex.evaluate_retrieval(
            [dict(query_input_ids=jnp.array(qi),
                  query_attention_mask=jnp.array(qm),
                  image_features=jnp.array(world.image_feats))],
            [dict(doc_input_ids=jnp.array(di),
                  doc_attention_mask=jnp.array(dm))],
            passage_ids=[f"GS_{i}" for i in range(world.n_docs)],
            pos_item_ids=[[f"GS_{i}"] for i in range(world.n_docs)],
            ks=[1, 5], search_mode="two_stage", n_candidates=16,
            coarse_int8=True)
    assert "pos_item_ids_recall_at_5" in m
    assert any("coarse_int8" in str(w.message) for w in rec)


def test_evaluate_retrieval_hierarchical(world):
    """search_mode='hierarchical' auto-builds summaries + block summaries
    (block size adapted to the padded index)."""
    cfg, model, params = make_model(world)
    ex = FLMRExecutor(model, params, TrainConfig(lr=1e-3), quiet=True)
    qi, qm = world.qt.tensorize(world.queries)
    di, dm = world.dt.tensorize(world.passages)
    m = ex.evaluate_retrieval(
        [dict(query_input_ids=jnp.array(qi),
              query_attention_mask=jnp.array(qm),
              image_features=jnp.array(world.image_feats))],
        [dict(doc_input_ids=jnp.array(di), doc_attention_mask=jnp.array(dm))],
        passage_ids=[f"GS_{i}" for i in range(world.n_docs)],
        pos_item_ids=[[f"GS_{i}"] for i in range(world.n_docs)],
        ks=[1, 5], search_mode="hierarchical", n_candidates=16)
    assert "pos_item_ids_recall_at_5" in m
    assert m["_index"].block_summaries is not None
