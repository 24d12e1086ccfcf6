"""RAG published-config behaviors (reference rag_model_blip.py):
num_knowledge_passages_in_training subsampling (:552-557),
use_gt_docs_for_training (:559-573), missing-qid dummy passages (:541-548),
ignore_knowledge_passages (:617), force_existence (:678-690), marker
replacement table (:607-614), add_null_document (metrics_processors.py:225).
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from ravqa_tpu.data import DataPipeline
from ravqa_tpu.data.datasets import corpus_doc_batches
from ravqa_tpu.executors import (FLMRExecutor, RagConfig, RagExecutor,
                                 TrainConfig)
from ravqa_tpu.models import (BertConfig, FLMRModelConfig, FLMRRetriever,
                              T5Config, T5Model)
from ravqa_tpu.models.rag import GeneratorInputBuilder


@pytest.fixture(scope="module")
def rag_setup():
    dp = DataPipeline({
        "raw": {"transform_name": "SyntheticOKVQA",
                "setup_kwargs": {"n_docs": 24, "n_questions": 12,
                                 "vision_dim": 8}},
        "loaders": {"transform_name": "PrepareDataloaders",
                    "input_node": "raw",
                    "setup_kwargs": {"query_maxlen": 12, "doc_maxlen": 12,
                                     "nway": 2}},
    })
    world = dp.get_data("loaders", explode=True)
    tok = world["tokenizer"]
    corpus = world["passages"]["full_passages"]
    rcfg = FLMRModelConfig.tiny(
        bert=BertConfig.tiny(vocab_size=tok.vocab_size + 8),
        vision_dim=8, prefix_len=2, dim=16, nway=2)
    retriever = FLMRRetriever(rcfg)
    rp = retriever.init(
        jax.random.PRNGKey(0),
        query_input_ids=jnp.ones((2, 12), jnp.int32),
        query_attention_mask=jnp.ones((2, 12), jnp.int32),
        image_features=jnp.ones((2, 8), jnp.float32),
        doc_input_ids=jnp.ones((4, 12), jnp.int32),
        doc_attention_mask=jnp.ones((4, 12), jnp.int32))["params"]
    gcfg = T5Config.tiny(vocab_size=tok.vocab_size + 8,
                         eos_token_id=tok.sep_token_id)
    gen = T5Model(gcfg)
    gp = gen.init(jax.random.PRNGKey(1), jnp.ones((2, 8), jnp.int32),
                  jnp.ones((2, 8), jnp.int32),
                  jnp.ones((2, 3), jnp.int32))["params"]
    fe = FLMRExecutor(retriever, rp, TrainConfig(lr=1e-3), quiet=True)
    index = fe.build_index(corpus_doc_batches(corpus, world["doc_tokenizer"],
                                              batch_size=8))
    return world, retriever, rp, gen, gp, index, corpus


def make_batch(world, idxs):
    items = [world["train"].items[i] for i in idxs]
    qt = world["query_tokenizer"]
    qi, qm = qt.tensorize([it["question"] for it in items])
    return {
        "question_ids": [it["question_id"] for it in items],
        "questions": [it["question"] for it in items],
        "answers": [it["answers"] for it in items],
        "pos_item_ids": [it["pos_item_ids"] for it in items],
        "query_input_ids": qi, "query_attention_mask": qm,
        "image_features": np.stack([it["image_features"] for it in items]),
    }


def _executor(rag_setup, **rag_kw):
    world, retriever, rp, gen, gp, index, corpus = rag_setup
    defaults = dict(n_docs=4, gen_maxlen=48, label_maxlen=4,
                    max_decode_len=4, use_lora=False)
    defaults.update(rag_kw)
    return world, RagExecutor(
        retriever, rp, gen, gp, gen_tokenizer=world["tokenizer"],
        rag_cfg=RagConfig(**defaults), train_cfg=TrainConfig(lr=1e-3),
        index=index, passage_contents=corpus.contents,
        passage_ids=corpus.ids, quiet=True), corpus


def test_n_docs_in_training_subsamples(rag_setup):
    world, ex, corpus = _executor(rag_setup, n_docs_in_training=2)
    batch = make_batch(world, [0, 1, 2])
    tb = ex.make_train_batch(batch)
    assert tb["doc_tokens"].shape[1] == 2          # training: subsampled
    assert tb["retrieval_labels"].shape == (3, 2)
    m = ex.train_step_rag(batch)
    assert np.isfinite(float(m["loss"]))
    ret_eval = ex.retrieve(batch)                  # eval: full n_docs
    assert ret_eval["rows"].shape == (3, 4)
    # subsampled rows are a subset of the top n_docs
    top = ex.retrieve(batch, training=False)["rows"]
    tr = ex.retrieve(batch, training=True)["rows"]
    for i in range(3):
        assert set(tr[i].tolist()) <= set(top[i].tolist())


def test_use_gt_docs_for_training(rag_setup):
    world, ex, corpus = _executor(rag_setup, use_gt_docs_for_training=True,
                                  n_docs=3)
    batch = make_batch(world, [0, 1])
    ret = ex.retrieve(batch, training=True)
    # every slot holds a ground-truth positive's content
    for i, pos in enumerate(batch["pos_item_ids"]):
        want = {corpus.content_of(p) for p in pos}
        assert set(ret["contents"][i]) <= want
    # eval path ignores the flag (real retrieval)
    ret_eval = ex.retrieve(batch, training=False)
    assert ret_eval["rows"].shape == (2, 3)
    m = ex.train_step_rag(batch)
    assert np.isfinite(float(m["loss"]))


def test_static_missing_qid_gets_dummy_passages(rag_setup):
    world, retriever, rp, gen, gp, index, corpus = rag_setup
    tok = world["tokenizer"]
    static = {"0": [(1, 1.0), (2, 0.5)]}           # only qid 0 known
    ex = RagExecutor(
        retriever, rp, gen, gp, gen_tokenizer=tok,
        rag_cfg=RagConfig(n_docs=2, gen_maxlen=48, label_maxlen=4,
                          max_decode_len=4, use_lora=False),
        train_cfg=TrainConfig(lr=1e-3),
        index=index, passage_contents=corpus.contents,
        static_retrieval=static, quiet=True)
    batch = make_batch(world, [0, 1])              # qid "1" missing
    ret = ex.retrieve(batch)
    assert ret["rows"][0].tolist() == [1, 2]
    assert ret["rows"][1].tolist() == [-1, -1]
    assert ret["contents"][1] == ["", ""]
    assert not ret["doc_masks"][1].any()           # dummy docs fully masked
    m = ex.train_step_rag(batch)
    assert np.isfinite(float(m["loss"]))


def test_marker_replacement_table():
    b = GeneratorInputBuilder()
    got = b.strip_markers(
        "<BOQ>what is it<EOQ> <BOC>a cat photo<EOC> <BOV>cat<SOV>dog<EOV>")
    assert got == "what is it Caption: a cat photo Objects: cat, dog."


def test_ignore_knowledge_passages():
    b = GeneratorInputBuilder(ignore_knowledge=True)
    out = b.build(["<BOQ>why<EOQ>"], [["secret knowledge"]])
    assert out == ["Question: why Answer:"]
    b2 = GeneratorInputBuilder()
    out2 = b2.build(["<BOQ>why<EOQ>"], [["secret knowledge"]])
    assert out2 == ["Question: why Knowledge: secret knowledge Answer:"]


def test_ignore_knowledge_flag_via_config(rag_setup):
    world, ex, corpus = _executor(rag_setup, ignore_knowledge_passages=True,
                                  n_docs=2)
    assert ex.input_builder.ignore_knowledge
    batch = make_batch(world, [0, 1])
    m = ex.train_step_rag(batch)
    assert np.isfinite(float(m["loss"]))


def test_force_existence_label_selection(rag_setup):
    """Default: labels = gold answer per doc. force_existence: labels = the
    per-doc selected answer (another answer substitutes when the gold answer
    is absent from the doc but that answer appears)."""
    world, ex_default, corpus = _executor(rag_setup, n_docs=2)
    _, ex_force, _ = _executor(rag_setup, n_docs=2, force_existence=True)
    batch = make_batch(world, [0, 1, 2])
    # make answers disagree with docs: gold answer 'zzz' never in any doc,
    # second answer = a word guaranteed in the positive doc
    for i, item_answers in enumerate(batch["answers"]):
        w = corpus.content_of(batch["pos_item_ids"][i][0]).split()[1]
        batch["answers"][i] = ["zzz"] * 6 + [w] * 4
    tb_d = ex_default.make_train_batch(batch)
    tb_f = ex_force.make_train_batch(batch)
    tok = world["tokenizer"]

    def decode_labels(lbl):
        return [tok.decode([t for t in row if t >= 0][:-1])
                for row in np.asarray(lbl)]
    dec_d = decode_labels(tb_d["labels"])
    dec_f = decode_labels(tb_f["labels"])
    assert all(t == "zzz" for t in dec_d)          # gold everywhere
    assert any(t != "zzz" for t in dec_f)          # selected answer appears


def test_freeze_flags_reach_nested_retriever(rag_setup):
    """ADVICE r1 (medium): freeze_* prefixes must match at any '/' boundary —
    RagExecutor nests retriever params under 'retriever/'."""
    from ravqa_tpu.parallel.partition import trainable_mask
    world, ex, corpus = _executor(rag_setup, n_docs=2)
    mask = trainable_mask(ex.state.params,
                          ["freeze_mapping_network",
                           "freeze_colbert_doc_encoder"])
    flat = {"/".join(str(getattr(k, "key", k)) for k in path): v
            for path, v in jax.tree_util.tree_flatten_with_path(mask)[0]}
    vp = [k for k in flat if "retriever/vision_projection" in k]
    de = [k for k in flat if "retriever/doc_encoder" in k]
    assert vp and de
    assert not any(flat[k] for k in vp)
    assert not any(flat[k] for k in de)
    assert any(v for k, v in flat.items() if k.startswith("generator"))

    # and end-to-end: frozen retriever submodules stay fixed through a step
    from ravqa_tpu.executors import TrainConfig as _TC
    world3, retriever, rp, gen, gp, index, corpus3 = rag_setup
    ex3 = RagExecutor(
        retriever, rp, gen, gp, gen_tokenizer=world["tokenizer"],
        rag_cfg=RagConfig(n_docs=2, gen_maxlen=48, label_maxlen=4,
                          max_decode_len=4, use_lora=False),
        train_cfg=_TC(lr=1e-2, modules=("freeze_mapping_network",)),
        index=index, passage_contents=corpus3.contents, quiet=True)
    before = jax.device_get(
        ex3.state.params["retriever"]["vision_projection"])
    ex3.train_step_rag(make_batch(world, [0, 1]))
    after = jax.device_get(
        ex3.state.params["retriever"]["vision_projection"])
    for a, b in zip(jax.tree.leaves(before), jax.tree.leaves(after)):
        np.testing.assert_array_equal(a, b)


def test_add_null_document_metric_drop():
    from ravqa_tpu.metrics import pseudo_relevance_scores
    contents = [["<null>", "the cat sat", "a dog"]]
    answers = [["cat"]]
    with_null = pseudo_relevance_scores(contents, answers, ks=[1, 2],
                                        add_null_document=True)
    without = pseudo_relevance_scores(contents, answers, ks=[1, 2])
    # with the null doc dropped, 'the cat sat' moves to rank 1
    assert with_null["recall_at_1"] == 1.0
    assert without["recall_at_1"] == 0.0


def test_retriever_lr_param_group():
    """TrainConfig.retriever_lr gives the 'retriever/' subtree its own LR
    in joint RAG training (reference RAG_BLIP2_with_FLMR optimizer_config:
    lr=6e-4 generator, retriever_lr=1e-4). retriever_lr=0 must leave
    retriever params untouched while the generator updates."""
    import jax
    import jax.numpy as jnp
    import optax

    from ravqa_tpu.executors.base import TrainConfig, make_optimizer

    params = {"retriever": {"w": jnp.ones((4,))},
              "generator": {"w": jnp.ones((4,))}}
    cfg = TrainConfig(lr=0.1, retriever_lr=0.0)
    tx = make_optimizer(cfg, params)
    grads = jax.tree.map(jnp.ones_like, params)
    state = tx.init(params)
    updates, _ = tx.update(grads, state, params)
    new = optax.apply_updates(params, updates)
    assert np.allclose(np.asarray(new["retriever"]["w"]), 1.0)
    assert not np.allclose(np.asarray(new["generator"]["w"]), 1.0)
