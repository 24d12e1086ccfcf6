"""End-to-end RAG executor test: live retrieve -> generate -> joint train on
the synthetic world; also the static-retrieval path."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from ravqa_tpu.data import DataPipeline
from ravqa_tpu.executors import (FLMRExecutor, RagConfig, RagExecutor,
                                 TrainConfig)
from ravqa_tpu.models import (BertConfig, FLMRModelConfig, FLMRRetriever,
                              T5Config, T5Model)
from ravqa_tpu.data.datasets import corpus_doc_batches


@pytest.fixture(scope="module")
def world():
    dp = DataPipeline({
        "raw": {"transform_name": "SyntheticOKVQA",
                "setup_kwargs": {"n_docs": 24, "n_questions": 12,
                                 "vision_dim": 8}},
        "loaders": {"transform_name": "PrepareDataloaders",
                    "input_node": "raw",
                    "setup_kwargs": {"query_maxlen": 12, "doc_maxlen": 12,
                                     "nway": 2}},
    })
    return dp.get_data("loaders", explode=True)


@pytest.fixture(scope="module")
def rag_setup(world):
    tok = world["tokenizer"]
    corpus = world["passages"]["full_passages"]
    # retriever
    rcfg = FLMRModelConfig.tiny(
        bert=BertConfig.tiny(vocab_size=tok.vocab_size + 8),
        vision_dim=8, prefix_len=2, dim=16, nway=2)
    retriever = FLMRRetriever(rcfg)
    rng = np.random.default_rng(0)
    rp = retriever.init(
        jax.random.PRNGKey(0),
        query_input_ids=jnp.ones((2, 12), jnp.int32),
        query_attention_mask=jnp.ones((2, 12), jnp.int32),
        image_features=jnp.ones((2, 8), jnp.float32),
        doc_input_ids=jnp.ones((4, 12), jnp.int32),
        doc_attention_mask=jnp.ones((4, 12), jnp.int32))["params"]
    # generator (shares the WordPiece vocab)
    gcfg = T5Config.tiny(vocab_size=tok.vocab_size + 8, eos_token_id=
                         tok.sep_token_id)
    gen = T5Model(gcfg)
    gp = gen.init(jax.random.PRNGKey(1), jnp.ones((2, 8), jnp.int32),
                  jnp.ones((2, 8), jnp.int32),
                  jnp.ones((2, 3), jnp.int32))["params"]
    # corpus index via a throwaway FLMR executor
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
        "query_input_ids": qi, "query_attention_mask": qm,
        "image_features": np.stack([it["image_features"] for it in items]),
    }


def test_rag_live_train_and_generate(rag_setup):
    world, retriever, rp, gen, gp, index, corpus = rag_setup
    tok = world["tokenizer"]
    ex = RagExecutor(
        retriever, rp, gen, gp, gen_tokenizer=tok,
        rag_cfg=RagConfig(n_docs=3, gen_maxlen=48, label_maxlen=4,
                          max_decode_len=4, use_lora=True, lora_rank=2),
        train_cfg=TrainConfig(lr=3e-3),
        index=index, passage_contents=corpus.contents, quiet=True)

    batch = make_batch(world, [0, 1, 2, 3])
    losses = []
    for _ in range(4):
        m = ex.train_step_rag(batch)
        losses.append(float(m["loss"]))
    assert all(np.isfinite(losses)), losses
    assert losses[-1] < losses[0]

    # generator base must stay frozen (LoRA-only training)
    base0 = jax.tree.leaves(gp)[0]
    base1 = jax.tree.leaves(
        jax.device_get(ex.state.params["generator"]["base"]))[0]
    np.testing.assert_array_equal(np.asarray(base0), base1)

    out = ex.generate(batch)
    assert len(out["predictions"]) == 4
    assert all(isinstance(p, str) for p in out["predictions"])
    assert out["doc_scores"].shape == (4, 3)
    assert out["selected_docs"].shape == (4,)


def test_rag_static_retrieval_path(rag_setup):
    world, retriever, rp, gen, gp, index, corpus = rag_setup
    tok = world["tokenizer"]
    # static map: question_id -> [(row, score), ...]
    static = {it["question_id"]: [(int(it["question_id"]) % len(corpus), 1.0),
                                  ((int(it["question_id"]) + 1)
                                   % len(corpus), 0.5)]
              for it in world["train"].items}
    ex = RagExecutor(
        retriever, rp, gen, gp, gen_tokenizer=tok,
        rag_cfg=RagConfig(n_docs=2, gen_maxlen=48, label_maxlen=4,
                          max_decode_len=4, use_lora=False),
        train_cfg=TrainConfig(lr=1e-3),
        index=index, passage_contents=corpus.contents,
        static_retrieval=static, quiet=True)
    batch = make_batch(world, [0, 1])
    m = ex.train_step_rag(batch)
    assert np.isfinite(float(m["loss"]))
    ret = ex.retrieve(batch)
    assert ret["rows"].shape == (2, 2)
    np.testing.assert_array_equal(
        ret["rows"][:, 0], [int(b) % len(corpus)
                            for b in batch["question_ids"]])


def test_rag_blip2_generator(rag_setup):
    """RAVQA-v2 path: BLIP-2 generator (tiny) with live retrieval."""
    from ravqa_tpu.models.blip2 import (Blip2Config, Blip2T5,
                                        Blip2VisionConfig, QFormerConfig)
    from ravqa_tpu.models import T5Config
    world, retriever, rp, gen, gp, index, corpus = rag_setup
    tok = world["tokenizer"]
    bcfg = Blip2Config(
        vision=Blip2VisionConfig.tiny(),
        qformer=QFormerConfig.tiny(),
        t5=T5Config.tiny(vocab_size=tok.vocab_size + 8,
                         eos_token_id=tok.sep_token_id),
        num_query_tokens=2)
    blip2 = Blip2T5(bcfg)
    bp = blip2.init(jax.random.PRNGKey(2),
                    jnp.ones((1, 32, 32, 3), jnp.float32),
                    jnp.ones((1, 6), jnp.int32), jnp.ones((1, 6), jnp.int32),
                    jnp.ones((1, 2), jnp.int32))["params"]
    ex = RagExecutor(
        retriever, rp, blip2, bp, gen_tokenizer=tok,
        rag_cfg=RagConfig(n_docs=2, gen_maxlen=32, label_maxlen=4,
                          max_decode_len=3, use_lora=True, lora_rank=2,
                          generator_type="blip2"),
        train_cfg=TrainConfig(lr=1e-3),
        index=index, passage_contents=corpus.contents, quiet=True)
    batch = make_batch(world, [0, 1])
    rng = np.random.default_rng(0)
    batch["pixel_values"] = rng.normal(size=(2, 32, 32, 3)).astype(np.float32)
    m = ex.train_step_rag(batch)
    assert np.isfinite(float(m["loss"]))
    out = ex.generate(batch)
    assert len(out["predictions"]) == 2


def test_rag_beam_generation(rag_setup):
    """num_beams=2 (the reference RAVQA-v2 setting) through generate()."""
    world, retriever, rp, gen, gp, index, corpus = rag_setup
    tok = world["tokenizer"]
    ex = RagExecutor(
        retriever, rp, gen, gp, gen_tokenizer=tok,
        rag_cfg=RagConfig(n_docs=2, gen_maxlen=32, label_maxlen=4,
                          max_decode_len=4, use_lora=False, num_beams=2),
        train_cfg=TrainConfig(lr=1e-3),
        index=index, passage_contents=corpus.contents, quiet=True)
    batch = make_batch(world, [0, 1])
    out = ex.generate(batch)
    assert len(out["predictions"]) == 2
    assert out["doc_scores"].shape == (2, 2)


def test_rag_training_on_mesh(rag_setup):
    """RAG joint training data-parallel over the 8-device mesh."""
    from ravqa_tpu.parallel import make_mesh
    world, retriever, rp, gen, gp, index, corpus = rag_setup
    tok = world["tokenizer"]
    mesh = make_mesh({"data": 8})
    # re-shard the index over the mesh for the collective searcher
    from ravqa_tpu.retrieval import build_index_from_embeddings
    import numpy as _np
    toks = _np.asarray(index.tokens, _np.float32)[:index.num_docs]
    msk = _np.asarray(index.mask, _np.int8)[:index.num_docs]
    idx_m = build_index_from_embeddings(toks, msk, pad_multiple=8,
                                        dtype=jnp.float32, mesh=mesh,
                                        axis="data")
    ex = RagExecutor(
        retriever, rp, gen, gp, gen_tokenizer=tok,
        rag_cfg=RagConfig(n_docs=2, gen_maxlen=32, label_maxlen=4,
                          max_decode_len=3, use_lora=False),
        train_cfg=TrainConfig(lr=1e-3), mesh=mesh,
        index=idx_m, passage_contents=corpus.contents, quiet=True)
    batch = make_batch(world, [0, 1, 2, 3, 4, 5, 6, 7])
    m = ex.train_step_rag(batch)
    assert np.isfinite(float(m["loss"]))


def test_rag_live_pruned_search(rag_setup):
    """Live retrieval through the pruned search modes (search_mode in
    RagConfig auto-builds summaries / block summaries on the index)."""
    world, retriever, rp, gen, gp, index, corpus = rag_setup
    tok = world["tokenizer"]
    ex = RagExecutor(
        retriever, rp, gen, gp, gen_tokenizer=tok,
        rag_cfg=RagConfig(n_docs=2, gen_maxlen=32, label_maxlen=4,
                          max_decode_len=4, use_lora=False,
                          search_mode="hierarchical", n_candidates=8),
        train_cfg=TrainConfig(lr=1e-3),
        index=index, passage_contents=corpus.contents, quiet=True)
    assert ex.index.summaries is not None
    assert ex.index.block_summaries is not None
    batch = make_batch(world, [0, 1])
    m = ex.train_step_rag(batch)
    assert np.isfinite(float(m["loss"]))
    out = ex.generate(batch)
    assert len(out["predictions"]) == 2


def test_prepare_for_serving_parity(rag_setup):
    """The serving form (inference_only + LoRA pre-merge) must generate
    bit-identically to the training form: prepare_for_serving replaces
    the per-program merge_lora with a one-time donated merge and drops
    optimizer state (rag_executor.prepare_for_serving — the deploy
    story behind scripts/bench_serving_vqa.py's VQA_BATCH=16 point)."""
    world, retriever, rp, gen, gp, index, corpus = rag_setup
    tok = world["tokenizer"]

    def build(**kw):
        return RagExecutor(
            retriever, rp, gen, gp, gen_tokenizer=tok,
            rag_cfg=RagConfig(n_docs=2, gen_maxlen=32, label_maxlen=4,
                              max_decode_len=4, use_lora=True,
                              lora_rank=2),
            train_cfg=TrainConfig(lr=3e-3),
            index=index, passage_contents=corpus.contents, quiet=True,
            **kw)

    ex = build()
    batch = make_batch(world, [0, 1, 2])
    # train a few steps so LoRA B != 0 and the merge actually matters
    for _ in range(3):
        ex.train_step_rag(batch)
    before = ex.generate(batch)

    ex.prepare_for_serving()
    assert ex.state.opt_state == ()
    assert "lora" not in ex.state.params["generator"]
    after = ex.generate(batch)
    assert after["predictions"] == before["predictions"]
    np.testing.assert_allclose(after["doc_scores"], before["doc_scores"],
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_array_equal(after["all_generations"],
                                  before["all_generations"])
    with pytest.raises(RuntimeError, match="inference_only"):
        ex.train_step_rag(batch)

    # inference_only construction: no optimizer state from the start
    ex2 = build(inference_only=True)
    assert ex2.state.opt_state == () and ex2.tx is None
    out2 = ex2.generate(batch)
    assert len(out2["predictions"]) == 3
    with pytest.raises(RuntimeError, match="inference_only"):
        ex2.train_step_rag(batch)
