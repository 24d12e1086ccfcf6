"""Learning-quality gates (VERDICT r4 Next #5): not just plumbing — the
models must LEARN on the synthetic OK-VQA world, to pinned floors.

Two gates, mirroring the reference's train-FLMR -> index -> train-RAG
workflow (README.md:488-590) with its metric oracles (README.md:111-121):

1. tiny-FLMR trained from scratch reaches a pinned Recall@5 on a
   retrieval task where the query is a strict sub-bag of the positive
   passage's words EXCLUDING the answer word (so the e2e exact-copy
   engine gate, tests/test_e2e_gate.py, cannot pass it untrained: the
   untrained encoder's top-3 hit rate measures ~0.13 here).
2. tiny-RAG trained with LIVE retrieval over the trained index improves
   VQA exact-match over a no-retrieval ablation
   (`ignore_knowledge_passages`, the reference's module flag) trained
   identically. The answer word exists ONLY in the positive passage, and
   the test split's positives are disjoint from training questions —
   memorization cannot solve the test split, copy-from-knowledge can.

Calibration notes (2026-08-19, CPU jax, under the conftest's 8 virtual
devices — numerics differ from a single-device run): retriever quality
is the load-bearing variable — at FLMR recall@1 0.98 (400 train steps)
the RAG EMs are with-retrieval train/test 0.975/0.077 vs ablation
0.912/0.058; at recall@1 ~0.73 (150 steps) the test margin collapses to
0 (noisy docs drown the copy signal). The tiny generator mostly
memorizes passage-content->answer (train EMs high for both arms), with
a small genuine copy-circuit transfer to unseen passages; a
mean-over-docs NLL gate was measured and rejected (wrong-doc dilution
inverts it). Floors below pin the measured values with tolerance for
jax-version drift.

Both tests are deterministic (fixed seeds) and CPU-sized; they live in
the slow tier (tests/slow_tests.txt).
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

N_DOCS, N_Q = 256, 256


@pytest.fixture(scope="module")
def world():
    dp = DataPipeline({
        "raw": {"transform_name": "SyntheticOKVQA",
                "setup_kwargs": {"n_docs": N_DOCS, "n_questions": N_Q,
                                 "vision_dim": 8}},
        "loaders": {"transform_name": "PrepareDataloaders",
                    "input_node": "raw",
                    "setup_kwargs": {"query_maxlen": 12, "doc_maxlen": 12,
                                     "nway": 2}}})
    w = dp.get_data("loaders", explode=True)
    # retrieval must be NECESSARY: the question is words[1:4] of its
    # positive passage — the answer (words[0]) appears only in the passage
    for split in ("train", "test"):
        for it in w[split].items:
            words = it["pos_item_contents"][0].split()
            it["question"] = " ".join(words[1:4])
    return w


@pytest.fixture(scope="module")
def trained_retriever(world):
    tok = world["tokenizer"]
    corpus = world["passages"]["full_passages"]
    qt, dtok = world["query_tokenizer"], world["doc_tokenizer"]
    rcfg = FLMRModelConfig.tiny(
        bert=BertConfig.tiny(vocab_size=tok.vocab_size + 8),
        vision_dim=8, prefix_len=2, dim=16, nway=2)
    retr = FLMRRetriever(rcfg)
    rp0 = retr.init(jax.random.PRNGKey(0),
                    query_input_ids=jnp.ones((2, 12), jnp.int32),
                    query_attention_mask=jnp.ones((2, 12), jnp.int32),
                    image_features=jnp.ones((2, 8), jnp.float32),
                    doc_input_ids=jnp.ones((4, 12), jnp.int32),
                    doc_attention_mask=jnp.ones((4, 12), jnp.int32)
                    )["params"]

    def batches(n_steps, bsize=16):
        rng = np.random.default_rng(7)
        items = world["train"].items
        for _ in range(n_steps):
            sel = rng.choice(len(items), bsize, replace=False)
            its = [items[i] for i in sel]
            qi, qm = qt.tensorize([it["question"] for it in its])
            docs = []
            for it in its:
                docs.append(it["pos_item_contents"][0])
                neg = rng.integers(N_DOCS)
                while f"GS_{neg}" == it["pos_item_ids"][0]:
                    neg = rng.integers(N_DOCS)
                docs.append(corpus.contents[neg])
            di, dm = dtok.tensorize(docs)
            yield dict(
                query_input_ids=jnp.array(qi),
                query_attention_mask=jnp.array(qm),
                image_features=jnp.array(np.stack(
                    [it["image_features"] for it in its])),
                doc_input_ids=jnp.array(di),
                doc_attention_mask=jnp.array(dm))

    fe = FLMRExecutor(retr, rp0, TrainConfig(lr=3e-3, total_steps=400),
                      quiet=True)
    fe.fit(batches(400), steps=400)
    return retr, fe


def test_flmr_learning_gate(world, trained_retriever):
    """Train tiny-FLMR from scratch -> pinned Recall@5 >= 0.95 on
    train+test questions (measured 1.00 at these seeds; tolerance for
    jax version drift). Reference oracle: PRRecall@5 89.2 after
    fine-tuning (README.md:113-115) — this is its synthetic-world twin."""
    retr, fe = trained_retriever
    corpus = world["passages"]["full_passages"]
    qt, dtok = world["query_tokenizer"], world["doc_tokenizer"]
    items = world["train"].items + world["test"].items
    qi, qm = qt.tensorize([it["question"] for it in items])
    qb = [dict(query_input_ids=jnp.array(qi),
               query_attention_mask=jnp.array(qm),
               image_features=jnp.array(np.stack(
                   [it["image_features"] for it in items])))]
    di, dm = dtok.tensorize(corpus.contents)
    db = [dict(doc_input_ids=jnp.array(di),
               doc_attention_mask=jnp.array(dm))]
    m = fe.evaluate_retrieval(
        qb, db, passage_ids=corpus.ids, passage_contents=corpus.contents,
        answers=[[it["gold_answer"]] for it in items],
        pos_item_ids=[it["pos_item_ids"] for it in items], ks=(1, 5))
    assert m["pos_item_ids_recall_at_5"] >= 0.95, m
    assert m["pos_item_ids_recall_at_1"] >= 0.85, m


def _em(preds, items):
    return float(np.mean([p.strip().startswith(it["gold_answer"])
                          for p, it in zip(preds, items)]))


def _train_rag(world, retr, rp, index, corpus, ignore, steps, lr):
    tok = world["tokenizer"]
    gcfg = T5Config.tiny(vocab_size=tok.vocab_size + 8,
                         eos_token_id=tok.sep_token_id)
    gen = T5Model(gcfg)
    gp = gen.init(jax.random.PRNGKey(1), jnp.ones((2, 8), jnp.int32),
                  jnp.ones((2, 8), jnp.int32),
                  jnp.ones((2, 3), jnp.int32))["params"]
    ex = RagExecutor(
        retr, rp, gen, gp, gen_tokenizer=tok,
        rag_cfg=RagConfig(n_docs=3, gen_maxlen=48, label_maxlen=4,
                          max_decode_len=4, use_lora=False,
                          ignore_knowledge_passages=ignore),
        train_cfg=TrainConfig(lr=lr), index=index,
        passage_contents=corpus.contents, quiet=True)
    qt = world["query_tokenizer"]

    def make_batch(items):
        qi, qm = qt.tensorize([it["question"] for it in items])
        return {"question_ids": [it["question_id"] for it in items],
                "questions": [it["question"] for it in items],
                "answers": [it["answers"] for it in items],
                "query_input_ids": qi, "query_attention_mask": qm,
                "image_features": np.stack(
                    [it["image_features"] for it in items])}

    rng = np.random.default_rng(0)
    train_items = world["train"].items
    for _ in range(steps):
        sel = rng.choice(len(train_items), 16, replace=False)
        ex.train_step_rag(make_batch([train_items[i] for i in sel]))
    out = {}
    for split in ("train", "test"):
        items = world[split].items
        res = ex.generate(make_batch(items))
        out[split] = _em(res["predictions"], items)
    return out


def test_rag_learning_gate(world, trained_retriever):
    """tiny-RAG with live retrieval must beat the no-retrieval ablation
    by pinned margins — the strongest quality proxy this environment
    allows for the reference's 'retrieval improves VQA' claim (RA-VQA
    54.51 vs its no-retrieval ablations, README.md:118-121).

    Measured at these seeds under the conftest env (see module
    docstring): with-retrieval train/test EM 0.975/0.077 vs ablation
    0.912/0.058."""
    retr, fe = trained_retriever
    corpus = world["passages"]["full_passages"]
    rp = jax.device_get(fe.state.params)
    index = fe.build_index(corpus_doc_batches(
        corpus, world["doc_tokenizer"], batch_size=32))
    with_ret = _train_rag(world, retr, rp, index, corpus, ignore=False,
                          steps=1200, lr=1e-3)
    no_ret = _train_rag(world, retr, rp, index, corpus, ignore=True,
                        steps=1200, lr=1e-3)
    # learning works end-to-end through the live-retrieval RAG step
    assert with_ret["train"] >= 0.9, (with_ret, no_ret)
    # knowledge access is a train-time advantage (0.975 vs 0.912)
    assert with_ret["train"] >= no_ret["train"] + 0.05, (with_ret, no_ret)
    # the copy circuit transfers to UNSEEN passages, above the ablation
    # (0.077 vs 0.058 measured; chance ~0.05)
    assert with_ret["test"] >= no_ret["test"] + 0.015, (with_ret, no_ret)
    assert with_ret["test"] >= 0.07, (with_ret, no_ret)
