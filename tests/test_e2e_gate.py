"""Engine e2e gate — the equivalent of the reference's ColBERT e2e test
(third_party/ColBERT/colbert/tests/e2e_test.py: index SQuAD-dev, search,
assert Success@5 > 0.93). Here: a 2000-passage synthetic corpus, queries
that are exact copies of their positive passage (an untrained encoder must
still rank the identical text first — this gates the *engine*: tokenizer
-> encode -> index -> sharded search -> metrics), Success@5 > 0.93."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from ravqa_tpu.data import DataPipeline
from ravqa_tpu.data.datasets import corpus_doc_batches, query_eval_batches
from ravqa_tpu.executors import FLMRExecutor, TrainConfig
from ravqa_tpu.models import BertConfig, FLMRModelConfig, FLMRRetriever
from ravqa_tpu.parallel import make_mesh


@pytest.mark.parametrize("sharded", [False, True])
def test_engine_gate_success_at_5(sharded):
    n_docs, n_q = 2000, 64
    dp = DataPipeline({
        "raw": {"transform_name": "SyntheticOKVQA",
                "setup_kwargs": {"n_docs": n_docs, "n_questions": n_q,
                                 "vision_dim": 8}},
        "loaders": {"transform_name": "PrepareDataloaders",
                    "input_node": "raw",
                    "setup_kwargs": {"query_maxlen": 16, "doc_maxlen": 16,
                                     "nway": 2}},
    })
    world = dp.get_data("loaders", explode=True)
    tok = world["tokenizer"]
    corpus = world["passages"]["full_passages"]
    # queries = the full positive passage text (exact-copy gate)
    ds = world["train"]
    for it in ds.items:
        it["question"] = it["pos_item_contents"][0]
    items = ds.items[:n_q]
    ds.items = items

    cfg = FLMRModelConfig.tiny(
        bert=BertConfig.tiny(vocab_size=tok.vocab_size + 8),
        vision_dim=8, prefix_len=1, dim=16,
        query_mode="text_only")  # pure text gate, like the reference e2e
    model = FLMRRetriever(cfg)
    params = model.init(
        jax.random.PRNGKey(0),
        query_input_ids=jnp.ones((2, 16), jnp.int32),
        query_attention_mask=jnp.ones((2, 16), jnp.int32),
        doc_input_ids=jnp.ones((4, 16), jnp.int32),
        doc_attention_mask=jnp.ones((4, 16), jnp.int32))["params"]
    mesh = make_mesh({"data": 8}) if sharded else None
    ex = FLMRExecutor(model, params, TrainConfig(lr=1e-3), mesh=mesh,
                      quiet=True)
    metrics = ex.evaluate_retrieval(
        query_eval_batches(ds, batch_size=32),
        corpus_doc_batches(corpus, ds.dt, batch_size=100),
        passage_ids=corpus.ids,
        pos_item_ids=[it["pos_item_ids"] for it in items],
        ks=[1, 5])
    success_at_5 = metrics["pos_item_ids_recall_at_5"]
    assert success_at_5 > 0.93, metrics
