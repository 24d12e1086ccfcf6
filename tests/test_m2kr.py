"""M2KR multi-task eval loop over two synthetic tasks."""

import jax
import jax.numpy as jnp
import numpy as np

from ravqa_tpu.data import DataPipeline
from ravqa_tpu.executors import FLMRExecutor, TrainConfig
from ravqa_tpu.executors.m2kr import (DEFAULT_INSTRUCTIONS, M2KRTask,
                                      evaluate_m2kr)
from ravqa_tpu.models import BertConfig, FLMRModelConfig, FLMRRetriever


def make_world(seed, n_docs, n_q):
    dp = DataPipeline({
        "raw": {"transform_name": "SyntheticOKVQA",
                "setup_kwargs": {"n_docs": n_docs, "n_questions": n_q,
                                 "vision_dim": 8, "seed": seed}},
        "loaders": {"transform_name": "PrepareDataloaders",
                    "input_node": "raw",
                    "setup_kwargs": {"query_maxlen": 12, "doc_maxlen": 12,
                                     "nway": 2}},
    })
    return dp.get_data("loaders", explode=True)


def test_evaluate_m2kr_two_tasks():
    w1 = make_world(0, 16, 8)
    w2 = make_world(1, 20, 8)
    tok = w1["tokenizer"]
    cfg = FLMRModelConfig.tiny(
        bert=BertConfig.tiny(vocab_size=tok.vocab_size + 8),
        vision_dim=8, prefix_len=2, dim=16)
    model = FLMRRetriever(cfg)
    params = model.init(
        jax.random.PRNGKey(0),
        query_input_ids=jnp.ones((2, 12), jnp.int32),
        query_attention_mask=jnp.ones((2, 12), jnp.int32),
        image_features=jnp.ones((2, 8), jnp.float32),
        doc_input_ids=jnp.ones((4, 12), jnp.int32),
        doc_attention_mask=jnp.ones((4, 12), jnp.int32))["params"]
    ex = FLMRExecutor(model, params, TrainConfig(lr=1e-3), quiet=True)
    tasks = [
        M2KRTask("okvqa", w1["test"], w1["passages"]["full_passages"],
                 ks=(1, 5)),
        M2KRTask("wit", w2["test"], w2["passages"]["full_passages"],
                 ks=(1, 5), use_answers=False),
    ]
    res = evaluate_m2kr(ex, tasks)
    assert "okvqa" in res and "wit" in res
    assert "pos_item_ids_recall_at_5" in res["okvqa"]
    assert "recall_at_5" in res["okvqa"]          # pseudo-relevance
    assert "recall_at_5" not in res["wit"]        # answers disabled
    assert "wit/pos_item_ids_recall_at_5" in res["_flat"]
    assert "okvqa" in DEFAULT_INSTRUCTIONS


def test_m2kr_loader(tmp_path):
    import json
    qf = tmp_path / "q.jsonl"
    pf = tmp_path / "p.jsonl"
    with open(pf, "w") as f:
        for i in range(3):
            f.write(json.dumps({"passage_id": f"P{i}",
                                "passage_content": f"text {i}"}) + "\n")
    with open(qf, "w") as f:
        f.write(json.dumps({"question_id": 1, "question": "q one",
                            "pos_item_ids": ["P0"]}) + "\n")
    dp = DataPipeline({
        "m2kr": {"transform_name": "LoadM2KRData",
                 "setup_kwargs": {"queries_path": {"test": str(qf)},
                                  "passages_path": str(pf)}}})
    out = dp.get_data("m2kr", explode=True)
    assert len(out["passages"]["full_passages"]) == 3
    assert out["test"][0]["pos_item_ids"] == ["P0"]
