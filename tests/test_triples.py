"""Triples data objects + triples trainer (ColBERT training subsystem)."""

import json

import jax
import jax.numpy as jnp
import numpy as np

from ravqa_tpu.data.colbert_data import Collection, Queries, Triples
from ravqa_tpu.executors.triples_executor import TriplesExecutor
from ravqa_tpu.executors import TrainConfig
from ravqa_tpu.models import BertConfig, FLMRModelConfig, FLMRRetriever
from ravqa_tpu.tokenization import (DocTokenizer, QueryTokenizer,
                                    WordPieceTokenizer, make_tiny_vocab)


def test_collection_and_queries_tsv(tmp_path):
    c = tmp_path / "c.tsv"
    c.write_text("0\tfirst passage\n1\tsecond passage\ttitle b\n")
    col = Collection.from_tsv(str(c))
    assert len(col) == 2
    assert col[1] == "title b | second passage"
    q = tmp_path / "q.tsv"
    q.write_text("7\twhat is this\n")
    qs = Queries.from_tsv(str(q))
    assert qs.qid2text["7"] == "what is this"
    # round-robin chunking
    chunks_r0 = list(col.enumerate_batches(1, rank=0, nranks=2))
    chunks_r1 = list(col.enumerate_batches(1, rank=1, nranks=2))
    assert len(chunks_r0) == 1 and len(chunks_r1) == 1


def test_triples_training_with_distillation(tmp_path):
    words = ["cat", "dog", "sun", "sky", "tree", "fish"]
    tok = WordPieceTokenizer(make_tiny_vocab(words))
    qt, dt = QueryTokenizer(tok, 8), DocTokenizer(tok, 8)
    passages = [f"{w} {words[(i+1) % 6]}" for i, w in enumerate(words)]
    col = Collection(passages, [f"P{i}" for i in range(6)])
    queries = Queries({str(i): words[i] for i in range(6)})
    rows = []
    for i in range(6):
        rows.append([str(i), [f"P{i}", 10.0], [f"P{(i+3) % 6}", 1.0]])
    tr = Triples(rows)

    cfg = FLMRModelConfig.tiny(
        bert=BertConfig.tiny(vocab_size=tok.vocab_size + 8),
        query_mode="text_only", dim=16, nway=2)
    model = FLMRRetriever(cfg)
    params = model.init(jax.random.PRNGKey(0),
                        query_input_ids=jnp.ones((2, 8), jnp.int32),
                        query_attention_mask=jnp.ones((2, 8), jnp.int32),
                        doc_input_ids=jnp.ones((4, 8), jnp.int32),
                        doc_attention_mask=jnp.ones((4, 8), jnp.int32)
                        )["params"]
    ex = TriplesExecutor(model, params, TrainConfig(lr=3e-3), quiet=True,
                         distill_weight=0.5, query_tokenizer=qt,
                         doc_tokenizer=dt)
    losses = []
    batches = tr.batches(queries, col, bsize=3, nway=2, epochs=None)
    for _ in range(10):
        m = ex.train_step(ex.make_batch(next(batches)))
        losses.append(float(m["loss"]))
    assert all(np.isfinite(losses))
    assert losses[-1] < losses[0]


def test_docs_to_passages():
    from ravqa_tpu.data.colbert_data import docs_to_passages
    doc = " ".join(f"w{i}" for i in range(10))
    out = docs_to_passages([doc], max_words=4)
    assert out == ["w0 w1 w2 w3", "w4 w5 w6 w7", "w8 w9"]
    out2 = docs_to_passages([doc], max_words=4, overlap=2)
    assert out2[0] == "w0 w1 w2 w3" and out2[1] == "w2 w3 w4 w5"


def test_create_triples_from_ranking():
    from ravqa_tpu.data.colbert_data import create_triples_from_ranking
    tr = create_triples_from_ranking(
        retrieved_ids=[["a", "b", "c"], ["x", "y"]],
        pos_item_ids=[["b"], []],
        query_ids=["q1", "q2"], n_negatives=2)
    assert len(tr) == 1
    qid, pos, *negs = tr[0]
    assert qid == "q1" and pos == "b"
    assert set(negs) <= {"a", "c"} and len(negs) == 2
