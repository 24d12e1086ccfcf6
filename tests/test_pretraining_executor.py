"""Vision-only pretraining executor (WIT mapping-network pretraining)."""

import jax
import jax.numpy as jnp
import numpy as np

from ravqa_tpu.executors import FLMRVisionPretrainingExecutor, TrainConfig
from ravqa_tpu.models import BertConfig, FLMRModelConfig, FLMRRetriever
from ravqa_tpu.tokenization import (DocTokenizer, WordPieceTokenizer,
                                    make_tiny_vocab)


def test_vision_pretraining_learns_mapping():
    tok = WordPieceTokenizer(make_tiny_vocab(
        ["cat", "dog", "sun", "sky", "tree", "fish", "red", "blue"]))
    dt = DocTokenizer(tok, doc_maxlen=10)
    n_docs, vdim = 12, 8
    rng = np.random.default_rng(0)
    passages = [f"{w} thing" for w in
                ["cat", "dog", "sun", "sky", "tree", "fish", "red", "blue",
                 "cat dog", "sun sky", "tree fish", "red blue"]]
    # each "image" feature deterministically encodes its positive doc id
    feats = np.eye(n_docs, vdim, dtype=np.float32)[:, :vdim] \
        + 0.05 * rng.normal(size=(n_docs, vdim)).astype(np.float32)

    cfg = FLMRModelConfig.tiny(
        bert=BertConfig.tiny(vocab_size=tok.vocab_size + 8),
        vision_dim=vdim, prefix_len=2, dim=16,
        query_mode="vision_only")
    model = FLMRRetriever(cfg)
    di, dm = dt.tensorize(passages)
    params = model.init(jax.random.PRNGKey(0),
                        image_features=jnp.array(feats[:2]),
                        doc_input_ids=jnp.array(di[:4]),
                        doc_attention_mask=jnp.array(dm[:4]))["params"]
    # freeze the doc tower: only the mapping network learns (reference WIT
    # pretraining config)
    ex = FLMRVisionPretrainingExecutor(
        model, params,
        TrainConfig(lr=5e-3, modules=("freeze_colbert_doc_encoder",)),
        quiet=True)
    losses = []
    for step in range(25):
        order = rng.permutation(n_docs)[:4]
        docs = []
        for i in order:
            docs.append(passages[i])
            docs.append(passages[(i + 5) % n_docs])
        bdi, bdm = dt.tensorize(docs)
        m = ex.train_step({"image_features": jnp.array(feats[order]),
                           "doc_input_ids": jnp.array(bdi),
                           "doc_attention_mask": jnp.array(bdm)})
        losses.append(float(m["loss"]))
    assert losses[-1] < losses[0]
    # doc tower stayed frozen
    d0 = jax.tree.leaves(params["doc_encoder"])[0]
    d1 = jax.tree.leaves(jax.device_get(
        ex.state.params["doc_encoder"]))[0]
    np.testing.assert_array_equal(np.asarray(d0), d1)

    # eval path: vision-only queries, pos-id recall (reference
    # compute_DPR_scores_with_pos_ids)
    metrics = ex.evaluate_retrieval(
        [{"image_features": feats}],
        [{"doc_input_ids": di, "doc_attention_mask": dm}],
        passage_ids=[f"W_{i}" for i in range(n_docs)],
        pos_item_ids=[[f"W_{i}"] for i in range(n_docs)], ks=[1, 5])
    assert metrics["pos_item_ids_recall_at_5"] > 5 / n_docs
