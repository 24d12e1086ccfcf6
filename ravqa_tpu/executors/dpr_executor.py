"""DPR dual-encoder executor (the reference's RetrieverDPR training path,
src/models/retriever/retriever_dpr.py + DPR configs): pooled-embedding
dot-product retrieval with in-batch negatives; evaluation indexes pooled
item embeddings and searches by inner product."""

from __future__ import annotations

from typing import Iterable, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ..metrics import positive_id_scores, pseudo_relevance_scores
from ..models.dpr import DPRRetriever
from .base import BaseExecutor, TrainConfig


class DPRExecutor(BaseExecutor):
    def loss_fn(self, params, batch, rng):
        out = self.model.apply({"params": params},
                               batch["query_input_ids"],
                               batch["query_attention_mask"],
                               batch["doc_input_ids"],
                               batch["doc_attention_mask"],
                               deterministic=True)
        return out["loss"], {}

    def encode_queries(self, batches: Iterable[dict]) -> np.ndarray:
        f = jax.jit(lambda p, i, m: self.model.apply(
            {"params": p}, i, m, method=DPRRetriever.encode_query))
        return np.concatenate(
            [np.asarray(f(self.state.params,
                          jnp.asarray(b["query_input_ids"]),
                          jnp.asarray(b["query_attention_mask"])))
             for b in batches], axis=0)

    def encode_items(self, batches: Iterable[dict]) -> np.ndarray:
        f = jax.jit(lambda p, i, m: self.model.apply(
            {"params": p}, i, m, method=DPRRetriever.encode_item))
        return np.concatenate(
            [np.asarray(f(self.state.params,
                          jnp.asarray(b["doc_input_ids"]),
                          jnp.asarray(b["doc_attention_mask"])))
             for b in batches], axis=0)

    def evaluate_retrieval(self, query_batches, doc_batches, passage_ids,
                           passage_contents=None, answers=None,
                           pos_item_ids=None, ks: Sequence[int] = (5, 10)):
        q = self.encode_queries(query_batches)
        d = self.encode_items(doc_batches)
        scores = q @ d.T
        k = min(max(ks), d.shape[0])
        rows = np.argsort(-scores, axis=1)[:, :k]
        metrics = {}
        retrieved = [[passage_ids[r] for r in row] for row in rows]
        if answers is not None and passage_contents is not None:
            contents = [[passage_contents[r] for r in row] for row in rows]
            metrics.update(pseudo_relevance_scores(contents, answers, ks))
        if pos_item_ids is not None:
            metrics.update(positive_id_scores(retrieved, pos_item_ids, ks))
        metrics["_retrieved_pids"] = retrieved
        return metrics
