"""Triples-based text-retrieval training (ColBERT training subsystem).

Equivalent of the reference engine's training/ package (SURVEY.md R20:
triples LazyBatcher + nway CE + optional KL distillation against teacher
scores). Trains the text-only late-interaction tower from
(query, pos, negs) triples — e.g. MSMARCO-style pretraining of the PreFLMR
text backbone.
"""

from __future__ import annotations

from typing import Iterable, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..models.flmr import FLMRRetriever
from ..ops.losses import in_batch_negative_loss, nway_ce_loss
from .flmr_executor import FLMRExecutor


class TriplesExecutor(FLMRExecutor):
    """Use with FLMRModelConfig(query_mode='text_only'). Batches from
    Triples.batches(); distillation weight via train_cfg-less attribute."""

    distill_weight: float = 0.0

    def __init__(self, *args, distill_weight: float = 0.0,
                 query_tokenizer=None, doc_tokenizer=None, **kwargs):
        super().__init__(*args, **kwargs)
        self.distill_weight = distill_weight
        self.qt = query_tokenizer
        self.dt = doc_tokenizer

    def make_batch(self, batch: dict) -> dict:
        qi, qm = self.qt.tensorize(batch["queries"])
        di, dm = self.dt.tensorize(batch["docs"])
        out = {"query_input_ids": jnp.asarray(qi),
               "query_attention_mask": jnp.asarray(qm),
               "doc_input_ids": jnp.asarray(di),
               "doc_attention_mask": jnp.asarray(dm)}
        if batch.get("target_scores") is not None:
            out["target_scores"] = jnp.asarray(batch["target_scores"])
        return out

    def loss_fn(self, params, batch, rng):
        cfg = self.model.cfg
        q = self.model.apply({"params": params},
                             batch["query_input_ids"],
                             batch["query_attention_mask"],
                             method=FLMRRetriever.query)
        d, d_mask = self.model.apply({"params": params},
                                     batch["doc_input_ids"],
                                     batch["doc_attention_mask"],
                                     method=FLMRRetriever.doc)
        loss, scores = nway_ce_loss(q, d, d_mask, cfg.nway)
        metrics = {"nway_loss": loss}
        if cfg.use_ib_negatives:
            ib, _ = in_batch_negative_loss(q, d, d_mask, cfg.nway)
            loss = loss + ib
            metrics["ib_loss"] = ib
        if self.distill_weight > 0 and "target_scores" in batch:
            # KL(teacher || student) over the nway softmax (reference
            # distillation scorer)
            t = jax.nn.log_softmax(batch["target_scores"], -1)
            s = jax.nn.log_softmax(scores, -1)
            kl = jnp.mean(jnp.sum(jnp.exp(t) * (t - s), axis=-1))
            loss = loss + self.distill_weight * kl
            metrics["distill_kl"] = kl
        return loss, metrics

    def train_on_triples(self, triples, queries, collection, bsize: int,
                         steps: int, **fit_kwargs):
        batches = (self.make_batch(b) for b in triples.batches(
            queries, collection, bsize=bsize, nway=self.model.cfg.nway))
        return self.fit(batches, steps=steps, **fit_kwargs)
