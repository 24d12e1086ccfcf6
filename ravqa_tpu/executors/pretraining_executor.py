"""WIT vision-pretraining executor (mapping-network pretraining).

Mirrors FLMRVisionPretrainingExecutor (/root/reference/src/executors/
FLMR_vision_pretraining_executor.py): the query is vision-only (mapping
network output, no text tokens — FLMR.py:143-156); evaluation computes
ground-truth Recall@K against pos_item_ids; typically trained with
freeze_colbert_doc_encoder so only the mapping network learns.
"""

from __future__ import annotations

from typing import Iterable

import jax.numpy as jnp
import numpy as np

from ..models.flmr import FLMRRetriever
from .flmr_executor import FLMRExecutor


class FLMRVisionPretrainingExecutor(FLMRExecutor):
    """Use with FLMRModelConfig(query_mode='vision_only')."""

    def encode_queries(self, batches: Iterable[dict]) -> np.ndarray:
        out = []
        for b in batches:
            q = self._encode_query(self.state.params, None, None,
                                   jnp.asarray(b["image_features"]))
            out.append(np.asarray(q, np.float32))
        return np.concatenate(out, axis=0)

    def _encode_query_impl(self, params, input_ids, attention_mask,
                           image_features):
        return self.model.apply({"params": params},
                                image_features=image_features,
                                method=FLMRRetriever.query)

    def loss_fn(self, params, batch, rng):
        out = self.model.apply({"params": params},
                               image_features=batch["image_features"],
                               doc_input_ids=batch["doc_input_ids"],
                               doc_attention_mask=batch[
                                   "doc_attention_mask"],
                               deterministic=True)
        return out["loss"], {"nway_loss": out["loss"] - out["ib_loss"],
                             "ib_loss": out["ib_loss"]}
