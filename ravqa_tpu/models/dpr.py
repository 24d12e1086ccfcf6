"""DPR dual-encoder retrieval baseline (Flax).

Reference: /root/reference/src/models/retriever/retriever_dpr.py — question
and item encoders with pooled-output dot-product scoring and in-batch-negative
cross-entropy; cross-device negatives via all_gather (there: torch dist,
here: jax.lax.all_gather over the mesh data axis, see ravqa_tpu.parallel).
"""

from __future__ import annotations

import dataclasses

import flax.linen as nn
import jax.numpy as jnp

from ..ops.losses import dpr_in_batch_loss
from .bert import BertConfig, BertModel


@dataclasses.dataclass(frozen=True)
class DPRModelConfig:
    bert: BertConfig = dataclasses.field(default_factory=BertConfig)
    nway: int = 2  # 1 positive + (nway-1) sampled negatives per query

    @staticmethod
    def tiny(**kw) -> "DPRModelConfig":
        base = dict(bert=BertConfig.tiny())
        base.update(kw)
        return DPRModelConfig(**base)


class DPRRetriever(nn.Module):
    cfg: DPRModelConfig

    def setup(self):
        self.query_encoder = BertModel(self.cfg.bert, name="query_encoder")
        self.item_encoder = BertModel(self.cfg.bert, name="item_encoder")

    def encode_query(self, input_ids, attention_mask, deterministic=True):
        _, pooled = self.query_encoder(input_ids, attention_mask,
                                       deterministic=deterministic)
        return pooled

    def encode_item(self, input_ids, attention_mask, deterministic=True):
        _, pooled = self.item_encoder(input_ids, attention_mask,
                                      deterministic=deterministic)
        return pooled

    def __call__(self, query_input_ids, query_attention_mask,
                 item_input_ids, item_attention_mask, deterministic=True):
        """item rows grouped per query; positive at i*nway."""
        q = self.encode_query(query_input_ids, query_attention_mask,
                              deterministic)
        d = self.encode_item(item_input_ids, item_attention_mask,
                             deterministic)
        loss, scores = dpr_in_batch_loss(q.astype(jnp.float32),
                                         d.astype(jnp.float32), self.cfg.nway)
        return {"loss": loss, "scores": scores, "query_emb": q,
                "item_emb": d}
