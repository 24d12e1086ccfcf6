"""FLMR — Fine-grained Late-interaction Multi-modal Retriever (Flax).

Capabilities match the reference model family
(/root/reference/src/models/retriever/FLMR.py):

- `FLMR` (text+vision query): query = BERT token embeddings -> bias-free
  Linear(hidden, 128) -> zero out pad rows -> concat mapping-network vision
  tokens -> L2 normalize over the feature dim (FLMR.py:73-99).
- `FLMRForPretraining` (vision-only query, FLMR.py:104-156): query_mode
  "vision_only".
- `FLMRWithVisionModel`/`FLMRForPretrainingWithVisionModel` (in-graph ViT,
  FLMR.py:160-292): pass pixel_values and set `in_graph_vision=True`.
- doc() = BERT -> linear -> pad+punctuation-skiplist masking -> L2 normalize
  (third_party/ColBERT/colbert/modeling/colbert.py:194-215).
- forward() = nway MaxSim scores (+ optional in-batch-negative CE,
  colbert.py:64-113).
- `separate_question_encoder` module flag: independent BERT tower for queries
  (reference checkpoint surgery at src/executors/FLMR_executor.py:232-288).

Freezing flags (freeze_colbert_doc_encoder / freeze_mapping_network /
freeze_question_encoder / freeze_image_encoder) are honored at the optimizer
level — see ravqa_tpu.executors.partitioning.trainable_mask.
"""

from __future__ import annotations

import dataclasses
import string
from typing import Any, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..ops.losses import in_batch_negative_loss, nway_ce_loss
from .bert import BertConfig, BertModel
from .mapping import TransformerMapping, VisionMapping
from .vit import CLIPVisionModel, ViTConfig


@dataclasses.dataclass(frozen=True)
class FLMRModelConfig:
    bert: BertConfig = dataclasses.field(default_factory=BertConfig)
    dim: int = 128
    vision_dim: int = 768               # CLIP CLS embedding size
    prefix_len: int = 32                # mapping_network_prefix_length
    nway: int = 2
    use_ib_negatives: bool = True
    separate_question_encoder: bool = False
    query_mode: str = "text+vision"     # | "vision_only" | "text_only"
    in_graph_vision: bool = False       # encode pixel_values with own ViT
    vit: Optional[ViTConfig] = None
    mask_punctuation: bool = True
    pad_token_id: int = 0
    interaction: str = "colbert"        # | "flipr" (PreFLMR)
    flipr_query_part_len: int = 0       # text-token count (question part)
    flipr_k1: int = 0                   # top-k1 over the question part
    flipr_k2: int = 0                   # top-k2 over the context part
    multimodal_docs: bool = False       # doc = text ∥ projected vision
    doc_prefix_len: int = 8             # vision tokens per doc image
    # PreFLMR transformer mapping network (companion FLMR repo; one extra
    # text-conditioned late-interaction token per vision patch)
    use_transformer_mapping: bool = False
    transformer_mapping_num_layers: int = 1
    transformer_mapping_hidden: int = 768
    transformer_mapping_num_heads: int = 12
    vision_patch_dim: Optional[int] = None  # patch-feature dim (def: vision_dim)
    # in-batch-negative loss memory/throughput knobs (ops.losses):
    # ib_block_n > 0 scores the (B x B*nway) pair grid in doc blocks with
    # per-block remat (bounds the token-score intermediate + residuals);
    # ib_score_bf16 runs the scoring dot in bf16 (MXU-native; the
    # reference scores docs in fp16 on GPU, colbert.py:204)
    ib_block_n: int = 0
    ib_score_bf16: bool = False

    @staticmethod
    def tiny(**kw) -> "FLMRModelConfig":
        base = dict(bert=BertConfig.tiny(), dim=16, vision_dim=24,
                    prefix_len=4)
        base.update(kw)
        return FLMRModelConfig(**base)


def l2_normalize(x, axis=-1, eps=1e-12):
    """torch.nn.functional.normalize semantics: zero rows stay zero.

    Guarded so zero rows (masked query/doc pads) get exactly zero gradient —
    a bare norm() has NaN grad at 0 and poisons training.
    """
    sq = jnp.sum(x * x, axis=axis, keepdims=True)
    is_zero = sq < eps
    out = x * jax.lax.rsqrt(jnp.where(is_zero, 1.0, sq))
    return jnp.where(is_zero, jnp.zeros_like(out), out)


def punctuation_skiplist_ids(tokenizer) -> list[int]:
    """Token ids of punctuation symbols (ColBERT skiplist, colbert.py:38-41)."""
    ids = set()
    for symbol in string.punctuation:
        enc = tokenizer.encode(symbol, add_special_tokens=False)
        if enc:
            ids.add(enc[0])
    return sorted(ids)


def skiplist_mask(input_ids: jnp.ndarray, skip_ids,
                  pad_token_id: int = 0) -> jnp.ndarray:
    """(B, T) -> float mask zeroing pads and skiplisted (punctuation) tokens.

    Matches ColBERT.mask (colbert.py:225-227): token kept iff not in skiplist
    and != pad.
    """
    keep = input_ids != pad_token_id
    if skip_ids is not None and len(skip_ids) > 0:
        skip = jnp.asarray(list(skip_ids), dtype=input_ids.dtype)
        keep &= ~jnp.any(input_ids[..., None] == skip[None, None, :], axis=-1)
    return keep.astype(jnp.float32)


class FLMRRetriever(nn.Module):
    cfg: FLMRModelConfig

    def setup(self):
        cfg = self.cfg
        self.doc_bert = BertModel(cfg.bert, name="doc_encoder")
        if cfg.separate_question_encoder:
            self.query_bert = BertModel(cfg.bert, name="query_encoder")
        else:
            self.query_bert = self.doc_bert
        self.linear = nn.Dense(cfg.dim, use_bias=False,
                               dtype=cfg.bert.dtype, name="linear")
        if cfg.query_mode != "text_only":
            self.vision_mapping = VisionMapping(
                vision_dim=cfg.vision_dim, lm_dim=cfg.dim,
                prefix_len=cfg.prefix_len, dtype=cfg.bert.dtype,
                name="vision_projection")
        if cfg.multimodal_docs:
            # doc-side mapping network (the reference's intended
            # doc_vision_projection.pt side file, base_colbert.py:49-58 /
            # colbert_utils.py multimodal-doc path)
            self.doc_vision_mapping = VisionMapping(
                vision_dim=cfg.vision_dim, lm_dim=cfg.dim,
                prefix_len=cfg.doc_prefix_len, dtype=cfg.bert.dtype,
                name="doc_vision_projection")
        if cfg.use_transformer_mapping:
            assert cfg.query_mode == "text+vision", \
                "transformer mapping cross-attends to text; needs text+vision"
            self.transformer_mapping = TransformerMapping(
                vision_dim=cfg.vision_patch_dim or cfg.vision_dim,
                hidden_size=cfg.transformer_mapping_hidden,
                lm_dim=cfg.dim,
                num_layers=cfg.transformer_mapping_num_layers,
                num_heads=cfg.transformer_mapping_num_heads,
                intermediate_size=cfg.transformer_mapping_hidden * 4,
                dtype=cfg.bert.dtype, param_dtype=cfg.bert.param_dtype,
                name="transformer_mapping")
        if cfg.in_graph_vision:
            assert cfg.vit is not None
            self.vision_model = CLIPVisionModel(cfg.vit, name="vision_model")

    def encode_images(self, pixel_values, deterministic=True):
        """(B, H, W, 3) or (B, n_roi, H, W, 3) -> (B[, n_roi], vision_dim)."""
        shape = pixel_values.shape
        if pixel_values.ndim == 5:
            flat = pixel_values.reshape((-1,) + shape[2:])
            _, cls = self.vision_model(flat, deterministic)
            return cls.reshape(shape[0], shape[1], -1)
        _, cls = self.vision_model(pixel_values, deterministic)
        return cls

    def query(self, input_ids=None, attention_mask=None, image_features=None,
              pixel_values=None, image_patch_features=None,
              deterministic=True):
        """Late-interaction query embeddings, L2-normalized.

        image_features: (B, vision_dim) or (B, n_roi, vision_dim) pre-extracted
        CLS features; or pass pixel_values with in_graph_vision=True.
        image_patch_features: (B, P, patch_dim) pre-extracted vision patch
        embeddings for the PreFLMR transformer mapping (the companion repo
        takes the ViT's second-to-last layer; with in_graph_vision and no
        explicit patches, the last layer's patch rows are used instead).
        Returns (B, Lq_total, dim); padded text rows are zero vectors.
        """
        cfg = self.cfg
        parts = []
        text_hidden = None
        if cfg.query_mode != "vision_only":
            text_hidden = self.query_bert(input_ids, attention_mask,
                                          deterministic=deterministic)[0]
            q = self.linear(text_hidden)
            # query masking uses empty skiplist: only pads zeroed (FLMR.py:80)
            mask = (input_ids != cfg.pad_token_id).astype(q.dtype)
            parts.append(q * mask[..., None])
        if cfg.query_mode != "text_only":
            if image_features is None:
                if (cfg.use_transformer_mapping
                        and image_patch_features is None
                        and pixel_values.ndim == 4):
                    last_hidden, image_features = self.vision_model(
                        pixel_values, deterministic)
                    image_patch_features = last_hidden[:, 1:]
                else:
                    image_features = self.encode_images(pixel_values,
                                                        deterministic)
            v = self.vision_mapping(image_features)
            # (B, prefix, dim) or (B, n_roi, prefix, dim) -> (B, n_v, dim)
            v = v.reshape(v.shape[0], -1, cfg.dim)
            parts.append(v)
            if cfg.use_transformer_mapping:
                t = self.transformer_mapping(
                    image_patch_features, text_hidden, attention_mask,
                    deterministic)
                parts.append(t.astype(v.dtype))
        q_all = jnp.concatenate(parts, axis=1) if len(parts) > 1 else parts[0]
        return l2_normalize(q_all.astype(jnp.float32), axis=-1)

    def doc(self, input_ids, attention_mask, skip_mask=None,
            doc_image_features=None, deterministic=True):
        """Doc token embeddings + validity mask.

        skip_mask: optional precomputed (B, Ld) skiplist mask (see
        skiplist_mask); when None only pads are zeroed.
        doc_image_features: (B, vision_dim) optional doc-side image features
        (multimodal_docs=True) — projected to doc_prefix_len extra tokens.
        Returns (D (B, Ld[+prefix], dim) L2-normalized, mask float).
        """
        cfg = self.cfg
        d = self.doc_bert(input_ids, attention_mask,
                          deterministic=deterministic)[0]
        d = self.linear(d)
        if skip_mask is None:
            skip_mask = (input_ids != cfg.pad_token_id).astype(jnp.float32)
        d = d * skip_mask[..., None].astype(d.dtype)
        if cfg.multimodal_docs and doc_image_features is not None:
            v = self.doc_vision_mapping(doc_image_features)
            v = v.reshape(v.shape[0], -1, cfg.dim)
            d = jnp.concatenate([d, v.astype(d.dtype)], axis=1)
            skip_mask = jnp.concatenate(
                [skip_mask, jnp.ones(v.shape[:2], skip_mask.dtype)], axis=1)
        return l2_normalize(d.astype(jnp.float32), axis=-1), skip_mask

    def __call__(self, query_input_ids=None, query_attention_mask=None,
                 image_features=None, pixel_values=None,
                 doc_input_ids=None, doc_attention_mask=None,
                 doc_skip_mask=None, doc_image_features=None,
                 image_patch_features=None, deterministic=True):
        """Training forward: nway scores + losses.

        doc_* are grouped per query: row i*nway is query i's positive
        (reference colbert.py:64-113).
        Returns dict(scores (B, nway), loss, ib_loss).
        """
        cfg = self.cfg
        q = self.query(query_input_ids, query_attention_mask, image_features,
                       pixel_values, image_patch_features, deterministic)
        d, d_mask = self.doc(doc_input_ids, doc_attention_mask, doc_skip_mask,
                             doc_image_features, deterministic)
        nway_loss, scores = nway_ce_loss(
            q, d, d_mask, cfg.nway, interaction=cfg.interaction,
            flipr_query_part_len=cfg.flipr_query_part_len,
            flipr_k1=cfg.flipr_k1, flipr_k2=cfg.flipr_k2)
        out = {"scores": scores, "loss": nway_loss,
               "ib_loss": jnp.zeros(())}
        if cfg.use_ib_negatives:
            ib, _ = in_batch_negative_loss(
                q, d, d_mask, cfg.nway, block_n=cfg.ib_block_n,
                compute_dtype=jnp.bfloat16 if cfg.ib_score_bf16 else None)
            out["ib_loss"] = ib
            out["loss"] = nway_loss + ib
        return out
