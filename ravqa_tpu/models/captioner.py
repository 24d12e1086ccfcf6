"""Oscar-style image captioner in Flax: BERT over [caption | tags | regions].

TPU-native replacement for the reference's offline Oscar captioning run
(materials/Oscar/oscar/run_captioning.py driven per README.md:437-466,
producing the caption JSON LoadOscarCaptionFeatures consumes).  The
input contract is the reference CaptionTensorizer
(run_captioning.py:197-320):

- sequence layout [caption: max_seq_a_len] + [tags: max_seq_len -
  max_seq_a_len] + [regions: max_img_seq_len];
- attention: caption->caption lower-triangular; tags/regions fully
  bidirectional among themselves and to each other; caption sees
  everything; tags/regions do NOT see the caption (:300-316);
- segment ids: caption 0, tags 1 (:232-244); region features enter as a
  linear projection with no position/type embedding (Oscar
  BertImgModel), segment-free;
- generation: the current caption slot holds [MASK]; the model predicts
  it, the token is revealed, and the mask moves right (the masked-LM
  decode of BertForImageCaptioning) — realised here as a lax.scan with
  a fixed caption budget, one jit for the whole decode.

The LM head is the tied-embedding BERT MLM head (transform dense+gelu+LN,
decoder tied to word embeddings plus a free bias).
"""

from __future__ import annotations

import dataclasses
from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from .bert import BertConfig, convert_hf_bert_params
from .transformer import TransformerEncoder


@dataclasses.dataclass(frozen=True)
class CaptionerConfig:
    bert: BertConfig = BertConfig()
    img_feature_dim: int = 2054          # VinVL 2048 + 6 box geometry
    max_seq_a_len: int = 40              # caption budget incl [CLS]/[SEP]
    max_seq_len: int = 70                # caption + tags
    max_img_seq_len: int = 50
    use_img_layernorm: bool = False
    cls_token_id: int = 101
    sep_token_id: int = 102
    mask_token_id: int = 103
    pad_token_id: int = 0

    @property
    def total_len(self) -> int:
        return self.max_seq_len + self.max_img_seq_len

    @staticmethod
    def tiny(**kw) -> "CaptionerConfig":
        base = dict(bert=BertConfig.tiny(), img_feature_dim=20,
                    max_seq_a_len=8, max_seq_len=14, max_img_seq_len=6)
        base.update(kw)
        return CaptionerConfig(**base)


def caption_attention_mask(cfg: CaptionerConfig,
                           tag_mask: jnp.ndarray,
                           img_mask: jnp.ndarray) -> jnp.ndarray:
    """Build the (B, T, T) 0/1 seq2seq mask of CaptionTensorizer
    (run_captioning.py:300-316). tag_mask (B, tags) and img_mask
    (B, img) flag real (unpadded) tags/regions."""
    a, s, t = cfg.max_seq_a_len, cfg.max_seq_len, cfg.total_len
    b = tag_mask.shape[0]
    m = jnp.zeros((b, t, t), jnp.float32)
    tri = jnp.tril(jnp.ones((a, a), jnp.float32))
    m = m.at[:, :a, :a].set(tri[None])
    ctx = jnp.concatenate([tag_mask.astype(jnp.float32),
                           img_mask.astype(jnp.float32)], -1)   # (B, ctx)
    # caption rows see all real context; context rows see real context
    m = m.at[:, :a, a:].set(ctx[:, None, :])
    m = m.at[:, a:, a:].set(ctx[:, None, :] * ctx[:, :, None])
    return m


class OscarCaptioner(nn.Module):
    cfg: CaptionerConfig

    def setup(self):
        c = self.cfg.bert
        self.word_embeddings = nn.Embed(c.vocab_size, c.hidden_size,
                                        dtype=c.dtype,
                                        name="word_embeddings")
        self.position_embeddings = nn.Embed(c.max_position_embeddings,
                                            c.hidden_size, dtype=c.dtype,
                                            name="position_embeddings")
        self.token_type_embeddings = nn.Embed(c.type_vocab_size,
                                              c.hidden_size, dtype=c.dtype,
                                              name="token_type_embeddings")
        self.embeddings_ln = nn.LayerNorm(epsilon=c.layer_norm_eps,
                                          dtype=jnp.float32,
                                          name="embeddings_ln")
        self.img_embedding = nn.Dense(c.hidden_size, dtype=c.dtype,
                                      name="img_embedding")
        if self.cfg.use_img_layernorm:
            self.img_ln = nn.LayerNorm(epsilon=c.layer_norm_eps,
                                       dtype=jnp.float32, name="img_ln")
        self.encoder = TransformerEncoder(c.encoder_cfg, name="encoder")
        self.mlm_dense = nn.Dense(c.hidden_size, dtype=c.dtype,
                                  name="mlm_dense")
        self.mlm_ln = nn.LayerNorm(epsilon=c.layer_norm_eps,
                                   dtype=jnp.float32, name="mlm_ln")
        self.mlm_bias = self.param("mlm_bias", nn.initializers.zeros,
                                   (c.vocab_size,))

    def __call__(self, text_ids, segment_ids, img_feats, attn_mask,
                 deterministic=True):
        """text_ids/segment_ids (B, max_seq_len); img_feats
        (B, max_img_seq_len, img_feature_dim); attn_mask (B, T, T).
        Returns (B, T, vocab) logits over the full sequence."""
        c = self.cfg.bert
        b, s = text_ids.shape
        x = self.word_embeddings(text_ids)
        x = x + self.position_embeddings(jnp.arange(s)[None, :])
        x = x + self.token_type_embeddings(segment_ids)
        x = self.embeddings_ln(x).astype(c.dtype)
        img = self.img_embedding(img_feats.astype(c.dtype))
        if self.cfg.use_img_layernorm:
            img = self.img_ln(img).astype(c.dtype)
        h = jnp.concatenate([x, img], axis=1)
        bias = (1.0 - attn_mask.astype(jnp.float32))[:, None] * -1e9
        h = self.encoder(h, bias.astype(c.dtype), deterministic)
        y = nn.gelu(self.mlm_dense(h), approximate=False)
        y = self.mlm_ln(y).astype(c.dtype)
        logits = y @ self.word_embeddings.embedding.T.astype(c.dtype)
        return logits + self.mlm_bias


def greedy_caption(model: OscarCaptioner, params, tag_ids, tag_mask,
                   img_feats, img_mask) -> tuple[jax.Array, jax.Array]:
    """Masked-LM greedy decode. tag_ids/tag_mask (B, tags); img_feats
    (B, img, D); img_mask (B, img). Returns (token ids (B, max_seq_a_len)
    with [CLS] first and [PAD] after [SEP], lengths incl [CLS]/[SEP]).

    Jit-compatible: the whole decode is one lax.scan over the fixed
    caption budget; each step re-runs the forward with the current slot
    masked (the Oscar decode semantics — tokens right of the cursor are
    invisible through the triangular mask, so one compiled shape serves
    every step)."""
    cfg = model.cfg
    a = cfg.max_seq_a_len
    b = tag_ids.shape[0]
    attn = caption_attention_mask(cfg, tag_mask, img_mask)
    segs = jnp.concatenate([
        jnp.zeros((b, a), jnp.int32),
        jnp.ones((b, cfg.max_seq_len - a), jnp.int32)], -1)
    cap0 = jnp.full((b, a), cfg.mask_token_id, jnp.int32)
    cap0 = cap0.at[:, 0].set(cfg.cls_token_id)

    def step(carry, t):
        cap, done = carry
        text = jnp.concatenate([cap, tag_ids.astype(jnp.int32)], -1)
        logits = model.apply(params, text, segs, img_feats, attn)
        tok = jnp.argmax(logits[:, t].astype(jnp.float32), -1) \
            .astype(jnp.int32)
        # budget exhausted at the last slot: force the closing [SEP]
        tok = jnp.where(t == a - 1, cfg.sep_token_id, tok)
        tok = jnp.where(done, cfg.pad_token_id, tok)
        cap = cap.at[:, t].set(tok)
        return (cap, done | (tok == cfg.sep_token_id)), tok

    (cap, _), _ = jax.lax.scan(step, (cap0, jnp.zeros((b,), bool)),
                               jnp.arange(1, a))
    lengths = (cap != cfg.pad_token_id).sum(-1)
    return cap, lengths


def decode_captions(token_ids: np.ndarray, lengths: np.ndarray,
                    id_to_token) -> list[str]:
    """Token ids -> caption strings (wordpiece join, ## merge), skipping
    [CLS]/[SEP]."""
    out = []
    for row, n in zip(np.asarray(token_ids), np.asarray(lengths)):
        words: list[str] = []
        for tid in row[1:int(n)]:
            tok = id_to_token(int(tid))
            if tok in ("[SEP]", "[PAD]", "[CLS]"):
                continue
            if tok.startswith("##") and words:
                words[-1] += tok[2:]
            else:
                words.append(tok)
        out.append(" ".join(words))
    return out


def write_caption_predictions(path: str, captions: dict) -> None:
    """Write the {image_key: [caption, ...]} JSON that
    LoadOscarCaptionFeatures (transforms.py) and the reference
    (vqa_data_ops.py:108-129) consume."""
    import json
    with open(path, "w") as f:
        json.dump({k: v if isinstance(v, list) else [v]
                   for k, v in captions.items()}, f)


def convert_oscar_captioner_params(state_dict: dict,
                                   cfg: CaptionerConfig) -> dict:
    """Oscar BertForImageCaptioning torch state dict -> params.

    Reuses the BERT encoder conversion (bert.* names match HF BERT) and
    adds the Oscar extras: bert.img_embedding, cls.predictions.*
    (decoder weight is tied to word embeddings and therefore dropped).
    """
    base = convert_hf_bert_params(state_dict, cfg.bert, prefix="bert.")
    base.pop("pooler", None)      # captioning head never uses the pooler

    def g(name):
        t = state_dict[name]
        return np.asarray(
            getattr(t, "detach", lambda: t)()).astype(np.float32)

    base["img_embedding"] = {"kernel": g("bert.img_embedding.weight").T,
                             "bias": g("bert.img_embedding.bias")}
    if cfg.use_img_layernorm:
        base["img_ln"] = {"scale": g("bert.img_layer_norm.weight"),
                          "bias": g("bert.img_layer_norm.bias")}
    base["mlm_dense"] = {
        "kernel": g("cls.predictions.transform.dense.weight").T,
        "bias": g("cls.predictions.transform.dense.bias")}
    base["mlm_ln"] = {
        "scale": g("cls.predictions.transform.LayerNorm.weight"),
        "bias": g("cls.predictions.transform.LayerNorm.bias")}
    base["mlm_bias"] = g("cls.predictions.bias")
    return jax.tree.map(jnp.asarray, base)
