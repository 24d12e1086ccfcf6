"""BLIP-2 (vision encoder + Q-Former + T5) — the RAVQA-v2 generator.

Clean-room Flax implementation matching the HF Blip2ForConditionalGeneration
(T5 language tower) semantics used by the reference
(/root/reference/src/models/rag/rag_model_blip.py:242-254):

- Blip2VisionModel: CLIP-style pre-LN ViT with a fused qkv projection whose
  bias has a zeroed K slice (qkv_bias trick), no embedding pre-layernorm,
  final post_layernorm;
- Q-Former: BERT-style post-LN layers over `num_query_tokens` learned
  queries, cross-attending to frozen image features every
  `cross_attention_frequency` layers (query-only path — BLIP-2 does not feed
  text to the Q-Former);
- language_projection to the T5 d_model; projected query tokens are
  prepended to the text token embeddings for the T5 encoder.

Weight conversion from HF checkpoints in convert_hf_blip2_params (parity
tested against transformers).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from .t5 import T5Config, T5Model
from .transformer import attention_bias_from_mask


@dataclasses.dataclass(frozen=True)
class Blip2VisionConfig:
    image_size: int = 224
    patch_size: int = 14
    hidden_size: int = 1408           # EVA ViT-g
    num_layers: int = 39
    num_heads: int = 16
    intermediate_size: int = 6144
    layer_norm_eps: float = 1e-6
    qkv_bias: bool = True
    dtype: Any = jnp.float32

    @property
    def num_patches(self) -> int:
        return (self.image_size // self.patch_size) ** 2

    @staticmethod
    def tiny(**kw):
        base = dict(image_size=32, patch_size=8, hidden_size=32,
                    num_layers=2, num_heads=4, intermediate_size=64)
        base.update(kw)
        return Blip2VisionConfig(**base)


@dataclasses.dataclass(frozen=True)
class QFormerConfig:
    hidden_size: int = 768
    num_layers: int = 12
    num_heads: int = 12
    intermediate_size: int = 3072
    encoder_hidden_size: int = 1408    # vision hidden
    cross_attention_frequency: int = 2
    layer_norm_eps: float = 1e-12
    dtype: Any = jnp.float32

    @staticmethod
    def tiny(**kw):
        base = dict(hidden_size=32, num_layers=2, num_heads=4,
                    intermediate_size=64, encoder_hidden_size=32)
        base.update(kw)
        return QFormerConfig(**base)


@dataclasses.dataclass(frozen=True)
class Blip2Config:
    vision: Blip2VisionConfig = dataclasses.field(
        default_factory=Blip2VisionConfig)
    qformer: QFormerConfig = dataclasses.field(default_factory=QFormerConfig)
    t5: T5Config = dataclasses.field(default_factory=T5Config.flan_t5_xl)
    num_query_tokens: int = 32

    @staticmethod
    def tiny(**kw):
        base = dict(vision=Blip2VisionConfig.tiny(),
                    qformer=QFormerConfig.tiny(),
                    t5=T5Config.tiny(), num_query_tokens=4)
        base.update(kw)
        return Blip2Config(**base)


class Blip2VisionLayer(nn.Module):
    cfg: Blip2VisionConfig

    @nn.compact
    def __call__(self, x):
        cfg = self.cfg
        h = nn.LayerNorm(epsilon=cfg.layer_norm_eps, dtype=jnp.float32,
                         name="ln1")(x).astype(cfg.dtype)
        qkv = nn.Dense(3 * cfg.hidden_size, use_bias=cfg.qkv_bias,
                       dtype=cfg.dtype, name="qkv")(h)
        b, t, _ = qkv.shape
        hd = cfg.hidden_size // cfg.num_heads
        qkv = qkv.reshape(b, t, 3, cfg.num_heads, hd)
        q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]
        logits = jnp.einsum("bqhd,bkhd->bhqk", q * (hd ** -0.5), k,
                            preferred_element_type=jnp.float32)
        probs = jax.nn.softmax(logits, -1).astype(cfg.dtype)
        ctx = jnp.einsum("bhqk,bkhd->bqhd", probs, v).reshape(
            b, t, cfg.hidden_size)
        h = nn.Dense(cfg.hidden_size, dtype=cfg.dtype, name="projection")(ctx)
        x = x + h
        h = nn.LayerNorm(epsilon=cfg.layer_norm_eps, dtype=jnp.float32,
                         name="ln2")(x).astype(cfg.dtype)
        h = nn.Dense(cfg.intermediate_size, dtype=cfg.dtype, name="fc1")(h)
        h = nn.gelu(h, approximate=False)
        h = nn.Dense(cfg.hidden_size, dtype=cfg.dtype, name="fc2")(h)
        return x + h


class Blip2VisionModel(nn.Module):
    cfg: Blip2VisionConfig

    @nn.compact
    def __call__(self, pixel_values):
        """pixel_values (B, H, W, 3) -> (B, P+1, hidden) post-layernormed."""
        cfg = self.cfg
        b = pixel_values.shape[0]
        x = nn.Conv(cfg.hidden_size, (cfg.patch_size, cfg.patch_size),
                    strides=(cfg.patch_size, cfg.patch_size), use_bias=True,
                    dtype=cfg.dtype, name="patch_embedding")(
            pixel_values.astype(cfg.dtype))
        x = x.reshape(b, -1, cfg.hidden_size)
        cls = self.param("class_embedding", nn.initializers.normal(0.02),
                         (cfg.hidden_size,))
        x = jnp.concatenate(
            [jnp.broadcast_to(cls.astype(cfg.dtype),
                              (b, 1, cfg.hidden_size)), x], axis=1)
        pos = self.param("position_embedding", nn.initializers.normal(0.02),
                         (cfg.num_patches + 1, cfg.hidden_size))
        x = x + pos.astype(cfg.dtype)[None]
        for i in range(cfg.num_layers):
            x = Blip2VisionLayer(cfg, name=f"layer_{i}")(x)
        return nn.LayerNorm(epsilon=cfg.layer_norm_eps, dtype=jnp.float32,
                            name="post_layernorm")(x).astype(cfg.dtype)


class QFormerAttention(nn.Module):
    cfg: QFormerConfig
    is_cross: bool = False

    @nn.compact
    def __call__(self, x, kv=None, bias=None):
        cfg = self.cfg
        hd = cfg.hidden_size // cfg.num_heads
        src = x if kv is None else kv
        q = nn.Dense(cfg.hidden_size, dtype=cfg.dtype, name="query")(x)
        k = nn.Dense(cfg.hidden_size, dtype=cfg.dtype, name="key")(src)
        v = nn.Dense(cfg.hidden_size, dtype=cfg.dtype, name="value")(src)
        b, tq, _ = q.shape
        tk = k.shape[1]
        q = q.reshape(b, tq, cfg.num_heads, hd)
        k = k.reshape(b, tk, cfg.num_heads, hd)
        v = v.reshape(b, tk, cfg.num_heads, hd)
        logits = jnp.einsum("bqhd,bkhd->bhqk", q * (hd ** -0.5), k,
                            preferred_element_type=jnp.float32)
        if bias is not None:
            logits = logits + bias
        probs = jax.nn.softmax(logits, -1).astype(cfg.dtype)
        ctx = jnp.einsum("bhqk,bkhd->bqhd", probs, v).reshape(
            b, tq, cfg.hidden_size)
        # BERT-style output block: dense -> residual LN outside
        return nn.Dense(cfg.hidden_size, dtype=cfg.dtype, name="output")(ctx)


class QFormerLayer(nn.Module):
    cfg: QFormerConfig
    has_cross: bool = False

    @nn.compact
    def __call__(self, x, image_embeds=None, image_bias=None):
        cfg = self.cfg
        ln = lambda name: nn.LayerNorm(epsilon=cfg.layer_norm_eps,
                                       dtype=jnp.float32, name=name)
        h = QFormerAttention(cfg, name="attention")(x)
        x = ln("attention_ln")(x + h).astype(cfg.dtype)
        if self.has_cross:
            h = QFormerAttention(cfg, is_cross=True, name="crossattention")(
                x, kv=image_embeds, bias=image_bias)
            x = ln("crossattention_ln")(x + h).astype(cfg.dtype)
        h = nn.Dense(cfg.intermediate_size, dtype=cfg.dtype,
                     name="intermediate_query")(x)
        h = nn.gelu(h, approximate=False)
        h = nn.Dense(cfg.hidden_size, dtype=cfg.dtype,
                     name="output_query")(h)
        return ln("output_ln")(x + h).astype(cfg.dtype)


class QFormer(nn.Module):
    cfg: QFormerConfig

    @nn.compact
    def __call__(self, query_embeds, image_embeds, image_mask=None):
        cfg = self.cfg
        x = nn.LayerNorm(epsilon=cfg.layer_norm_eps, dtype=jnp.float32,
                         name="layernorm")(query_embeds).astype(cfg.dtype)
        bias = attention_bias_from_mask(image_mask) \
            if image_mask is not None else None
        for i in range(cfg.num_layers):
            x = QFormerLayer(cfg,
                             has_cross=(i % cfg.cross_attention_frequency
                                        == 0),
                             name=f"layer_{i}")(x, image_embeds, bias)
        return x


class Blip2T5(nn.Module):
    cfg: Blip2Config

    def setup(self):
        cfg = self.cfg
        self.vision_model = Blip2VisionModel(cfg.vision, name="vision_model")
        self.qformer = QFormer(cfg.qformer, name="qformer")
        self.query_tokens = self.param(
            "query_tokens", nn.initializers.normal(0.02),
            (cfg.num_query_tokens, cfg.qformer.hidden_size))
        self.language_projection = nn.Dense(
            cfg.t5.d_model, dtype=cfg.t5.dtype, name="language_projection")
        self.language_model = T5Model(cfg.t5, name="language_model")

    def encode_image(self, pixel_values):
        """pixel -> projected language tokens (B, n_query, d_model)."""
        img = self.vision_model(pixel_values)
        b = img.shape[0]
        q = jnp.broadcast_to(self.query_tokens[None],
                             (b,) + self.query_tokens.shape)
        q = self.qformer(q, img)
        return self.language_projection(q)

    def encode(self, pixel_values, input_ids, attention_mask):
        """Returns (encoder_hidden, full_mask) with vision tokens prepended."""
        vis = self.encode_image(pixel_values)
        txt = self.language_model.shared(input_ids)
        embeds = jnp.concatenate([vis, txt], axis=1)
        mask = jnp.concatenate(
            [jnp.ones(vis.shape[:2], attention_mask.dtype), attention_mask],
            axis=1)
        enc = self.language_model.encode(attention_mask=mask,
                                         inputs_embeds=embeds)
        return enc, mask

    def __call__(self, pixel_values, input_ids, attention_mask,
                 decoder_input_ids):
        enc, mask = self.encode(pixel_values, input_ids, attention_mask)
        return self.language_model.decode(decoder_input_ids, enc, mask)

    # decoding helpers (mirror T5Model's API for generation.py)
    def init_cache(self, batch: int, max_len: int):
        return self.language_model.init_cache(batch, max_len)

    def decode_step(self, token_ids, enc, enc_mask, caches):
        return self.language_model.decode_step(token_ids, enc, enc_mask,
                                               caches)


# ---------------------------------------------------------------------------
# HF conversion
# ---------------------------------------------------------------------------

def convert_hf_blip2_params(state_dict: dict, cfg: Blip2Config) -> dict:
    from .t5 import convert_hf_t5_params

    def g(name):
        t = state_dict[name]
        return np.asarray(getattr(t, "detach", lambda: t)()).astype(
            np.float32)

    v = cfg.vision
    vision: dict = {
        "patch_embedding": {
            "kernel": g("vision_model.embeddings.patch_embedding.weight")
            .transpose(2, 3, 1, 0),
            "bias": g("vision_model.embeddings.patch_embedding.bias")},
        "class_embedding":
            g("vision_model.embeddings.class_embedding").reshape(-1),
        "position_embedding":
            g("vision_model.embeddings.position_embedding").reshape(
                -1, v.hidden_size),
        "post_layernorm": {"scale": g("vision_model.post_layernorm.weight"),
                           "bias": g("vision_model.post_layernorm.bias")},
    }
    for i in range(v.num_layers):
        pre = f"vision_model.encoder.layers.{i}."
        layer = {
            "ln1": {"scale": g(pre + "layer_norm1.weight"),
                    "bias": g(pre + "layer_norm1.bias")},
            "qkv": {"kernel": g(pre + "self_attn.qkv.weight").T},
            "projection": {
                "kernel": g(pre + "self_attn.projection.weight").T,
                "bias": g(pre + "self_attn.projection.bias")},
            "ln2": {"scale": g(pre + "layer_norm2.weight"),
                    "bias": g(pre + "layer_norm2.bias")},
            "fc1": {"kernel": g(pre + "mlp.fc1.weight").T,
                    "bias": g(pre + "mlp.fc1.bias")},
            "fc2": {"kernel": g(pre + "mlp.fc2.weight").T,
                    "bias": g(pre + "mlp.fc2.bias")},
        }
        if v.qkv_bias:
            layer["qkv"]["bias"] = g(pre + "self_attn.qkv.bias")
        vision[f"layer_{i}"] = layer

    qc = cfg.qformer
    qformer: dict = {
        "layernorm": {"scale": g("qformer.layernorm.weight"),
                      "bias": g("qformer.layernorm.bias")},
    }
    for i in range(qc.num_layers):
        pre = f"qformer.encoder.layer.{i}."
        def lin(name):
            return {"kernel": g(pre + name + ".weight").T,
                    "bias": g(pre + name + ".bias")}
        layer = {
            "attention": {
                "query": lin("attention.attention.query"),
                "key": lin("attention.attention.key"),
                "value": lin("attention.attention.value"),
                "output": lin("attention.output.dense"),
            },
            "attention_ln": {
                "scale": g(pre + "attention.output.LayerNorm.weight"),
                "bias": g(pre + "attention.output.LayerNorm.bias")},
            "intermediate_query": lin("intermediate_query.dense"),
            "output_query": lin("output_query.dense"),
            "output_ln": {
                "scale": g(pre + "output_query.LayerNorm.weight"),
                "bias": g(pre + "output_query.LayerNorm.bias")},
        }
        if i % qc.cross_attention_frequency == 0:
            layer["crossattention"] = {
                "query": lin("crossattention.attention.query"),
                "key": lin("crossattention.attention.key"),
                "value": lin("crossattention.attention.value"),
                "output": lin("crossattention.output.dense"),
            }
            layer["crossattention_ln"] = {
                "scale": g(pre + "crossattention.output.LayerNorm.weight"),
                "bias": g(pre + "crossattention.output.LayerNorm.bias")}
        qformer[f"layer_{i}"] = layer

    lm_sd = {k[len("language_model."):]: v for k, v in state_dict.items()
             if k.startswith("language_model.")}
    return {
        "vision_model": vision,
        "qformer": qformer,
        "query_tokens": g("query_tokens").reshape(
            cfg.num_query_tokens, qc.hidden_size),
        "language_projection": {"kernel": g("language_projection.weight").T,
                                "bias": g("language_projection.bias")},
        "language_model": convert_hf_t5_params(lm_sd, cfg.t5),
    }
