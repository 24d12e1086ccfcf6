"""The FLMR vision->late-interaction mapping networks.

Reference: /root/reference/src/models/retriever/FLMR.py:20-31,44-50 — an MLP
(vision_dim -> (lm_dim*prefix)/2 -> lm_dim*prefix) with Tanh between layers,
whose output reshapes to `prefix_length` extra 128-d query tokens per image
(or per ROI).

`TransformerMapping` is the PreFLMR (ACL 2024) upgrade from the companion
FLMR repo (not vendored in /root/reference; the paper's "transformer mapping
network"): vision PATCH embeddings pass through an input linear, a small
BERT-style decoder stack that cross-attends to the text encoder's hidden
states, and an output linear into the 128-d late-interaction space —
producing one extra query token per patch, text-conditioned.
"""

from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax.numpy as jnp

from .transformer import (EncoderConfig, MlpBlock, MultiHeadAttention,
                          attention_bias_from_mask)


class MappingMLP(nn.Module):
    """Tanh-MLP: sizes[0] -> ... -> sizes[-1]; Tanh after all but last."""
    sizes: Sequence[int]
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = x.astype(self.dtype)
        n = len(self.sizes) - 1
        for i in range(n):
            x = nn.Dense(self.sizes[i + 1], dtype=self.dtype,
                         name=f"dense_{i}")(x)
            if i < n - 1:
                x = nn.tanh(x)
        return x


class VisionMapping(nn.Module):
    """vision features (..., vision_dim) -> (..., prefix_len, lm_dim) tokens."""
    vision_dim: int
    lm_dim: int = 128
    prefix_len: int = 32
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, image_features):
        out_dim = self.lm_dim * self.prefix_len
        mlp = MappingMLP((self.vision_dim, out_dim // 2, out_dim),
                         dtype=self.dtype, name="mlp")
        h = mlp(image_features)
        return h.reshape(h.shape[:-1] + (self.prefix_len, self.lm_dim))


class TransformerMappingLayer(nn.Module):
    """Post-LN BERT-decoder-style layer: self-attn over the vision tokens,
    cross-attn to the text encoder hidden states, FFN."""
    cfg: EncoderConfig

    @nn.compact
    def __call__(self, x, text_hidden, text_bias, deterministic=True):
        cfg = self.cfg
        ln = lambda name: nn.LayerNorm(epsilon=cfg.layer_norm_eps,
                                       dtype=jnp.float32, name=name)
        h = MultiHeadAttention(cfg, name="attention")(
            x, None, deterministic)
        x = ln("ln_self")(x + h).astype(cfg.dtype)
        h = MultiHeadAttention(cfg, name="cross_attention")(
            x, text_bias, deterministic, kv=text_hidden)
        x = ln("ln_cross")(x + h).astype(cfg.dtype)
        h = MlpBlock(cfg, name="mlp")(x, deterministic)
        x = ln("ln_out")(x + h).astype(cfg.dtype)
        return x


class TransformerMapping(nn.Module):
    """PreFLMR transformer mapping network.

    patch_features (B, P, vision_dim) + text_hidden (B, Lt, text_hidden_dim)
    + text_mask (B, Lt) -> (B, P, lm_dim) late-interaction vision tokens.
    Input/output linears bracket a small cross-attending transformer (the
    companion repo instantiates a 1-layer bert-base decoder with
    add_cross_attention=True; text pads are masked out of cross-attention).
    """
    vision_dim: int
    hidden_size: int = 768
    lm_dim: int = 128
    num_layers: int = 1
    num_heads: int = 12
    intermediate_size: int = 3072
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, patch_features, text_hidden, text_mask,
                 deterministic=True):
        cfg = EncoderConfig(hidden_size=self.hidden_size,
                            num_layers=self.num_layers,
                            num_heads=self.num_heads,
                            intermediate_size=self.intermediate_size,
                            dtype=self.dtype, param_dtype=self.param_dtype)
        x = nn.Dense(self.hidden_size, dtype=self.dtype,
                     param_dtype=self.param_dtype,
                     name="input_linear")(patch_features.astype(self.dtype))
        text_bias = attention_bias_from_mask(text_mask)
        for i in range(self.num_layers):
            x = TransformerMappingLayer(cfg, name=f"layer_{i}")(
                x, text_hidden, text_bias, deterministic)
        return nn.Dense(self.lm_dim, dtype=self.dtype,
                        param_dtype=self.param_dtype,
                        name="output_linear")(x)
