"""Shared Flax transformer-encoder building blocks.

Used by the BERT text encoder (post-LayerNorm, learned positions) and the
CLIP/ViT vision encoders (pre-LayerNorm, patch embeddings). Written for TPU:
bf16-friendly compute dtype with f32 LayerNorm/softmax accumulation, static
shapes, no data-dependent control flow.
"""

from __future__ import annotations

import dataclasses
from typing import Callable, Optional

import flax.linen as nn
import jax.numpy as jnp
import jax


def quick_gelu(x):
    """CLIP's gelu variant: x * sigmoid(1.702 x)."""
    return x * jax.nn.sigmoid(1.702 * x)


ACTIVATIONS: dict[str, Callable] = {
    # HF "gelu" is the exact erf form; "gelu_new" is the tanh approximation
    "gelu": lambda x: nn.gelu(x, approximate=False),
    "gelu_new": nn.gelu,
    "quick_gelu": quick_gelu,
    "relu": nn.relu,
    "tanh": nn.tanh,
}


@dataclasses.dataclass(frozen=True)
class EncoderConfig:
    hidden_size: int = 768
    num_layers: int = 12
    num_heads: int = 12
    intermediate_size: int = 3072
    activation: str = "gelu"
    layer_norm_eps: float = 1e-12
    pre_layernorm: bool = False          # False: BERT post-LN; True: ViT/CLIP
    dropout_rate: float = 0.0
    dtype: jnp.dtype = jnp.float32       # compute dtype (bf16 on TPU)
    param_dtype: jnp.dtype = jnp.float32  # parameter storage dtype
    # rematerialize each layer on the backward pass (jax.checkpoint):
    # activation memory O(1) layers instead of O(num_layers) at ~1/3 extra
    # FLOPs — for training PreFLMR-scale towers (ViT-L/G in-graph) on a
    # single chip
    remat: bool = False


class MultiHeadAttention(nn.Module):
    cfg: EncoderConfig

    @nn.compact
    def __call__(self, x, attention_bias=None, deterministic=True, kv=None):
        """Self-attention over x, or cross-attention when `kv` (the
        key/value source sequence) is given."""
        cfg = self.cfg
        head_dim = cfg.hidden_size // cfg.num_heads
        dense = lambda name: nn.DenseGeneral(
            (cfg.num_heads, head_dim), axis=-1, dtype=cfg.dtype,
            param_dtype=cfg.param_dtype, name=name)
        kv_src = x if kv is None else kv.astype(cfg.dtype)
        q = dense("query")(x)
        k = dense("key")(kv_src)
        v = dense("value")(kv_src)
        scale = head_dim ** -0.5
        # (B, H, Tq, Tk), accumulate in f32 for stability.
        logits = jnp.einsum("bqhd,bkhd->bhqk", q * scale, k,
                            preferred_element_type=jnp.float32)
        if attention_bias is not None:
            logits = logits + attention_bias
        probs = jax.nn.softmax(logits, axis=-1).astype(cfg.dtype)
        if cfg.dropout_rate > 0:
            probs = nn.Dropout(cfg.dropout_rate)(probs,
                                                 deterministic=deterministic)
        ctx = jnp.einsum("bhqk,bkhd->bqhd", probs, v)
        out = nn.DenseGeneral(cfg.hidden_size, axis=(-2, -1), dtype=cfg.dtype,
                              param_dtype=cfg.param_dtype, name="out")(ctx)
        return out


class MlpBlock(nn.Module):
    cfg: EncoderConfig

    @nn.compact
    def __call__(self, x, deterministic=True):
        cfg = self.cfg
        act = ACTIVATIONS[cfg.activation]
        h = nn.Dense(cfg.intermediate_size, dtype=cfg.dtype,
                     param_dtype=cfg.param_dtype, name="fc1")(x)
        h = act(h)
        h = nn.Dense(cfg.hidden_size, dtype=cfg.dtype,
                     param_dtype=cfg.param_dtype, name="fc2")(h)
        if cfg.dropout_rate > 0:
            h = nn.Dropout(cfg.dropout_rate)(h, deterministic=deterministic)
        return h


class EncoderLayer(nn.Module):
    cfg: EncoderConfig

    @nn.compact
    def __call__(self, x, attention_bias=None, deterministic=True):
        cfg = self.cfg
        ln = lambda name: nn.LayerNorm(epsilon=cfg.layer_norm_eps,
                                       dtype=jnp.float32, name=name)
        if cfg.pre_layernorm:
            h = MultiHeadAttention(cfg, name="attention")(
                ln("ln1")(x).astype(cfg.dtype), attention_bias, deterministic)
            x = x + h
            h = MlpBlock(cfg, name="mlp")(
                ln("ln2")(x).astype(cfg.dtype), deterministic)
            x = x + h
        else:
            h = MultiHeadAttention(cfg, name="attention")(
                x, attention_bias, deterministic)
            x = ln("ln1")(x + h).astype(cfg.dtype)
            h = MlpBlock(cfg, name="mlp")(x, deterministic)
            x = ln("ln2")(x + h).astype(cfg.dtype)
        return x


class TransformerEncoder(nn.Module):
    cfg: EncoderConfig

    @nn.compact
    def __call__(self, x, attention_bias=None, deterministic=True):
        Layer = (nn.remat(EncoderLayer, static_argnums=(3,))
                 if self.cfg.remat else EncoderLayer)
        for i in range(self.cfg.num_layers):
            x = Layer(self.cfg, name=f"layer_{i}")(
                x, attention_bias, deterministic)
        return x


def attention_bias_from_mask(attention_mask: jnp.ndarray,
                             dtype=jnp.float32) -> jnp.ndarray:
    """(B, T) 1/0 mask -> (B, 1, 1, T) additive bias with -1e9 on pads."""
    bias = (1.0 - attention_mask.astype(jnp.float32)) * -1e9
    return bias[:, None, None, :].astype(dtype)
