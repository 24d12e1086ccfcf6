"""BERT text encoder in Flax, with HF (torch) checkpoint conversion.

The late-interaction retriever's text backbone (reference:
/root/reference/third_party/ColBERT/colbert/modeling/hf_colbert.py — BERT +
bias-free Linear(hidden,128) head). This is a clean-room Flax implementation;
weights from HuggingFace `bert-base-uncased`-family torch checkpoints can be
imported via `convert_hf_bert_params`.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from .transformer import (EncoderConfig, TransformerEncoder,
                          attention_bias_from_mask)


@dataclasses.dataclass(frozen=True)
class BertConfig:
    vocab_size: int = 30522
    hidden_size: int = 768
    num_layers: int = 12
    num_heads: int = 12
    intermediate_size: int = 3072
    max_position_embeddings: int = 512
    type_vocab_size: int = 2
    layer_norm_eps: float = 1e-12
    dropout_rate: float = 0.0
    dtype: Any = jnp.float32
    param_dtype: Any = jnp.float32
    remat: bool = False                  # per-layer backward remat

    @property
    def encoder_cfg(self) -> EncoderConfig:
        return EncoderConfig(
            hidden_size=self.hidden_size,
            num_layers=self.num_layers,
            num_heads=self.num_heads,
            intermediate_size=self.intermediate_size,
            activation="gelu",
            layer_norm_eps=self.layer_norm_eps,
            pre_layernorm=False,
            dropout_rate=self.dropout_rate,
            dtype=self.dtype,
            param_dtype=self.param_dtype,
            remat=self.remat,
        )

    @staticmethod
    def tiny(**kw) -> "BertConfig":
        """A small config for tests."""
        base = dict(vocab_size=512, hidden_size=64, num_layers=2, num_heads=4,
                    intermediate_size=128, max_position_embeddings=128,
                    type_vocab_size=2)
        base.update(kw)
        return BertConfig(**base)


class BertModel(nn.Module):
    cfg: BertConfig

    @nn.compact
    def __call__(self, input_ids, attention_mask, token_type_ids=None,
                 deterministic=True):
        cfg = self.cfg
        b, t = input_ids.shape
        if token_type_ids is None:
            token_type_ids = jnp.zeros_like(input_ids)
        word = nn.Embed(cfg.vocab_size, cfg.hidden_size, dtype=cfg.dtype,
                        param_dtype=cfg.param_dtype,
                        name="word_embeddings")(input_ids)
        pos_ids = jnp.arange(t)[None, :]
        pos = nn.Embed(cfg.max_position_embeddings, cfg.hidden_size,
                       dtype=cfg.dtype, param_dtype=cfg.param_dtype,
                       name="position_embeddings")(pos_ids)
        typ = nn.Embed(cfg.type_vocab_size, cfg.hidden_size, dtype=cfg.dtype,
                       param_dtype=cfg.param_dtype,
                       name="token_type_embeddings")(token_type_ids)
        x = word + pos + typ
        x = nn.LayerNorm(epsilon=cfg.layer_norm_eps, dtype=jnp.float32,
                         name="embeddings_ln")(x).astype(cfg.dtype)
        bias = attention_bias_from_mask(attention_mask)
        x = TransformerEncoder(cfg.encoder_cfg, name="encoder")(
            x, bias, deterministic)
        pooled = nn.tanh(nn.Dense(cfg.hidden_size, dtype=cfg.dtype,
                                  param_dtype=cfg.param_dtype,
                                  name="pooler")(x[:, 0]))
        return x, pooled


# ---------------------------------------------------------------------------
# HF torch checkpoint conversion
# ---------------------------------------------------------------------------

def convert_hf_bert_params(state_dict: dict, cfg: BertConfig,
                           prefix: str = "bert.") -> dict:
    """Convert a HuggingFace BertModel torch state_dict to this module's
    params pytree. `state_dict` values may be torch tensors or numpy arrays.
    """
    def g(name):
        t = state_dict[prefix + name]
        return np.asarray(getattr(t, "detach", lambda: t)()).astype(np.float32)

    p: dict = {
        "word_embeddings": {"embedding": g("embeddings.word_embeddings.weight")},
        "position_embeddings": {"embedding": g("embeddings.position_embeddings.weight")},
        "token_type_embeddings": {"embedding": g("embeddings.token_type_embeddings.weight")},
        "embeddings_ln": {"scale": g("embeddings.LayerNorm.weight"),
                          "bias": g("embeddings.LayerNorm.bias")},
        "pooler": {"kernel": g("pooler.dense.weight").T,
                   "bias": g("pooler.dense.bias")},
        "encoder": {},
    }
    h, nh = cfg.hidden_size, cfg.num_heads
    hd = h // nh
    for i in range(cfg.num_layers):
        pre = f"encoder.layer.{i}."
        def lin(name):
            return g(pre + name + ".weight").T, g(pre + name + ".bias")
        qk, qb = lin("attention.self.query")
        kk, kb = lin("attention.self.key")
        vk, vb = lin("attention.self.value")
        ok, ob = lin("attention.output.dense")
        p["encoder"][f"layer_{i}"] = {
            "attention": {
                "query": {"kernel": qk.reshape(h, nh, hd),
                          "bias": qb.reshape(nh, hd)},
                "key": {"kernel": kk.reshape(h, nh, hd),
                        "bias": kb.reshape(nh, hd)},
                "value": {"kernel": vk.reshape(h, nh, hd),
                          "bias": vb.reshape(nh, hd)},
                "out": {"kernel": ok.reshape(nh, hd, h), "bias": ob},
            },
            "ln1": {"scale": g(pre + "attention.output.LayerNorm.weight"),
                    "bias": g(pre + "attention.output.LayerNorm.bias")},
            "mlp": {
                "fc1": {"kernel": g(pre + "intermediate.dense.weight").T,
                        "bias": g(pre + "intermediate.dense.bias")},
                "fc2": {"kernel": g(pre + "output.dense.weight").T,
                        "bias": g(pre + "output.dense.bias")},
            },
            "ln2": {"scale": g(pre + "output.LayerNorm.weight"),
                    "bias": g(pre + "output.LayerNorm.bias")},
        }
    return p
