"""T5 encoder-decoder (Flax) — the RAG answer generator.

Clean-room implementation covering t5 v1.0 (relu) and v1.1/flan (gated-gelu)
variants: RMSNorm, relative-position-bucket attention bias, tied or untied
LM head. Used as the RAVQA generator (reference: T5 in v1,
BLIP2-flan-T5 in v2 — /root/reference/src/models/rag/rag_model_blip.py) and
as the language tower of our BLIP-2 equivalent (blip2.py).

Decoding (greedy + beam) lives in generation.py; HF torch checkpoint
conversion in convert_hf_t5_params below (verified against transformers).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

NEG_BIAS = -1e9


@dataclasses.dataclass(frozen=True)
class T5Config:
    vocab_size: int = 32128
    d_model: int = 512
    d_kv: int = 64
    d_ff: int = 2048
    num_layers: int = 6
    num_decoder_layers: Optional[int] = None
    num_heads: int = 8
    relative_attention_num_buckets: int = 32
    relative_attention_max_distance: int = 128
    layer_norm_eps: float = 1e-6
    feed_forward_proj: str = "relu"        # "relu" | "gated-gelu"
    tie_word_embeddings: bool = True
    pad_token_id: int = 0
    eos_token_id: int = 1
    decoder_start_token_id: int = 0
    dtype: Any = jnp.float32             # compute dtype
    param_dtype: Any = jnp.float32       # parameter storage dtype
    # rematerialize each block on the backward pass (jax.checkpoint):
    # activation memory drops from O(layers) to O(1) residuals at ~1/3 extra
    # FLOPs — what lets the flan-T5-XL RAVQA-v2 recipe (bs1 x 5 docs x 512
    # tokens + LoRA) train on ONE v5e chip (scripts/bench_rag_train.py)
    remat: bool = False

    @property
    def n_dec(self) -> int:
        return self.num_decoder_layers or self.num_layers

    @staticmethod
    def tiny(**kw) -> "T5Config":
        base = dict(vocab_size=512, d_model=64, d_kv=16, d_ff=128,
                    num_layers=2, num_heads=4)
        base.update(kw)
        return T5Config(**base)

    @staticmethod
    def flan_t5_xl(**kw) -> "T5Config":
        base = dict(vocab_size=32128, d_model=2048, d_kv=64, d_ff=5120,
                    num_layers=24, num_heads=32,
                    feed_forward_proj="gated-gelu",
                    tie_word_embeddings=False)
        base.update(kw)
        return T5Config(**base)


class RMSNorm(nn.Module):
    eps: float = 1e-6
    dtype: Any = jnp.float32
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        var = jnp.mean(jnp.square(x.astype(jnp.float32)), -1, keepdims=True)
        x = x * jax.lax.rsqrt(var + self.eps)
        w = self.param("weight", nn.initializers.ones, (x.shape[-1],),
                       self.param_dtype)
        return (w * x).astype(self.dtype)


def relative_position_bucket(relative_position, bidirectional: bool,
                             num_buckets: int, max_distance: int):
    """HF T5 bucket function (exact semantics)."""
    ret = 0
    n = -relative_position
    if bidirectional:
        num_buckets //= 2
        ret += (n < 0).astype(jnp.int32) * num_buckets
        n = jnp.abs(n)
    else:
        n = jnp.maximum(n, 0)
    max_exact = num_buckets // 2
    is_small = n < max_exact
    val_if_large = max_exact + (
        jnp.log(n.astype(jnp.float32) / max_exact + 1e-6)
        / np.log(max_distance / max_exact)
        * (num_buckets - max_exact)).astype(jnp.int32)
    val_if_large = jnp.minimum(val_if_large, num_buckets - 1)
    ret += jnp.where(is_small, n, val_if_large)
    return ret


class T5Attention(nn.Module):
    cfg: T5Config
    has_relative_bias: bool = False
    bidirectional: bool = True

    @nn.compact
    def __call__(self, x, kv=None, mask_bias=None, position_bias=None,
                 decode_cache=None):
        """x: (B, Tq, D); kv: (B, Tk, D) for cross-attn (None = self-attn).

        decode_cache: optional dict with 'k','v' (B, Tmax, H, dkv) and
        'index' scalar — incremental decoding for self-attention.
        Returns (out, position_bias, new_cache).
        """
        cfg = self.cfg
        inner = cfg.num_heads * cfg.d_kv
        dense = lambda name: nn.DenseGeneral(
            (cfg.num_heads, cfg.d_kv), axis=-1, use_bias=False,
            dtype=cfg.dtype, param_dtype=cfg.param_dtype, name=name)
        q = dense("q")(x)
        src = x if kv is None else kv
        k = dense("k")(src)
        v = dense("v")(src)

        new_cache = None
        if decode_cache is not None:
            idx = decode_cache["index"]
            ck = jax.lax.dynamic_update_slice(decode_cache["k"], k,
                                              (0, idx, 0, 0))
            cv = jax.lax.dynamic_update_slice(decode_cache["v"], v,
                                              (0, idx, 0, 0))
            k, v = ck, cv
            new_cache = {"k": ck, "v": cv, "index": idx + x.shape[1]}

        # NOTE: T5 does NOT scale by sqrt(d_kv)
        logits = jnp.einsum("bqhd,bkhd->bhqk", q, k,
                            preferred_element_type=jnp.float32)
        tq, tk = logits.shape[-2], logits.shape[-1]
        if position_bias is None and self.has_relative_bias:
            ctx_pos = jnp.arange(tk)[None, :]
            if decode_cache is not None:
                qry_pos = (decode_cache["index"]
                           + jnp.arange(tq))[:, None]
            else:
                qry_pos = jnp.arange(tq)[:, None]
            rp = relative_position_bucket(
                ctx_pos - qry_pos, self.bidirectional,
                cfg.relative_attention_num_buckets,
                cfg.relative_attention_max_distance)
            emb = nn.Embed(cfg.relative_attention_num_buckets, cfg.num_heads,
                           dtype=jnp.float32, param_dtype=cfg.param_dtype,
                           name="relative_attention_bias")(rp)
            position_bias = emb.transpose(2, 0, 1)[None]   # (1, H, Tq, Tk)
        if position_bias is not None:
            logits = logits + position_bias
        if mask_bias is not None:
            logits = logits + mask_bias
        if decode_cache is not None:
            # mask cache slots not yet written (zeros would leak attention)
            valid = jnp.arange(tk) < (decode_cache["index"] + x.shape[1])
            logits = logits + jnp.where(valid, 0.0, NEG_BIAS)[None, None,
                                                              None, :]
        probs = jax.nn.softmax(logits, axis=-1).astype(cfg.dtype)
        ctx = jnp.einsum("bhqk,bkhd->bqhd", probs, v)
        out = nn.DenseGeneral(cfg.d_model, axis=(-2, -1), use_bias=False,
                              dtype=cfg.dtype, param_dtype=cfg.param_dtype,
                              name="o")(ctx)
        return out, position_bias, new_cache


class T5FF(nn.Module):
    cfg: T5Config

    @nn.compact
    def __call__(self, x):
        cfg = self.cfg
        if cfg.feed_forward_proj == "gated-gelu":
            wi0 = nn.Dense(cfg.d_ff, use_bias=False, dtype=cfg.dtype,
                           param_dtype=cfg.param_dtype, name="wi_0")(x)
            wi1 = nn.Dense(cfg.d_ff, use_bias=False, dtype=cfg.dtype,
                           param_dtype=cfg.param_dtype, name="wi_1")(x)
            h = nn.gelu(wi0, approximate=True) * wi1
        else:
            h = nn.relu(nn.Dense(cfg.d_ff, use_bias=False, dtype=cfg.dtype,
                                 param_dtype=cfg.param_dtype,
                                 name="wi")(x))
        return nn.Dense(cfg.d_model, use_bias=False, dtype=cfg.dtype,
                        param_dtype=cfg.param_dtype, name="wo")(h)


class T5Block(nn.Module):
    cfg: T5Config
    is_decoder: bool = False
    has_relative_bias: bool = False

    @nn.compact
    def __call__(self, x, enc=None, self_bias=None, cross_bias=None,
                 position_bias=None, decode_cache=None):
        cfg = self.cfg
        h, position_bias, new_cache = T5Attention(
            cfg, has_relative_bias=self.has_relative_bias,
            bidirectional=not self.is_decoder, name="self_attn")(
            RMSNorm(cfg.layer_norm_eps, cfg.dtype, cfg.param_dtype,
                    name="ln1")(x),
            mask_bias=self_bias, position_bias=position_bias,
            decode_cache=decode_cache)
        x = x + h
        if self.is_decoder:
            h, _, _ = T5Attention(cfg, name="cross_attn")(
                RMSNorm(cfg.layer_norm_eps, cfg.dtype, cfg.param_dtype,
                        name="ln_cross")(x),
                kv=enc, mask_bias=cross_bias)
            x = x + h
        h = T5FF(cfg, name="ff")(
            RMSNorm(cfg.layer_norm_eps, cfg.dtype, cfg.param_dtype,
                    name="ln2")(x))
        return x + h, position_bias, new_cache


def _mask_bias(mask, dtype=jnp.float32):
    return ((1.0 - mask.astype(jnp.float32)) * -1e9)[:, None, None, :]


def _causal_bias(t, dtype=jnp.float32):
    m = jnp.tril(jnp.ones((t, t), jnp.float32))
    return ((1.0 - m) * -1e9)[None, None]


class T5Model(nn.Module):
    cfg: T5Config

    def setup(self):
        cfg = self.cfg
        self.shared = nn.Embed(cfg.vocab_size, cfg.d_model, dtype=cfg.dtype,
                               param_dtype=cfg.param_dtype, name="shared")
        Block = nn.remat(T5Block) if cfg.remat else T5Block
        self.enc_blocks = [
            Block(cfg, is_decoder=False, has_relative_bias=(i == 0),
                  name=f"encoder_{i}") for i in range(cfg.num_layers)]
        self.enc_final_ln = RMSNorm(cfg.layer_norm_eps, cfg.dtype,
                                    cfg.param_dtype,
                                    name="encoder_final_ln")
        self.dec_blocks = [
            Block(cfg, is_decoder=True, has_relative_bias=(i == 0),
                  name=f"decoder_{i}") for i in range(cfg.n_dec)]
        self.dec_final_ln = RMSNorm(cfg.layer_norm_eps, cfg.dtype,
                                    cfg.param_dtype,
                                    name="decoder_final_ln")
        if not cfg.tie_word_embeddings:
            self.lm_head = nn.Dense(cfg.vocab_size, use_bias=False,
                                    dtype=cfg.dtype,
                                    param_dtype=cfg.param_dtype,
                                    name="lm_head")

    def encode(self, input_ids=None, attention_mask=None,
               inputs_embeds=None):
        """Returns encoder hidden states (B, T, D). inputs_embeds lets
        BLIP-2 prepend projected vision tokens."""
        x = self.shared(input_ids) if inputs_embeds is None else inputs_embeds
        bias = _mask_bias(attention_mask) if attention_mask is not None \
            else None
        pos = None
        for blk in self.enc_blocks:
            x, pos, _ = blk(x, self_bias=bias, position_bias=pos)
        return self.enc_final_ln(x)

    def decode(self, decoder_input_ids, enc, enc_mask=None,
               decoder_attention_mask=None):
        """Teacher-forced decode. Returns logits (B, Td, V)."""
        cfg = self.cfg
        x = self.shared(decoder_input_ids)
        t = decoder_input_ids.shape[1]
        self_bias = _causal_bias(t)
        if decoder_attention_mask is not None:
            self_bias = self_bias + _mask_bias(decoder_attention_mask)
        cross_bias = _mask_bias(enc_mask) if enc_mask is not None else None
        pos = None
        for blk in self.dec_blocks:
            x, pos, _ = blk(x, enc=enc, self_bias=self_bias,
                            cross_bias=cross_bias, position_bias=pos)
        x = self.dec_final_ln(x)
        return self._logits(x)

    def _logits(self, x):
        cfg = self.cfg
        if cfg.tie_word_embeddings:
            x = x * (cfg.d_model ** -0.5)
            return x @ self.shared.embedding.T.astype(cfg.dtype)
        return self.lm_head(x)

    def decode_step(self, token_ids, enc, enc_mask, caches):
        """Incremental decode: token_ids (B, 1). Returns (logits (B, 1, V),
        new_caches list)."""
        x = self.shared(token_ids)
        cross_bias = _mask_bias(enc_mask) if enc_mask is not None else None
        new_caches = []
        pos = None
        for blk, cache in zip(self.dec_blocks, caches):
            x, pos, nc = blk(x, enc=enc, cross_bias=cross_bias,
                             position_bias=pos, decode_cache=cache)
            new_caches.append(nc)
        x = self.dec_final_ln(x)
        return self._logits(x), new_caches

    def __call__(self, input_ids=None, attention_mask=None,
                 decoder_input_ids=None, decoder_attention_mask=None,
                 inputs_embeds=None):
        enc = self.encode(input_ids, attention_mask, inputs_embeds)
        return self.decode(decoder_input_ids, enc, attention_mask,
                           decoder_attention_mask)

    def init_cache(self, batch: int, max_len: int):
        cfg = self.cfg
        return [{"k": jnp.zeros((batch, max_len, cfg.num_heads, cfg.d_kv),
                                cfg.dtype),
                 "v": jnp.zeros((batch, max_len, cfg.num_heads, cfg.d_kv),
                                cfg.dtype),
                 "index": jnp.zeros((), jnp.int32)}
                for _ in range(cfg.n_dec)]


def shift_right(labels: jnp.ndarray, decoder_start_token_id: int,
                pad_token_id: int, ignore_index: int = -100) -> jnp.ndarray:
    """HF _shift_right: labels -> decoder_input_ids."""
    shifted = jnp.roll(labels, 1, axis=-1)
    shifted = shifted.at[:, 0].set(decoder_start_token_id)
    return jnp.where(shifted == ignore_index, pad_token_id, shifted)


# ---------------------------------------------------------------------------
# HF conversion
# ---------------------------------------------------------------------------

def convert_hf_t5_params(state_dict: dict, cfg: T5Config,
                         prefix: str = "") -> dict:
    def g(name):
        t = state_dict[prefix + name]
        return np.asarray(getattr(t, "detach", lambda: t)()).astype(np.float32)

    h, nh, dkv = cfg.d_model, cfg.num_heads, cfg.d_kv

    def attn(pre, cross=False):
        p = {
            "q": {"kernel": g(pre + ".q.weight").T.reshape(h, nh, dkv)},
            "k": {"kernel": g(pre + ".k.weight").T.reshape(h, nh, dkv)},
            "v": {"kernel": g(pre + ".v.weight").T.reshape(h, nh, dkv)},
            "o": {"kernel": g(pre + ".o.weight").T.reshape(nh, dkv, h)},
        }
        rb = pre + ".relative_attention_bias.weight"
        if prefix + rb in state_dict:
            p["relative_attention_bias"] = {"embedding": g(rb)}
        return p

    def ff(pre):
        if cfg.feed_forward_proj == "gated-gelu":
            return {"wi_0": {"kernel": g(pre + ".wi_0.weight").T},
                    "wi_1": {"kernel": g(pre + ".wi_1.weight").T},
                    "wo": {"kernel": g(pre + ".wo.weight").T}}
        return {"wi": {"kernel": g(pre + ".wi.weight").T},
                "wo": {"kernel": g(pre + ".wo.weight").T}}

    p: dict = {"shared": {"embedding": g("shared.weight")},
               "encoder_final_ln": {"weight":
                                    g("encoder.final_layer_norm.weight")},
               "decoder_final_ln": {"weight":
                                    g("decoder.final_layer_norm.weight")}}
    if not cfg.tie_word_embeddings:
        p["lm_head"] = {"kernel": g("lm_head.weight").T}
    for i in range(cfg.num_layers):
        b = f"encoder.block.{i}"
        p[f"encoder_{i}"] = {
            "self_attn": attn(b + ".layer.0.SelfAttention"),
            "ln1": {"weight": g(b + ".layer.0.layer_norm.weight")},
            "ff": ff(b + ".layer.1.DenseReluDense"),
            "ln2": {"weight": g(b + ".layer.1.layer_norm.weight")},
        }
    for i in range(cfg.n_dec):
        b = f"decoder.block.{i}"
        p[f"decoder_{i}"] = {
            "self_attn": attn(b + ".layer.0.SelfAttention"),
            "ln1": {"weight": g(b + ".layer.0.layer_norm.weight")},
            "cross_attn": attn(b + ".layer.1.EncDecAttention"),
            "ln_cross": {"weight": g(b + ".layer.1.layer_norm.weight")},
            "ff": ff(b + ".layer.2.DenseReluDense"),
            "ln2": {"weight": g(b + ".layer.2.layer_norm.weight")},
        }
    return p
