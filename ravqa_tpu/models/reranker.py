"""Cross-encoder reranker in Flax (+ HF checkpoint conversion).

TPU-native equivalent of the reference engine's reranker/distillation
models (reference: /root/reference/third_party/ColBERT/colbert/modeling/
reranker/electra.py:1-35 — ELECTRA encoder + Linear(hidden,1) on [CLS];
and the ms-marco MiniLM cross-encoders loaded by
colbert/distillation/scorer.py:40 via AutoModelForSequenceClassification,
i.e. BERT encoder + tanh pooler + Linear classifier).

One Flax module covers both head flavours (`head="linear_cls"` for the
ELECTRA reranker, `head="pooler_classifier"` for BertForSequenceClassification
cross-encoders); ELECTRA's factorized embeddings (embedding_size !=
hidden_size bridged by an `embeddings_project` Dense) are supported so
electra-small/base checkpoints convert exactly.

Scoring runs as one jitted batched forward per (batch, seqlen) bucket —
the reference loops torch mini-batches on GPU (scorer.py:46-60); here the
pair matrix is padded to a static bucket so XLA compiles once per bucket
and the MXU sees one large matmul stream.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Optional, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from .transformer import (EncoderConfig, TransformerEncoder,
                          attention_bias_from_mask)


@dataclasses.dataclass(frozen=True)
class RerankerConfig:
    vocab_size: int = 30522
    embedding_size: int = 768            # ELECTRA may differ from hidden
    hidden_size: int = 768
    num_layers: int = 12
    num_heads: int = 12
    intermediate_size: int = 3072
    max_position_embeddings: int = 512
    type_vocab_size: int = 2
    layer_norm_eps: float = 1e-12
    dropout_rate: float = 0.0
    # "linear_cls": score = Linear(hidden,1)(x[:,0])            (ELECTRA)
    # "pooler_classifier": tanh(pooler(x[:,0])) -> classifier   (BERT seqcls)
    head: str = "linear_cls"
    dtype: Any = jnp.float32
    param_dtype: Any = jnp.float32

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
        )

    @staticmethod
    def tiny(**kw) -> "RerankerConfig":
        base = dict(vocab_size=512, embedding_size=32, hidden_size=64,
                    num_layers=2, num_heads=4, intermediate_size=128,
                    max_position_embeddings=128, type_vocab_size=2)
        base.update(kw)
        return RerankerConfig(**base)


class CrossEncoderReranker(nn.Module):
    """score(query, passage) — higher is more relevant. Returns (B,) f32."""

    cfg: RerankerConfig

    @nn.compact
    def __call__(self, input_ids, attention_mask, token_type_ids=None,
                 deterministic=True):
        cfg = self.cfg
        b, t = input_ids.shape
        if token_type_ids is None:
            token_type_ids = jnp.zeros_like(input_ids)
        word = nn.Embed(cfg.vocab_size, cfg.embedding_size, dtype=cfg.dtype,
                        param_dtype=cfg.param_dtype,
                        name="word_embeddings")(input_ids)
        pos = nn.Embed(cfg.max_position_embeddings, cfg.embedding_size,
                       dtype=cfg.dtype, param_dtype=cfg.param_dtype,
                       name="position_embeddings")(jnp.arange(t)[None, :])
        typ = nn.Embed(cfg.type_vocab_size, cfg.embedding_size,
                       dtype=cfg.dtype, param_dtype=cfg.param_dtype,
                       name="token_type_embeddings")(token_type_ids)
        x = word + pos + typ
        x = nn.LayerNorm(epsilon=cfg.layer_norm_eps, dtype=jnp.float32,
                         name="embeddings_ln")(x).astype(cfg.dtype)
        if cfg.embedding_size != cfg.hidden_size:
            x = nn.Dense(cfg.hidden_size, dtype=cfg.dtype,
                         param_dtype=cfg.param_dtype,
                         name="embeddings_project")(x)
        bias = attention_bias_from_mask(attention_mask)
        x = TransformerEncoder(cfg.encoder_cfg, name="encoder")(
            x, bias, deterministic)
        cls = x[:, 0]
        if cfg.head == "pooler_classifier":
            pooled = nn.tanh(nn.Dense(cfg.hidden_size, dtype=cfg.dtype,
                                      param_dtype=cfg.param_dtype,
                                      name="pooler")(cls))
            score = nn.Dense(1, dtype=cfg.dtype, param_dtype=cfg.param_dtype,
                             name="classifier")(pooled)
        else:
            score = nn.Dense(1, dtype=cfg.dtype, param_dtype=cfg.param_dtype,
                             name="score_head")(cls)
        return score.squeeze(-1).astype(jnp.float32)


# ---------------------------------------------------------------------------
# HF torch checkpoint conversion
# ---------------------------------------------------------------------------

def _encoder_params(g, cfg: RerankerConfig) -> dict:
    h, nh = cfg.hidden_size, cfg.num_heads
    hd = h // nh
    enc: dict = {}
    for i in range(cfg.num_layers):
        pre = f"encoder.layer.{i}."

        def lin(name):
            return g(pre + name + ".weight").T, g(pre + name + ".bias")

        qk, qb = lin("attention.self.query")
        kk, kb = lin("attention.self.key")
        vk, vb = lin("attention.self.value")
        ok, ob = lin("attention.output.dense")
        enc[f"layer_{i}"] = {
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
    return enc


def convert_hf_electra_reranker_params(state_dict: dict,
                                       cfg: RerankerConfig) -> dict:
    """ElectraReranker layout (electra.py:17-20): `electra.*` encoder keys
    + top-level `linear.{weight,bias}` scoring head."""
    def g(name, prefix="electra."):
        t = state_dict[prefix + name]
        return np.asarray(getattr(t, "detach", lambda: t)()).astype(np.float32)

    p: dict = {
        "word_embeddings": {"embedding": g("embeddings.word_embeddings.weight")},
        "position_embeddings": {"embedding": g("embeddings.position_embeddings.weight")},
        "token_type_embeddings": {"embedding": g("embeddings.token_type_embeddings.weight")},
        "embeddings_ln": {"scale": g("embeddings.LayerNorm.weight"),
                          "bias": g("embeddings.LayerNorm.bias")},
        "encoder": _encoder_params(g, cfg),
        "score_head": {"kernel": g("linear.weight", prefix="").T,
                       "bias": g("linear.bias", prefix="")},
    }
    if cfg.embedding_size != cfg.hidden_size:
        p["embeddings_project"] = {
            "kernel": g("embeddings_project.weight").T,
            "bias": g("embeddings_project.bias")}
    return p


def convert_hf_seqcls_bert_params(state_dict: dict,
                                  cfg: RerankerConfig) -> dict:
    """BertForSequenceClassification layout (the ms-marco MiniLM
    cross-encoders the reference's distillation Scorer defaults to,
    scorer.py:13): `bert.*` encoder + `bert.pooler` + `classifier`."""
    def g(name, prefix="bert."):
        t = state_dict[prefix + name]
        return np.asarray(getattr(t, "detach", lambda: t)()).astype(np.float32)

    p: dict = {
        "word_embeddings": {"embedding": g("embeddings.word_embeddings.weight")},
        "position_embeddings": {"embedding": g("embeddings.position_embeddings.weight")},
        "token_type_embeddings": {"embedding": g("embeddings.token_type_embeddings.weight")},
        "embeddings_ln": {"scale": g("embeddings.LayerNorm.weight"),
                          "bias": g("embeddings.LayerNorm.bias")},
        "encoder": _encoder_params(g, cfg),
        "pooler": {"kernel": g("pooler.dense.weight").T,
                   "bias": g("pooler.dense.bias")},
        "classifier": {"kernel": g("classifier.weight", prefix="").T,
                       "bias": g("classifier.bias", prefix="")},
    }
    return p


# ---------------------------------------------------------------------------
# Pair tokenization
# ---------------------------------------------------------------------------

class RerankerTokenizer:
    """[CLS] query [SEP] passage [SEP] with token_type_ids 0/1 and HF
    `truncation='longest_first'` semantics (reference reranker/tokenizer.py:
    10-16): the longer of the two sequences is trimmed one token at a time
    until the pair fits `total_maxlen`."""

    def __init__(self, tok, total_maxlen: int = 180):
        self.tok = tok
        self.total_maxlen = total_maxlen

    def _truncate_pair(self, a: list, b: list, budget: int):
        while len(a) + len(b) > budget:
            if len(a) >= len(b):
                a = a[:-1]
            else:
                b = b[:-1]
        return a, b

    def tensorize(self, questions: Sequence[str], passages: Sequence[str],
                  pad_to: Optional[int] = None):
        assert len(questions) == len(passages)
        cls_id, sep_id = self.tok.cls_token_id, self.tok.sep_token_id
        budget = self.total_maxlen - 3           # [CLS] + 2x [SEP]
        rows, types, lens = [], [], []
        for q, p in zip(questions, passages):
            qa = self.tok.convert_tokens_to_ids(self.tok.tokenize(q))
            pa = self.tok.convert_tokens_to_ids(self.tok.tokenize(p))
            qa, pa = self._truncate_pair(qa, pa, budget)
            ids = [cls_id] + qa + [sep_id] + pa + [sep_id]
            tt = [0] * (len(qa) + 2) + [1] * (len(pa) + 1)
            rows.append(ids)
            types.append(tt)
            lens.append(len(ids))
        maxlen = pad_to or max(lens)
        n = len(rows)
        ids = np.zeros((n, maxlen), np.int32)
        ttypes = np.zeros((n, maxlen), np.int32)
        mask = np.zeros((n, maxlen), np.int32)
        for i, (r, t) in enumerate(zip(rows, types)):
            ids[i, :len(r)] = r
            ttypes[i, :len(t)] = t
            mask[i, :len(r)] = 1
        return ids, mask, ttypes
