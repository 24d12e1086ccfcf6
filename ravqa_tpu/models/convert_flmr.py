"""Convert reference FLMR/ColBERT checkpoints to ravqa_tpu params.

The reference's HF interchange format (SURVEY.md §5 checkpoint formats):
a BertPreTrainedModel dir whose state dict holds `bert.*` + `linear.weight`
(HF_ColBERT, third_party/ColBERT/colbert/modeling/hf_colbert.py:7-61) plus
side files `vision_projection.pt` (the Tanh-MLP state dict: model.0.*,
model.2.*) and optionally `query_encoder*` copies for
separate_question_encoder runs (base_colbert.py:44-60,
FLMR_executor.py:1021-1032).

Also supports the PreFLMR HF release layout (FLMRModelForRetrieval:
context_text_encoder.bert_model.*, context_text_encoder_linear.*,
query_text_encoder.*, vision_projection.model.*).
"""

from __future__ import annotations

from typing import Optional

import numpy as np

from .bert import BertConfig, convert_hf_bert_params
from .flmr import FLMRModelConfig


def _np(t):
    return np.asarray(getattr(t, "detach", lambda: t)()).astype(np.float32)


def convert_mlp_params(sd: dict, prefix: str = "model.") -> dict:
    """Torch nn.Sequential MLP (Linear, Tanh, Linear) -> MappingMLP params."""
    out = {}
    i = 0
    layer = 0
    while f"{prefix}{i}.weight" in sd:
        out[f"dense_{layer}"] = {
            "kernel": _np(sd[f"{prefix}{i}.weight"]).T,
            "bias": _np(sd[f"{prefix}{i}.bias"]),
        }
        layer += 1
        i += 2  # skip activation modules
    return {"mlp": out}


def convert_hf_flmr_params(
    colbert_sd: dict,
    cfg: FLMRModelConfig,
    vision_projection_sd: Optional[dict] = None,
    query_encoder_sd: Optional[dict] = None,
    query_vision_projection_sd: Optional[dict] = None,
) -> dict:
    """Reference FLMR checkpoint -> FLMRRetriever params pytree."""
    params: dict = {
        "doc_encoder": convert_hf_bert_params(colbert_sd, cfg.bert,
                                              prefix="bert."),
        "linear": {"kernel": _np(colbert_sd["linear.weight"]).T},
    }
    if vision_projection_sd is not None:
        params["vision_projection"] = convert_mlp_params(
            vision_projection_sd)
    if cfg.separate_question_encoder:
        src = query_encoder_sd or colbert_sd
        params["query_encoder"] = convert_hf_bert_params(src, cfg.bert,
                                                         prefix="bert.")
    return params


def convert_preflmr_params(sd: dict, cfg: FLMRModelConfig) -> dict:
    """PreFLMR HF-release (FLMRModelForRetrieval) state dict -> params."""
    params: dict = {
        "doc_encoder": convert_hf_bert_params(
            sd, cfg.bert, prefix="context_text_encoder.bert_model."),
        "linear": {"kernel":
                   _np(sd["context_text_encoder_linear.weight"]).T},
    }
    if any(k.startswith("vision_projection.model.") for k in sd):
        vp = {k[len("vision_projection."):]: v for k, v in sd.items()
              if k.startswith("vision_projection.")}
        params["vision_projection"] = convert_mlp_params(vp)
    if cfg.separate_question_encoder and any(
            k.startswith("query_text_encoder.") for k in sd):
        params["query_encoder"] = convert_hf_bert_params(
            sd, cfg.bert, prefix="query_text_encoder.bert_model.")
    return params
