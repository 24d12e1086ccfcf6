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


def convert_transformer_mapping_params(
        sd: dict, num_layers: int, num_heads: int,
        prefix: str = "transformer_mapping_") -> dict:
    """PreFLMR transformer-mapping weights -> TransformerMapping params.

    Companion-repo (FLMRModelForRetrieval) layout:
    `{prefix}input_linear.*`, `{prefix}network.layer.{i}.attention.self.*` /
    `.attention.output.*` / `.crossattention.self.*` /
    `.crossattention.output.*` / `.intermediate.dense` / `.output.dense` /
    `.output.LayerNorm`, `{prefix}output_linear.*` (a 1-layer BERT decoder
    stack with add_cross_attention=True bracketed by two linears).
    """
    def g(name):
        return _np(sd[prefix + name])

    p: dict = {"input_linear": {"kernel": g("input_linear.weight").T,
                                "bias": g("input_linear.bias")}}
    h = p["input_linear"]["kernel"].shape[1]
    nh = num_heads
    hd = h // nh
    for i in range(num_layers):
        pre = f"network.layer.{i}."

        def lin(name, pre=pre):
            return g(pre + name + ".weight").T, g(pre + name + ".bias")

        def attn(block, pre=pre):
            qk, qb = lin(block + ".self.query", pre)
            kk, kb = lin(block + ".self.key", pre)
            vk, vb = lin(block + ".self.value", pre)
            ok, ob = lin(block + ".output.dense", pre)
            return {
                "query": {"kernel": qk.reshape(-1, nh, hd),
                          "bias": qb.reshape(nh, hd)},
                "key": {"kernel": kk.reshape(-1, nh, hd),
                        "bias": kb.reshape(nh, hd)},
                "value": {"kernel": vk.reshape(-1, nh, hd),
                          "bias": vb.reshape(nh, hd)},
                "out": {"kernel": ok.reshape(nh, hd, h), "bias": ob},
            }

        fc1k, fc1b = lin("intermediate.dense")
        fc2k, fc2b = lin("output.dense")
        p[f"layer_{i}"] = {
            "attention": attn("attention"),
            "ln_self": {
                "scale": g(pre + "attention.output.LayerNorm.weight"),
                "bias": g(pre + "attention.output.LayerNorm.bias")},
            "cross_attention": attn("crossattention"),
            "ln_cross": {
                "scale": g(pre + "crossattention.output.LayerNorm.weight"),
                "bias": g(pre + "crossattention.output.LayerNorm.bias")},
            "mlp": {"fc1": {"kernel": fc1k, "bias": fc1b},
                    "fc2": {"kernel": fc2k, "bias": fc2b}},
            "ln_out": {"scale": g(pre + "output.LayerNorm.weight"),
                       "bias": g(pre + "output.LayerNorm.bias")},
        }
    p["output_linear"] = {"kernel": g("output_linear.weight").T,
                          "bias": g("output_linear.bias")}
    return p


def export_transformer_mapping_params(
        params: dict, num_heads: int,
        prefix: str = "transformer_mapping_") -> dict:
    """Reverse of convert_transformer_mapping_params: TransformerMapping
    params -> the companion repo's torch state-dict layout (numpy values;
    wrap in torch.tensor to save)."""
    out = {}

    def put(name, kernel=None, bias=None):
        if kernel is not None:
            out[prefix + name + ".weight"] = np.ascontiguousarray(kernel.T)
        if bias is not None:
            out[prefix + name + ".bias"] = np.asarray(bias)

    il = params["input_linear"]
    put("input_linear", np.asarray(il["kernel"]), il["bias"])
    h = np.asarray(il["kernel"]).shape[1]
    i = 0
    while f"layer_{i}" in params:
        lp = params[f"layer_{i}"]
        pre = f"network.layer.{i}."

        def attn(block, p):
            for name in ("query", "key", "value"):
                k = np.asarray(p[name]["kernel"])
                put(pre + block + f".self.{name}",
                    k.reshape(k.shape[0], -1),
                    np.asarray(p[name]["bias"]).reshape(-1))
            ok = np.asarray(p["out"]["kernel"]).reshape(-1, h)
            put(pre + block + ".output.dense", ok, p["out"]["bias"])

        attn("attention", lp["attention"])
        attn("crossattention", lp["cross_attention"])
        out[prefix + pre + "attention.output.LayerNorm.weight"] = \
            np.asarray(lp["ln_self"]["scale"])
        out[prefix + pre + "attention.output.LayerNorm.bias"] = \
            np.asarray(lp["ln_self"]["bias"])
        out[prefix + pre + "crossattention.output.LayerNorm.weight"] = \
            np.asarray(lp["ln_cross"]["scale"])
        out[prefix + pre + "crossattention.output.LayerNorm.bias"] = \
            np.asarray(lp["ln_cross"]["bias"])
        put(pre + "intermediate.dense", np.asarray(lp["mlp"]["fc1"]["kernel"]),
            lp["mlp"]["fc1"]["bias"])
        put(pre + "output.dense", np.asarray(lp["mlp"]["fc2"]["kernel"]),
            lp["mlp"]["fc2"]["bias"])
        out[prefix + pre + "output.LayerNorm.weight"] = \
            np.asarray(lp["ln_out"]["scale"])
        out[prefix + pre + "output.LayerNorm.bias"] = \
            np.asarray(lp["ln_out"]["bias"])
        i += 1
    ol = params["output_linear"]
    put("output_linear", np.asarray(ol["kernel"]), ol["bias"])
    return out


def convert_hf_flmr_params(
    colbert_sd: dict,
    cfg: FLMRModelConfig,
    vision_projection_sd: Optional[dict] = None,
    query_encoder_sd: Optional[dict] = None,
    doc_vision_projection_sd: Optional[dict] = None,
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
    if doc_vision_projection_sd is not None:
        # doc_vision_projection.pt side file (base_colbert.py:49-58)
        params["doc_vision_projection"] = convert_mlp_params(
            doc_vision_projection_sd)
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
    if cfg.use_transformer_mapping and any(
            k.startswith("transformer_mapping_input_linear") for k in sd):
        params["transformer_mapping"] = convert_transformer_mapping_params(
            sd, cfg.transformer_mapping_num_layers,
            cfg.transformer_mapping_num_heads)
    return params


def export_flmr_to_hf_format(params: dict, cfg: FLMRModelConfig,
                             save_dir: str) -> None:
    """Reverse conversion: FLMRRetriever params -> the reference's HF
    interchange layout (save_HF_model, FLMR_executor.py:1021-1032):
    `pytorch_model.bin` holding bert.* + linear.weight, plus
    `vision_projection.pt` (Tanh-MLP state dict) and optionally
    `query_encoder_pytorch_model.bin`. Loadable by the reference (torch)."""
    import os

    import torch

    def t(x):
        return torch.tensor(np.asarray(x, np.float32))

    def bert_to_sd(p: dict, cfg_bert) -> dict:
        sd = {
            "bert.embeddings.word_embeddings.weight":
                t(p["word_embeddings"]["embedding"]),
            "bert.embeddings.position_embeddings.weight":
                t(p["position_embeddings"]["embedding"]),
            "bert.embeddings.token_type_embeddings.weight":
                t(p["token_type_embeddings"]["embedding"]),
            "bert.embeddings.LayerNorm.weight": t(p["embeddings_ln"]["scale"]),
            "bert.embeddings.LayerNorm.bias": t(p["embeddings_ln"]["bias"]),
            "bert.pooler.dense.weight": t(p["pooler"]["kernel"]).T,
            "bert.pooler.dense.bias": t(p["pooler"]["bias"]),
        }
        h = cfg_bert.hidden_size
        for i in range(cfg_bert.num_layers):
            lp = p["encoder"][f"layer_{i}"]
            pre = f"bert.encoder.layer.{i}."
            att = lp["attention"]
            for name, key in (("query", "query"), ("key", "key"),
                              ("value", "value")):
                k = np.asarray(att[key]["kernel"]).reshape(h, -1)
                b = np.asarray(att[key]["bias"]).reshape(-1)
                sd[pre + f"attention.self.{name}.weight"] = t(k.T)
                sd[pre + f"attention.self.{name}.bias"] = t(b)
            ok = np.asarray(att["out"]["kernel"]).reshape(-1, h)
            sd[pre + "attention.output.dense.weight"] = t(ok.T)
            sd[pre + "attention.output.dense.bias"] = t(att["out"]["bias"])
            sd[pre + "attention.output.LayerNorm.weight"] = \
                t(lp["ln1"]["scale"])
            sd[pre + "attention.output.LayerNorm.bias"] = t(lp["ln1"]["bias"])
            sd[pre + "intermediate.dense.weight"] = \
                t(lp["mlp"]["fc1"]["kernel"]).T
            sd[pre + "intermediate.dense.bias"] = t(lp["mlp"]["fc1"]["bias"])
            sd[pre + "output.dense.weight"] = t(lp["mlp"]["fc2"]["kernel"]).T
            sd[pre + "output.dense.bias"] = t(lp["mlp"]["fc2"]["bias"])
            sd[pre + "output.LayerNorm.weight"] = t(lp["ln2"]["scale"])
            sd[pre + "output.LayerNorm.bias"] = t(lp["ln2"]["bias"])
        return sd

    os.makedirs(save_dir, exist_ok=True)
    sd = bert_to_sd(params["doc_encoder"], cfg.bert)
    sd["linear.weight"] = t(params["linear"]["kernel"]).T
    torch.save(sd, os.path.join(save_dir, "pytorch_model.bin"))
    if "vision_projection" in params:
        mlp = params["vision_projection"]["mlp"]
        vp = {}
        for layer, torch_idx in (("dense_0", 0), ("dense_1", 2)):
            if layer in mlp:
                vp[f"model.{torch_idx}.weight"] = t(mlp[layer]["kernel"]).T
                vp[f"model.{torch_idx}.bias"] = t(mlp[layer]["bias"])
        torch.save(vp, os.path.join(save_dir, "vision_projection.pt"))
    if "query_encoder" in params:
        qsd = bert_to_sd(params["query_encoder"], cfg.bert)
        torch.save(qsd, os.path.join(save_dir,
                                     "query_encoder_pytorch_model.bin"))
