"""CLIP-style ViT vision encoder in Flax, with HF checkpoint conversion.

The reference extracts image features with HF CLIPVisionModel / ViTModel
(offline: /root/reference/src/data_ops/vqa_data_ops.py:834-1444; in-graph:
/root/reference/src/models/retriever/FLMR.py:160-292). This module supports
both use cases: batch feature extraction (CLS last_hidden_state[:, 0]) and
in-graph encoding for FLMRWithVisionModel-style end-to-end training.
"""

from __future__ import annotations

import dataclasses
from typing import Any

import flax.linen as nn
import jax.numpy as jnp
import numpy as np

from .transformer import EncoderConfig, TransformerEncoder


@dataclasses.dataclass(frozen=True)
class ViTConfig:
    image_size: int = 224
    patch_size: int = 16
    hidden_size: int = 768
    num_layers: int = 12
    num_heads: int = 12
    intermediate_size: int = 3072
    layer_norm_eps: float = 1e-5
    activation: str = "quick_gelu"      # CLIP; plain ViT uses "gelu"
    use_pre_layernorm: bool = True      # CLIP has pre_layrnorm before blocks
    global_pool: bool = False           # MAE-style mean-pool instead of CLS
    dtype: Any = jnp.float32
    param_dtype: Any = jnp.float32       # parameter storage dtype
    remat: bool = False                  # per-layer backward remat

    @property
    def num_patches(self) -> int:
        return (self.image_size // self.patch_size) ** 2

    @property
    def encoder_cfg(self) -> EncoderConfig:
        return EncoderConfig(
            hidden_size=self.hidden_size,
            num_layers=self.num_layers,
            num_heads=self.num_heads,
            intermediate_size=self.intermediate_size,
            activation=self.activation,
            layer_norm_eps=self.layer_norm_eps,
            pre_layernorm=True,
            dtype=self.dtype,
            param_dtype=self.param_dtype,
            remat=self.remat,
        )

    @staticmethod
    def tiny(**kw) -> "ViTConfig":
        base = dict(image_size=32, patch_size=8, hidden_size=64, num_layers=2,
                    num_heads=4, intermediate_size=128)
        base.update(kw)
        return ViTConfig(**base)

    @staticmethod
    def clip_base_p16() -> "ViTConfig":
        return ViTConfig()  # openai/clip-vit-base-patch16

    @staticmethod
    def clip_large_p14() -> "ViTConfig":
        return ViTConfig(patch_size=14, hidden_size=1024, num_layers=24,
                         num_heads=16, intermediate_size=4096)

    @staticmethod
    def clip_g_p14() -> "ViTConfig":
        # laion CLIP-ViT-bigG sizes (PreFLMR ViT-G; vision_embedding 1664)
        return ViTConfig(patch_size=14, hidden_size=1664, num_layers=48,
                         num_heads=16, intermediate_size=8192,
                         activation="gelu")


class CLIPVisionModel(nn.Module):
    cfg: ViTConfig

    @nn.compact
    def __call__(self, pixel_values, deterministic=True):
        """pixel_values: (B, H, W, 3) float. Returns (last_hidden, cls)."""
        cfg = self.cfg
        b = pixel_values.shape[0]
        x = nn.Conv(cfg.hidden_size,
                    kernel_size=(cfg.patch_size, cfg.patch_size),
                    strides=(cfg.patch_size, cfg.patch_size),
                    use_bias=False, dtype=cfg.dtype,
                    param_dtype=cfg.param_dtype,
                    name="patch_embedding")(pixel_values.astype(cfg.dtype))
        x = x.reshape(b, -1, cfg.hidden_size)            # (B, P, H)
        cls = self.param("class_embedding", nn.initializers.normal(0.02),
                         (cfg.hidden_size,), cfg.param_dtype)
        cls = jnp.broadcast_to(cls.astype(cfg.dtype), (b, 1, cfg.hidden_size))
        x = jnp.concatenate([cls, x], axis=1)
        pos = self.param("position_embedding", nn.initializers.normal(0.02),
                         (cfg.num_patches + 1, cfg.hidden_size),
                         cfg.param_dtype)
        x = x + pos.astype(cfg.dtype)[None]
        if cfg.use_pre_layernorm:
            x = nn.LayerNorm(epsilon=cfg.layer_norm_eps, dtype=jnp.float32,
                             name="pre_layernorm")(x).astype(cfg.dtype)
        x = TransformerEncoder(cfg.encoder_cfg, name="encoder")(
            x, None, deterministic)
        # MAE-style global pooling (reference models_vit.py:20-94
        # forward_features global_pool branch) vs CLIP CLS pooling
        rep = jnp.mean(x[:, 1:], axis=1) if cfg.global_pool else x[:, 0]
        pooled = nn.LayerNorm(epsilon=cfg.layer_norm_eps, dtype=jnp.float32,
                              name="post_layernorm")(rep)
        return x, pooled.astype(cfg.dtype)


def convert_hf_clip_vision_params(state_dict: dict, cfg: ViTConfig,
                                  prefix: str = "vision_model.") -> dict:
    """Convert HF CLIPVisionModel torch weights to this module's params."""
    def g(name):
        t = state_dict[prefix + name]
        return np.asarray(getattr(t, "detach", lambda: t)()).astype(np.float32)

    h, nh = cfg.hidden_size, cfg.num_heads
    hd = h // nh
    p: dict = {
        # torch conv weight (out, in, kh, kw) -> flax (kh, kw, in, out)
        "patch_embedding": {"kernel": g("embeddings.patch_embedding.weight")
                            .transpose(2, 3, 1, 0)},
        "class_embedding": g("embeddings.class_embedding"),
        "position_embedding": g("embeddings.position_embedding.weight"),
        "post_layernorm": {"scale": g("post_layernorm.weight"),
                           "bias": g("post_layernorm.bias")},
        "encoder": {},
    }
    if cfg.use_pre_layernorm:
        p["pre_layernorm"] = {"scale": g("pre_layrnorm.weight"),
                              "bias": g("pre_layrnorm.bias")}
    for i in range(cfg.num_layers):
        pre = f"encoder.layers.{i}."
        def lin(name):
            return g(pre + name + ".weight").T, g(pre + name + ".bias")
        qk, qb = lin("self_attn.q_proj")
        kk, kb = lin("self_attn.k_proj")
        vk, vb = lin("self_attn.v_proj")
        ok, ob = lin("self_attn.out_proj")
        f1k, f1b = lin("mlp.fc1")
        f2k, f2b = lin("mlp.fc2")
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
            "ln1": {"scale": g(pre + "layer_norm1.weight"),
                    "bias": g(pre + "layer_norm1.bias")},
            "mlp": {"fc1": {"kernel": f1k, "bias": f1b},
                    "fc2": {"kernel": f2k, "bias": f2b}},
            "ln2": {"scale": g(pre + "layer_norm2.weight"),
                    "bias": g(pre + "layer_norm2.bias")},
        }
    return p


# ---------------------------------------------------------------------------
# CLIP image preprocessing (resize + center-crop + normalize), jit-friendly
# ---------------------------------------------------------------------------

CLIP_IMAGE_MEAN = np.array([0.48145466, 0.4578275, 0.40821073], np.float32)
CLIP_IMAGE_STD = np.array([0.26862954, 0.26130258, 0.27577711], np.float32)


def clip_preprocess(images: jnp.ndarray, image_size: int = 224) -> jnp.ndarray:
    """(B, H, W, 3) uint8/float [0,255] -> (B, S, S, 3) normalized float32.

    Bilinear resize to (S, S) + CLIP normalization, as one XLA program
    (replaces the reference's PIL/torchvision CPU preprocessing).
    """
    import jax
    x = images.astype(jnp.float32) / 255.0
    x = jax.image.resize(x, (x.shape[0], image_size, image_size, 3),
                         method="bilinear")
    return (x - CLIP_IMAGE_MEAN) / CLIP_IMAGE_STD
