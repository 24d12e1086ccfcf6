"""The FLMR vision->late-interaction mapping network.

Reference: /root/reference/src/models/retriever/FLMR.py:20-31,44-50 — an MLP
(vision_dim -> (lm_dim*prefix)/2 -> lm_dim*prefix) with Tanh between layers,
whose output reshapes to `prefix_length` extra 128-d query tokens per image
(or per ROI).
"""

from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax.numpy as jnp


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
