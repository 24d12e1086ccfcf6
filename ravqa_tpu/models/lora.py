"""LoRA adapters — functional merge-on-the-fly.

Replaces the reference's custom peft wrapper
(/root/reference/src/models/custom_peft.py, LoRA r=8 α=32 on the BLIP-2
generator, rag_model_blip.py:242-254) with the idiomatic-JAX formulation:
LoRA params live in their own pytree; `merge_lora` computes
W_eff = W + (α/r)·A@B on the fly inside the jitted step (XLA fuses the
rank-r update into the consumer matmul chain); the optimizer trains only the
LoRA tree. Exact LoRA semantics, zero model-code changes.
"""

from __future__ import annotations

from typing import Callable, Sequence

import jax
import jax.numpy as jnp


def _match(path_keys: tuple[str, ...], targets: Sequence[str]) -> bool:
    joined = "/".join(path_keys)
    return any(t in joined for t in targets)


def _path_keys(path) -> tuple[str, ...]:
    return tuple(p.key if hasattr(p, "key") else str(p) for p in path)


def init_lora(params, rank: int = 8, targets: Sequence[str] = ("q", "v"),
              rng: jax.Array | None = None, dtype=jnp.float32):
    """Build the LoRA pytree: for every 2D+ kernel whose path matches a
    target substring, A ~ N(0, 0.02) (in, r) and B = 0 (r, out)."""
    if rng is None:
        rng = jax.random.PRNGKey(0)
    flat = jax.tree_util.tree_flatten_with_path(params)[0]
    keys = jax.random.split(rng, max(len(flat), 1))
    lora = {}
    for (path, leaf), key in zip(flat, keys):
        pk = _path_keys(path)
        if pk[-1] != "kernel" or leaf.ndim < 2:
            continue
        if not _match(pk[:-1], targets):
            continue
        # DenseGeneral kernels can be >2D (e.g. (d_model, heads, d_kv)):
        # treat the first axis as input, the rest as (flattened) output.
        in_dim = int(leaf.shape[0])
        out_dim = np_prod(leaf.shape[1:])
        a = jax.random.normal(key, (in_dim, rank), dtype) * 0.02
        b = jnp.zeros((rank, out_dim), dtype)
        node = lora
        for k in pk[:-1]:
            node = node.setdefault(k, {})
        node["lora_a"] = a
        node["lora_b"] = b
    return lora


def np_prod(shape) -> int:
    out = 1
    for s in shape:
        out *= int(s)
    return out


def merge_lora(params, lora, alpha: float = 32.0, rank: int = 8):
    """W_eff = W + (alpha/rank) * A @ B, reshaped to W's shape."""
    scale = alpha / rank

    def walk(p, l):
        if not isinstance(l, dict):
            return p
        if "lora_a" in l:
            out = dict(p)
            w = p["kernel"]
            delta = (l["lora_a"] @ l["lora_b"]).reshape(w.shape) * scale
            out["kernel"] = w + delta.astype(w.dtype)
            for k in l:
                if k not in ("lora_a", "lora_b"):
                    out[k] = walk(p[k], l[k])
            return out
        out = dict(p)
        for k, sub in l.items():
            if k in p:
                out[k] = walk(p[k], sub)
        return out

    return walk(params, lora)


def count_lora_params(lora) -> int:
    return sum(x.size for x in jax.tree.leaves(lora))
