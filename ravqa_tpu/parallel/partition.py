"""Parameter partitioning + cross-device negative gathering.

- trainable_mask: optax-style bool pytree implementing the reference's
  freeze flags (freeze_colbert_doc_encoder / freeze_mapping_network /
  freeze_question_encoder / freeze_image_encoder — FLMR.py:52-68,
  FLMR_executor.py:290-365) without mutating the model.
- gather_negatives: mesh-wide all_gather of doc/query embeddings for
  cross-device in-batch negatives (reference `negative_samples_across_gpus`,
  retriever_dpr.py:103-137 / colbert.py:115-163). With jax the local shard
  keeps gradients and remote shards are stop_gradient'ed, matching the
  reference's detach-then-reinsert trick.
- fsdp_sharding: optional FSDP-style param sharding rule for big generators.
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

# module-flag -> param-path prefixes ("/"-joined, matched against the start
# of the flattened param path) that the flag freezes
FREEZE_FLAG_PREFIXES = {
    "freeze_colbert_doc_encoder": ("doc_encoder", "linear"),
    "freeze_question_encoder": ("query_encoder",),
    "freeze_mapping_network": ("vision_projection",),
    "freeze_image_encoder": ("vision_model",),
    "freeze_generator_base": ("generator/base",),
}


def trainable_mask(params, modules: list[str]):
    """Bool pytree: True = trainable, honoring reference freeze flags.

    Prefixes match at ANY '/'-aligned path boundary, not just the tree
    root — RagExecutor nests the retriever under "retriever/", so e.g.
    freeze_mapping_network must also freeze
    "retriever/vision_projection/..." during RAG joint training (the
    reference passes the same module flags through, RAG_BLIP executor
    configs)."""
    frozen_prefixes: tuple[str, ...] = ()
    for flag, prefixes in FREEZE_FLAG_PREFIXES.items():
        if flag in modules:
            frozen_prefixes += prefixes

    def is_trainable(path) -> bool:
        parts = [p.key if hasattr(p, "key") else str(p) for p in path]
        for pre in frozen_prefixes:
            npre = pre.count("/") + 1
            for start in range(len(parts) - npre + 1):
                if "/".join(parts[start:start + npre]) == pre:
                    return False
        return True

    return jax.tree_util.tree_map_with_path(
        lambda path, _: is_trainable(path), params)


def gather_with_local_grads(x: jax.Array, axis: str) -> jax.Array:
    """all_gather over `axis`; only the local shard carries gradients.

    Must be called inside shard_map/pjit with `axis` in scope. Output dim 0
    is num_devices * local_batch.
    """
    gathered = jax.lax.all_gather(jax.lax.stop_gradient(x), axis)  # (W, b, …)
    w = gathered.shape[0]
    my = jax.lax.axis_index(axis)
    # reinsert the grad-carrying local shard at our slot
    gathered = jax.lax.dynamic_update_index_in_dim(gathered, x, my, 0)
    return gathered.reshape((-1,) + x.shape[1:])


def fsdp_sharding(params, mesh: Mesh, axis: str = "data",
                  min_size: int = 2 ** 18):
    """NamedSharding pytree: shard the largest divisible dim of big params."""
    def rule(p):
        if p.size < min_size:
            return NamedSharding(mesh, P())
        n = mesh.shape[axis]
        dims = [None] * p.ndim
        order = sorted(range(p.ndim), key=lambda d: -p.shape[d])
        for d in order:
            if p.shape[d] % n == 0:
                dims[d] = axis
                break
        return NamedSharding(mesh, P(*dims))
    return jax.tree.map(rule, params)
