"""Tensor-parallel parameter partitioning (Megatron-style) for the
transformer towers, over a "model" mesh axis.

The reference never shards models (its biggest generator is BLIP2-flan-T5-XL
trained DDP — SURVEY.md §2.6); on TPU pods TP is how flan-T5-XL/XXL-scale
generators serve within HBM. GSPMD propagates activation shardings from
these parameter shardings; XLA inserts the all-reduces:

- attention q/k/v DenseGeneral kernels (d_model, heads, d_kv): heads sharded;
- attention output (heads, d_kv, d_model): heads sharded (row-parallel);
- MLP up-projections (d_model, d_ff): d_ff sharded (column-parallel);
- MLP down-projection (d_ff, d_model): d_ff sharded (row-parallel);
- embeddings / layernorms / biases: replicated.
"""

from __future__ import annotations

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

# param-name -> (rule applied to the kernel's dims)
_COLUMN_PARALLEL = {"q", "k", "v", "query", "key", "value", "wi", "wi_0",
                    "wi_1", "fc1", "intermediate_query"}
_ROW_PARALLEL = {"o", "out", "wo", "fc2", "output", "output_query",
                 "projection"}


def tp_sharding(params, mesh: Mesh, axis: str = "model"):
    """NamedSharding pytree for transformer params over the `axis` axis.

    Works for the T5Model/BertModel/Blip2T5 param trees in this repo (their
    leaf module names follow the sets above). Unknown kernels replicate.
    """
    n = mesh.shape[axis]

    def rule(path, leaf):
        keys = [p.key if hasattr(p, "key") else str(p) for p in path]
        if keys[-1] not in ("kernel",) or leaf.ndim < 2:
            return NamedSharding(mesh, P())
        owner = keys[-2]
        if owner in _COLUMN_PARALLEL:
            # shard the output dim(s): last dim for 2D, heads dim for 3D
            dim = 1 if leaf.ndim == 2 else 1
            if leaf.shape[dim] % n == 0:
                spec = [None] * leaf.ndim
                spec[dim] = axis
                return NamedSharding(mesh, P(*spec))
        if owner in _ROW_PARALLEL:
            # shard the input dim: first dim (2D) / heads dim (3D out proj)
            dim = 0
            if leaf.shape[dim] % n == 0:
                spec = [None] * leaf.ndim
                spec[dim] = axis
                return NamedSharding(mesh, P(*spec))
        return NamedSharding(mesh, P())

    return jax.tree_util.tree_map_with_path(rule, params)


def apply_tp(params, mesh: Mesh, axis: str = "model"):
    """device_put the params with tp_sharding specs."""
    return jax.tree.map(jax.device_put, params, tp_sharding(params, mesh,
                                                            axis))
