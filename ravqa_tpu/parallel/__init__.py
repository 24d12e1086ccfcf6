from .mesh import batch_sharding, make_mesh, replicated, shard_batch
from .partition import (FREEZE_FLAG_PREFIXES, fsdp_sharding,
                        gather_with_local_grads, trainable_mask)

__all__ = ["batch_sharding", "make_mesh", "replicated", "shard_batch",
           "FREEZE_FLAG_PREFIXES", "fsdp_sharding",
           "gather_with_local_grads", "trainable_mask"]

from .tp import apply_tp, tp_sharding  # noqa: E402
__all__ += ["apply_tp", "tp_sharding"]
