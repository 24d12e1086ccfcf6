"""Device-mesh construction and sharding helpers.

One SPMD program over a jax.sharding.Mesh replaces the reference's three
runtimes (Lightning DDP, mp-spawn ColBERT Launcher, single-process searcher)
— SURVEY.md §2.6. Axis conventions:

  "data"  — batch/data parallel (training) — also used as the index axis for
            validation-time search (the KB shards over the same devices);
  "model" — optional tensor parallelism for large generators (BLIP-2 scale).
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(axes: Optional[dict[str, int]] = None,
              devices: Optional[Sequence] = None) -> Mesh:
    """Create a mesh. Default: all devices on one 'data' axis."""
    if devices is None:
        devices = jax.devices()
    if axes is None:
        axes = {"data": len(devices)}
    names = tuple(axes.keys())
    shape = tuple(axes.values())
    n = int(np.prod(shape))
    assert n <= len(devices), f"need {n} devices, have {len(devices)}"
    arr = np.asarray(devices[:n]).reshape(shape)
    return Mesh(arr, names)


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def batch_sharding(mesh: Mesh, axis: str = "data") -> NamedSharding:
    """Shard dim 0 (batch) over `axis`."""
    return NamedSharding(mesh, P(axis))


def shard_batch(batch: dict, mesh: Mesh, axis: str = "data") -> dict:
    """device_put every array in the batch with dim-0 sharding."""
    sh = batch_sharding(mesh, axis)
    return jax.tree.map(lambda x: jax.device_put(x, sh), batch)
