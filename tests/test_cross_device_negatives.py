"""gather_with_local_grads: mesh-wide negative gathering (reference
negative_samples_across_gpus, retriever_dpr.py:103-137)."""

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import PartitionSpec as P

from ravqa_tpu.parallel import gather_with_local_grads, make_mesh


def test_gather_with_local_grads():
    mesh = make_mesh({"data": 8})
    b, d = 2, 4
    x = jnp.arange(8 * b * d, dtype=jnp.float32).reshape(8 * b, d)

    def inner(x_local):
        return gather_with_local_grads(x_local, "data")

    f = jax.jit(jax.shard_map(inner, mesh=mesh, in_specs=P("data"),
                              out_specs=P("data"), check_vma=False))
    out = f(x)
    # every shard gathered the full global batch -> output dim0 = 8 * (8b)?
    # out_specs P("data") splits dim0 across shards again: global result
    # is (8 * 8b / 8) * 8 = 8*2*8 = 128 rows... simpler: check via one shard
    def inner_full(x_local):
        g = gather_with_local_grads(x_local, "data")
        return jnp.sum(g, axis=0, keepdims=True)  # same on all shards

    f2 = jax.jit(jax.shard_map(inner_full, mesh=mesh, in_specs=P("data"),
                               out_specs=P("data"), check_vma=False))
    sums = np.asarray(f2(x))            # (8, d): per-shard total over gather
    for r in range(1, 8):
        np.testing.assert_allclose(sums[r], sums[0])  # gather saw all rows
    np.testing.assert_allclose(sums[0], np.asarray(x).sum(0))

    # gradients flow ONLY to the local shard's contribution
    def loss(x):
        def inner_l(x_local):
            g = gather_with_local_grads(x_local, "data")
            # weight remote rows so a detach bug would show up in grads
            w = jnp.arange(g.shape[0], dtype=jnp.float32)[:, None]
            return jnp.sum(g * w, axis=0, keepdims=True) / g.shape[0]
        y = jax.shard_map(inner_l, mesh=mesh, in_specs=P("data"),
                          out_specs=P("data"), check_vma=False)(x)
        return jnp.sum(y)

    g = np.asarray(jax.jit(jax.grad(loss))(x))
    # each row i of x appears once in every shard's gather at global slot i
    # with weight i; only the LOCAL copy carries grad -> grad = i / (8b)
    want = np.repeat(np.arange(16, dtype=np.float32), 1)[:, None] / 16.0
    np.testing.assert_allclose(g, np.broadcast_to(want, g.shape), rtol=1e-5)
