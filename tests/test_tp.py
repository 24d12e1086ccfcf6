"""Tensor-parallel sharding: T5 forward is numerically identical with
TP-sharded params on a (data=2, model=4) mesh, and params actually shard."""

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P

from ravqa_tpu.models import T5Config, T5Model
from ravqa_tpu.parallel import apply_tp, make_mesh, tp_sharding


def test_t5_tp_forward_matches_replicated():
    cfg = T5Config.tiny(d_model=64, d_kv=16, num_heads=4, d_ff=128)
    model = T5Model(cfg)
    rng = np.random.default_rng(0)
    ids = jnp.array(rng.integers(2, 512, (4, 6)), jnp.int32)
    mask = jnp.ones((4, 6), jnp.int32)
    dec = jnp.array(rng.integers(2, 512, (4, 3)), jnp.int32)
    params = model.init(jax.random.PRNGKey(0), ids, mask, dec)["params"]
    want = np.asarray(model.apply({"params": params}, ids, mask, dec))

    mesh = make_mesh({"data": 2, "model": 4})
    specs = tp_sharding(params, mesh)
    # attention q kernel (64, 4, 16): heads dim sharded over model
    qspec = specs["encoder_0"]["self_attn"]["q"]["kernel"].spec
    assert qspec == P(None, "model", None)
    # mlp wi (64, 128): d_ff sharded; wo (128, 64): d_ff sharded
    assert specs["encoder_0"]["ff"]["wi"]["kernel"].spec == P(None, "model")
    assert specs["encoder_0"]["ff"]["wo"]["kernel"].spec == P("model", None)

    tp_params = apply_tp(params, mesh)
    with mesh:
        got = jax.jit(lambda p, i, m, d: model.apply({"params": p}, i, m, d),
                      in_shardings=(tp_sharding(params, mesh),
                                    NamedSharding(mesh, P("data")),
                                    NamedSharding(mesh, P("data")),
                                    NamedSharding(mesh, P("data"))),
                      )(tp_params, ids, mask, dec)
    np.testing.assert_allclose(np.asarray(got), want, rtol=2e-5, atol=2e-5)
    # params are actually distributed
    k = tp_params["encoder_0"]["self_attn"]["q"]["kernel"]
    assert len(k.sharding.device_set) == 8 or \
        k.sharding.spec == P(None, "model", None)
