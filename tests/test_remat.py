"""Per-layer rematerialization (remat flags on T5Config / BertConfig /
ViTConfig): identical params, loss, and gradients vs the non-remat path —
remat may only trade FLOPs for memory, never change numerics. This is
what lets the published flan-T5-XL / BLIP-2 / PreFLMR recipes train on
one chip (scripts/bench_rag_train.py, bench_train.py SCALE=preflmr)."""

import numpy as np
import jax
import jax.numpy as jnp


def _grads_equal(g0, g1):
    for a, b in zip(jax.tree.leaves(g0), jax.tree.leaves(g1)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-6)


def test_t5_remat_grad_parity():
    from ravqa_tpu.models import T5Config, T5Model
    m0 = T5Model(T5Config.tiny())
    m1 = T5Model(T5Config.tiny(remat=True))
    ids = jnp.arange(16, dtype=jnp.int32).reshape(2, 8) % 100
    am = jnp.ones((2, 8), jnp.int32)
    dec = jnp.ones((2, 3), jnp.int32)
    p = m0.init(jax.random.PRNGKey(0), ids, am, dec)["params"]

    def loss(m):
        def f(p):
            enc = m.apply({"params": p}, ids, am, method=type(m).encode)
            logits = m.apply({"params": p}, dec, enc, am,
                             method=type(m).decode)
            return jnp.mean(logits ** 2)
        return jax.value_and_grad(f)(p)

    (l0, g0), (l1, g1) = loss(m0), loss(m1)
    assert np.allclose(float(l0), float(l1), rtol=1e-6)
    _grads_equal(g0, g1)


def test_bert_remat_grad_parity():
    from ravqa_tpu.models import BertConfig, BertModel
    m0 = BertModel(BertConfig.tiny(vocab_size=128))
    m1 = BertModel(BertConfig.tiny(vocab_size=128, remat=True))
    ids = jnp.ones((2, 8), jnp.int32)
    am = jnp.ones((2, 8), jnp.int32)
    p = m0.init(jax.random.PRNGKey(0), ids, am)["params"]

    def loss(m):
        f = lambda p: jnp.mean(m.apply({"params": p}, ids, am)[0] ** 2)
        return jax.value_and_grad(f)(p)

    (l0, g0), (l1, g1) = loss(m0), loss(m1)
    assert np.allclose(float(l0), float(l1), rtol=1e-6)
    _grads_equal(g0, g1)


def test_vit_remat_and_param_dtype():
    import dataclasses
    from ravqa_tpu.models import ViTConfig
    from ravqa_tpu.models.vit import CLIPVisionModel
    c0 = ViTConfig.tiny()
    c1 = dataclasses.replace(ViTConfig.tiny(), remat=True)
    m0, m1 = CLIPVisionModel(c0), CLIPVisionModel(c1)
    px = jnp.ones((2, 32, 32, 3), jnp.float32)
    p = m0.init(jax.random.PRNGKey(0), px)["params"]

    def loss(m):
        f = lambda p: jnp.mean(m.apply({"params": p}, px)[1] ** 2)
        return jax.value_and_grad(f)(p)

    (l0, g0), (l1, g1) = loss(m0), loss(m1)
    assert np.allclose(float(l0), float(l1), rtol=1e-6)
    _grads_equal(g0, g1)

    # bf16 param storage initializes bf16 leaves (the 1.8B-tower mode)
    cbf = dataclasses.replace(ViTConfig.tiny(), dtype=jnp.bfloat16,
                              param_dtype=jnp.bfloat16)
    pbf = CLIPVisionModel(cbf).init(jax.random.PRNGKey(0), px)["params"]
    kinds = {x.dtype for x in jax.tree.leaves(pbf)
             if hasattr(x, "dtype") and x.ndim >= 2}
    assert kinds == {jnp.dtype(jnp.bfloat16)}, kinds
