"""Full-state checkpointing: resume is bit-identical to uninterrupted
training (Lightning-.ckpt semantics — Adam moments, MultiSteps accumulation
counter, LR-schedule position, and the step RNG all persist; the reference
even hand-hacks scheduler resume, src/executors/FLMR_executor.py:332), and
FSDP shards the optimizer state instead of replicating it (ZeRO-3)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ravqa_tpu.executors import FLMRExecutor, TrainConfig
from ravqa_tpu.models import BertConfig, FLMRModelConfig, FLMRRetriever
from ravqa_tpu.parallel import make_mesh


def make_world(n_batches=8, seed=3):
    cfg = FLMRModelConfig.tiny(
        bert=BertConfig.tiny(vocab_size=512, hidden_size=64,
                             intermediate_size=128),
        vision_dim=8, prefix_len=2, dim=16)
    model = FLMRRetriever(cfg)
    rng = np.random.default_rng(seed)

    def mk_batch():
        return dict(
            query_input_ids=jnp.array(rng.integers(1, 512, (8, 8)),
                                      jnp.int32),
            query_attention_mask=jnp.ones((8, 8), jnp.int32),
            image_features=jnp.array(rng.normal(size=(8, 8)), jnp.float32),
            doc_input_ids=jnp.array(rng.integers(1, 512, (16, 10)),
                                    jnp.int32),
            doc_attention_mask=jnp.ones((16, 10), jnp.int32),
        )

    batches = [mk_batch() for _ in range(n_batches)]
    params = model.init(jax.random.PRNGKey(0), **batches[0])["params"]
    return model, params, batches


# warmup + linear decay + accumulation: the exact combination whose state
# (schedule counts, MultiSteps counter, Adam moments) a params-only
# checkpoint silently resets on resume
TRAIN_CFG = TrainConfig(lr=1e-3, warmup_steps=4, total_steps=8,
                        schedule="linear", accumulate_grad_batches=2)


@pytest.mark.parametrize("backend", ["msgpack", "orbax"])
def test_resume_parity(tmp_path, backend):
    model, params, batches = make_world()

    # uninterrupted run: 8 micro-steps (4 optimizer updates)
    ex = FLMRExecutor(model, params, TRAIN_CFG, quiet=True)
    for b in batches:
        ex.train_step(b)
    ref_params = jax.device_get(ex.state.params)

    # interrupted run: 4 micro-steps (save lands MID-schedule with a
    # half-full accumulator is avoided — 4 = 2 full updates — but warmup
    # is still in progress), save, fresh executor resumes 4 more
    ex1 = FLMRExecutor(model, params, TRAIN_CFG, quiet=True)
    for b in batches[:4]:
        ex1.train_step(b)
    ex1.save_checkpoint(str(tmp_path / "ck"), backend=backend)

    ex2 = FLMRExecutor(model, params, TRAIN_CFG, quiet=True)
    if backend == "orbax":
        ex2.load_checkpoint_orbax(str(tmp_path / "ck"))
    else:
        ex2.load_checkpoint(str(tmp_path / "ck"))
    assert int(ex2.state.step) == 4
    for b in batches[4:]:
        ex2.train_step(b)

    for a, b in zip(jax.tree.leaves(ref_params),
                    jax.tree.leaves(jax.device_get(ex2.state.params))):
        np.testing.assert_array_equal(a, b)


def test_resume_mid_accumulation(tmp_path):
    """Saving after an ODD micro-step (half-full MultiSteps accumulator)
    still resumes bit-identically — the accumulated grads persist too."""
    model, params, batches = make_world()
    ex = FLMRExecutor(model, params, TRAIN_CFG, quiet=True)
    for b in batches:
        ex.train_step(b)
    ref_params = jax.device_get(ex.state.params)

    ex1 = FLMRExecutor(model, params, TRAIN_CFG, quiet=True)
    for b in batches[:3]:
        ex1.train_step(b)
    ex1.save_checkpoint(str(tmp_path / "ck"))
    ex2 = FLMRExecutor(model, params, TRAIN_CFG, quiet=True)
    ex2.load_checkpoint(str(tmp_path / "ck"))
    for b in batches[3:]:
        ex2.train_step(b)
    for a, b in zip(jax.tree.leaves(ref_params),
                    jax.tree.leaves(jax.device_get(ex2.state.params))):
        np.testing.assert_array_equal(a, b)


def test_params_only_checkpoint_still_loads(tmp_path):
    """Back-compat: a pre-round-3 checkpoint (params+step only) loads with
    a fresh opt_state instead of crashing."""
    import os
    model, params, batches = make_world(n_batches=2)
    ex = FLMRExecutor(model, params, TRAIN_CFG, quiet=True)
    ex.train_step(batches[0])
    ex.save_checkpoint(str(tmp_path / "ck"))
    os.remove(tmp_path / "ck" / "opt_state.msgpack")
    os.remove(tmp_path / "ck" / "rng.msgpack")
    ex2 = FLMRExecutor(model, params, TRAIN_CFG, quiet=True)
    ex2.load_checkpoint(str(tmp_path / "ck"))
    assert int(ex2.state.step) == 1
    m = ex2.train_step(batches[1])
    assert np.isfinite(float(m["loss"]))


def _addressable_fraction(tree):
    """Bytes on device 0 / total logical bytes across the tree's arrays."""
    local = total = 0
    for leaf in jax.tree.leaves(tree):
        if not hasattr(leaf, "addressable_shards"):
            continue
        shard0 = [s for s in leaf.addressable_shards if s.device ==
                  jax.devices()[0]]
        local += sum(int(np.prod(s.data.shape)) * leaf.dtype.itemsize
                     for s in shard0)
        total += leaf.nbytes
    return local / max(total, 1)


def test_fsdp_shards_opt_state():
    """Adam moments follow their params' FSDP sharding: per-device
    opt-state bytes ~= 1/8 of logical, and training matches the
    replicated-mesh run."""
    mesh = make_mesh({"data": 8})
    model, params, batches = make_world()

    ex_rep = FLMRExecutor(model, params, TrainConfig(lr=1e-3), mesh=mesh,
                          quiet=True)
    ex_fsdp = FLMRExecutor(model, params, TrainConfig(lr=1e-3), mesh=mesh,
                           quiet=True, param_sharding="fsdp",
                           fsdp_min_size=1024)

    frac = _addressable_fraction(ex_fsdp.state.opt_state)
    # moments of all >=1024-element params shard 8 ways; scalar counts and
    # tiny biases stay replicated — device 0 should hold well under half
    assert frac < 0.35, frac
    assert _addressable_fraction(ex_rep.state.opt_state) == pytest.approx(1.0)

    # one step: Adam moments are LINEAR/quadratic in the grads, so they
    # must match tightly (params themselves go through g/(|g|+eps), which
    # amplifies sharded-reduction-order noise and is checked loosely below)
    m_rep = ex_rep.train_step(batches[0])
    m_fsdp = ex_fsdp.train_step(batches[0])
    np.testing.assert_allclose(float(m_rep["loss"]), float(m_fsdp["loss"]),
                               rtol=1e-5)
    for a, b in zip(jax.tree.leaves(jax.device_get(ex_rep.state.opt_state)),
                    jax.tree.leaves(jax.device_get(ex_fsdp.state.opt_state))):
        if np.issubdtype(np.asarray(a).dtype, np.floating):
            np.testing.assert_allclose(a, b, atol=1e-6)
    for b in batches[1:3]:
        m_rep = ex_rep.train_step(b)
        m_fsdp = ex_fsdp.train_step(b)
    np.testing.assert_allclose(float(m_rep["loss"]), float(m_fsdp["loss"]),
                               rtol=1e-3)
    for a, b in zip(jax.tree.leaves(jax.device_get(ex_rep.state.params)),
                    jax.tree.leaves(jax.device_get(ex_fsdp.state.params))):
        np.testing.assert_allclose(a, b, atol=5e-3)


def test_fsdp_checkpoint_roundtrip(tmp_path):
    """Save from an FSDP-sharded executor, restore into a fresh one —
    restored opt_state keeps the FSDP shardings."""
    mesh = make_mesh({"data": 8})
    model, params, batches = make_world(n_batches=4)
    ex = FLMRExecutor(model, params, TRAIN_CFG, mesh=mesh, quiet=True,
                      param_sharding="fsdp", fsdp_min_size=1024)
    for b in batches[:2]:
        ex.train_step(b)
    ex.save_checkpoint(str(tmp_path / "ck"))
    ex2 = FLMRExecutor(model, params, TRAIN_CFG, mesh=mesh, quiet=True,
                       param_sharding="fsdp", fsdp_min_size=1024)
    ex2.load_checkpoint(str(tmp_path / "ck"))
    assert _addressable_fraction(ex2.state.opt_state) < 0.35
    for b in batches[2:]:
        ex.train_step(b)
        ex2.train_step(b)
    for a, b in zip(jax.tree.leaves(jax.device_get(ex.state.params)),
                    jax.tree.leaves(jax.device_get(ex2.state.params))):
        np.testing.assert_array_equal(a, b)


def test_orbax_params_only_fallback_and_full_restore_errors(tmp_path):
    """A pre-round-3 orbax checkpoint (params+step only) loads with a
    fresh opt_state; the fallback is keyed on the checkpoint CONTENTS,
    not on swallowing restore errors."""
    import orbax.checkpoint as ocp
    import os
    model, params, batches = make_world(n_batches=2)
    ex = FLMRExecutor(model, params, TRAIN_CFG, quiet=True)
    ex.train_step(batches[0])
    # write an old-format checkpoint by hand
    ckptr = ocp.StandardCheckpointer()
    p = os.path.abspath(str(tmp_path / "old" / "orbax"))
    ckptr.save(p, {"params": jax.device_get(ex.state.params),
                   "step": jax.device_get(ex.state.step)}, force=True)
    ckptr.wait_until_finished()
    ex2 = FLMRExecutor(model, params, TRAIN_CFG, quiet=True)
    ex2.load_checkpoint_orbax(str(tmp_path / "old"))
    assert int(ex2.state.step) == 1
    m = ex2.train_step(batches[1])
    assert np.isfinite(float(m["loss"]))
