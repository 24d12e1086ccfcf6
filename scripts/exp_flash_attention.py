"""Flash attention for the BERT towers: on-chip parity + perf.

The round-5 training-MFU decomposition (STATUS.md) left "attention/softmax
VPU time" as the remaining gap at 40-45% MFU. The pallas TPU flash kernel
(jax.experimental.pallas.ops.tpu.flash_attention) never materializes the
(B, H, T, T) logits/probs tensors in HBM — at the 9-ROI training shape
(Lq=832, bs=30) those are ~1 GB f32 per tensor per layer direction.

This script measures, on one real chip:
  1. forward/grad parity: BertConfig(flash=True) vs the XLA path at the
     doc-tower (150x220) and 9-ROI query-tower (30x832) shapes, outputs
     compared at REAL token positions only (pad rows are sliced-garbage in
     the flash path by design — they are masked out of every downstream
     consumer: MaxSim doc masks, query scoring uses mask-augmented rows
     whose attention bits are real),
  2. fwd+bwd wall time per tower at both shapes.

Run: python scripts/exp_flash_attention.py
"""

import sys
import time

import numpy as np

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp

from ravqa_tpu.models import BertConfig
from ravqa_tpu.models.bert import BertModel

ON_TPU = jax.default_backend() == "tpu"
assert ON_TPU, "flash attention experiment needs the real chip"

SHAPES = [
    ("doc tower (bs30 x nway5, Ld=220)", 150, 220),
    ("query tower reference (Lq=64)", 30, 64),
    ("PreFLMR long-instruction query (Lq=512)", 30, 512),
]


def make_model(flash):
    cfg = BertConfig(dtype=jnp.bfloat16, flash=flash)
    return cfg, BertModel(cfg)


cfg0, m0 = make_model(False)
cfg1, m1 = make_model(True)
rng = jax.random.PRNGKey(0)
params = m0.init(rng, jnp.ones((2, 16), jnp.int32),
                 jnp.ones((2, 16), jnp.int32))["params"]

for name, b, t in SHAPES:
    key = jax.random.PRNGKey(b * t)
    ids = jax.random.randint(key, (b, t), 0, 30000)
    # realistic key-padding mask: ragged lengths down to t//2
    lens = jax.random.randint(jax.random.PRNGKey(1), (b,), t // 2, t + 1)
    mask = (jnp.arange(t)[None, :] < lens[:, None]).astype(jnp.int32)

    def fwd(model):
        f = jax.jit(lambda p, i, m: model.apply({"params": p}, i, m)[0])
        out = jax.block_until_ready(f(params, ids, mask))
        return f, out

    f0, o0 = fwd(m0)
    f1, o1 = fwd(m1)
    mm = mask[:, :, None].astype(jnp.float32)
    diff = jnp.max(jnp.abs((o0 - o1) * mm)) / (
        jnp.max(jnp.abs(o0 * mm)) + 1e-9)

    def loss_fn(model):
        def loss(p):
            out = model.apply({"params": p}, ids, mask)[0]
            return jnp.sum((out * mm).astype(jnp.float32) ** 2) / b
        return jax.jit(jax.value_and_grad(loss))

    g0 = loss_fn(m0)
    g1 = loss_fn(m1)
    l0, gr0 = jax.block_until_ready(g0(params))
    l1, gr1 = jax.block_until_ready(g1(params))
    gflat0 = jnp.concatenate([x.ravel().astype(jnp.float32)
                              for x in jax.tree.leaves(gr0)])
    gflat1 = jnp.concatenate([x.ravel().astype(jnp.float32)
                              for x in jax.tree.leaves(gr1)])
    gdiff = jnp.max(jnp.abs(gflat0 - gflat1)) / (jnp.max(jnp.abs(gflat0))
                                                 + 1e-9)
    print(f"{name}: fwd rel-max-diff {float(diff):.2e}  "
          f"loss {float(l0):.4f}/{float(l1):.4f}  "
          f"grad rel-max-diff {float(gdiff):.2e}", flush=True)

    for a in (gr0, gr1, o0, o1):
        jax.tree.map(lambda x: x.delete(), a)
    del gr0, gr1, o0, o1

    # perf: fwd+bwd, blocking each step (unthrottled dispatch OOMs on the
    # 20 in-flight 440 MB grad trees)
    for tag, g in (("xla", g0), ("flash", g1)):
        iters = 20
        jax.tree.map(lambda x: x.delete(), jax.block_until_ready(g(params)))
        t0 = time.perf_counter()
        for _ in range(iters):
            out = jax.block_until_ready(g(params))
            jax.tree.map(lambda x: x.delete(), out)
        dt = (time.perf_counter() - t0) / iters
        print(f"  {tag:6s} fwd+bwd: {dt*1e3:7.1f} ms", flush=True)
