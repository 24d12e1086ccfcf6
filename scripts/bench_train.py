"""FLMR training throughput on the real TPU chip at the reference's
published scale: BERT-base towers, batch 30, nway 5 (1 pos + 4 negs),
query_maxlen 32 + 32 vision prefix tokens, doc_maxlen 220
(reference README.md:130-131 trains this on one GPU at bs30 grad-accum 4).

Run: python scripts/bench_train.py
     SCALE=preflmr python scripts/bench_train.py
       -> PreFLMR-scale: in-graph CLIP-ViT-bigG tower (1.8B, bf16 params,
          frozen per the PreFLMR recipe), transformer mapping network +
          FLIPR interaction, pixels in, bs8 — the M2KR pretraining shape
          on ONE chip.
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp

from ravqa_tpu.executors import FLMRExecutor, TrainConfig
from ravqa_tpu.models import (BertConfig, FLMRModelConfig, FLMRRetriever,
                              ViTConfig)

SCALE = os.environ.get("SCALE", "base")
rng = np.random.default_rng(0)
if SCALE == "preflmr":
    B, NWAY, LQ, LD = 8, 2, 32, 220
    vit = ViTConfig.clip_g_p14()
    vit = __import__("dataclasses").replace(
        vit, dtype=jnp.bfloat16, param_dtype=jnp.bfloat16, remat=True)
    cfg = FLMRModelConfig(
        bert=BertConfig(dtype=jnp.bfloat16), dim=128,
        vision_dim=vit.hidden_size, prefix_len=32, nway=NWAY,
        use_ib_negatives=True, in_graph_vision=True, vit=vit,
        use_transformer_mapping=True, interaction="flipr",
        flipr_query_part_len=LQ, flipr_k1=24, flipr_k2=16,
        vision_patch_dim=vit.hidden_size)
    model = FLMRRetriever(cfg)
    batch = dict(
        query_input_ids=jnp.array(rng.integers(1, 30000, (B, LQ)),
                                  jnp.int32),
        query_attention_mask=jnp.ones((B, LQ), jnp.int32),
        pixel_values=jnp.array(rng.normal(size=(B, 224, 224, 3)),
                               jnp.float32),
        doc_input_ids=jnp.array(rng.integers(1, 30000, (B * NWAY, LD)),
                                jnp.int32),
        doc_attention_mask=jnp.ones((B * NWAY, LD), jnp.int32),
    )
    train_cfg = TrainConfig(lr=1e-5, modules=("freeze_image_encoder",))
else:
    B, NWAY, LQ, LD = 30, 5, 32, 220
    cfg = FLMRModelConfig(
        bert=BertConfig(dtype=jnp.bfloat16), dim=128, vision_dim=768,
        prefix_len=32, nway=NWAY, use_ib_negatives=True)
    model = FLMRRetriever(cfg)
    batch = dict(
        query_input_ids=jnp.array(rng.integers(1, 30000, (B, LQ)),
                                  jnp.int32),
        query_attention_mask=jnp.ones((B, LQ), jnp.int32),
        image_features=jnp.array(rng.normal(size=(B, 768)), jnp.float32),
        doc_input_ids=jnp.array(rng.integers(1, 30000, (B * NWAY, LD)),
                                jnp.int32),
        doc_attention_mask=jnp.ones((B * NWAY, LD), jnp.int32),
    )
    train_cfg = TrainConfig(lr=1e-5)
params = model.init(jax.random.PRNGKey(0), **batch)["params"]
n_params = sum(x.size for x in jax.tree.leaves(params))
print(f"params: {n_params/1e6:.1f}M ({SCALE})", flush=True)

ex = FLMRExecutor(model, params, train_cfg, quiet=True,
                  copy_params=SCALE != "preflmr")
if SCALE == "preflmr":
    del params
t0 = time.time()
m = ex.train_step(batch)
_ = float(m["loss"])
print(f"compile+first step: {time.time()-t0:.1f}s loss={float(m['loss']):.3f}",
      flush=True)

steps = 30
t0 = time.perf_counter()
for _ in range(steps):
    m = ex.train_step(batch)      # steps chain on the donated params
_ = float(m["loss"])              # one sync at the end — syncing per
                                  # step pays the full host/tunnel
                                  # round-trip every step
dt = (time.perf_counter() - t0) / steps
# BERT fwd+bwd flops ~ 6 * params * tokens (rough)
tokens = B * LQ + B * NWAY * LD
tflops = 6 * n_params * tokens / dt / 1e12
print(f"train: {1/dt:.2f} steps/s ({dt*1e3:.0f} ms/step, {B/dt:.1f} "
      f"queries/s, ~{tflops:.0f} TFLOP/s incl. sync overhead)", flush=True)
