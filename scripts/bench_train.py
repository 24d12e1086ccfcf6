"""FLMR training throughput + MFU on the real TPU chip at the reference's
published scale: BERT-base towers, batch 30, nway 5 (1 pos + 4 negs),
query_maxlen 32 + 32 vision prefix tokens, doc_maxlen 220
(reference README.md:130-131 trains this on one GPU at bs30 grad-accum 4).

Legs (base scale): the in-batch-negative loss variants —
  xla      : unblocked maxsim_all_pairs_xla (rounds 1-4 baseline)
  blocked  : ib_block_n=NWAY*6 per-block remat (ops.maxsim blocked path)
  blocked8 : blocked + bf16 scoring dot (reference scores docs fp16 on
             GPU, colbert.py:204)
MFU is XLA-accounted: lowered HLO cost-analysis flops / wall-clock /
197 TFLOP/s (v5e bf16 peak).

Run: python scripts/bench_train.py
     SCALE=preflmr python scripts/bench_train.py
       -> PreFLMR-scale: in-graph CLIP-ViT-bigG tower (1.8B, bf16 params,
          frozen per the PreFLMR recipe), transformer mapping network +
          FLIPR interaction, pixels in, bs8 — the M2KR pretraining shape
          on ONE chip.
"""

import dataclasses
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
PEAK = 197e12  # v5e bf16 roofline
rng = np.random.default_rng(0)


def measure(cfg, batch, train_cfg, steps=30, copy_params=True):
    model = FLMRRetriever(cfg)
    params = model.init(jax.random.PRNGKey(0), **batch)["params"]
    n_params = sum(x.size for x in jax.tree.leaves(params))
    ex = FLMRExecutor(model, params, train_cfg, quiet=True,
                      copy_params=copy_params)
    if not copy_params:
        del params
    # XLA-accounted step flops (compiled cost analysis; the executable is
    # cached so the later train_step call reuses it)
    try:
        cost = ex._train_step.lower(ex.state, batch).compile() \
            .cost_analysis()
        step_flops = float(cost.get("flops", 0.0))
    except Exception as e:  # tunnel/version quirks: fall back to analytic
        print(f"  (cost_analysis unavailable: {e})", flush=True)
        step_flops = 0.0
    t0 = time.time()
    m = ex.train_step(batch)
    loss0 = float(m["loss"])
    t_compile = time.time() - t0
    t0 = time.perf_counter()
    for _ in range(steps):
        m = ex.train_step(batch)  # steps chain on the donated params
    _ = float(m["loss"])          # one sync at the end (tunnel round-trip)
    dt = (time.perf_counter() - t0) / steps
    return dict(n_params=n_params, dt=dt, loss0=loss0,
                t_compile=t_compile, step_flops=step_flops)


if SCALE == "preflmr":
    B, NWAY, LQ, LD = 8, 2, 32, 220
    vit = ViTConfig.clip_g_p14()
    vit = dataclasses.replace(
        vit, dtype=jnp.bfloat16, param_dtype=jnp.bfloat16, remat=True)
    cfg = FLMRModelConfig(
        bert=BertConfig(dtype=jnp.bfloat16), dim=128,
        vision_dim=vit.hidden_size, prefix_len=32, nway=NWAY,
        use_ib_negatives=True, in_graph_vision=True, vit=vit,
        use_transformer_mapping=True, interaction="flipr",
        flipr_query_part_len=LQ, flipr_k1=24, flipr_k2=16,
        vision_patch_dim=vit.hidden_size)
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
    r = measure(cfg, batch, train_cfg, copy_params=False)
    mfu = r["step_flops"] / r["dt"] / PEAK if r["step_flops"] else 0.0
    print(f"params: {r['n_params']/1e6:.1f}M (preflmr) "
          f"compile+first {r['t_compile']:.1f}s", flush=True)
    print(f"train: {1/r['dt']:.2f} steps/s ({r['dt']*1e3:.0f} ms/step, "
          f"{B/r['dt']:.1f} queries/s, "
          f"{r['step_flops']/r['dt']/1e12:.1f} TFLOP/s, MFU {mfu:.1%})",
          flush=True)
    sys.exit(0)

if SCALE == "roi":
    # the reference's 9-ROI headline config (README.md:113-115,
    # FLMR_with_ROI.jsonnet): 512 text tokens + (1+9) images x 32 prefix
    # = 832 query tokens. Here the unblocked in-batch-negative loss's
    # (B*nway, Ld, B, Lq) token-score tensor is 3.3 GiB f32 (+ the same
    # again as autodiff residuals) — the shape the blocked/remat path
    # exists for.
    B, NWAY, LQ, LD, N_IMG = 30, 5, 512, 220, 10
else:
    B, NWAY, LQ, LD, N_IMG = 30, 5, 32, 220, 1
base_cfg = FLMRModelConfig(
    bert=BertConfig(dtype=jnp.bfloat16), dim=128, vision_dim=768,
    prefix_len=32, nway=NWAY, use_ib_negatives=True)
feats = (rng.normal(size=(B, 768)) if N_IMG == 1
         else rng.normal(size=(B, N_IMG, 768)))
batch = dict(
    query_input_ids=jnp.array(rng.integers(1, 30000, (B, LQ)), jnp.int32),
    query_attention_mask=jnp.ones((B, LQ), jnp.int32),
    image_features=jnp.array(feats, jnp.float32),
    doc_input_ids=jnp.array(rng.integers(1, 30000, (B * NWAY, LD)),
                            jnp.int32),
    doc_attention_mask=jnp.ones((B * NWAY, LD), jnp.int32),
)
train_cfg = TrainConfig(lr=1e-5)

legs = [
    ("xla", {}),
    ("blocked", {"ib_block_n": NWAY * 6}),
    ("blocked_bf16", {"ib_block_n": NWAY * 6, "ib_score_bf16": True}),
]
for name, kw in legs:
    cfg = dataclasses.replace(base_cfg, **kw)
    r = measure(cfg, batch, train_cfg)
    mfu = r["step_flops"] / r["dt"] / PEAK if r["step_flops"] else 0.0
    print(f"{name:13s}: {1/r['dt']:5.2f} steps/s ({r['dt']*1e3:6.1f} "
          f"ms/step, {B/r['dt']:6.1f} q/s, "
          f"{r['step_flops']/r['dt']/1e12:6.1f} TFLOP/s, MFU {mfu:.1%}) "
          f"loss0={r['loss0']:.4f} "
          f"[{r['n_params']/1e6:.1f}M params, "
          f"hlo {r['step_flops']/1e12:.2f} TFLOP/step, "
          f"compile {r['t_compile']:.0f}s]", flush=True)
