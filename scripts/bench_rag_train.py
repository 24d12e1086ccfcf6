"""RAVQA-v2 training-step benchmark at the published recipe scale.

The reference trains BLIP2-flan-T5-XL + LoRA at bs1 x accum16 with 5
knowledge passages per question (README.md:566-590) — the B*n_docs
generator forward is its OOM pain point (num_knowledge_passages_in_training
exists for exactly this). This script runs OUR RagExecutor train step at
that scale on ONE v5e chip: flan-T5-XL-shape generator (~2.8B bf16),
LoRA r=8 on q/v projections (base frozen via stop_gradient), BERT-base
FLMR retriever with live in-graph retrieval scores, bs1 x n_docs5,
gen_maxlen 512, optax MultiSteps accumulation 16.

Prints per-micro-step time and effective questions/s.
Run: python scripts/bench_rag_train.py   (SCALE=blip2 for the full BLIP2 generator; SCALE=large for t5-large)
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp

from ravqa_tpu.data import DataPipeline
from ravqa_tpu.data.datasets import corpus_doc_batches
from ravqa_tpu.executors import (FLMRExecutor, RagConfig, RagExecutor,
                                 TrainConfig)
from ravqa_tpu.models import (BertConfig, FLMRModelConfig, FLMRRetriever,
                              T5Config, T5Model)

SCALE = os.environ.get("SCALE", "xl")
B, N_DOCS, GEN_LEN, LABEL_LEN, ACCUM = 1, 5, 512, 10, 16

dp = DataPipeline({
    "raw": {"transform_name": "SyntheticOKVQA",
            "setup_kwargs": {"n_docs": 64, "n_questions": 32,
                             "vision_dim": 768}},
    "loaders": {"transform_name": "PrepareDataloaders", "input_node": "raw",
                "setup_kwargs": {"query_maxlen": 32, "doc_maxlen": 64,
                                 "nway": 2}}})
world = dp.get_data("loaders", explode=True)
tok = world["tokenizer"]
corpus = world["passages"]["full_passages"]

rcfg = FLMRModelConfig(
    bert=BertConfig(vocab_size=tok.vocab_size + 8, dtype=jnp.bfloat16),
    dim=128, vision_dim=768, prefix_len=32, nway=2)
retriever = FLMRRetriever(rcfg)
rp = retriever.init(
    jax.random.PRNGKey(0),
    query_input_ids=jnp.ones((2, 32), jnp.int32),
    query_attention_mask=jnp.ones((2, 32), jnp.int32),
    image_features=jnp.ones((2, 768), jnp.float32),
    doc_input_ids=jnp.ones((4, 64), jnp.int32),
    doc_attention_mask=jnp.ones((4, 64), jnp.int32))["params"]

if SCALE == "xl":
    # remat: per-block rematerialization is what fits the XL backward in
    # one chip's HBM (first attempt without it: RESOURCE_EXHAUSTED)
    # bf16 PARAM storage too (the reference trains precision="bf16"; the
    # LoRA base is frozen anyway): 5.4 GiB instead of 10.9 GiB f32
    gcfg = T5Config.flan_t5_xl(dtype=jnp.bfloat16, param_dtype=jnp.bfloat16,
                               remat=True, vocab_size=tok.vocab_size + 8)
else:
    gcfg = T5Config(vocab_size=tok.vocab_size + 8, d_model=1024, d_kv=64,
                    d_ff=2816, num_layers=24, num_decoder_layers=24,
                    num_heads=16, feed_forward_proj="gated-gelu",
                    dtype=jnp.bfloat16)
if SCALE == "blip2":
    # the FULL published generator: EVA-ViT-g (1.0B) + Q-Former + flan-T5-XL
    # (2.7B) — vision/qformer are inside the frozen LoRA base
    # (stop_gradient), so only their forward runs; T5 remats its backward
    from ravqa_tpu.models.blip2 import (Blip2Config, Blip2T5,
                                        Blip2VisionConfig, QFormerConfig)
    bcfg = Blip2Config(
        vision=Blip2VisionConfig(dtype=jnp.bfloat16),
        qformer=QFormerConfig(dtype=jnp.bfloat16),
        t5=T5Config.flan_t5_xl(dtype=jnp.bfloat16,
                               param_dtype=jnp.bfloat16, remat=True,
                               vocab_size=tok.vocab_size + 8),
        num_query_tokens=32)
    gen = Blip2T5(bcfg)
    gp = gen.init(jax.random.PRNGKey(1),
                  jnp.ones((1, 224, 224, 3), jnp.float32),
                  jnp.ones((1, 8), jnp.int32), jnp.ones((1, 8), jnp.int32),
                  jnp.ones((1, 3), jnp.int32))["params"]
    # bf16 storage for the frozen vision/qformer trees too (their configs
    # store f32; f32 ViT-g alone is 4 GiB). Leaf-wise cast with incremental
    # free so the f32 and bf16 trees never coexist in HBM.
    leaves, treedef = jax.tree_util.tree_flatten(gp)
    del gp
    for i in range(len(leaves)):
        leaf = leaves[i]
        leaves[i] = (leaf.astype(jnp.bfloat16)
                     if leaf.dtype == jnp.float32 else leaf)
        del leaf
    gp = jax.tree_util.tree_unflatten(treedef, leaves)
    del leaves
else:
    gen = T5Model(gcfg)
    gp = gen.init(jax.random.PRNGKey(1), jnp.ones((2, 8), jnp.int32),
                  jnp.ones((2, 8), jnp.int32), jnp.ones((2, 3), jnp.int32),
                  )["params"]
n_params = sum(np.prod(p.shape) for p in jax.tree.leaves(gp))
print(f"generator params: {n_params / 1e9:.2f}B ({SCALE})", flush=True)

fe = FLMRExecutor(retriever, rp, TrainConfig(lr=1e-3), quiet=True)
index = fe.build_index(corpus_doc_batches(corpus, world["doc_tokenizer"],
                                          batch_size=16))
ex = RagExecutor(
    retriever, rp, gen, gp, gen_tokenizer=tok,
    rag_cfg=RagConfig(n_docs=N_DOCS, gen_maxlen=GEN_LEN,
                      label_maxlen=LABEL_LEN, max_decode_len=LABEL_LEN,
                      use_lora=True, lora_rank=8, lora_alpha=32.0,
                      loss_type="Approach6",
                      generator_type=("blip2" if SCALE == "blip2"
                                      else "t5")),
    train_cfg=TrainConfig(lr=1e-4, retriever_lr=1e-5,
                          accumulate_grad_batches=ACCUM,
                          modules=("freeze_question_encoder",)),
    index=index, passage_contents=corpus.contents, quiet=True,
    # no defensive copy: at 3.8B params the transient 2x would not fit;
    # gp/rp are not reused after this (the train step donates them)
    copy_params=False)
del gp

items = [world["train"].items[i] for i in range(B)]
qt = world["query_tokenizer"]
qi, qm = qt.tensorize([it["question"] for it in items])
batch = {
    **({"pixel_values": np.zeros((B, 224, 224, 3), np.float32)}
       if SCALE == "blip2" else {}),
    "question_ids": [it["question_id"] for it in items],
    "questions": [it["question"] for it in items],
    "answers": [it["answers"] for it in items],
    "query_input_ids": qi, "query_attention_mask": qm,
    "image_features": np.stack([it["image_features"] for it in items]),
}

t0 = time.time()
m = ex.train_step_rag(batch)
print(f"compile+first micro-step: {time.time() - t0:.1f}s "
      f"loss={float(m['loss']):.3f}", flush=True)

steps = 2 * ACCUM
t0 = time.perf_counter()
for _ in range(steps):
    m = ex.train_step_rag(batch)
_ = float(m["loss"])               # sync
dt = (time.perf_counter() - t0) / steps
print(f"micro-step (bs{B} x {N_DOCS} docs, gen_len {GEN_LEN}): "
      f"{dt * 1e3:.0f} ms -> {B / dt:.2f} questions/s; "
      f"effective batch {B * ACCUM} every {dt * ACCUM:.1f}s "
      f"(reference recipe bs1 x accum16)", flush=True)
mem = jax.devices()[0].memory_stats()
if mem:
    print(f"HBM in use: {mem.get('bytes_in_use', 0) / 2**30:.2f} GiB",
          flush=True)
