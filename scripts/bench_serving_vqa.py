"""Full-product VQA serving bench: VQAServer (retrieve -> generate ->
joint answer pick) with the RAVQA-v2 generator SHAPE (flan-T5-XL, ~2.8B
params bf16, LoRA-wrapped) over a BERT-base retriever + token index, on
one real TPU chip (VERDICT r4 Next #9 — the reference has no serving at
all; this extends the lead beyond retrieval-only serving).

Reports:
  - batch path: end-to-end RagExecutor.generate latency at the compiled
    batch shape (the in-process ceiling: retrieval + B*n_docs greedy
    decode + answer pick),
  - served path: client-observed p50/p95/p99 and QPS through VQAServer's
    dynamic micro-batching at several offered concurrency levels.

Axon-tunnel caveat (same as bench_serving.py): every dispatch pays the
~10-20 ms host<->TPU round-trip; on directly-attached TPU the served
numbers approach the batch-path ceiling.

Run: python scripts/bench_serving_vqa.py            (flan-T5-XL shape)
     GEN_SCALE=base python scripts/bench_serving_vqa.py   (T5-base, fast)
"""

import os
import sys
import threading
import time

import numpy as np

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp

from ravqa_tpu.executors import FLMRExecutor, RagConfig, RagExecutor, \
    TrainConfig
from ravqa_tpu.models import BertConfig, FLMRModelConfig, FLMRRetriever, \
    T5Config, T5Model
from ravqa_tpu.retrieval import build_index_from_embeddings
from ravqa_tpu.serving import ServeConfig, VQAServer
from ravqa_tpu.tokenization import (QueryTokenizer, WordPieceTokenizer,
                                    make_tiny_vocab)

SCALE = os.environ.get("GEN_SCALE", "xl")
ON_TPU = jax.default_backend() == "tpu"
N_DOCS_IDX = 28160 if ON_TPU else 512      # corpus size (HBM headroom for XL)
LD, DIM = 64, 128
N_RETR_DOCS = 5                            # reference RAVQA-v2 passages
MAX_DECODE = 8
B_BATCH = int(os.environ.get("VQA_BATCH", "4"))  # compiled generate batch
USE_LORA = os.environ.get("VQA_LORA", "1") != "0"  # LoRA-wrapped generator
# serve-time LoRA pre-merge + no optimizer state (the deployment form);
# PREMERGE=0 keeps the training-form executor (merge inside every
# generate program + Adam moments over the LoRA tree) for A/B
PREMERGE = os.environ.get("VQA_PREMERGE", "1") != "0"
dt = jnp.bfloat16 if ON_TPU else jnp.float32

WORDS = ["cat", "dog", "sky", "sun", "tree", "fish", "bird", "car", "red",
         "blue", "big", "old", "hot", "wet", "sad", "fast", "tall", "round"]

tok = WordPieceTokenizer(make_tiny_vocab(WORDS))
qt = QueryTokenizer(tok, query_maxlen=16)

# retriever: BERT-base towers (the production FLMR shape)
rcfg = FLMRModelConfig(
    bert=(BertConfig(dtype=dt) if ON_TPU else BertConfig.tiny(
        vocab_size=tok.vocab_size + 8)),
    dim=DIM if ON_TPU else 16, vision_dim=768, prefix_len=4, nway=2,
    use_ib_negatives=False)
retr = FLMRRetriever(rcfg)
rp = retr.init(jax.random.PRNGKey(0),
               query_input_ids=jnp.ones((2, 16), jnp.int32),
               query_attention_mask=jnp.ones((2, 16), jnp.int32),
               image_features=jnp.ones((2, 768), jnp.float32),
               doc_input_ids=jnp.ones((4, 16), jnp.int32),
               doc_attention_mask=jnp.ones((4, 16), jnp.int32))["params"]

# synthetic corpus index, generated on-device
rdim = rcfg.dim


@jax.jit
def make_tokens(key):
    t = jax.random.normal(key, (N_DOCS_IDX, LD, rdim), dt)
    sq = jnp.sum(t.astype(jnp.float32) ** 2, -1, keepdims=True)
    return (t * jax.lax.rsqrt(sq + 1e-9).astype(dt)).astype(dt)


toks = jax.block_until_ready(make_tokens(jax.random.PRNGKey(1)))
index = build_index_from_embeddings(np.asarray(toks, np.float32),
                                    np.ones((N_DOCS_IDX, LD), np.int8),
                                    dtype=dt)
toks.delete()
contents = [f"passage {i} " + " ".join(
    np.random.default_rng(i).choice(WORDS, 5)) for i in range(N_DOCS_IDX)]

# generator at the RAVQA-v2 shape
if SCALE == "xl" and ON_TPU:
    gcfg = T5Config.flan_t5_xl(dtype=jnp.bfloat16, param_dtype=jnp.bfloat16)
elif ON_TPU:
    gcfg = T5Config(vocab_size=32128, d_model=768, d_kv=64, d_ff=3072,
                    num_layers=12, num_heads=12, dtype=jnp.bfloat16)
else:
    gcfg = T5Config.tiny(vocab_size=tok.vocab_size + 8,
                         eos_token_id=tok.sep_token_id)
gen = T5Model(gcfg)
gp = gen.init(jax.random.PRNGKey(2), jnp.ones((2, 8), jnp.int32),
              jnp.ones((2, 8), jnp.int32),
              jnp.ones((2, 3), jnp.int32))["params"]
n_gp = sum(x.size for x in jax.tree.leaves(gp))
print(f"generator: {n_gp/1e9:.2f}B params ({SCALE}), retriever index "
      f"{N_DOCS_IDX} docs", flush=True)

ex = RagExecutor(
    retr, rp, gen, gp, gen_tokenizer=tok,
    rag_cfg=RagConfig(n_docs=N_RETR_DOCS, gen_maxlen=96, label_maxlen=8,
                      max_decode_len=MAX_DECODE, use_lora=USE_LORA,
                      lora_rank=8),
    train_cfg=TrainConfig(lr=1e-4),
    index=index, passage_contents=contents, quiet=True,
    inference_only=PREMERGE)
if PREMERGE:
    ex.prepare_for_serving()
    print("serving form: LoRA pre-merged, no optimizer state", flush=True)

rng = np.random.default_rng(0)
questions = [" ".join(rng.choice(WORDS, 4)) + " ?" for _ in range(256)]
feats = rng.normal(size=(256, 768)).astype(np.float32)


def gen_batch(idxs):
    qi, qm = qt.tensorize([questions[i] for i in idxs])
    return {"questions": [questions[i] for i in idxs],
            "question_ids": [str(i) for i in idxs],
            "query_input_ids": np.asarray(qi),
            "query_attention_mask": np.asarray(qm),
            "image_features": feats[idxs]}


# ---- batch path (in-process ceiling) ---------------------------------------
b = gen_batch(np.arange(B_BATCH))
t0 = time.time()
out = ex.generate(b)
print(f"compile+first generate(B={B_BATCH} x {N_RETR_DOCS} docs, "
      f"{MAX_DECODE} new toks): {time.time()-t0:.0f}s", flush=True)
iters = 8
t0 = time.perf_counter()
for i in range(iters):
    out = ex.generate(gen_batch(np.arange(B_BATCH) + i))
dt_b = (time.perf_counter() - t0) / iters
print(f"batch path: {dt_b*1e3:.0f} ms/batch{B_BATCH} = "
      f"{B_BATCH/dt_b:.1f} answered questions/s "
      f"(retrieve@{N_DOCS_IDX} + {B_BATCH*N_RETR_DOCS} decodes)",
      flush=True)

# ---- served path (VQAServer, client-observed) ------------------------------
serve = VQAServer(ex, qt, image_feature_dim=768,
                  config=ServeConfig(max_batch=B_BATCH, max_wait_ms=4.0))
# warm every bucket
for nb in (1, 2, B_BATCH):
    _ = serve.answer_batch(questions[:nb], feats[:nb])

for conc in (1, B_BATCH, 2 * B_BATCH):
    lat = []
    lock = threading.Lock()
    n_req = max(32, conc * 8)

    def client(cid):
        r = np.random.default_rng(cid)
        for _ in range(n_req // conc):
            i = int(r.integers(256))
            t0 = time.perf_counter()
            serve.submit(questions[i], feats[i]).result()
            with lock:
                lat.append(time.perf_counter() - t0)

    t0 = time.perf_counter()
    th = [threading.Thread(target=client, args=(c,)) for c in range(conc)]
    for t in th:
        t.start()
    for t in th:
        t.join()
    wall = time.perf_counter() - t0
    lat_ms = np.sort(np.array(lat)) * 1e3
    p = lambda q: lat_ms[min(len(lat_ms) - 1, int(q * len(lat_ms)))]
    print(f"served conc={conc}: {len(lat)/wall:.2f} QPS  "
          f"p50 {p(.50):.0f} ms  p95 {p(.95):.0f} ms  "
          f"p99 {p(.99):.0f} ms", flush=True)
serve.stop()
