"""Serving-path benchmark: RetrievalServer (dynamic micro-batching) over
the 112k-doc index on one real TPU chip.

Measures SERVED throughput and client-observed latency at several offered
concurrency levels: submitting threads tokenize + enqueue, the dispatcher
pads to the compiled batch shape and runs encode+search per micro-batch.

Axon-tunnel caveat (honesty): each dispatch pays the fixed host<->TPU
tunnel round-trip (~10-20 ms), which bounds served QPS at roughly
max_batch / RTT regardless of device speed — on directly-attached TPU
the dispatch RTT is sub-millisecond and the in-jit bench (bench.py,
17k QPS/chip) is the device-side ceiling. The relative numbers
(batching amortization vs concurrency) are what this script shows.

Run: python scripts/bench_serving.py
"""

import sys
import threading
import time

import numpy as np

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp

from ravqa_tpu.executors import FLMRExecutor, TrainConfig
from ravqa_tpu.models import BertConfig, FLMRModelConfig, FLMRRetriever
from ravqa_tpu.retrieval import LateInteractionSearcher, TokenIndex
from ravqa_tpu.retrieval.coarse import (block_summaries, summarize_docs)
from ravqa_tpu.serving import RetrievalServer, ServeConfig
from ravqa_tpu.tokenization import (QueryTokenizer, WordPieceTokenizer,
                                    make_tiny_vocab)

N, LD, DIM = 56320, 128, 128   # half the bench.py corpus: leaves HBM headroom
# for the two compiled serving programs (encode, search) under the axon
# tunnel allocator quirk (see scripts/bench_1m.py note)
MAX_BATCH = 32
dt = jnp.bfloat16

WORDS = ["cat", "dog", "sky", "sun", "tree", "fish", "bird", "car", "red",
         "blue", "big", "old", "hot", "wet", "sad", "fast", "tall", "round"]


@jax.jit
def make_index_tokens(key):
    t = jax.random.normal(key, (N, LD, DIM), dt)
    sq = jnp.sum(t.astype(jnp.float32) ** 2, -1, keepdims=True)
    return (t * jax.lax.rsqrt(sq + 1e-9).astype(dt)).astype(dt)


def main():
    vocab = make_tiny_vocab(WORDS)
    tok = WordPieceTokenizer(vocab)
    qt = QueryTokenizer(tok, query_maxlen=32)

    # real BERT-base-shape query tower (the serving encode cost)
    cfg = FLMRModelConfig(bert=BertConfig(vocab_size=tok.vocab_size + 10),
                          dim=DIM, vision_dim=768, prefix_len=32, nway=2)
    model = FLMRRetriever(cfg)
    rng = np.random.default_rng(0)
    qi, qm = qt.tensorize(["cat dog sky"])
    params = model.init(
        jax.random.PRNGKey(0),
        query_input_ids=jnp.asarray(qi),
        query_attention_mask=jnp.asarray(qm),
        image_features=jnp.zeros((1, 768), jnp.float32),
        doc_input_ids=jnp.asarray(np.tile(qi, (2, 1))),      # B*nway rows
        doc_attention_mask=jnp.asarray(np.tile(qm, (2, 1))))["params"]
    ex = FLMRExecutor(model, params, TrainConfig(lr=1e-4), quiet=True)

    tokens = make_index_tokens(jax.random.PRNGKey(1))
    mask = jnp.ones((N, LD), jnp.int8)
    index = TokenIndex(tokens=tokens, mask=mask,
                       pids=np.arange(N), num_docs=N)
    index.summaries = summarize_docs(tokens, mask, n_summary=8,
                                     iters=2).astype(dt)
    index.block_summaries = block_summaries(
        index.summaries, block_size=64, n_block_summary=4).astype(dt)
    index.block_size = 64
    jax.block_until_ready(index.block_summaries)
    # the shipped fast preset (C=max(256,k), covering n_blocks, int8
    # stage-1 rows + fused kernel) — what a production server would run
    searcher = LateInteractionSearcher(index, mode="hierarchical",
                                       preset="fast")
    print("setup ok", flush=True)

    texts = [" ".join(rng.choice(WORDS, size=4, replace=False))
             for _ in range(256)]
    feats = rng.normal(size=(256, 768)).astype(np.float32)

    for conc in (1, 8, 32, 64):
        server = RetrievalServer(
            ex, searcher, qt, image_feature_dim=768,
            config=ServeConfig(max_batch=MAX_BATCH, max_wait_ms=2.0, k=10))
        # warm EVERY bucket executable (dispatch pads to the smallest
        # covering bucket, so mixed-load bursts hit several shapes)
        for bkt in server.cfg.buckets():
            server.search_batch(texts[:bkt], feats[:bkt])

        lat = []
        done = []
        stop_at = time.perf_counter() + 5.0

        def client(i):
            k = 0
            while time.perf_counter() < stop_at:
                t0 = time.perf_counter()
                server.submit(texts[(i * 31 + k) % 256],
                              feats[(i * 31 + k) % 256]).result(timeout=60)
                lat.append(time.perf_counter() - t0)
                k += 1
            done.append(k)

        threads = [threading.Thread(target=client, args=(i,))
                   for i in range(conc)]
        t0 = time.perf_counter()
        for t in threads:
            t.start()
        for t in threads:
            t.join()
        wall = time.perf_counter() - t0
        served = sum(done)
        ls = np.sort(np.asarray(lat)) * 1e3
        print(f"conc={conc:3d}: {served / wall:8.1f} QPS served  "
              f"p50={ls[len(ls) // 2]:6.1f} ms  "
              f"p95={ls[int(len(ls) * 0.95)]:6.1f} ms  "
              f"p99={ls[int(len(ls) * 0.99)]:6.1f} ms  (n={served})",
              flush=True)
        server.stop()


if __name__ == "__main__":
    main()
