"""Generation throughput on the real TPU: T5-base-scale greedy decode at the
RAG serving shape (B=32 questions x n_docs=5 -> 160 sequences, 32 new tokens,
encoder input 96 tokens). Run: python scripts/bench_generate.py"""

import sys
import time

import numpy as np

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp

from ravqa_tpu.models.generation import greedy_generate
from ravqa_tpu.models.t5 import T5Config, T5Model

import os as _os
B = 16 if _os.environ.get("GEN_SCALE") == "xl" else 32
NDOCS, T_IN, T_OUT = 5, 96, 32
N = B * NDOCS

import os
SCALE = os.environ.get("GEN_SCALE", "base")
if SCALE == "xl":       # flan-t5-xl (the RAVQA-v2 generator, ~2.8B params)
    cfg = T5Config.flan_t5_xl(dtype=jnp.bfloat16,
                              param_dtype=jnp.bfloat16)
else:
    cfg = T5Config(vocab_size=32128, d_model=768, d_kv=64, d_ff=3072,
                   num_layers=12, num_heads=12, dtype=jnp.bfloat16)
model = T5Model(cfg)
rng = np.random.default_rng(0)
ids = jnp.array(rng.integers(2, 32000, (N, T_IN)), jnp.int32)
mask = jnp.ones((N, T_IN), jnp.int32)
params = model.init(jax.random.PRNGKey(0), ids[:2], mask[:2],
                    jnp.ones((2, 4), jnp.int32))["params"]

n_params = sum(x.size for x in jax.tree.leaves(params))
print(f"params: {n_params/1e6:.0f}M", flush=True)


@jax.jit
def generate(params, ids, mask):
    enc = model.apply({"params": params}, ids, mask, method=T5Model.encode)

    def step(tok, cache):
        return model.apply({"params": params}, tok, enc, mask, cache,
                           method=T5Model.decode_step)
    cache = model.apply({"params": params}, N, T_OUT,
                        method=T5Model.init_cache)
    toks, lp = greedy_generate(step, cache, batch=N, max_len=T_OUT,
                               start_id=0, eos_id=1)
    return toks, lp


t0 = time.time()
toks, lp = generate(params, ids, mask)
_ = np.asarray(lp)
print(f"compile+first: {time.time()-t0:.1f}s", flush=True)

t0 = time.perf_counter()
iters = 5
for i in range(iters):
    toks, lp = generate(params, ids, mask)
    _ = np.asarray(lp)
dt = (time.perf_counter() - t0) / iters
print(f"greedy decode: {N * T_OUT / dt:.0f} tokens/s "
      f"({N / dt:.1f} seqs/s, {B / dt:.1f} questions/s at n_docs={NDOCS}, "
      f"{dt*1e3:.0f} ms/batch)", flush=True)
