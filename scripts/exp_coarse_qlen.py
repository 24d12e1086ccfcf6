"""Experiment: coarse_query_len truncation on the 1M coarse sweep.

The coarse summary sweep is COMPUTE-bound (1.4-1.7x off the bf16
roofline at dim=128 — exp_coarse_kernel.py), and its FLOPs are linear
in the number of query tokens scored. FLMR queries are [MASK]-augmented
to Lq=32, so the tail tokens are near-duplicates; the reference itself
truncates candidate generation to query_maxlen tokens
(third_party/ColBERT/colbert/search/index_storage.py:68-77) — plumbed
here as `coarse_query_len` (stages 0-1 truncate, the exact fine stage
always scores the full query).

Measures on the real chip at the 1M bench shape:
  1. coarse_sweep_pallas latency at coarse Lq 32 / 16 / 8
  2. candidate-cut fidelity vs the full-Lq cut (top-1024 overlap) and
     self-doc containment
  3. end-to-end two_stage_search QPS + top-1 at each coarse_query_len

Run: python scripts/exp_coarse_qlen.py
CPU check: JAX_PLATFORMS=cpu EXP_N=8192 EXP_INTERPRET=1 ...
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp

from ravqa_tpu.ops.maxsim import coarse_sweep_pallas
from ravqa_tpu.ops.quant import quantize_index_int8
from ravqa_tpu.retrieval.coarse import summarize_docs, two_stage_search

N = int(os.environ.get("EXP_N", 1_000_448))
S, DIM, B, LQ, LD, K = 4, 128, 32, 32, 32, 10
N_TOPICS = 8192
SLAB = 62_528 if N >= 62_528 else N
INTERPRET = bool(int(os.environ.get("EXP_INTERPRET", "0")))
dt = jnp.bfloat16


@jax.jit
def make_topics(key):
    t = jax.random.normal(key, (N_TOPICS, DIM), dt)
    return t * jax.lax.rsqrt(jnp.sum(t.astype(jnp.float32) ** 2, -1,
                                     keepdims=True) + 1e-9).astype(dt)


def slab_tokens(key, i, topics, slab):
    kn = jax.random.fold_in(key, i)
    gidx = i * slab + jnp.arange(slab, dtype=jnp.int32)
    assign = jnp.clip(jnp.floor(gidx.astype(jnp.float32)
                                * (N_TOPICS / N)).astype(jnp.int32),
                      0, N_TOPICS - 1)
    t = topics[assign][:, None, :] + (0.3 * jax.random.normal(
        kn, (slab, LD, DIM), dt)).astype(dt)
    sq = jnp.sum(t.astype(jnp.float32) ** 2, -1, keepdims=True)
    return (t * jax.lax.rsqrt(sq + 1e-9).astype(dt)).astype(dt)


@jax.jit
def build_index(key, topics):
    """int8 token index + bf16 summaries (the 1M throughput codec)."""
    def body(i, carry):
        toks, scl, smm = carry
        tn = slab_tokens(key, i, topics, SLAB)
        t8, s8 = quantize_index_int8(tn, jnp.ones((SLAB, LD), jnp.int8))
        sm = summarize_docs(tn, jnp.ones((SLAB, LD), jnp.int8),
                            n_summary=S, iters=2).astype(dt)
        start = i * SLAB
        return (jax.lax.dynamic_update_slice(toks, t8, (start, 0, 0)),
                jax.lax.dynamic_update_slice(scl, s8, (start, 0)),
                jax.lax.dynamic_update_slice(smm, sm, (start, 0, 0)))
    init = (jnp.zeros((N, LD, DIM), jnp.int8),
            jnp.zeros((N, LD), jnp.float32),
            jnp.zeros((N, S, DIM), dt))
    return jax.lax.fori_loop(0, N // SLAB, body, init)


key = jax.random.PRNGKey(7)
topics = make_topics(key)
t0 = time.time()
tokens, scales, summ = jax.block_until_ready(build_index(key, topics))
mask = jnp.ones((N, LD), jnp.int8)
print(f"{N} int8 index built in {time.time() - t0:.0f}s", flush=True)


@jax.jit
def make_queries(qkey, key, topics):
    base = slab_tokens(key, 0, topics, SLAB)[:B, :LQ].astype(jnp.float32)
    qt = base + 0.1 * jax.random.normal(qkey, (B, LQ, DIM))
    qt = qt * jax.lax.rsqrt(jnp.sum(qt ** 2, -1, keepdims=True) + 1e-9)
    return qt.astype(dt)


q = make_queries(jax.random.PRNGKey(1), key, topics)
summ_t = jax.block_until_ready(jax.jit(lambda s: jnp.swapaxes(s, 0, 1))(summ))
valid = jnp.ones((N,), jnp.float32)


def sweep_ms(name, lq_c, iters=32):
    @jax.jit
    def run(q0, st, v):
        def body(qc, _):
            s = coarse_sweep_pallas(qc[:, :lq_c], st, v)
            return qc + (s[:, 0] * 1e-9).astype(qc.dtype)[:, None, None], ()
        qc, _ = jax.lax.scan(body, q0, None, length=iters)
        return qc[:1, :1, :1]
    _ = np.asarray(run(q, summ_t, valid))
    t0 = time.perf_counter()
    _ = np.asarray(run(q, summ_t, valid))
    ms = (time.perf_counter() - t0) / iters * 1e3
    print(f"{name}: {ms:.2f} ms/batch", flush=True)


import functools


@functools.partial(jax.jit, static_argnames=("lq_c",))
def _topc(qq, st, v, lq_c, c=min(1024, N)):
    qc = qq[:, :lq_c]
    if INTERPRET:
        s = jnp.einsum("snd,bqd->nsbq", st, qc,
                       preferred_element_type=jnp.float32)
        scores = jnp.sum(jnp.max(s, axis=1), axis=-1).T
    else:
        scores = coarse_sweep_pallas(qc, st, v)
    return jax.lax.top_k(scores, c)[1]


def topc(qq, lq_c):
    return _topc(qq, summ_t, valid, lq_c)


def e2e_qps(name, lq_c, iters=32):
    @jax.jit
    def run(q0, t, m, sc, sm, st):
        def body(qc, _):
            s, _ = two_stage_search(qc, t, m, sm, k=K, n_candidates=1024,
                                    coarse_query_len=lq_c, scales=sc,
                                    use_pallas_coarse=True, summaries_t=st,
                                    approx_topk=True)
            return qc + (s[:, 0] * 1e-9).astype(qc.dtype)[:, None, None], ()
        qc, _ = jax.lax.scan(body, q0, None, length=iters)
        return qc[:1, :1, :1]
    args = (tokens, mask, scales, summ, summ_t)
    _ = np.asarray(run(q, *args))
    t0 = time.perf_counter()
    _ = np.asarray(run(q, *args))
    dt_s = time.perf_counter() - t0
    print(f"{name}: {B * iters / dt_s:.0f} QPS ({dt_s / iters * 1e3:.2f} "
          f"ms/batch)", flush=True)


base_c = None
for lq_c in (32, 16, 8):
    if not INTERPRET:
        sweep_ms(f"sweep coarse_Lq={lq_c}", lq_c)
    c = np.asarray(topc(q, lq_c))
    hit = float(np.mean([(i in set(c[i])) for i in range(B)]))
    if base_c is None:
        base_c = c
        print(f"coarse_Lq={lq_c}: self-doc contained {hit:.2f}", flush=True)
    else:
        keep = float(np.mean([len(set(c[i]) & set(base_c[i])) / c.shape[1]
                              for i in range(B)]))
        print(f"coarse_Lq={lq_c}: top-1024 overlap {keep:.3f}, "
              f"self-doc contained {hit:.2f}", flush=True)
    if not INTERPRET:
        _, rows = two_stage_search(q, tokens, mask, summ, k=K,
                                   n_candidates=1024, coarse_query_len=lq_c,
                                   scales=scales, use_pallas_coarse=True,
                                   summaries_t=summ_t, approx_topk=True)
        top1 = float(np.mean(np.asarray(rows)[:, 0] == np.arange(B)))
        print(f"  two-stage top-1: {top1:.2f}", flush=True)
        e2e_qps(f"  two-stage C=1024 coarse_Lq={lq_c}", lq_c)
