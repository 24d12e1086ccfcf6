"""Experiment: reduced-dimension summary projection for the coarse sweep.

The 1M two-stage cost is now dominated by the coarse summary sweep
(coarse_sweep_pallas, 9.1 ms at S=4/dim=128 — 1.4-1.7x off the bf16
compute roofline, scripts/exp_coarse_kernel.py). PLAID-style candidate
generation suggests the coarse tier does not need full-dimension
vectors: projecting the summaries (and the query, once) onto the top
`summary_dim` PCA directions halves (dim=64) or quarters (dim=32) both
the sweep FLOPs and the summary bytes. The fine stage re-scores at full
dimension, so only the CANDIDATE CUT is perturbed — same approximation
class as the summary pruning itself.

Measures, on the real chip at the 1M bench shape:
  1. coarse_sweep_pallas latency at dim 128 / 64 / 32
     (MXU K=64/K=32 contractions run at reduced systolic utilization, so
     the FLOP halving may not translate 1:1 — that is the question)
  2. candidate-cut fidelity: fraction of the full-dim top-1024 candidates
     retained by the projected top-1024, and self-retrieval containment
     (the query's own doc inside the projected top-C)

Run: python scripts/exp_coarse_dim.py
CPU syntax check: JAX_PLATFORMS=cpu EXP_N=8192 EXP_INTERPRET=1 ...
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp

from ravqa_tpu.ops.maxsim import coarse_sweep_pallas
from ravqa_tpu.retrieval.coarse import summarize_docs

N = int(os.environ.get("EXP_N", 1_000_448))
S, DIM, B, LQ = 4, 128, 32, 32
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
        kn, (slab, LQ, DIM), dt)).astype(dt)
    sq = jnp.sum(t.astype(jnp.float32) ** 2, -1, keepdims=True)
    return (t * jax.lax.rsqrt(sq + 1e-9).astype(dt)).astype(dt)


@jax.jit
def build_summaries(key, topics):
    def body(i, smm):
        tn = slab_tokens(key, i, topics, SLAB)
        sm = summarize_docs(tn, jnp.ones((SLAB, LQ), jnp.int8),
                            n_summary=S, iters=2).astype(dt)
        return jax.lax.dynamic_update_slice(smm, sm, (i * SLAB, 0, 0))
    return jax.lax.fori_loop(0, N // SLAB, body,
                             jnp.zeros((N, S, DIM), dt))


key = jax.random.PRNGKey(7)
topics = make_topics(key)
t0 = time.time()
summ = jax.block_until_ready(build_summaries(key, topics))
print(f"{N} summaries built in {time.time() - t0:.0f}s", flush=True)


@jax.jit
def make_queries(qkey, key, topics):
    base = slab_tokens(key, 0, topics, SLAB)[:B, :LQ].astype(jnp.float32)
    qt = base + 0.1 * jax.random.normal(qkey, (B, LQ, DIM))
    qt = qt * jax.lax.rsqrt(jnp.sum(qt ** 2, -1, keepdims=True) + 1e-9)
    return qt.astype(dt)


q = make_queries(jax.random.PRNGKey(1), key, topics)


@jax.jit
def pca_proj(summ):
    """Top-DIM PCA directions of a summary sample -> (DIM, DIM) f32
    orthonormal rows ordered by variance (slice columns for dim cuts)."""
    sample = summ[::max(N // 65536, 1)].reshape(-1, DIM).astype(jnp.float32)
    sample = sample - jnp.mean(sample, 0, keepdims=True)
    cov = sample.T @ sample
    _, vecs = jnp.linalg.eigh(cov)           # ascending eigenvalues
    return vecs[:, ::-1]                     # (DIM, DIM), top first


P = jax.block_until_ready(pca_proj(summ))


def project(x, d):
    y = jnp.einsum("...i,ij->...j", x.astype(jnp.float32), P[:, :d])
    n = jax.lax.rsqrt(jnp.sum(y ** 2, -1, keepdims=True) + 1e-9)
    return (y * n).astype(dt)


@jax.jit
def slot_major(s):
    return jnp.swapaxes(s, 0, 1)


valid = jnp.ones((N,), jnp.float32)


def timeit(name, qq, st, dsc=None, iters=32):
    """One timing harness for both sweep branches: dsc=None times the
    float kernel, dsc=(N,) scales the int8 branch."""
    extra = () if dsc is None else (dsc,)

    @jax.jit
    def run(q0, st, v, *ds):
        def body(qc, _):
            s = coarse_sweep_pallas(qc, st, v,
                                    dscale=ds[0] if ds else None)
            return qc + (s[:, 0] * 1e-9).astype(qc.dtype)[:, None, None], ()
        qc, _ = jax.lax.scan(body, q0, None, length=iters)
        return qc[:1, :1, :1]
    _ = np.asarray(run(qq, st, valid, *extra))
    t0 = time.perf_counter()
    _ = np.asarray(run(qq, st, valid, *extra))
    ms = (time.perf_counter() - t0) / iters * 1e3
    print(f"{name}: {ms:.2f} ms/batch", flush=True)
    return ms


@jax.jit
def topc(qq, st, c=min(1024, N)):
    if INTERPRET:                       # CPU check: same math via XLA
        s = jnp.einsum("snd,bqd->nsbq", st, qq,
                       preferred_element_type=jnp.float32)
        scores = jnp.sum(jnp.max(s, axis=1), axis=-1).T
    else:
        scores = coarse_sweep_pallas(qq, st, valid)
    return jax.lax.top_k(scores, c)[1]


@jax.jit
def topc_i8(qq, st8, dsc, c=min(1024, N)):
    scores = coarse_sweep_pallas(qq, st8, valid, dscale=dsc)
    return jax.lax.top_k(scores, c)[1]


dims = (128, 64, 32)
cands = {}
for d in dims:
    qd = q if d == DIM else project(q, d)
    sd = summ if d == DIM else project(summ, d)
    st = jax.block_until_ready(slot_major(sd))
    if not INTERPRET:
        timeit(f"coarse_sweep dim={d}", qd, st)
    c = np.asarray(topc(qd, st))
    cands[d] = c
    # self-retrieval containment: query i's true doc is doc i
    hit = float(np.mean([(i in set(c[i])) for i in range(B)]))
    if d != DIM:
        keep = float(np.mean([len(set(c[i]) & set(cands[DIM][i])) / c.shape[1]
                              for i in range(B)]))
        print(f"dim={d}: top-1024 overlap with dim-128 cut {keep:.3f}, "
              f"self-doc contained {hit:.2f}", flush=True)
    else:
        print(f"dim={d}: self-doc contained {hit:.2f}", flush=True)
    # int8 x PCA composition: quantize the PROJECTED summaries (the two
    # cuts multiply only if the composed candidate set still holds)
    if not INTERPRET:
        from ravqa_tpu.ops.quant import quantize_summaries_t_int8
        st8, dsc = jax.block_until_ready(quantize_summaries_t_int8(st))
        timeit(f"coarse_sweep dim={d} int8", qd, st8, dsc)
        ci = np.asarray(topc_i8(qd, st8, dsc))
        hit_i8 = float(np.mean([(i in set(ci[i])) for i in range(B)]))
        keep_i8 = float(np.mean([len(set(ci[i]) & set(cands[DIM][i]))
                                 / ci.shape[1] for i in range(B)]))
        print(f"dim={d} int8: top-1024 overlap with dim-128 bf16 cut "
              f"{keep_i8:.3f}, self-doc contained {hit_i8:.2f}", flush=True)
        st8.delete()
        dsc.delete()
        del st8, dsc
    del st, sd
