"""Benchmark: late-interaction retrieval queries/sec/chip.

Measures the serving hot path — a query batch scored against an HBM-resident
token index with the fused Pallas MaxSim kernel + top-k — on one real TPU
chip. Prints ONE JSON line:

  {"metric": "...", "value": QPS, "unit": "queries/s/chip", "vs_baseline": r}

vs_baseline: published ColBERT-v2/PLAID GPU latencies are ~10-100 ms/query
end-to-end (PLAID paper, A100, MS MARCO-scale with aggressive IVF pruning);
we take 50 QPS/GPU as the ColBERT-on-GPU reference throughput, so
vs_baseline = QPS / 50. The BASELINE.json north-star (>10x ColBERT GPU) is
vs_baseline > 10.

Timing notes (axon tunnel): block_until_ready() does not actually wait for
remote execution, so iterations are chained *inside one jit* via lax.scan
(each step consumes the previous top-k result, forcing sequential execution)
and the final fetch is a host transfer.
"""

import json
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    from ravqa_tpu.ops import maxsim_search_pallas, maxsim_search_xla

    on_tpu = jax.default_backend() == "tpu"
    # Index sized to the OK-VQA GoogleSearch corpus (~112k passages):
    # 112640 docs x 128 tokens x 128 dim bf16 = 3.4 GiB in HBM.
    n, ld, dim = (112640, 128, 128) if on_tpu else (2048, 32, 128)
    b, lq = 32, 32
    k = 10
    iters = 8

    dt = jnp.bfloat16 if on_tpu else jnp.float32
    # Generate the synthetic index ON DEVICE: host RNG + an 8.6 GiB
    # host->device transfer through the axon tunnel would dominate setup.
    @jax.jit
    def make_index(key):
        # generate directly in bf16 — an f32 intermediate would double HBM
        t = jax.random.normal(key, (n, ld, dim), dt)
        sq = jnp.sum(t.astype(jnp.float32) ** 2, -1, keepdims=True)
        return (t * jax.lax.rsqrt(sq + 1e-9).astype(dt)).astype(dt)

    @jax.jit
    def make_queries(key):
        t = jax.random.normal(key, (b, lq, dim), jnp.float32)
        t = t * jax.lax.rsqrt(jnp.sum(t * t, -1, keepdims=True) + 1e-9)
        return t.astype(dt)

    index = make_index(jax.random.PRNGKey(0))
    mask = jnp.ones((n, ld), jnp.float32)
    q = make_queries(jax.random.PRNGKey(1))

    @jax.jit
    def chained(q, index, mask):
        def body(carry, _):
            qq = carry
            scores = (maxsim_search_pallas(qq, index, mask, tile_d=16)
                      if on_tpu else maxsim_search_xla(qq, index, mask))
            s, i = jax.lax.top_k(scores, k)
            # data dependency: perturb queries with the top scores so scan
            # iterations cannot be executed in parallel / CSE'd
            qq = qq + (s[:, 0] * 1e-9).astype(qq.dtype)[:, None, None]
            return qq, (s, i)
        qq, (s, i) = jax.lax.scan(body, q, None, length=iters)
        return s, i

    # warmup + compile
    s, i = chained(q, index, mask)
    np.asarray(s)

    t0 = time.perf_counter()
    s, i = chained(q, index, mask)
    s_host = np.asarray(s)  # forces full round-trip
    dt_s = time.perf_counter() - t0

    qps = b * iters / dt_s
    flops = 2.0 * n * ld * b * lq * dim * iters
    out = {
        "metric": "late-interaction search QPS/chip "
                  f"({n} docs x {ld} toks, exact MaxSim, bf16, top-{k})",
        "value": round(qps, 1),
        "unit": "queries/s/chip",
        "vs_baseline": round(qps / 50.0, 2),
        "extra": {
            "backend": jax.default_backend(),
            "docs": n, "batch": b, "iters": iters, "wall_s": round(dt_s, 3),
            "tflops": round(flops / dt_s / 1e12, 1),
            "index_gib": round(n * ld * dim * (2 if on_tpu else 4) / 2**30,
                               2),
        },
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
