"""Benchmark: late-interaction retrieval queries/sec/chip.

Measures the serving hot path on one real TPU chip over a 112640-doc token
index (the OK-VQA GoogleSearch corpus scale): hierarchical 3-stage search
(block summaries -> doc summaries -> exact MaxSim re-score) over a
cluster-ordered index (the build-time cluster_order recipe), with the
two-stage and exhaustive fused-Pallas-MaxSim QPS and the recall@10 /
top-1 agreement vs exact reported alongside. Prints ONE JSON line.

vs_baseline: published ColBERT-v2/PLAID GPU throughput is ~10-100 ms/query
(A100, aggressive IVF pruning); we take 50 QPS/GPU as the ColBERT-on-GPU
reference, so vs_baseline = QPS / 50. North-star (>10x) = vs_baseline > 10.

Timing notes (axon tunnel): block_until_ready() does not wait for remote
execution, so iterations are chained inside one jit via lax.scan (each step
perturbs the queries with the previous scores, forcing sequential execution)
and the final fetch is a host transfer. Index data is generated on-device
(host->device of GBs through the tunnel is minutes). Device buffers are
passed as jit ARGUMENTS — closure-captured constants get serialized into the
HLO and shipped to the remote compiler.
"""

import json
import os
import sys
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    from ravqa_tpu.ops import maxsim_search_pallas, maxsim_search_xla
    from ravqa_tpu.retrieval.coarse import (block_summaries,
                                            block_summaries_t,
                                            hierarchical_search,
                                            summarize_docs, two_stage_search)

    on_tpu = jax.default_backend() == "tpu"
    n, ld, dim = (112640, 128, 128) if on_tpu else (2048, 32, 128)
    b, lq, k = 32, 32, 10
    n_candidates = 256
    n_topics = 2048 if on_tpu else 64
    # enough in-jit chained iterations to amortize the fixed per-call
    # host/tunnel round-trip (~10-20 ms): at 8 iters the 3 ms/batch
    # hierarchical mode read ~40% slow
    iters = 64 if on_tpu else 4
    dt = jnp.bfloat16 if on_tpu else jnp.float32

    # Structured synthetic index (doc tokens cluster around topics, as real
    # passage embeddings do); generated on-device, cluster-ordered (the
    # sorted assignment models coarse.cluster_order applied at build time,
    # which hierarchical search requires for coherent blocks).
    @jax.jit
    def make_index(key):
        kt, kn, ka = jax.random.split(key, 3)
        topics = jax.random.normal(kt, (n_topics, dim), dt)
        topics = topics * jax.lax.rsqrt(
            jnp.sum(topics.astype(jnp.float32) ** 2, -1,
                    keepdims=True) + 1e-9).astype(dt)
        assign = jnp.sort(jax.random.randint(ka, (n,), 0, n_topics))
        t = topics[assign][:, None, :] + (0.3 * jax.random.normal(
            kn, (n, ld, dim), dt)).astype(dt)
        sq = jnp.sum(t.astype(jnp.float32) ** 2, -1, keepdims=True)
        return (t * jax.lax.rsqrt(sq + 1e-9).astype(dt)).astype(dt)

    @jax.jit
    def make_queries(key, index):
        ki, kn = jax.random.split(key)
        qidx = jax.random.randint(ki, (b,), 0, n)
        qt = index[qidx, :lq].astype(jnp.float32) \
            + 0.1 * jax.random.normal(kn, (b, lq, dim))
        qt = qt * jax.lax.rsqrt(jnp.sum(qt ** 2, -1, keepdims=True) + 1e-9)
        return qt.astype(dt)

    index = make_index(jax.random.PRNGKey(0))
    mask = jnp.ones((n, ld), jnp.float32)
    q = make_queries(jax.random.PRNGKey(1), index)
    summ = summarize_docs(index, mask, n_summary=8, iters=4).astype(dt)
    block = 64
    # nb sweep on v5e (recall flat at 0.9906 from nb=8 to 32; summary-stage
    # limited): nb=32: 6119 QPS, nb=16: 7303, nb=8: 7649. 16 is the robust pick.
    n_blocks = 16 if on_tpu else 8
    bsum = block_summaries(summ, block_size=block,
                           n_block_summary=4).astype(dt)
    bsum = jax.block_until_ready(bsum)
    # the searcher's TPU-default fast path: slot-major summary copies for
    # the coarse-sweep kernel + approx_max_k pruning cuts (the final
    # exact top_k(k) after re-scoring is never approximated)
    summ_t = jax.block_until_ready(
        jax.jit(lambda x: jnp.swapaxes(x, 0, 1))(summ)) if on_tpu else None
    bsum_t = jax.block_until_ready(
        jax.jit(block_summaries_t)(bsum)) if on_tpu else None
    approx = on_tpu

    def exact_fn(qq, idx, m):
        if on_tpu:
            return maxsim_search_pallas(qq, idx, m, tile_d=64)
        return maxsim_search_xla(qq, idx, m)

    # stage-1 rides the fused scalar-prefetch kernel (stage1_rows layout;
    # the XLA twin runs off-TPU) — measured +10-38% over the XLA stage-1
    # across the 112k/1M presets (STATUS.md round-4)
    from ravqa_tpu.ops.maxsim import stage1_rows
    summ_rows = jax.block_until_ready(
        jax.jit(stage1_rows, static_argnums=1)(summ, block))

    # recall of hierarchical (the headline mode) vs exact
    exact_scores = np.asarray(exact_fn(q, index, mask))
    exact_top = np.argsort(-exact_scores, 1)[:, :k]
    _, rows = hierarchical_search(q, index, mask, None, bsum, k=k,
                                  n_blocks=n_blocks,
                                  n_candidates=n_candidates,
                                  block_size=block, approx_topk=approx,
                                  block_summ_t=bsum_t, summ_rows=summ_rows)
    rows = np.asarray(rows)
    recall = float(np.mean([len(set(rows[i]) & set(exact_top[i])) / k
                            for i in range(b)]))
    top1 = float(np.mean(rows[:, 0] == exact_top[:, 0]))
    # numerics-matched recall: the fine stage re-scores with XLA-semantics
    # math, and the Pallas exact kernel breaks bf16 near-ties at rank ~10
    # differently (cross-backend exact-vs-exact overlap is itself 0.9945
    # on this corpus — scripts/frontier_tie_noise.py). Against the XLA
    # exact reference the pruned search measures lossless (1.0000).
    xla_top = np.argsort(-np.asarray(
        jax.jit(maxsim_search_xla)(q, index, mask)), 1)[:, :k]
    recall_matched = float(np.mean(
        [len(set(rows[i]) & set(xla_top[i])) / k for i in range(b)]))

    def timeit(fn, args):
        @jax.jit
        def run(q, *args):
            def body(qq, _):
                s = fn(qq, *args)
                qq = qq + (s[:, 0] * 1e-9).astype(qq.dtype)[:, None, None]
                return qq, ()
            qq, _ = jax.lax.scan(body, q, None, length=iters)
            return qq[:1, :1, :1]
        _ = np.asarray(run(q, *args))          # compile + warm
        t0 = time.perf_counter()
        _ = np.asarray(run(q, *args))
        return time.perf_counter() - t0

    dt_exact = timeit(exact_fn, (index, mask))
    dt_two = timeit(
        lambda qq, idx, m, sm, smt: two_stage_search(
            qq, idx, m, sm, k=k, n_candidates=n_candidates,
            use_pallas_coarse=on_tpu, summaries_t=smt,
            approx_topk=approx)[0],
        (index, mask, summ, summ_t))
    dt_hier_xla = timeit(
        lambda qq, idx, m, sm, bm, bmt: hierarchical_search(
            qq, idx, m, sm, bm, k=k, n_blocks=n_blocks,
            n_candidates=n_candidates, block_size=block,
            approx_topk=approx, block_summ_t=bmt)[0],
        (index, mask, summ, bsum, bsum_t))
    dt_hier = timeit(
        lambda qq, idx, m, bm, bmt, rw: hierarchical_search(
            qq, idx, m, None, bm, k=k, n_blocks=n_blocks,
            n_candidates=n_candidates, block_size=block,
            approx_topk=approx, block_summ_t=bmt, summ_rows=rw)[0],
        (index, mask, bsum, bsum_t, summ_rows))

    qps_exact = b * iters / dt_exact
    qps_two = b * iters / dt_two
    qps_hier = b * iters / dt_hier

    # ---- 1M-doc leg (the BASELINE.json north-star scale) through the
    # shipped searcher API under preset="fast" (VERDICT r4 Next #4:
    # BENCH_r*.json must record the target scale, not just 112k).
    # int8 + residual codecs; disable with RAVQA_BENCH_1M=0.
    extra_1m = {}
    if on_tpu and os.environ.get("RAVQA_BENCH_1M", "1") != "0":
        # free the 112k buffers first (the int8 1M index alone is 7.5 GiB)
        for a in (index, mask, summ, bsum, summ_t, bsum_t, summ_rows):
            a.delete()
        del index, mask, summ, bsum, summ_t, bsum_t, summ_rows
        import functools
        sys.path.insert(0, os.path.join(os.path.dirname(
            os.path.abspath(__file__)), "scripts"))
        import synth1m
        from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
        from ravqa_tpu.retrieval import LateInteractionSearcher

        key = jax.random.PRNGKey(7)
        topics = synth1m.make_topics(key)
        mesh = Mesh(np.array(jax.devices()[:1]), ("index",))
        sh = NamedSharding(mesh, P("index"))

        @jax.jit
        def make_queries_1m(qkey, key, topics):
            base = synth1m.slab_tokens(key, 0, topics)[:b, :lq] \
                .astype(jnp.float32)
            qt = base + 0.1 * jax.random.normal(qkey, (b, lq, synth1m.DIM))
            qt = qt * jax.lax.rsqrt(
                jnp.sum(qt ** 2, -1, keepdims=True) + 1e-9)
            return qt.astype(jnp.float32)

        q1m = jax.block_until_ready(
            make_queries_1m(jax.random.PRNGKey(1), key, topics))
        qidx = np.arange(b)

        for codec in ("int8", "residual"):
            idx1m = (synth1m.build_int8_index(key, topics, sh)
                     if codec == "int8"
                     else synth1m.build_residual_index(key, topics, sh))
            s = LateInteractionSearcher(idx1m, mesh=mesh, axis="index",
                                        mode="hierarchical", preset="fast",
                                        approx_topk=True)
            _, rows1m = s.search(np.asarray(q1m), k=k)
            top1_1m = float(np.mean(rows1m[:, 0] == qidx))
            fn = s._search_fn(k)
            args1m = s.sharded_args(q1m)

            @functools.partial(jax.jit, static_argnums=0)
            def run1m(iters, qq0, *arrs):
                def body(qq, _):
                    sc, _ = fn(qq, *arrs)
                    return qq + (sc[:, 0] * 1e-9).astype(
                        qq.dtype)[:, None, None], ()
                qq, _ = jax.lax.scan(body, qq0, None, length=iters)
                return qq[:1, :1, :1]

            it1m = 32
            _ = np.asarray(run1m(it1m, *args1m))
            t0 = time.perf_counter()
            _ = np.asarray(run1m(it1m, *args1m))
            dt1m = time.perf_counter() - t0
            extra_1m[f"qps_1m_{codec}_preset_fast"] = round(
                b * it1m / dt1m, 1)
            extra_1m[f"self_top1_1m_{codec}"] = top1_1m
            for leaf in jax.tree.leaves(idx1m.__dict__):
                if isinstance(leaf, jax.Array):
                    leaf.delete()
            del idx1m, s, fn, args1m

    out = {
        "metric": f"late-interaction search QPS/chip ({n} docs x {ld} toks, "
                  f"hierarchical B={n_blocks} C={n_candidates}, top-{k})",
        "value": round(qps_hier, 1),
        "unit": "queries/s/chip",
        "vs_baseline": round(qps_hier / 50.0, 2),
        "extra": {
            "backend": jax.default_backend(),
            "recall_at_10_vs_exact": round(recall, 4),
            "recall_at_10_vs_exact_matched_numerics": round(recall_matched,
                                                            4),
            "top1_agreement_vs_exact": round(top1, 4),
            "exact_qps": round(qps_exact, 1),
            "two_stage_qps": round(qps_two, 1),
            "hierarchical_xla_stage1_qps": round(b * iters / dt_hier_xla,
                                                 1),
            "exact_ms_per_batch32": round(dt_exact / iters * 1e3, 2),
            "hierarchical_ms_per_batch32": round(dt_hier / iters * 1e3, 2),
            "index_gib": round(n * ld * dim
                               * (2 if on_tpu else 4) / 2 ** 30, 2),
            **extra_1m,
        },
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
