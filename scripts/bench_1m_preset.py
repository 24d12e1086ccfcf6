"""1M-doc bench THROUGH THE SHIPPED SEARCHER API under preset="fast".

The 1M operating-point numbers (STATUS.md round-4) were measured at the
`hierarchical_search` function level with hand-resolved knobs. This
script closes the last inch: it builds a 1M TokenIndex on-device
(residual codec by default, int8 tokens with --codec int8), constructs
`LateInteractionSearcher(..., preset="fast")` on a 1-device mesh (the
exact shard_map production program), asserts the preset resolves to
the measured operating point (C=256, n_blocks=32, int8 stage-1 rows
via the fused kernel), and times the compiled program scan-chained
(tunnel timing discipline — see bench_1m.py).

Measured (one v5e, 2026-08-19): residual 9,471-9,855 QPS/chip,
int8 15,916 QPS/chip; self top-1 1.00 both.

Run: python scripts/bench_1m_preset.py [--codec residual|int8]
"""

import functools
import os
import sys
import time

import numpy as np

sys.path.insert(0, ".")
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

import synth1m
from synth1m import build_int8_index, build_residual_index, make_topics, \
    slab_tokens
from ravqa_tpu.retrieval import LateInteractionSearcher

B, LQ, K = 32, 32, 10


def main(codec: str):
    key = jax.random.PRNGKey(7)
    topics = make_topics(key)
    mesh = Mesh(np.array(jax.devices()[:1]), ("index",))
    sh = NamedSharding(mesh, P("index"))
    idx = (build_residual_index(key, topics, sh) if codec == "residual"
           else build_int8_index(key, topics, sh))

    @jax.jit
    def make_queries(qkey, key, topics):
        base = slab_tokens(key, 0, topics)[:B, :LQ].astype(jnp.float32)
        qt = base + 0.1 * jax.random.normal(qkey, (B, LQ, synth1m.DIM))
        qt = qt * jax.lax.rsqrt(jnp.sum(qt ** 2, -1, keepdims=True) + 1e-9)
        return qt.astype(jnp.float32)

    q = jax.block_until_ready(make_queries(jax.random.PRNGKey(1), key,
                                           topics))
    qidx = np.arange(B)

    s = LateInteractionSearcher(idx, mesh=mesh, axis="index",
                                mode="hierarchical", preset="fast",
                                approx_topk=True)
    # the preset must resolve to the measured operating point
    assert s.resolve_candidates(K) == 256, s.resolve_candidates(K)
    assert s.resolve_blocks(K) == 32, s.resolve_blocks(K)
    assert s._summ_rows is not None and s._summ_rows.dtype == jnp.int8

    scores, rows = s.search(np.asarray(q), k=K)
    top1 = float(np.mean(rows[:, 0] == qidx))
    fn = s._search_fn(K)
    # the exact arg tuple the sharded program expects (assembly owned by
    # the searcher — it grows with codec features)
    args = s.sharded_args(q)

    @functools.partial(jax.jit, static_argnums=0)
    def run(iters, qq0, *arrs):
        def body(qq, _):
            sc, _ = fn(qq, *arrs)
            return qq + (sc[:, 0] * 1e-9).astype(qq.dtype)[:, None, None], ()
        qq, _ = jax.lax.scan(body, qq0, None, length=iters)
        return qq[:1, :1, :1]

    iters = 32
    _ = np.asarray(run(iters, *args))
    t0 = time.perf_counter()
    _ = np.asarray(run(iters, *args))
    dt_s = (time.perf_counter() - t0) / iters
    print(f"searcher_api(preset=fast, 1-dev mesh) hier_1M_{codec}: "
          f"{B / dt_s:.0f} QPS/chip ({dt_s * 1e3:.2f} ms/batch) "
          f"self_top1 {top1:.2f}", flush=True)


if __name__ == "__main__":
    codec = "residual"
    if "--codec" in sys.argv:
        codec = sys.argv[sys.argv.index("--codec") + 1]
    assert codec in ("residual", "int8"), codec
    main(codec)
