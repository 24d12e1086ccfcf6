"""On-chip proof that the SHARDED hierarchical program with the fused
stage-1 kernel lowers and runs on real TPU hardware.

Only one chip is available, so the mesh has one device: the program is
the exact shard_map(make_sharded_search) path production uses — stage-0
coarse-sweep kernel, stage-1 fused scalar-prefetch kernel (int8 rows +
per-doc dscale via coarse_int8), approx_max_k cuts, cross-shard top-k
merge collective — compiled and timed on-chip. Multi-device execution of
the same program is certified by __graft_entry__.dryrun_multichip /
tests/test_summ_int8.py on the 8-device CPU mesh.

Run: python scripts/bench_sharded_s1k.py
"""

import sys
import time

import numpy as np

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ravqa_tpu.retrieval import LateInteractionSearcher, TokenIndex
from ravqa_tpu.retrieval.coarse import summarize_docs

N, LD, DIM, S = 112_640, 64, 128, 8    # 112k docs, block-aligned
B, LQ, K = 32, 32, 10
BLOCK = 64
dt = jnp.bfloat16


@jax.jit
def build(key):
    n_topics = 1024
    t = jax.random.normal(key, (n_topics, DIM), dt)
    topics = t * jax.lax.rsqrt(
        jnp.sum(t.astype(jnp.float32) ** 2, -1, keepdims=True) + 1e-9
    ).astype(dt)
    assign = (jnp.arange(N, dtype=jnp.int32) * n_topics) // N
    toks = topics[assign][:, None, :] + (0.3 * jax.random.normal(
        jax.random.fold_in(key, 1), (N, LD, DIM), dt)).astype(dt)
    sq = jnp.sum(toks.astype(jnp.float32) ** 2, -1, keepdims=True)
    toks = (toks * jax.lax.rsqrt(sq + 1e-9).astype(dt)).astype(dt)
    t32 = toks.astype(jnp.float32)
    sc = jnp.maximum(jnp.max(jnp.abs(t32), -1), 1e-8) / 127.0
    q8 = jnp.round(t32 / sc[..., None]).astype(jnp.int8)
    summ = summarize_docs(toks, jnp.ones((N, LD), jnp.int8),
                          n_summary=S, iters=2).astype(dt)
    return q8, sc, summ


key = jax.random.PRNGKey(7)
t0 = time.time()
q8, scales, summ = jax.block_until_ready(build(key))
print(f"112k int8 index built in {time.time() - t0:.0f}s", flush=True)

mesh = Mesh(np.array(jax.devices()[:1]), ("index",))
sh = NamedSharding(mesh, P("index"))
idx = TokenIndex(tokens=jax.device_put(q8, sh),
                 mask=jax.device_put(jnp.ones((N, LD), jnp.int8), sh),
                 pids=np.arange(N, dtype=np.int64), num_docs=N,
                 scales=jax.device_put(scales, sh),
                 summaries=jax.device_put(summ, sh), block_size=BLOCK)
idx.build_block_summaries(block_size=BLOCK, n_block_summary=4,
                          mesh=mesh, axis="index")


@jax.jit
def make_queries(key, q8, scales):
    base = q8[:B, :LQ].astype(jnp.float32) * scales[:B, :LQ, None]
    qt = base + 0.1 * jax.random.normal(key, (B, LQ, DIM))
    qt = qt * jax.lax.rsqrt(jnp.sum(qt ** 2, -1, keepdims=True) + 1e-9)
    return qt.astype(dt)


q = jax.block_until_ready(make_queries(jax.random.PRNGKey(1), q8, scales))

for name, kw, bsum_i8 in (
        ("xla_stage1_bf16s0", dict(coarse_int8=True), False),
        ("xla_stage1_i8s0", dict(coarse_int8=True), True),
        ("s1kernel_bf16s0", dict(coarse_int8=True, stage1_kernel=True),
         False),
        ("s1kernel_i8s0", dict(coarse_int8=True, stage1_kernel=True), True)):
    s = LateInteractionSearcher(idx, mesh=mesh, axis="index",
                                mode="hierarchical", n_candidates=1024,
                                n_blocks=128, approx_topk=True, **kw)
    if not bsum_i8:
        # A/B the sharded stage-0 int8 block-summary sweep (VERDICT r4
        # Next #6) against the bf16 original by nulling the int8 copy
        # before the search program is built.
        s._bsum_i8 = None
        s._bsum_i8_scale = None
    scores, rows = s.search(np.asarray(q, np.float32), k=K)
    top1 = float(np.mean(rows[:, 0] == np.arange(B)))
    fn = s._search_fn(K)

    # scan-chain the timed program (tunnel timing discipline —
    # block_until_ready lies; see scripts/bench_1m.py)
    import functools

    @functools.partial(jax.jit, static_argnums=0)
    def run(iters, qq0, *arrs):
        def body(qq, _):
            sc, _ = fn(qq, *arrs)
            return qq + (sc[:, 0] * 1e-9).astype(qq.dtype)[:, None, None], ()
        qq, _ = jax.lax.scan(body, qq0, None, length=iters)
        return qq[:1, :1, :1]

    args = s.sharded_args(q.astype(jnp.float32))
    iters = 64
    _ = np.asarray(run(iters, *args))
    t0 = time.perf_counter()
    _ = np.asarray(run(iters, *args))
    dt_s = time.perf_counter() - t0
    print(f"sharded(1-dev mesh) hier_112k_{name}: "
          f"{B * iters / dt_s:.0f} QPS/chip "
          f"({dt_s / iters * 1e3:.2f} ms/batch) top1={top1:.2f}",
          flush=True)
