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

Run: python scripts/bench_1m_preset.py [--codec residual|int8]
"""

import sys
import time

import numpy as np

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ravqa_tpu.ops.residual import (_kmeans, compress_flat, pack_records,
                                    record_bytes)
from ravqa_tpu.retrieval import LateInteractionSearcher, TokenIndex
from ravqa_tpu.retrieval.coarse import block_summaries, summarize_docs

N, LD, DIM = 1_000_448, 64, 128
S_SUMM = 4
B, LQ, K = 32, 32, 10
N_TOPICS = 8192
SLAB = 62_528
NBITS = 2
N_CENT = 8192
BLOCK = 64
dt = jnp.bfloat16


@jax.jit
def make_topics(key):
    t = jax.random.normal(key, (N_TOPICS, DIM), dt)
    return t * jax.lax.rsqrt(jnp.sum(t.astype(jnp.float32) ** 2, -1,
                                     keepdims=True) + 1e-9).astype(dt)


def slab_tokens(key, i, topics):
    kn = jax.random.fold_in(key, i)
    gidx = i * SLAB + jnp.arange(SLAB, dtype=jnp.int32)
    assign = jnp.clip(jnp.floor(gidx.astype(jnp.float32)
                                * (N_TOPICS / N)).astype(jnp.int32),
                      0, N_TOPICS - 1)
    t = topics[assign][:, None, :] + (0.3 * jax.random.normal(
        kn, (SLAB, LD, DIM), dt)).astype(dt)
    sq = jnp.sum(t.astype(jnp.float32) ** 2, -1, keepdims=True)
    return (t * jax.lax.rsqrt(sq + 1e-9).astype(dt)).astype(dt)


@jax.jit
def codec_sample(key, topics):
    t = slab_tokens(key, 0, topics).astype(jnp.float32)
    flat = t.reshape(-1, DIM)
    pick = jax.random.choice(jax.random.fold_in(key, 99),
                             flat.shape[0], (131072,), replace=False)
    return flat[pick]


def build_int8_index(key, topics, sh):
    """int8-token 1M index (the throughput codec), slabbed in one jit."""
    @jax.jit
    def build(key, topics):
        def body(i, carry):
            idx8, scl, smm = carry
            tn = slab_tokens(key, i, topics)
            t32 = tn.astype(jnp.float32)
            sc = jnp.maximum(jnp.max(jnp.abs(t32), -1), 1e-8) / 127.0
            q8 = jnp.round(t32 / sc[..., None]).astype(jnp.int8)
            sm = summarize_docs(tn, jnp.ones((SLAB, LD), jnp.int8),
                                n_summary=S_SUMM, iters=2).astype(dt)
            start = i * SLAB
            return (jax.lax.dynamic_update_slice(idx8, q8, (start, 0, 0)),
                    jax.lax.dynamic_update_slice(
                        scl, sc.astype(jnp.float32), (start, 0)),
                    jax.lax.dynamic_update_slice(smm, sm, (start, 0, 0)))
        init = (jnp.zeros((N, LD, DIM), jnp.int8),
                jnp.zeros((N, LD), jnp.float32),
                jnp.zeros((N, S_SUMM, DIM), dt))
        return jax.lax.fori_loop(0, N // SLAB, body, init)

    t0 = time.time()
    index8, scales, summ = jax.block_until_ready(build(key, topics))
    print(f"int8 index built in {time.time() - t0:.0f}s", flush=True)
    bsum = jax.jit(lambda s: block_summaries(
        s, block_size=BLOCK, n_block_summary=4).astype(dt))(summ)
    return TokenIndex(
        tokens=jax.device_put(index8, sh),
        mask=jax.device_put(jnp.ones((N, LD), jnp.int8), sh),
        pids=np.arange(N, dtype=np.int64), num_docs=N,
        scales=jax.device_put(scales, sh),
        summaries=jax.device_put(summ, sh),
        block_summaries=jax.device_put(bsum, sh), block_size=BLOCK)


def build_residual_index(key, topics, sh):
    t0 = time.time()
    sample = codec_sample(key, topics)
    held = sample[114688:]
    centroids = _kmeans(sample[:114688], N_CENT, 8)
    codes_h = jnp.argmax(held @ centroids.T, axis=-1)
    resid = np.asarray(held - centroids[codes_h]).reshape(-1)
    nb = 2 ** NBITS
    cutoffs = jnp.asarray(np.quantile(resid, np.arange(1, nb) / nb)
                          .astype(np.float32))
    weights = jnp.asarray(np.quantile(resid, (np.arange(nb) + 0.5) / nb)
                          .astype(np.float32))
    print(f"codec trained in {time.time() - t0:.0f}s", flush=True)

    rec_w = record_bytes(LD, DIM, NBITS)

    @jax.jit
    def build_index(key, topics, centroids, cutoffs, weights_d):
        def body(i, carry):
            records, smm = carry
            tn = slab_tokens(key, i, topics)
            flat = tn.astype(jnp.float32).reshape(-1, DIM)
            code, pk, scale = compress_flat(flat, centroids, cutoffs,
                                            weights_d, NBITS)
            rec = pack_records(code.reshape(SLAB, LD),
                               scale.reshape(SLAB, LD).astype(jnp.bfloat16),
                               pk.reshape(SLAB, LD, -1))
            sm = summarize_docs(tn, jnp.ones((SLAB, LD), jnp.int8),
                                n_summary=S_SUMM, iters=2).astype(dt)
            start = i * SLAB
            return (jax.lax.dynamic_update_slice(records, rec, (start, 0)),
                    jax.lax.dynamic_update_slice(smm, sm, (start, 0, 0)))
        init = (jnp.zeros((N, rec_w), jnp.uint8),
                jnp.zeros((N, S_SUMM, DIM), dt))
        return jax.lax.fori_loop(0, N // SLAB, body, init)

    t0 = time.time()
    records, summ = build_index(key, topics, centroids, cutoffs, weights)
    records = jax.block_until_ready(records)
    print(f"residual index built in {time.time() - t0:.0f}s", flush=True)

    bsum = jax.jit(lambda s: block_summaries(
        s, block_size=BLOCK, n_block_summary=4).astype(dt))(summ)
    return TokenIndex(
        tokens=None, mask=jax.device_put(jnp.ones((N, LD), jnp.int8), sh),
        pids=np.arange(N, dtype=np.int64), num_docs=N,
        summaries=jax.device_put(summ, sh),
        block_summaries=jax.device_put(bsum, sh), block_size=BLOCK,
        records=jax.device_put(records, sh),
        codec_centroids=centroids, codec_weights=weights, nbits=NBITS)


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
        qt = base + 0.1 * jax.random.normal(qkey, (B, LQ, DIM))
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
    if codec == "residual":
        args = (q, idx.mask, s._summ_rows, idx.block_summaries,
                idx.records, idx.codec_centroids, idx.codec_weights,
                s._summ_rows_scale)
    else:
        args = (q, idx.tokens, idx.mask, s._summ_rows,
                idx.block_summaries, idx.scales, s._summ_rows_scale)

    import functools

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
