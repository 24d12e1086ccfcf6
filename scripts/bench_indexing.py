"""Indexing-phase throughput at 1M docs on ONE v5e chip (VERDICT r4 Next #3).

The reference treats corpus indexing as a first-class 4-phase offline job
(collection_indexer.py:56-426: setup/sample -> k-means train -> per-rank
encode+compress -> IVF finalize). This measures the TPU-native equivalent
end-to-end with the REAL BERT-base doc tower (not synthetic vectors):

  leg int8     : encode 1M docs (Ld=64) -> int8 quantize -> doc summaries,
                 fused per-slab in ONE jitted program with the device-
                 resident index buffers DONATED (in-place slab writes — no
                 double buffer of the 7.5 GiB index; the production
                 bench_1m.py layout: int8 tokens + scales + S=8 bf16
                 summaries).
  leg residual : codec train (device k-means on an encoded sample + host
                 residual quantiles) then encode -> compress -> packed
                 records + S=4 summaries (the bench_1m_residual.py layout,
                 ~3.1 GiB at nbits=2).
  block summaries for the hierarchical mode are timed separately.

Throughput is reported as docs/s and tokens/s; the encode tower's
HLO-accounted TFLOP/s contextualizes how much of the job is the BERT
forward (its flops dominate; quantize/summarize ride the same program).

Timing note (axon tunnel): block_until_ready can return before remote
execution finishes, so each leg ends by fetching a tiny checksum computed
INSIDE the final slab program — host receipt of that scalar proves the
whole dependency chain executed.

Run: python scripts/bench_indexing.py          (1M docs, ~5-10 min)
     BENCH_N=125056 python scripts/bench_indexing.py   (1/8 scale smoke)
     BENCH_LEGS=int8|residual                          (run one leg only)
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp

from ravqa_tpu.models import BertConfig, FLMRModelConfig, FLMRRetriever
from ravqa_tpu.ops.residual import _kmeans, compress_flat, pack_records, \
    record_bytes
from ravqa_tpu.retrieval.coarse import block_summaries, summarize_docs

N = int(os.environ.get("BENCH_N", 1_000_448))
LD, DIM = 64, 128
# 1_000_448 / 256: the int8 leg keeps ~10 GiB of donated index buffers
# live, so the BERT forward's temps must fit in the remainder — 7816-doc
# slabs compile to 16.65G (>15.75G HBM); 3908 fits.
SLAB = int(os.environ.get("BENCH_SLAB", 3908))
while N % SLAB:
    SLAB //= 2
NBITS = int(os.environ.get("BENCH_NBITS", 2))
N_CENT = int(os.environ.get("BENCH_NCENT", 8192))
dt = jnp.bfloat16

cfg = FLMRModelConfig(bert=BertConfig(dtype=jnp.bfloat16), dim=DIM,
                      vision_dim=768, prefix_len=32, nway=2,
                      use_ib_negatives=False)
model = FLMRRetriever(cfg)
_init_batch = dict(
    query_input_ids=jnp.ones((2, 8), jnp.int32),
    query_attention_mask=jnp.ones((2, 8), jnp.int32),
    image_features=jnp.ones((2, 768), jnp.float32),
    doc_input_ids=jnp.ones((4, 8), jnp.int32),
    doc_attention_mask=jnp.ones((4, 8), jnp.int32))
params = model.init(jax.random.PRNGKey(0), **_init_batch)["params"]
n_params = sum(x.size for x in jax.tree.leaves(params))
print(f"doc tower: BERT-base ({n_params/1e6:.0f}M params incl. shared "
      f"query tower), corpus {N} docs x {LD} tokens, slab {SLAB}",
      flush=True)


def encode_slab(params, key, i):
    """One slab of synthetic-token REAL encodes: random ids -> doc()."""
    ids = jax.random.randint(jax.random.fold_in(key, i), (SLAB, LD),
                             1, 30000, jnp.int32)
    am = jnp.ones((SLAB, LD), jnp.int32)
    d, m = model.apply({"params": params}, ids, am,
                       method=FLMRRetriever.doc)
    return d.astype(dt), m


LEGS = os.environ.get("BENCH_LEGS", "int8,residual").split(",")

# ---- leg 1: int8 index build (encode -> quantize -> summaries) ------------

def _int8_slab(idx8, scl, smm, params, key, i):
    tn, m = encode_slab(params, key, i)
    t32 = tn.astype(jnp.float32)
    absmax = jnp.max(jnp.abs(t32), -1)
    sc = jnp.maximum(absmax, 1e-8) / 127.0
    q8 = jnp.round(t32 / sc[..., None]).astype(jnp.int8)
    sm = summarize_docs(tn, m.astype(jnp.int8), n_summary=8,
                        iters=2).astype(dt)
    start = i * SLAB
    idx8 = jax.lax.dynamic_update_slice(idx8, q8, (start, 0, 0))
    scl = jax.lax.dynamic_update_slice(scl, sc.astype(jnp.float32),
                                       (start, 0))
    smm = jax.lax.dynamic_update_slice(smm, sm, (start, 0, 0))
    chk = sc.astype(jnp.float32).sum() + q8[::31, 0, 0].astype(
        jnp.float32).sum()
    return idx8, scl, smm, chk


int8_slab = jax.jit(_int8_slab, donate_argnums=(0, 1, 2))

# encode-phase HLO flops (per slab; the build is N/SLAB of these + the
# quantize/summarize epilogue riding the same program)
try:
    cost = jax.jit(encode_slab).lower(
        params, jax.random.PRNGKey(0), 0).compile().cost_analysis()
    slab_flops = float(cost.get("flops", 0.0))
except Exception:
    slab_flops = 0.0

t0 = time.time()
idx8 = jnp.zeros((N, LD, DIM), jnp.int8)
scl = jnp.zeros((N, LD), jnp.float32)
smm = jnp.zeros((N, 8, DIM), dt)
key = jax.random.PRNGKey(7)
idx8, scl, smm, chk = int8_slab(idx8, scl, smm, params, key, jnp.int32(0))
_ = float(chk)
dt_c = time.time() - t0          # slab-program compile + first slab
t0 = time.time()
for i in range(1, N // SLAB):
    idx8, scl, smm, chk = int8_slab(idx8, scl, smm, params, key,
                                    jnp.int32(i))
_ = float(chk)       # host receipt of the last slab's checksum = job done
dt_b = time.time() - t0
n_sl = N // SLAB - 1
enc_tflops = slab_flops * n_sl / dt_b / 1e12
gib = (idx8.size + scl.size * 4 + smm.size * 2) / 2 ** 30
docs = n_sl * SLAB
print(f"int8 build (encode+quantize+summaries): compile+slab0 {dt_c:.0f}s, "
      f"then {dt_b:.0f}s = {docs/dt_b:,.0f} docs/s = "
      f"{docs*LD/dt_b/1e6:.2f}M tokens/s "
      f"({gib:.1f} GiB, encode ~{enc_tflops:.0f} TFLOP/s); "
      f"total {dt_c+dt_b:.0f}s", flush=True)

if N % 64 == 0:
    # chunked: blocks are independent, and the whole-corpus call's f32
    # k-means temps don't fit next to the 9.8 GiB resident index
    bs_chunk = jax.jit(lambda s: block_summaries(
        s, block_size=64, n_block_summary=4).astype(dt))
    n_ch = 16
    while (N // 64) % n_ch:
        n_ch //= 2
    t0 = time.time()
    parts = [bs_chunk(smm[j * (N // n_ch):(j + 1) * (N // n_ch)])
             for j in range(n_ch)]
    bchk = jax.jit(lambda ps: sum(p[::37, 0].astype(jnp.float32).sum()
                                  for p in ps))(parts)
    _ = float(bchk)
    print(f"block summaries (B=64, S=4, {n_ch} chunks): "
          f"{time.time()-t0:.1f}s ({N//64}, 4, {DIM})", flush=True)
    for p in parts:
        p.delete()
    del parts

for a in (idx8, scl, smm):
    a.delete()
del idx8, scl, smm

# ---- leg 2: residual-codec build (train + encode -> compress -> pack) -----

@jax.jit
def codec_sample(params, key):
    t, _ = encode_slab(params, key, 0)
    flat = t.astype(jnp.float32).reshape(-1, DIM)
    pick = jax.random.choice(jax.random.fold_in(key, 99),
                             flat.shape[0], (131072,), replace=False)
    return flat[pick]


t0 = time.time()
sample = codec_sample(params, key)
held = sample[114688:]
centroids = _kmeans(sample[:114688], N_CENT, 8)
codes_h = jnp.argmax(held @ centroids.T, axis=-1)
resid = np.asarray(held - centroids[codes_h]).reshape(-1)
nb = 2 ** NBITS
cutoffs = jnp.asarray(np.quantile(resid, np.arange(1, nb) / nb)
                      .astype(np.float32))
weights = jnp.asarray(np.quantile(resid, (np.arange(nb) + 0.5) / nb)
                      .astype(np.float32))
dt_train = time.time() - t0
print(f"codec train ({N_CENT} centroids, nbits={NBITS}): {dt_train:.0f}s "
      "(sample encode + device k-means + host quantiles)", flush=True)

REC = record_bytes(LD, DIM, NBITS)


def _residual_slab(records, smm, params, key, centroids, cutoffs, weights,
                   i):
    tn, m = encode_slab(params, key, i)
    flat = tn.astype(jnp.float32).reshape(-1, DIM)
    code, pk, scale = compress_flat(flat, centroids, cutoffs,
                                    weights, NBITS)
    rec = pack_records(code.reshape(SLAB, LD),
                       scale.reshape(SLAB, LD),
                       pk.reshape(SLAB, LD, -1))
    sm = summarize_docs(tn, m.astype(jnp.int8), n_summary=4,
                        iters=2).astype(dt)
    start = i * SLAB
    records = jax.lax.dynamic_update_slice(records, rec, (start, 0))
    smm = jax.lax.dynamic_update_slice(smm, sm, (start, 0, 0))
    chk = rec[::31, 0].astype(jnp.float32).sum()
    return records, smm, chk


residual_slab = jax.jit(_residual_slab, donate_argnums=(0, 1))

t0 = time.time()
records = jnp.zeros((N, REC), jnp.uint8)
smm_r = jnp.zeros((N, 4, DIM), dt)
records, smm_r, chk = residual_slab(records, smm_r, params, key,
                                    centroids, cutoffs, weights,
                                    jnp.int32(0))
_ = float(chk)
dt_rc = time.time() - t0
t0 = time.time()
for i in range(1, N // SLAB):
    records, smm_r, chk = residual_slab(records, smm_r, params, key,
                                        centroids, cutoffs, weights,
                                        jnp.int32(i))
_ = float(chk)
dt_r = time.time() - t0
docs = (N // SLAB - 1) * SLAB
gib_r = (records.size + smm_r.size * 2) / 2 ** 30
print(f"residual build (encode+compress+pack+summaries): compile+slab0 "
      f"{dt_rc:.0f}s, then {dt_r:.0f}s = {docs/dt_r:,.0f} docs/s = "
      f"{docs*LD/dt_r/1e6:.2f}M tokens/s "
      f"({gib_r:.1f} GiB records+summaries)", flush=True)
print(f"TOTAL residual job incl. codec train: {dt_rc + dt_r + dt_train:.0f}s",
      flush=True)
