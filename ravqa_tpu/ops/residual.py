"""Residual codec: centroid code + bucketized packed residuals.

TPU-native re-design of the reference's ResidualCodec
(/root/reference/third_party/ColBERT/colbert/indexing/codecs/residual.py:
169-278 compress, :242-278 decompress; packbits.cu / decompress_residuals.cu
CUDA kernels): every token embedding is stored as

    code      int32   nearest spherical-k-means centroid id
    residual  uint8[dim*nbits/8]   per-dim bucket ids, nbits each, packed

and reconstructed as centroid[code] + bucket_weights[bucket_id] per dim.
Bucket cutoffs/weights are residual-distribution quantiles, exactly the
reference's scheme (residual.py:44-52). Differences by design: packing is
PLANAR bit packing on the VPU (byte j holds dims {j, j+D/p, ..., j+(p-1)D/p}
where p = 8/nbits, so bit-plane k of the byte vector is dims
[k*D/p, (k+1)*D/p) — each plane unpacks with one shift+mask over the lane
dim, which both XLA and the fused Pallas kernel lower to pure vector ops;
no reversed_bit_map lookup — we own both sides). Compression/decompression
are jitted jnp, and there is no CPU/GPU split.

Compression ratio vs bf16 tokens at dim=128 (int16 codes + 2-byte
reconstruction-norm scale): nbits=2 -> 7.1x (36 B/token), nbits=4 -> 3.8x
(68 B/token, higher fidelity). The stored scale carries the reference's
post-decompress L2 normalization (residual.py:273-276) into scoring.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np


@dataclasses.dataclass
class ResidualCodec:
    centroids: jax.Array       # (K, dim) f32 (L2-normalized for the flat
    #                            codec; the additive coarse[h]+fine[l] table,
    #                            not unit-norm, for the factored one)
    bucket_cutoffs: jax.Array  # (2^nbits - 1,) f32
    bucket_weights: jax.Array  # (2^nbits,) f32
    nbits: int = 2
    # factored additive codebook (train_codec_factored): centroid of code
    # h*k_fine+l is coarse[h] + fine[l]. `centroids` then holds the
    # materialized flat table so compress/decompress/XLA scoring are
    # format-identical to the flat codec; only the fused TPU kernel reads
    # the factors (its in-VMEM centroid matmul drops from K to k1+k2 rows).
    coarse: Optional[jax.Array] = None     # (k_coarse, dim) f32
    fine: Optional[jax.Array] = None       # (k_fine, dim) f32

    @property
    def dim(self) -> int:
        return self.centroids.shape[1]

    @property
    def packed_dim(self) -> int:
        return self.dim * self.nbits // 8

    @property
    def factored(self) -> bool:
        return self.coarse is not None


def _sample_split(tokens, mask, sample: int, heldout: int, seed: int):
    """Valid-token flatten + disjoint (train, heldout) sample — shared by
    both codec trainers so the split rules never diverge."""
    valid = np.asarray(mask).reshape(-1) > 0
    flat = np.asarray(tokens, np.float32).reshape(-1, tokens.shape[-1])[valid]
    rng = np.random.default_rng(seed)
    take = min(sample + heldout, len(flat))
    # small corpora: keep at least half the picks for k-means so neither
    # split is ever empty (heldout default 2^14 >> tiny test corpora)
    heldout = max(1, min(heldout, take // 2))
    pick = rng.choice(len(flat), take, replace=False)
    return flat[pick[:take - heldout]], flat[pick[take - heldout:]]


def _fit_buckets(resid: np.ndarray, nbits: int):
    """nbits bucket layer fit to the actual post-codebook residual
    distribution (cutoffs at the quantile edges, weights at the bucket
    medians — reference residual.py bucketization)."""
    nb = 2 ** nbits
    cutoffs = np.quantile(resid, np.arange(1, nb) / nb).astype(np.float32)
    weights = np.quantile(resid, (np.arange(nb) + 0.5) / nb) \
        .astype(np.float32)
    return jnp.asarray(cutoffs), jnp.asarray(weights)


def train_codec(tokens: np.ndarray, mask: np.ndarray, n_centroids: int = 256,
                nbits: int = 2, iters: int = 8, sample: int = 2 ** 16,
                heldout: int = 2 ** 14, seed: int = 0) -> ResidualCodec:
    """K-means + residual-quantile training (reference CollectionIndexer
    .train, collection_indexer.py:206-314, on a token sample)."""
    train, held = _sample_split(tokens, mask, sample, heldout, seed)

    cent = _kmeans(jnp.asarray(train), n_centroids, iters)

    codes = _assign(jnp.asarray(held), cent)
    resid = np.asarray(jnp.asarray(held) - cent[codes]).reshape(-1)
    cutoffs, weights = _fit_buckets(resid, nbits)
    return ResidualCodec(centroids=cent, bucket_cutoffs=cutoffs,
                         bucket_weights=weights, nbits=nbits)


@functools.partial(jax.jit, static_argnames=("k", "iters"))
def _kmeans(x: jax.Array, k: int, iters: int) -> jax.Array:
    n = x.shape[0]
    stride = max(n // k, 1)
    cent = x[::stride][:k]
    cent = cent * jax.lax.rsqrt(jnp.sum(cent ** 2, -1, keepdims=True) + 1e-9)

    def step(c, _):
        a = jnp.argmax(x @ c.T, axis=-1)
        tot = jnp.zeros_like(c).at[a].add(x)
        cnt = jnp.zeros((c.shape[0],), jnp.float32).at[a].add(1.0)
        new = jnp.where(cnt[:, None] > 0, tot, c)
        new = new * jax.lax.rsqrt(jnp.sum(new ** 2, -1, keepdims=True) + 1e-9)
        return new, ()
    cent, _ = jax.lax.scan(step, cent, None, length=iters)
    return cent


@jax.jit
def _assign(x: jax.Array, centroids: jax.Array) -> jax.Array:
    return jnp.argmax(x @ centroids.T, axis=-1)


@functools.partial(jax.jit, static_argnames=("k", "iters"))
def _kmeans_l2(x: jax.Array, k: int, iters: int) -> jax.Array:
    """Plain (non-spherical) k-means — for residual distributions, which
    are not unit-norm. Assignment is argmin ||x - c||^2, i.e.
    argmax(x @ c^T - ||c||^2/2)."""
    stride = max(x.shape[0] // k, 1)
    cent = x[::stride][:k]

    def step(c, _):
        a = jnp.argmax(x @ c.T - 0.5 * jnp.sum(c * c, -1), axis=-1)
        tot = jnp.zeros_like(c).at[a].add(x)
        cnt = jnp.zeros((c.shape[0],), jnp.float32).at[a].add(1.0)
        new = jnp.where(cnt[:, None] > 0,
                        tot / jnp.maximum(cnt[:, None], 1.0), c)
        return new, ()
    cent, _ = jax.lax.scan(step, cent, None, length=iters)
    return cent


@functools.partial(jax.jit, static_argnames=("iters",))
def _refine_factored(x: jax.Array, coarse: jax.Array, fine: jax.Array,
                     iters: int):
    """Alternating refinement of the additive codebook under the GREEDY
    (residual-VQ) assignment compress uses (assign_factored): assign,
    then coordinate-descent mean updates of coarse and fine. Training
    under the same assignment rule that compression applies is what makes
    greedy near-optimal at convergence."""
    k1 = coarse.shape[0]
    k2 = fine.shape[0]

    def step(carry, _):
        c, f = carry
        a = assign_factored(x, c, f)
        hi, lo = a // k2, a % k2
        tc = jnp.zeros_like(c).at[hi].add(x - f[lo])
        cc = jnp.zeros((k1,), jnp.float32).at[hi].add(1.0)
        c2 = jnp.where(cc[:, None] > 0,
                       tc / jnp.maximum(cc[:, None], 1.0), c)
        tf = jnp.zeros_like(f).at[lo].add(x - c2[hi])
        cf = jnp.zeros((k2,), jnp.float32).at[lo].add(1.0)
        f2 = jnp.where(cf[:, None] > 0,
                       tf / jnp.maximum(cf[:, None], 1.0), f)
        return (c2, f2), ()

    (coarse, fine), _ = jax.lax.scan(step, (coarse, fine), None,
                                     length=iters)
    return coarse, fine


def train_codec_factored(tokens: np.ndarray, mask: np.ndarray,
                         k_coarse: int = 64, k_fine: int = 128,
                         nbits: int = 2, iters: int = 8,
                         refine_iters: int = 4, sample: int = 2 ** 16,
                         heldout: int = 2 ** 14,
                         seed: int = 0) -> ResidualCodec:
    """Train a FACTORED additive codebook: effective K = k_coarse * k_fine
    centroids, where centroid[h*k_fine + l] = coarse[h] + fine[l].

    Same index format as the flat codec (the flat table is materialized
    into `centroids`, codes are single ints) at the same compression ratio
    — but the fused decompress+MaxSim TPU kernel
    (maxsim_residual_pallas) can then compute its in-VMEM centroid-score
    term as one "two-hot" matmul against a (k1+k2, Lq) table instead of a
    one-hot against (K, Lq): the FLOPs drop K/(k1+k2)-fold (42x at
    64x128), which un-gates the kernel at the large codebooks (K=8192)
    that 1M-doc indexes need. The reference has no analogue — its
    decompress runs on CPU/CUDA gather hardware
    (decompress_residuals.cpp/.cu) where codebook size is free; on TPU
    the factorization is what maps the gather onto the MXU.

    Assignment is GREEDY residual-VQ (assign_factored: nearest coarse,
    then nearest fine of the residual — k1+k2 dots per token, so both
    training and compression get k1*k2/(k1+k2)-fold cheaper than a flat
    codebook of the same effective size; a 256x256 factored codebook
    compresses 16x FASTER than flat-8192 while offering 8x the effective
    centroids). Training: spherical k-means coarse, l2 k-means fine on
    the residuals, then `refine_iters` rounds of greedy assignment +
    alternating mean updates — refined under the same rule compression
    applies. Constrained-codebook quantization error lands between
    flat-K and flat-(k1+k2); the nbits bucket layer absorbs the
    difference (cutoffs/weights are fit to the ACTUAL post-codebook
    residual distribution either way).
    k_fine must be a power of two (codes split as hi*k_fine + lo with
    shift/mask inside the kernel).
    """
    assert k_fine & (k_fine - 1) == 0, "k_fine must be a power of two"
    # pack_records stores codes as uint16 — a larger effective codebook
    # would WRAP silently and score against the wrong centroids
    assert k_coarse * k_fine <= 65536, \
        (f"k_coarse*k_fine = {k_coarse * k_fine} exceeds the uint16 "
         "code range of the packed record layout (pack_records)")
    train_np, held_np = _sample_split(tokens, mask, sample, heldout, seed)
    train, held = jnp.asarray(train_np), jnp.asarray(held_np)

    coarse = _kmeans(train, k_coarse, iters)       # unit-norm init
    resid0 = train - coarse[_assign(train, coarse)]
    fine = _kmeans_l2(resid0, k_fine, iters)
    coarse, fine = _refine_factored(train, coarse, fine, refine_iters)

    table = jnp.reshape(coarse[:, None, :] + fine[None, :, :],
                        (k_coarse * k_fine, coarse.shape[1]))
    codes = assign_factored(held, coarse, fine)
    resid = np.asarray(held - table[codes]).reshape(-1)
    cutoffs, weights = _fit_buckets(resid, nbits)
    return ResidualCodec(centroids=table, bucket_cutoffs=cutoffs,
                         bucket_weights=weights, nbits=nbits,
                         coarse=coarse, fine=fine)


def assign_factored(flat, coarse, fine) -> jax.Array:
    """Greedy (residual-VQ) assignment to the factored additive codebook:
    nearest coarse centroid first, then nearest fine centroid of the
    remaining residual — k1+k2 dot products per token instead of the
    k1*k2 a flat table costs (16x cheaper at 256x256, which is what lets
    factored codebooks scale past flat k-means sizes). Both argmins use
    the l2 rule (argmax x@c^T - ||c||^2/2): the factors are NOT
    unit-norm."""
    hi = jnp.argmax(flat @ coarse.T - 0.5 * jnp.sum(coarse * coarse, -1),
                    axis=-1)
    r = flat - coarse[hi]
    lo = jnp.argmax(r @ fine.T - 0.5 * jnp.sum(fine * fine, -1), axis=-1)
    return hi * fine.shape[0] + lo


def compress_flat(flat, centroids, cutoffs, weights, nbits: int,
                  codes=None):
    """Codec core on flat (T, dim) f32 tokens -> (codes (T,) int32,
    packed (T, dim*nbits/8) uint8 planar bytes, scales (T,) f32).

    The single source of truth for the bit-pack layout + scale math —
    _compress_block (masked/batched driver) and the in-graph index builder
    in scripts/bench_1m_residual.py both call it; keep them bit-identical.

    codes: optional precomputed (T,) centroid assignment (the factored
    codec passes assign_factored's greedy codes — the flat argmax over
    its k1*k2 table would cost k1*k2/(k1+k2) times more). Default is the
    flat codec's dot-argmax (== nearest-neighbor for its unit centroids,
    matching the reference's cosine assignment).
    """
    dim = flat.shape[-1]
    if codes is None:
        codes = jnp.argmax(flat @ centroids.T, axis=-1)      # (T,)
    resid = flat - centroids[codes]
    bucket = jnp.searchsorted(cutoffs, resid)                # 0..2^nbits-1
    rec = centroids[codes] + weights[bucket]
    scales = jax.lax.rsqrt(jnp.sum(rec * rec, axis=-1) + 1e-12)
    bucket = bucket.astype(jnp.uint8)
    per_byte = 8 // nbits
    # planar layout: bucket (T, dim) -> (T, per_byte, dim/per_byte) where
    # plane p (byte bits p*nbits..) holds dims [p*dim/per_byte, ...)
    b = bucket.reshape(-1, per_byte, dim // per_byte)
    shifts = (jnp.arange(per_byte, dtype=jnp.uint8) * nbits)
    packed = jnp.sum(
        b.astype(jnp.uint32) << shifts[None, :, None].astype(jnp.uint32),
        axis=1).astype(jnp.uint8)
    return codes, packed, scales


@functools.partial(jax.jit, static_argnames=("nbits",))
def _compress_block(tokens, mask, centroids, cutoffs, weights,
                    coarse=None, fine=None, *, nbits: int):
    """(N, Ld, dim) f32 -> codes (N, Ld) int32, packed (N, Ld, dim*nbits/8)
    uint8, scales (N, Ld) f32. Masked tokens compress to code 0 / zero
    residual bits (the mask is kept separately; search fills them with
    NEG_INF).

    scales = 1/||centroid[code] + weights[bucket]||: the reference
    L2-NORMALIZES the reconstruction before scoring (residual.py:273-276
    `normalize(centroids_ + residuals_)`), so search multiplies per-token
    scores by this factor — stored at compress time because the fused
    kernel's distributive split (cq[code] + r @ q^T) cannot normalize the
    sum in-flight.
    """
    n, ld, dim = tokens.shape
    t = tokens.astype(jnp.float32) * mask[..., None].astype(jnp.float32)
    flat = t.reshape(-1, dim)
    pre = (assign_factored(flat, coarse, fine)
           if coarse is not None else None)
    codes, packed, scales = compress_flat(flat, centroids, cutoffs,
                                          weights, nbits, codes=pre)
    per_byte = 8 // nbits
    codes = codes * mask.reshape(-1).astype(codes.dtype)
    packed = packed * mask.reshape(-1, 1).astype(jnp.uint8)
    # zero the scales of masked tokens too: their codes/bytes are zeroed
    # above, so an unmasked scale would multiply a garbage reconstruction
    # for any consumer that (unlike search, which applies doc_masks)
    # treats mask-0 rows as zero tokens
    scales = scales * mask.reshape(-1).astype(scales.dtype)
    return (codes.reshape(n, ld).astype(jnp.int32),
            packed.reshape(n, ld, dim // per_byte),
            scales.reshape(n, ld))


def compress(tokens, mask, codec: ResidualCodec, block: int = 65536):
    """Host-driver: compress in blocks so the f32 upcast never exceeds
    `block` docs at a time. Returns (codes, packed, scales)."""
    toks = np.asarray(tokens)
    msk = np.asarray(mask)
    codes_out, packed_out, scales_out = [], [], []
    for s in range(0, toks.shape[0], block):
        c, p, sc = _compress_block(jnp.asarray(toks[s:s + block],
                                               jnp.float32),
                                   jnp.asarray(msk[s:s + block]),
                                   codec.centroids, codec.bucket_cutoffs,
                                   codec.bucket_weights,
                                   codec.coarse, codec.fine,
                                   nbits=codec.nbits)
        codes_out.append(np.asarray(c))
        packed_out.append(np.asarray(p))
        scales_out.append(np.asarray(sc))
    return (jnp.asarray(np.concatenate(codes_out)),
            jnp.asarray(np.concatenate(packed_out)),
            jnp.asarray(np.concatenate(scales_out)))


def unpack_bits(packed: jax.Array, nbits: int) -> jax.Array:
    """(..., dim*nbits/8) uint8 -> (..., dim) uint8 bucket ids (planar
    layout: plane p of the byte vector is dims [p*P, (p+1)*P))."""
    per_byte = 8 // nbits
    shifts = (jnp.arange(per_byte, dtype=jnp.uint8) * nbits)
    mask = jnp.uint8(2 ** nbits - 1)
    # (..., pb, P): plane-major so the row-major reshape restores dim order
    vals = (packed[..., None, :] >> shifts[:, None]) & mask
    return vals.reshape(packed.shape[:-1] + (-1,))


def decompress(codes: jax.Array, packed: jax.Array,
               centroids: jax.Array, bucket_weights: jax.Array,
               nbits: int, dtype=jnp.bfloat16) -> jax.Array:
    """codes (..., ) int32 + packed (..., dim*nbits/8) -> (..., dim)
    (reference decompress_residuals: centroid[code] + weights[bits]).

    Default output dtype is bf16: the nbits bucket quantization error
    (~2^-nbits of the residual range) dwarfs bf16 rounding, and the bf16
    intermediate halves the HBM traffic of the consuming fine-stage matmul.
    """
    bits = unpack_bits(packed, nbits)                        # (..., dim)
    out = centroids[codes] + bucket_weights[bits.astype(jnp.int32)]
    return out.astype(dtype)


# ---------------------------------------------------------------------------
# Packed per-doc records: the residual index's storage/gather format
# ---------------------------------------------------------------------------
#
# Measured on v5e (scripts/exp_residual_stage2.py): gathering codes /
# scales / residual bytes as SEPARATE arrays costs ~1.5 ms/batch in small-
# row XLA gathers and forces the fine stage into a per-query lax.map
# (3.1/7.4 ms at C=256/1024). Packing each doc's [codes int16 | scales
# bf16 | residual bytes] into ONE contiguous uint8 record row makes the
# candidate gather a single wide-row take and unlocks the fully-batched
# decompress+einsum fine stage: 1.6/2.8 ms — 1.9x/2.7x. Same bytes, one
# layout. (The reference's analogue is its strided chunk storage,
# residual_embeddings_strided.py.)

def record_bytes(ld: int, dim: int, nbits: int) -> int:
    return ld * 2 + ld * 2 + ld * (dim * nbits // 8)


@jax.jit
def pack_records(codes: jax.Array, scales: jax.Array,
                 packed: jax.Array) -> jax.Array:
    """codes (N, Ld) int (< 65536 centroids) + scales (N, Ld) bf16 +
    packed (N, Ld, P) uint8 -> (N, Ld*(4+P)) uint8 records."""
    n, ld = codes.shape
    cb = jax.lax.bitcast_convert_type(
        codes.astype(jnp.uint16), jnp.uint8).reshape(n, ld * 2)
    sb = jax.lax.bitcast_convert_type(
        scales.astype(jnp.bfloat16), jnp.uint8).reshape(n, ld * 2)
    rb = packed.reshape(n, -1)
    return jnp.concatenate([cb, sb, rb], axis=1)


def split_records(rg: jax.Array, ld: int):
    """Inverse of pack_records on (possibly gathered) records
    (..., RB) uint8 -> (codes (..., Ld) int32, scales (..., Ld) f32,
    packed (..., Ld, P) uint8)."""
    lead = rg.shape[:-1]
    codes = jax.lax.bitcast_convert_type(
        rg[..., :ld * 2].reshape(lead + (ld, 2)), jnp.uint16) \
        .astype(jnp.int32)
    scales = jax.lax.bitcast_convert_type(
        rg[..., ld * 2:ld * 4].reshape(lead + (ld, 2)), jnp.bfloat16) \
        .astype(jnp.float32)
    packed = rg[..., ld * 4:].reshape(lead + (ld, -1))
    return codes, scales, packed


# ---------------------------------------------------------------------------
# Fused decompress + MaxSim Pallas kernel (the serving fine stage)
# ---------------------------------------------------------------------------
#
# The XLA fine stage decompresses candidates to an HBM-resident (C, Ld, dim)
# intermediate per query before the scoring matmul — at C=1024, Ld=64 that is
# 16 MiB (bf16) of write+read traffic per query, the residual path's
# bandwidth tax vs an int8 index. The fused path splits the score by
# distributivity ((c[code] + r) @ q^T = cq[code] + r @ q^T):
#
#   - the CENTROID part cq[code] is a batched XLA row-gather of the small
#     precomputed cq = centroids @ q^T table — (B, C, Ld, Lq) bf16, 4x
#     smaller than the (.., dim) reconstruction and K-independent
#     (Mosaic's tpu.dynamic_gather only handles 8-row tables, so the
#     gather stays outside; a one-hot MXU matmul was measured 2x slower
#     at K=8192: the (T, K) one-hot FLOPs scale with K),
#   - the RESIDUAL part never touches HBM: the kernel unpacks the planar
#     residual bytes with shift+mask lane ops, maps bucket ids -> weights
#     with a select chain (2^nbits SMEM scalars), scores per-plane on the
#     MXU against query slices, adds the gathered centroid scores, applies
#     the -9999 mask, and reduces max-over-doc-tokens / sum-over-query-
#     tokens entirely in VMEM (same block-reshape trick as
#     ops.maxsim._maxsim_kernel).
#
# Replaces the reference's decompress_residuals.cpp/.cu +
# segmented_maxsim.cpp pair (SURVEY.md §2.4 N2b/N5 + N1) in one fused TPU
# kernel + one XLA gather.

def _residual_maxsim_kernel(w_ref, q_ref, cs_ref, packed_ref,
                            m_ref, out_ref, *, tc: int, ld: int, lq: int,
                            nbits: int, plane_w: int, n_cent: int,
                            k_coarse: int = 0, k_fine: int = 0):
    """Grid (B, C//tc). Score tile: tc candidate docs of one query.

    w_ref: (1, 2^nbits) SMEM — bucket weights.
    q_ref: (Lq, dim) VMEM — this query (bf16).
    cs_ref: (n_cent, Lq) bf16 VMEM — this query's centroid-score table.
      Flat codec: the full cq = centroids @ q^T table (one-hot(code) @ cq
      on the MXU). Factored codec (k_coarse/k_fine set): rows [0, k1) hold
      coarse @ q^T and rows [k1, k1+k2) fine @ q^T (zero-padded to
      n_cent); the centroid score of code hi*k2+lo is the SUM of rows hi
      and k1+lo — one "TWO-hot" MXU matmul whose FLOPs scale with k1+k2,
      not K = k1*k2, which is what lets the kernel run at K=8192.
    packed_ref: (tc*Ld, plane_w) uint8 VMEM — planar residual bytes.
    m_ref: (tc*Ld, 2) f32 VMEM — lane 0: centroid code (as f32; exact for
      K < 2^24); lane 1: reconstruction-norm scale (the reference's
      post-decompress L2 normalization, residual.py:273) PRE-MASKED to 0
      on invalid tokens — validity is scale > 0 (valid scales are
      strictly positive rsqrt outputs), so no separate validity lane.
    out_ref: (tc, 1) f32 VMEM — per-doc MaxSim scores.
    """
    t = tc * ld
    packed = packed_ref[:].astype(jnp.int32)                # (T, P)
    lane_mask = (1 << nbits) - 1

    # in-VMEM selector @ cs — no HBM centroid-score intermediate; the
    # selector FLOPs scale with n_cent, so the caller gates the FLAT
    # one-hot to small codebooks (the XLA row-gather alternative was
    # measured slower than the plain decompress path at K=8192); the
    # factored two-hot has no such limit (n_cent = k1+k2 rows)
    codes = m_ref[:, 0:1].astype(jnp.int32)                 # (T, 1)
    iota = jax.lax.broadcasted_iota(jnp.int32, (t, n_cent), 1)
    if k_fine:
        hi = jax.lax.shift_right_logical(codes, k_fine.bit_length() - 1)
        lo = (codes & (k_fine - 1)) + k_coarse
        sel = jnp.logical_or(iota == hi, iota == lo) \
            .astype(jnp.bfloat16)                           # (T, k1+k2)
    else:
        sel = (iota == codes).astype(jnp.bfloat16)          # (T, K)
    acc = jax.lax.dot_general(
        sel, cs_ref[:],
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)                 # (T, Lq)

    per_byte = 8 // nbits
    for p in range(per_byte):
        ids = jax.lax.shift_right_logical(packed, p * nbits) & lane_mask
        w = jnp.full((t, plane_w), w_ref[0, 0], jnp.float32)
        for v in range(1, 2 ** nbits):
            w = jnp.where(ids == v, w_ref[0, v], w)
        q_slice = q_ref[:, p * plane_w:(p + 1) * plane_w]   # (Lq, P)
        acc += jax.lax.dot_general(
            w.astype(jnp.bfloat16), q_slice,
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)             # (T, Lq)

    scale = m_ref[:, 1:2]
    s = jnp.where(scale > 0, acc * scale, -9999.0)
    per_q = jnp.max(s.reshape(tc, ld, lq), axis=1)          # (tc, Lq)
    out_ref[:] = jnp.sum(per_q, axis=-1, keepdims=True)


# Negative result (measured on v5e-1, K=8192, B=32, C=1024, Ld=64, nbits=2):
# a "hybrid" kernel that pre-gathers the centroid term cq[code] with one
# batched XLA gather and scores only the residual planes in Pallas LOSES
# 2-4x to the plain XLA fine stage (12.5 vs 6.9 ms/batch at C=1024).
# The per-token centroid-score rows are tiny (Lq bf16 = 64 B), so the
# gather is overhead-bound: take_along_axis with a batch dim costs
# 18.7 ms alone; flattening to a single-table jnp.take cuts it to 5.0 ms
# (a 3.7x trick worth remembering) but the total still trails XLA, whose
# per-query fused decompress gathers 256-B centroid VECTORS from a table
# that stays cache/VMEM-resident inside lax.map. Keep the XLA fine stage
# for big codebooks; the one-hot kernel below for small ones.

@functools.partial(jax.jit, static_argnames=("nbits", "tile_c", "interpret"))
def maxsim_residual_pallas(q: jax.Array, codes_g: jax.Array,
                           packed_g: jax.Array, mask_g: jax.Array,
                           centroids: jax.Array, bucket_weights: jax.Array,
                           scales_g: Optional[jax.Array] = None,
                           coarse: Optional[jax.Array] = None,
                           fine: Optional[jax.Array] = None,
                           *, nbits: int, tile_c: int = 32,
                           interpret: bool = False) -> jax.Array:
    """Fused residual-decompress + MaxSim over per-query candidate sets.

    q: (B, Lq, dim) queries; codes_g: (B, C, Ld) int32 GATHERED candidate
    codes; packed_g: (B, C, Ld, dim*nbits/8) uint8; mask_g: (B, C, Ld);
    scales_g: optional (B, C, Ld) reconstruction-norm scales (compress()).
    coarse/fine: the factored codec's additive factors
    (train_codec_factored) — the in-kernel centroid term then costs
    k_coarse+k_fine selector columns instead of K, removing the
    small-codebook gate. Returns (B, C) f32 MaxSim scores. C must be a
    multiple of tile_c.
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    b, lq, dim = q.shape
    _, c, ld = codes_g.shape
    plane_w = packed_g.shape[-1]
    n_cent = centroids.shape[0]
    assert c % tile_c == 0, f"pad candidates to a multiple of {tile_c}"

    qb = q.astype(jnp.bfloat16)
    if coarse is not None:
        assert fine is not None
        k1, k2 = coarse.shape[0], fine.shape[0]
        assert k2 & (k2 - 1) == 0, "k_fine must be a power of two"
        assert n_cent == k1 * k2, (n_cent, k1, k2)
        cs1 = jnp.einsum("kd,bqd->bkq", coarse.astype(jnp.bfloat16), qb,
                         preferred_element_type=jnp.float32)
        cs2 = jnp.einsum("kd,bqd->bkq", fine.astype(jnp.bfloat16), qb,
                         preferred_element_type=jnp.float32)
        cs = jnp.concatenate([cs1, cs2], axis=1)        # (B, k1+k2, Lq)
        pad = (-(k1 + k2)) % 16       # bf16 sublane tiling of the block
        if pad:
            cs = jnp.pad(cs, ((0, 0), (0, pad), (0, 0)))
        cs_rows = k1 + k2 + pad
        cs_flat = cs.astype(jnp.bfloat16).reshape(b * cs_rows, lq)
        kc, kf = k1, k2
    else:
        assert n_cent <= 1024, \
            ("the fused kernel's one-hot centroid matmul scales with "
             "n_cent; use a FACTORED codec (train_codec_factored) or the "
             "XLA fine stage for larger codebooks")
        cq = jnp.einsum("kd,bqd->bkq", centroids.astype(jnp.bfloat16), qb,
                        preferred_element_type=jnp.float32)  # (B, K, Lq)
        cs_rows = n_cent
        cs_flat = cq.astype(jnp.bfloat16).reshape(b * n_cent, lq)
        kc = kf = 0
    # fold the validity mask INTO the scale lane (masked tokens -> scale
    # 0; valid reconstruction-norm scales are strictly positive): the
    # kernel side-band is 2 f32 lanes per token, not 3
    if scales_g is None:
        eff_scale = mask_g.astype(jnp.float32)
    else:
        eff_scale = scales_g.astype(jnp.float32) \
            * mask_g.astype(jnp.float32)
    mask2 = jnp.stack([codes_g.astype(jnp.float32), eff_scale], axis=-1)
    cs_spec_rows, cs_index = cs_rows, (lambda i, j: (i, 0))
    q_flat = qb.reshape(b * lq, dim)
    packed_flat = packed_g.reshape(b * c * ld, plane_w)
    mask_flat = mask2.reshape(b * c * ld, 2)
    w = bucket_weights.astype(jnp.float32).reshape(1, -1)

    n_ctiles = c // tile_c
    kernel = functools.partial(
        _residual_maxsim_kernel, tc=tile_c, ld=ld, lq=lq, nbits=nbits,
        plane_w=plane_w, n_cent=cs_rows, k_coarse=kc, k_fine=kf)
    out = pl.pallas_call(
        kernel,
        grid=(b, n_ctiles),
        in_specs=[
            pl.BlockSpec((1, 2 ** nbits), lambda i, j: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((lq, dim), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((cs_spec_rows, lq), cs_index,
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_c * ld, plane_w),
                         lambda i, j: (i * n_ctiles + j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_c * ld, 2),
                         lambda i, j: (i * n_ctiles + j, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tile_c, 1),
                               lambda i, j: (i * n_ctiles + j, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b * c, 1), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=2 * b * c * ld * lq * dim,
            bytes_accessed=(packed_flat.size + cs_flat.size * 2
                            + mask_flat.size * 4 + b * c * 4),
            transcendentals=0,
        ),
        interpret=interpret,
    )(w, q_flat, cs_flat, packed_flat, mask_flat)
    return out.reshape(b, c)
