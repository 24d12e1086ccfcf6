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

Compression ratio vs bf16 tokens at dim=128: nbits=2 -> 7.1x (36 B/token),
nbits=4 -> 4.6x (68 B/token, higher fidelity).
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
    centroids: jax.Array       # (K, dim) f32, L2-normalized
    bucket_cutoffs: jax.Array  # (2^nbits - 1,) f32
    bucket_weights: jax.Array  # (2^nbits,) f32
    nbits: int = 2

    @property
    def dim(self) -> int:
        return self.centroids.shape[1]

    @property
    def packed_dim(self) -> int:
        return self.dim * self.nbits // 8


def train_codec(tokens: np.ndarray, mask: np.ndarray, n_centroids: int = 256,
                nbits: int = 2, iters: int = 8, sample: int = 2 ** 16,
                heldout: int = 2 ** 14, seed: int = 0) -> ResidualCodec:
    """K-means + residual-quantile training (reference CollectionIndexer
    .train, collection_indexer.py:206-314, on a token sample)."""
    valid = np.asarray(mask).reshape(-1) > 0
    flat = np.asarray(tokens, np.float32).reshape(-1, tokens.shape[-1])[valid]
    rng = np.random.default_rng(seed)
    take = min(sample + heldout, len(flat))
    pick = rng.choice(len(flat), take, replace=False)
    train, held = flat[pick[:-heldout or None]], flat[pick[-heldout:]]

    cent = _kmeans(jnp.asarray(train), n_centroids, iters)

    codes = _assign(jnp.asarray(held), cent)
    resid = np.asarray(jnp.asarray(held) - cent[codes]).reshape(-1)
    nb = 2 ** nbits
    qs = np.arange(1, nb) / nb
    cutoffs = np.quantile(resid, qs).astype(np.float32)
    wqs = (np.arange(nb) + 0.5) / nb
    weights = np.quantile(resid, wqs).astype(np.float32)
    return ResidualCodec(centroids=cent,
                         bucket_cutoffs=jnp.asarray(cutoffs),
                         bucket_weights=jnp.asarray(weights), nbits=nbits)


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


@functools.partial(jax.jit, static_argnames=("nbits",))
def _compress_block(tokens, mask, centroids, cutoffs, *, nbits: int):
    """(N, Ld, dim) f32 -> codes (N, Ld) int32, packed (N, Ld, dim*nbits/8)
    uint8. Masked tokens compress to code 0 / zero residual bits (the mask
    is kept separately; search fills them with NEG_INF)."""
    n, ld, dim = tokens.shape
    t = tokens.astype(jnp.float32) * mask[..., None].astype(jnp.float32)
    flat = t.reshape(-1, dim)
    codes = jnp.argmax(flat @ centroids.T, axis=-1)          # (N*Ld,)
    resid = flat - centroids[codes]
    bucket = jnp.searchsorted(cutoffs, resid)                # 0..2^nbits-1
    bucket = bucket.astype(jnp.uint8)
    per_byte = 8 // nbits
    # planar layout: bucket (T, dim) -> (T, per_byte, dim/per_byte) where
    # plane p (byte bits p*nbits..) holds dims [p*dim/per_byte, ...)
    b = bucket.reshape(-1, per_byte, dim // per_byte)
    shifts = (jnp.arange(per_byte, dtype=jnp.uint8) * nbits)
    packed = jnp.sum(
        b.astype(jnp.uint32) << shifts[None, :, None].astype(jnp.uint32),
        axis=1).astype(jnp.uint8)
    codes = codes * mask.reshape(-1).astype(codes.dtype)
    packed = packed * mask.reshape(-1, 1).astype(jnp.uint8)
    return (codes.reshape(n, ld).astype(jnp.int32),
            packed.reshape(n, ld, dim // per_byte))


def compress(tokens, mask, codec: ResidualCodec, block: int = 65536):
    """Host-driver: compress in blocks so the f32 upcast never exceeds
    `block` docs at a time."""
    toks = np.asarray(tokens)
    msk = np.asarray(mask)
    codes_out, packed_out = [], []
    for s in range(0, toks.shape[0], block):
        c, p = _compress_block(jnp.asarray(toks[s:s + block], jnp.float32),
                               jnp.asarray(msk[s:s + block]),
                               codec.centroids, codec.bucket_cutoffs,
                               nbits=codec.nbits)
        codes_out.append(np.asarray(c))
        packed_out.append(np.asarray(p))
    return (jnp.asarray(np.concatenate(codes_out)),
            jnp.asarray(np.concatenate(packed_out)))


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
