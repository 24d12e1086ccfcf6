"""Int8 token-embedding codec for the late-interaction index.

Replaces the reference's residual codec (k-means centroid code + nbits
bucketized residuals, /root/reference/third_party/ColBERT/colbert/indexing/
codecs/residual.py + packbits/decompress CUDA kernels) with a TPU-idiomatic
scheme: symmetric per-token int8 quantization. The MXU multiplies int8 at 2x
bf16 throughput and the index shrinks 2x vs bf16 (4x vs f32), with no gather
/LUT decompression step — scales fold into the MaxSim reduction:

    score(q, d) = sum_i qnorm_i * max_j (s_j * (q8_i . d8_j))
    s_j = d_scale_j / 127,  q kept in f32/bf16 or quantized per-token.

Here we keep q in float (queries are tiny) and quantize only the index; the
max over doc tokens commutes with the per-doc-token positive scale.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .maxsim import NEG_INF


def quantize_index_int8(tokens: jax.Array, mask: jax.Array):
    """(N, Ld, dim) float -> (int8 tokens, (N, Ld) f32 scales).

    Per-token symmetric: scale = max|x|/127 (>= tiny eps so masked/zero rows
    stay exactly zero).
    """
    absmax = jnp.max(jnp.abs(tokens), axis=-1)               # (N, Ld)
    scales = jnp.maximum(absmax, 1e-8) / 127.0
    q = jnp.round(tokens / scales[..., None]).astype(jnp.int8)
    q = q * mask[..., None].astype(jnp.int8)
    return q, scales * mask.astype(scales.dtype)


def dequantize_int8(q: jax.Array, scales: jax.Array) -> jax.Array:
    return q.astype(jnp.float32) * scales[..., None]


def maxsim_search_int8_xla(q: jax.Array, tokens_i8: jax.Array,
                           scales: jax.Array, mask: jax.Array) -> jax.Array:
    """MaxSim over an int8 index; q stays float. Returns (B, N) f32.

    The int8 dot rides the MXU (int32 accumulation) when q is also int8; for
    the XLA reference path we upcast q@d in f32 after applying scales — XLA
    fuses the dequant multiply into the contraction epilogue.
    """
    # (N, Ld, B, Lq) in f32 via scaled int8
    s = jnp.einsum("nld,bqd->nlbq", tokens_i8.astype(jnp.float32), q,
                   preferred_element_type=jnp.float32)
    s = s * scales[:, :, None, None]
    s = jnp.where(mask.astype(bool)[:, :, None, None], s, NEG_INF)
    per_q = jnp.max(s, axis=1)                               # (N, B, Lq)
    return jnp.sum(per_q, axis=-1).T                         # (B, N)
