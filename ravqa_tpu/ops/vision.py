"""Detector ops in pure JAX: NMS and ROIAlign.

TPU-native equivalents of the reference's maskrcnn-benchmark CUDA kernels
(materials/scene_graph_benchmark/maskrcnn_benchmark/csrc/{nms.cu,
ROIAlign_cuda.cu} — SURVEY.md §2.4 N6), used for on-TPU VinVL-style feature
extraction should detector re-extraction be needed. Static shapes, lax
control flow; differentiable ROIAlign.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


def box_iou(a: jax.Array, b: jax.Array) -> jax.Array:
    """(N, 4) x (M, 4) [x1, y1, x2, y2] -> (N, M) IoU."""
    area_a = jnp.maximum(a[:, 2] - a[:, 0], 0) * \
        jnp.maximum(a[:, 3] - a[:, 1], 0)
    area_b = jnp.maximum(b[:, 2] - b[:, 0], 0) * \
        jnp.maximum(b[:, 3] - b[:, 1], 0)
    lt = jnp.maximum(a[:, None, :2], b[None, :, :2])
    rb = jnp.minimum(a[:, None, 2:], b[None, :, 2:])
    wh = jnp.maximum(rb - lt, 0)
    inter = wh[..., 0] * wh[..., 1]
    return inter / jnp.maximum(area_a[:, None] + area_b[None] - inter,
                               1e-9)


@functools.partial(jax.jit, static_argnames=("max_outputs",))
def nms(boxes: jax.Array, scores: jax.Array, iou_threshold: float = 0.5,
        max_outputs: int = 100):
    """Greedy NMS. Returns (indices (max_outputs,) int32 padded with -1,
    count). Matches torchvision/maskrcnn semantics (keep highest score,
    suppress IoU > threshold)."""
    n = boxes.shape[0]
    iou = box_iou(boxes, boxes)

    def body(carry, _):
        alive, sel_count = carry
        masked = jnp.where(alive, scores, -jnp.inf)
        best = jnp.argmax(masked)
        valid = masked[best] > -jnp.inf
        suppress = iou[best] > iou_threshold
        alive = alive & ~suppress
        alive = alive.at[best].set(False)
        idx = jnp.where(valid, best, -1).astype(jnp.int32)
        return (alive, sel_count + valid.astype(jnp.int32)), idx

    (_, count), idxs = jax.lax.scan(
        body, (jnp.ones((n,), bool), jnp.zeros((), jnp.int32)),
        None, length=max_outputs)
    return idxs, count


@functools.partial(jax.jit, static_argnames=("output_size",
                                             "sampling_ratio"))
def roi_align(features: jax.Array, boxes: jax.Array, output_size: int = 7,
              sampling_ratio: int = 2, spatial_scale: float = 1.0):
    """ROIAlign (bilinear, aligned=False torchvision semantics).

    features (H, W, C); boxes (N, 4) [x1, y1, x2, y2] in input coordinates.
    Returns (N, output_size, output_size, C).
    """
    h, w, c = features.shape

    def sample(y, x):
        """Bilinear sample features at fractional (y, x)."""
        y0 = jnp.clip(jnp.floor(y), 0, h - 1)
        x0 = jnp.clip(jnp.floor(x), 0, w - 1)
        y1 = jnp.clip(y0 + 1, 0, h - 1)
        x1 = jnp.clip(x0 + 1, 0, w - 1)
        wy = jnp.clip(y - y0, 0, 1)
        wx = jnp.clip(x - x0, 0, 1)
        y0i, y1i, x0i, x1i = (y0.astype(jnp.int32), y1.astype(jnp.int32),
                              x0.astype(jnp.int32), x1.astype(jnp.int32))
        f00 = features[y0i, x0i]
        f01 = features[y0i, x1i]
        f10 = features[y1i, x0i]
        f11 = features[y1i, x1i]
        return (f00 * (1 - wy) * (1 - wx) + f01 * (1 - wy) * wx
                + f10 * wy * (1 - wx) + f11 * wy * wx)

    def per_box(box):
        x1, y1, x2, y2 = box * spatial_scale
        bw = jnp.maximum(x2 - x1, 1e-6)
        bh = jnp.maximum(y2 - y1, 1e-6)
        bin_w = bw / output_size
        bin_h = bh / output_size
        sr = sampling_ratio
        out = jnp.zeros((output_size, output_size, c), features.dtype)
        for iy in range(sr):
            for ix in range(sr):
                # sample grid: centers of sr x sr points per bin
                gy = y1 + (jnp.arange(output_size) + (iy + 0.5) / sr) * bin_h
                gx = x1 + (jnp.arange(output_size) + (ix + 0.5) / sr) * bin_w
                yy = jnp.broadcast_to(gy[:, None],
                                      (output_size, output_size))
                xx = jnp.broadcast_to(gx[None, :],
                                      (output_size, output_size))
                out = out + jax.vmap(jax.vmap(sample))(yy, xx)
        return out / (sr * sr)

    return jax.vmap(per_box)(boxes.astype(jnp.float32))
