"""VinVL-style AttrRCNN object + attribute detector in Flax (X152-C4).

TPU-native re-design of the reference's offline feature extractor
(SURVEY.md §2.5): the scene_graph_benchmark AttrRCNN meta-architecture
(materials/scene_graph_benchmark/scene_graph_benchmark/AttrRCNN.py:42-110)
with the maskrcnn-benchmark C4 pieces —

- ResNeXt-C4 backbone: maskrcnn_benchmark/modeling/backbone/resnet.py
  (ResNet :87-160, Bottleneck :245-350, BaseStem :353-370); VinVL config
  sgg_configs/vgattr/vinvl_x152c4.yaml (groups=32, width=8,
  stride_in_1x1=False, C4 out 1024).
- RPN head + proposal selection: modeling/rpn/rpn.py + rpn/inference.py
  (pre-NMS 6000 / post-NMS 300 / IoU 0.7 at test time).
- C4 ROI box head: roi_heads/box_head/roi_box_feature_extractors.py
  (ResNet50Conv5ROIFeatureExtractor :16-56 — ROIAlign 14x14 at 1/16 into
  a stride-2 res5 stage) + FastRCNNPredictor, postprocessed per
  roi_heads/box_head/inference.py filter_results (:188) with
  score_thresh 0.2, per-class NMS 0.5, 100 detections, min 10.
- Attribute head: scene_graph_benchmark/attribute_head/
  roi_attribute_predictors.py:10-38 (avgpool ⊕ class embedding → fc →
  attr scores) and inference.py:40-87 (softmax, background zeroed,
  threshold, top max_num_attr_per_obj).

The design is TPU-first, not a translation: NHWC layout, static shapes
end to end (fixed canvas, fixed proposal/detection counts with validity
masks), `lax`-friendly greedy NMS from ops.vision, and ONE batched
class-offset NMS over flattened (proposal, class) pairs instead of the
reference's per-class Python loop.  The reference's
MIN_DETECTIONS_PER_IMG threshold binary-search is realised statically:
below-threshold candidates are kept alive with a rank penalty and
retained only while the above-threshold pool is short.

Frozen BatchNorm is folded to a per-channel (scale, bias) affine at
conversion time (maskrcnn FrozenBatchNorm2d semantics).
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ..ops.vision import nms, roi_align

BBOX_XFORM_CLIP = float(np.log(1000.0 / 16.0))


@dataclasses.dataclass(frozen=True)
class DetectorConfig:
    # backbone (vinvl_x152c4.yaml MODEL.RESNETS)
    stem_channels: int = 64
    stage_blocks: tuple = (3, 8, 36)      # layer1..layer3 (C2..C4)
    res5_blocks: int = 3                  # ROI head stage (layer4)
    num_groups: int = 32
    width_per_group: int = 8
    res2_out_channels: int = 256
    # rpn
    anchor_sizes: tuple = (32, 64, 128, 256, 512)
    aspect_ratios: tuple = (0.5, 1.0, 2.0)
    anchor_stride: int = 16
    rpn_pre_nms_top_n: int = 6000
    rpn_post_nms_top_n: int = 300
    rpn_nms_thresh: float = 0.7
    # roi heads
    num_classes: int = 1595               # incl. background at index 0
    pooler_resolution: int = 14
    pooler_sampling_ratio: int = 2
    box_score_thresh: float = 0.2
    box_nms_thresh: float = 0.5
    detections_per_img: int = 100
    min_detections_per_img: int = 10
    bbox_reg_weights: tuple = (10.0, 10.0, 5.0, 5.0)
    box_candidate_pool: int = 400         # pairs entering the final NMS
    # attribute head (sg_defaults.py:18-30)
    num_attributes: int = 525
    cls_emd_dim: int = 256
    attr_emd_dim: int = 512
    attr_thresh: float = 0.05
    max_attr_per_obj: int = 16
    dtype: Any = jnp.float32

    @property
    def bottleneck_channels(self) -> tuple:
        base = self.num_groups * self.width_per_group
        return tuple(base * 2 ** i for i in range(len(self.stage_blocks)))

    @property
    def stage_out_channels(self) -> tuple:
        return tuple(self.res2_out_channels * 2 ** i
                     for i in range(len(self.stage_blocks)))

    @property
    def backbone_out_channels(self) -> int:
        return self.stage_out_channels[-1]

    @property
    def res5_out_channels(self) -> int:
        return self.res2_out_channels * 2 ** len(self.stage_blocks)

    @property
    def num_anchors(self) -> int:
        return len(self.anchor_sizes) * len(self.aspect_ratios)

    @staticmethod
    def tiny(**kw) -> "DetectorConfig":
        base = dict(stem_channels=8, stage_blocks=(1, 1, 1), res5_blocks=1,
                    num_groups=2, width_per_group=4, res2_out_channels=16,
                    anchor_sizes=(16, 32), aspect_ratios=(0.5, 1.0, 2.0),
                    rpn_pre_nms_top_n=64, rpn_post_nms_top_n=16,
                    num_classes=7, pooler_resolution=7,
                    detections_per_img=8, min_detections_per_img=2,
                    box_candidate_pool=32, num_attributes=5,
                    cls_emd_dim=8, attr_emd_dim=16, max_attr_per_obj=3)
        base.update(kw)
        return DetectorConfig(**base)

    @staticmethod
    def vinvl_x152c4(**kw) -> "DetectorConfig":
        """The published VinVL extraction config (vinvl_x152c4.yaml)."""
        return DetectorConfig(**kw)


class FrozenBN(nn.Module):
    """FrozenBatchNorm2d folded to y = x * scale + bias.

    The converter folds (weight, bias, running_mean, running_var) into
    scale = weight / sqrt(var + eps), bias = bias - mean * scale.
    """
    features: int

    @nn.compact
    def __call__(self, x):
        scale = self.param("scale", nn.initializers.ones, (self.features,))
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        return x * scale.astype(x.dtype) + bias.astype(x.dtype)


class Bottleneck(nn.Module):
    """ResNeXt bottleneck, stride on the 3x3 (stride_in_1x1=False)."""
    bottleneck_channels: int
    out_channels: int
    stride: int = 1
    num_groups: int = 1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        identity = x
        needs_proj = (x.shape[-1] != self.out_channels or self.stride != 1)
        if needs_proj:
            identity = nn.Conv(self.out_channels, (1, 1),
                               strides=(self.stride, self.stride),
                               use_bias=False, dtype=self.dtype,
                               name="downsample_conv")(x)
            identity = FrozenBN(self.out_channels,
                                name="downsample_bn")(identity)
        y = nn.Conv(self.bottleneck_channels, (1, 1), use_bias=False,
                    dtype=self.dtype, name="conv1")(x)
        y = nn.relu(FrozenBN(self.bottleneck_channels, name="bn1")(y))
        y = nn.Conv(self.bottleneck_channels, (3, 3),
                    strides=(self.stride, self.stride), padding=1,
                    feature_group_count=self.num_groups, use_bias=False,
                    dtype=self.dtype, name="conv2")(y)
        y = nn.relu(FrozenBN(self.bottleneck_channels, name="bn2")(y))
        y = nn.Conv(self.out_channels, (1, 1), use_bias=False,
                    dtype=self.dtype, name="conv3")(y)
        y = FrozenBN(self.out_channels, name="bn3")(y)
        return nn.relu(y + identity)


class ResNetStage(nn.Module):
    num_blocks: int
    bottleneck_channels: int
    out_channels: int
    first_stride: int = 1
    num_groups: int = 1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        for i in range(self.num_blocks):
            x = Bottleneck(self.bottleneck_channels, self.out_channels,
                           stride=self.first_stride if i == 0 else 1,
                           num_groups=self.num_groups, dtype=self.dtype,
                           name=f"block{i}")(x)
        return x


class C4Backbone(nn.Module):
    """Stem + layer1..layer3 -> (B, H/16, W/16, 1024)."""
    cfg: DetectorConfig

    @nn.compact
    def __call__(self, x):
        c = self.cfg
        x = nn.Conv(c.stem_channels, (7, 7), strides=(2, 2), padding=3,
                    use_bias=False, dtype=c.dtype, name="stem_conv1")(x)
        x = nn.relu(FrozenBN(c.stem_channels, name="stem_bn1")(x))
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))
        for si in range(len(c.stage_blocks)):
            x = ResNetStage(
                c.stage_blocks[si], c.bottleneck_channels[si],
                c.stage_out_channels[si],
                first_stride=1 if si == 0 else 2,
                num_groups=c.num_groups, dtype=c.dtype,
                name=f"layer{si + 1}")(x)
        return x


class Res5Head(nn.Module):
    """ROI feature extractor head (layer4, stride 2): (N, r, r, 1024) ->
    pooled (N, 2048). Shared by the box and attribute heads
    (SHARE_BOX_FEATURE_EXTRACTOR=True, sg_defaults.py:18)."""
    cfg: DetectorConfig

    @nn.compact
    def __call__(self, x):
        c = self.cfg
        base = c.num_groups * c.width_per_group
        x = ResNetStage(
            c.res5_blocks, base * 2 ** len(c.stage_blocks),
            c.res5_out_channels, first_stride=2,
            num_groups=c.num_groups, dtype=c.dtype, name="layer4")(x)
        return jnp.mean(x, axis=(1, 2))


class RPNHead(nn.Module):
    cfg: DetectorConfig

    @nn.compact
    def __call__(self, feat):
        c = self.cfg
        t = nn.relu(nn.Conv(feat.shape[-1], (3, 3), padding=1,
                            dtype=c.dtype, name="conv")(feat))
        logits = nn.Conv(c.num_anchors, (1, 1), dtype=c.dtype,
                         name="cls_logits")(t)
        deltas = nn.Conv(c.num_anchors * 4, (1, 1), dtype=c.dtype,
                         name="bbox_pred")(t)
        return logits, deltas


# ---------------------------------------------------------------------------
# Box math (py-faster-rcnn legacy conventions, as maskrcnn_benchmark
# keeps them: +1 box widths, generate_anchors rounding).
# ---------------------------------------------------------------------------

def generate_base_anchors(stride: int, sizes, ratios) -> np.ndarray:
    """Legacy generate_anchors (anchor_generator.py): base window
    [0, stride-1]^2, ratio enumeration with rounding, then scale
    enumeration. Returns (A, 4) float32."""
    base = np.array([0, 0, stride - 1, stride - 1], np.float32)

    def whctr(a):
        w = a[2] - a[0] + 1
        h = a[3] - a[1] + 1
        return w, h, a[0] + 0.5 * (w - 1), a[1] + 0.5 * (h - 1)

    def mkanchors(ws, hs, xc, yc):
        ws, hs = ws[:, None], hs[:, None]
        return np.hstack([xc - 0.5 * (ws - 1), yc - 0.5 * (hs - 1),
                          xc + 0.5 * (ws - 1), yc + 0.5 * (hs - 1)])

    w, h, xc, yc = whctr(base)
    size_ratios = (w * h) / np.asarray(ratios, np.float32)
    ws = np.round(np.sqrt(size_ratios))
    hs = np.round(ws * np.asarray(ratios, np.float32))
    ratio_anchors = mkanchors(ws, hs, xc, yc)
    out = []
    scales = np.asarray(sizes, np.float32) / stride
    for ra in ratio_anchors:
        w, h, xc, yc = whctr(ra)
        out.append(mkanchors(w * scales, h * scales, xc, yc))
    return np.concatenate(out, 0).astype(np.float32)


def shift_anchors(base: np.ndarray, fh: int, fw: int,
                  stride: int) -> np.ndarray:
    """(A, 4) -> (fh * fw * A, 4), row-major over (y, x, a)."""
    sx = np.arange(fw, dtype=np.float32) * stride
    sy = np.arange(fh, dtype=np.float32) * stride
    xx, yy = np.meshgrid(sx, sy)
    shifts = np.stack([xx, yy, xx, yy], -1).reshape(-1, 1, 4)
    return (shifts + base[None]).reshape(-1, 4)


def decode_boxes(deltas: jax.Array, boxes: jax.Array,
                 weights=(1.0, 1.0, 1.0, 1.0)) -> jax.Array:
    """BoxCoder.decode (maskrcnn box_coder.py): legacy +1 widths,
    dw/dh clamped at log(1000/16), x2 = ctr + w/2 - 1."""
    wx, wy, ww, wh = weights
    widths = boxes[..., 2] - boxes[..., 0] + 1.0
    heights = boxes[..., 3] - boxes[..., 1] + 1.0
    ctr_x = boxes[..., 0] + 0.5 * widths
    ctr_y = boxes[..., 1] + 0.5 * heights
    dx = deltas[..., 0] / wx
    dy = deltas[..., 1] / wy
    dw = jnp.minimum(deltas[..., 2] / ww, BBOX_XFORM_CLIP)
    dh = jnp.minimum(deltas[..., 3] / wh, BBOX_XFORM_CLIP)
    px = dx * widths + ctr_x
    py = dy * heights + ctr_y
    pw = jnp.exp(dw) * widths
    ph = jnp.exp(dh) * heights
    return jnp.stack([px - 0.5 * pw, py - 0.5 * ph,
                      px + 0.5 * pw - 1, py + 0.5 * ph - 1], -1)


def clip_boxes(boxes: jax.Array, hw: jax.Array) -> jax.Array:
    h, w = hw[0].astype(boxes.dtype), hw[1].astype(boxes.dtype)
    x1 = jnp.clip(boxes[..., 0], 0, w - 1)
    y1 = jnp.clip(boxes[..., 1], 0, h - 1)
    x2 = jnp.clip(boxes[..., 2], 0, w - 1)
    y2 = jnp.clip(boxes[..., 3], 0, h - 1)
    return jnp.stack([x1, y1, x2, y2], -1)


def _rpn_proposals_single(logits, deltas, anchors, hw, cfg: DetectorConfig):
    """One image: anchors + RPN outputs -> (post_nms, 4) boxes + mask."""
    n = anchors.shape[0]
    pre = min(cfg.rpn_pre_nms_top_n, n)
    scores = logits.reshape(-1).astype(jnp.float32)
    top_s, top_i = jax.lax.top_k(scores, pre)
    sel_anchors = jnp.take(anchors, top_i, axis=0)
    sel_deltas = jnp.take(deltas.reshape(-1, 4).astype(jnp.float32),
                          top_i, axis=0)
    boxes = clip_boxes(decode_boxes(sel_deltas, sel_anchors), hw)
    keep, count = nms(boxes, top_s, cfg.rpn_nms_thresh,
                      max_outputs=cfg.rpn_post_nms_top_n)
    valid = keep >= 0
    boxes = jnp.take(boxes, jnp.maximum(keep, 0), axis=0)
    return jnp.where(valid[:, None], boxes, 0.0), valid


def _select_detections_single(probs, box_deltas, proposals, prop_valid,
                              hw, cfg: DetectorConfig):
    """Flatten (proposal, class>0) pairs -> one class-offset NMS.

    Mirrors inference.py filter_results semantics (threshold, per-class
    NMS, cap at detections_per_img) with the MIN_DETECTIONS top-up done
    by rank-penalising below-threshold candidates instead of the
    reference's threshold binary search.
    """
    p, c = probs.shape
    pool = min(cfg.box_candidate_pool, p * (c - 1))
    fg = probs[:, 1:]                                      # drop background
    fg = jnp.where(prop_valid[:, None], fg, 0.0)
    flat = fg.reshape(-1)
    above = flat > cfg.box_score_thresh
    # above-threshold pairs dominate; below-threshold ones survive only
    # to serve the min_detections floor
    key = jnp.where(above, flat + 2.0, flat)
    top_key, top_i = jax.lax.top_k(key, pool)
    pi = top_i // (c - 1)
    ci = top_i % (c - 1) + 1                               # true class id
    sel_deltas = box_deltas.reshape(p, c, 4)[pi, ci]
    sel_boxes = clip_boxes(
        decode_boxes(sel_deltas, proposals[pi],
                     weights=cfg.bbox_reg_weights), hw)
    sel_scores = flat[top_i]
    sel_above = above[top_i]
    # class-offset trick: boxes of different classes never overlap
    offset = (ci.astype(jnp.float32) *
              (jnp.maximum(hw[0], hw[1]).astype(jnp.float32) + 2.0))
    keep, _ = nms(sel_boxes + offset[:, None], top_key,
                  cfg.box_nms_thresh, max_outputs=cfg.detections_per_img)
    kvalid = keep >= 0
    keep_c = jnp.maximum(keep, 0)
    d_boxes = jnp.take(sel_boxes, keep_c, axis=0)
    d_scores = jnp.take(sel_scores, keep_c)
    d_labels = jnp.take(ci, keep_c)
    d_above = jnp.take(sel_above, keep_c) & kvalid
    # NMS emits above-threshold picks first (they carry the +2 key);
    # keep below-threshold survivors only up to the min-detections floor
    rank = jnp.cumsum(kvalid.astype(jnp.int32)) - 1
    d_valid = kvalid & (d_above | (rank < cfg.min_detections_per_img))
    d_boxes = jnp.where(d_valid[:, None], d_boxes, 0.0)
    return d_boxes, d_scores * d_valid, \
        d_labels * d_valid, d_valid


class AttrRCNN(nn.Module):
    """Full VinVL-style detector. Input images are NHWC float32, already
    resized and BGR-pixel-mean-subtracted (INPUT.PIXEL_MEAN,
    vinvl_x152c4.yaml), padded to a fixed canvas; valid_hw gives each
    image's true (h, w) inside the canvas."""
    cfg: DetectorConfig

    @nn.compact
    def __call__(self, images: jax.Array, valid_hw: jax.Array) -> dict:
        c = self.cfg
        feat = C4Backbone(c, name="backbone")(images)
        logits, deltas = RPNHead(c, name="rpn")(feat)

        fh, fw = feat.shape[1], feat.shape[2]
        anchors = jnp.asarray(shift_anchors(
            generate_base_anchors(c.anchor_stride, c.anchor_sizes,
                                  c.aspect_ratios), fh, fw,
            c.anchor_stride))
        proposals, prop_valid = jax.vmap(
            functools.partial(_rpn_proposals_single, cfg=c),
            in_axes=(0, 0, None, 0))(logits, deltas, anchors, valid_hw)

        res5 = Res5Head(c, name="roi_head")
        scale = 1.0 / c.anchor_stride
        pooled = jax.vmap(lambda f, b: roi_align(
            f, b, output_size=c.pooler_resolution,
            sampling_ratio=c.pooler_sampling_ratio,
            spatial_scale=scale))(feat, proposals)
        b, p = pooled.shape[:2]
        box_feats = res5(pooled.reshape((b * p,) + pooled.shape[2:]))
        cls_logits = nn.Dense(c.num_classes, dtype=c.dtype,
                              name="cls_score")(box_feats)
        box_deltas = nn.Dense(c.num_classes * 4, dtype=c.dtype,
                              name="bbox_pred")(box_feats)
        probs = jax.nn.softmax(
            cls_logits.astype(jnp.float32).reshape(b, p, -1), -1)
        box_deltas = box_deltas.astype(jnp.float32).reshape(b, p, -1)

        d_boxes, d_scores, d_labels, d_valid = jax.vmap(
            functools.partial(_select_detections_single, cfg=c))(
            probs, box_deltas, proposals, prop_valid, valid_hw)

        # attribute head re-pools the FINAL boxes through the shared
        # res5 extractor (AttrRCNN.py:89-103)
        d = d_boxes.shape[1]
        det_pooled = jax.vmap(lambda f, bx: roi_align(
            f, bx, output_size=c.pooler_resolution,
            sampling_ratio=c.pooler_sampling_ratio,
            spatial_scale=scale))(feat, d_boxes)
        det_feats = res5(det_pooled.reshape((b * d,) +
                                            det_pooled.shape[2:]))
        cls_emb = nn.Embed(c.num_classes, c.cls_emd_dim,
                           dtype=c.dtype, name="cls_embedding")(
            d_labels.reshape(-1))
        attr_h = nn.relu(nn.Dense(c.attr_emd_dim, dtype=c.dtype,
                                  name="fc_attr")(
            jnp.concatenate([det_feats, cls_emb], -1)))
        attr_logits = nn.Dense(c.num_attributes, dtype=c.dtype,
                               name="attr_score")(attr_h)
        attr_probs = jax.nn.softmax(
            attr_logits.astype(jnp.float32), -1).reshape(b, d, -1)
        attr_probs = attr_probs.at[..., 0].set(0.0)   # background attr
        attr_probs = jnp.where(attr_probs > c.attr_thresh, attr_probs, 0.0)
        attr_scores, attr_labels = jax.lax.top_k(attr_probs,
                                                 c.max_attr_per_obj)

        return {
            "boxes": d_boxes,                       # (B, D, 4) xyxy
            "scores": d_scores,                     # (B, D)
            "labels": d_labels,                     # (B, D) class ids >= 1
            "valid": d_valid,                       # (B, D) bool
            "num_detections": d_valid.sum(-1),
            "features": det_feats.reshape(b, d, -1),  # (B, D, 2048)
            "attr_scores": attr_scores,             # (B, D, max_attr)
            "attr_labels": attr_labels,             # (B, D, max_attr)
        }


# ---------------------------------------------------------------------------
# Weight conversion: maskrcnn_benchmark / scene_graph_benchmark state
# dict -> AttrRCNN params. Checkpoint layout per the module names read
# from the reference source (resnet.py, rpn.py,
# roi_box_feature_extractors.py, roi_attribute_predictors.py).
# ---------------------------------------------------------------------------

BN_EPS = 1e-5   # FrozenBatchNorm2d uses the stored statistics verbatim


def _fold_bn(sd, prefix):
    w = np.asarray(sd[prefix + ".weight"], np.float32)
    b = np.asarray(sd[prefix + ".bias"], np.float32)
    mean = np.asarray(sd.get(prefix + ".running_mean",
                             np.zeros_like(w)), np.float32)
    var = np.asarray(sd.get(prefix + ".running_var",
                            np.ones_like(w)), np.float32)
    scale = w / np.sqrt(var + BN_EPS)
    return {"scale": scale, "bias": b - mean * scale}


def _conv(sd, name):
    w = np.asarray(sd[name + ".weight"], np.float32)
    out = {"kernel": np.transpose(w, (2, 3, 1, 0))}     # OIHW -> HWIO
    if name + ".bias" in sd:
        out["bias"] = np.asarray(sd[name + ".bias"], np.float32)
    return out


def _linear(sd, name):
    return {"kernel": np.asarray(sd[name + ".weight"], np.float32).T,
            "bias": np.asarray(sd[name + ".bias"], np.float32)}


def _convert_bottleneck(sd, prefix):
    out = {}
    for j in (1, 2, 3):
        out[f"conv{j}"] = _conv(sd, f"{prefix}.conv{j}")
        out[f"bn{j}"] = _fold_bn(sd, f"{prefix}.bn{j}")
    if f"{prefix}.downsample.0.weight" in sd:
        out["downsample_conv"] = _conv(sd, f"{prefix}.downsample.0")
        out["downsample_bn"] = _fold_bn(sd, f"{prefix}.downsample.1")
    return out


def _convert_stage(sd, prefix, num_blocks):
    return {f"block{i}": _convert_bottleneck(sd, f"{prefix}.{i}")
            for i in range(num_blocks)}


def convert_vinvl_params(state_dict: dict, cfg: DetectorConfig) -> dict:
    """torch state dict (e.g. torch.load(...)['model']) -> Flax params.

    Accepts the reference checkpoint layout: 'module.' prefixes are
    stripped; frozen BN is folded into (scale, bias).
    """
    sd = {k.removeprefix("module."): v for k, v in state_dict.items()}
    bb = "backbone.body"
    backbone = {"stem_conv1": _conv(sd, f"{bb}.stem.conv1"),
                "stem_bn1": _fold_bn(sd, f"{bb}.stem.bn1")}
    for si in range(len(cfg.stage_blocks)):
        backbone[f"layer{si + 1}"] = _convert_stage(
            sd, f"{bb}.layer{si + 1}", cfg.stage_blocks[si])
    params = {
        "backbone": backbone,
        "rpn": {"conv": _conv(sd, "rpn.head.conv"),
                "cls_logits": _conv(sd, "rpn.head.cls_logits"),
                "bbox_pred": _conv(sd, "rpn.head.bbox_pred")},
        "roi_head": {"layer4": _convert_stage(
            sd, "roi_heads.box.feature_extractor.head.layer4",
            cfg.res5_blocks)},
        "cls_score": _linear(sd, "roi_heads.box.predictor.cls_score"),
        "bbox_pred": _linear(sd, "roi_heads.box.predictor.bbox_pred"),
        "cls_embedding": {"embedding": np.asarray(
            sd["attribute.predictor.cls_embedding.weight"], np.float32)},
        "fc_attr": _linear(sd, "attribute.predictor.fc_attr"),
        "attr_score": _linear(sd, "attribute.predictor.attr_score"),
    }
    return jax.tree.map(jnp.asarray, params)
