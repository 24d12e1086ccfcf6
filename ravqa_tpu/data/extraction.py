"""On-TPU VinVL-style offline feature extraction: images -> predictions.tsv.

Replaces the reference's offline scene_graph_benchmark extraction run
(materials/scene_graph_benchmark/tools/test_sg_net.py driven per
README.md:345-436, writing predictions.tsv with TSV_SAVE_SUBSET
['rect', 'class', 'conf', 'feature', 'attr_labels', 'attr_scores'] —
vinvl_x152c4_okvqa_testset.yaml) with a jitted AttrRCNN forward on TPU.

Output rows are exactly what LoadVinVLFeatures (transforms.py) and the
reference's own LoadVinVLFeatures (src/data_ops/vqa_data_ops.py:54-105)
parse: `image_key \t json` where json = {"objects": [{"class", "rect",
"conf", "attributes", "attr_scores", "feature"}], "num_boxes"}.

TPU-first batching: the detector compiles ONCE for a fixed
(batch, canvas) shape; images are aspect-preserving-resized on host
(min/max-size rule of INPUT.MIN_SIZE_TEST/MAX_SIZE_TEST), padded into
the canvas, and detections are mapped back to original coordinates.
"""

from __future__ import annotations

import base64
import json
from typing import Iterable, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ..models.detection import AttrRCNN, DetectorConfig
from .transforms import _resize_host

# vinvl_x152c4.yaml INPUT.PIXEL_MEAN (BGR order, Caffe-style)
VINVL_PIXEL_MEAN = (103.530, 116.280, 123.675)


def scale_for_detection(h: int, w: int, min_size: int = 600,
                        max_size: int = 1000) -> float:
    """maskrcnn Resize rule: scale shorter side to min_size unless the
    longer side would exceed max_size."""
    scale = min_size / min(h, w)
    if scale * max(h, w) > max_size:
        scale = max_size / max(h, w)
    return scale


def preprocess_for_detection(image: np.ndarray, canvas_hw=(1024, 1024),
                             min_size: int = 600, max_size: int = 1000,
                             pixel_mean=VINVL_PIXEL_MEAN):
    """RGB uint8/float (H, W, 3) -> (canvas BGR mean-subtracted float32,
    (resized_h, resized_w), scale)."""
    im = np.asarray(image)
    h, w = im.shape[:2]
    scale = scale_for_detection(h, w, min_size, max_size)
    th = min(canvas_hw[0], max(1, int(round(h * scale))))
    tw = min(canvas_hw[1], max(1, int(round(w * scale))))
    resized = _resize_host(im, (th, tw))
    bgr = resized[..., ::-1] - np.asarray(pixel_mean, np.float32)
    canvas = np.zeros((canvas_hw[0], canvas_hw[1], 3), np.float32)
    canvas[:th, :tw] = bgr
    return canvas, (th, tw), scale


class VinVLFeatureExtractor:
    """Batched, jit-compiled detector driver producing D1-schema rows.

    labelmap / attr_labelmap mirror the VG-SGG-dicts label files the
    reference loads (DATASETS.LABELMAP_FILE): dicts mapping class /
    attribute index (1-based, 0 = background) to name.
    """

    def __init__(self, cfg: DetectorConfig, params, labelmap: dict,
                 attr_labelmap: dict, canvas_hw=(1024, 1024),
                 batch_size: int = 8, min_size: int = 600,
                 max_size: int = 1000):
        self.cfg = cfg
        self.params = params
        self.labelmap = {int(k): v for k, v in labelmap.items()}
        self.attr_labelmap = {int(k): v for k, v in attr_labelmap.items()}
        self.canvas_hw = canvas_hw
        self.batch_size = batch_size
        self.min_size = min_size
        self.max_size = max_size
        model = AttrRCNN(cfg)
        self._apply = jax.jit(model.apply)

    def _predict_batch(self, canvases: np.ndarray, hws: np.ndarray) -> dict:
        out = self._apply(self.params, jnp.asarray(canvases),
                          jnp.asarray(hws, jnp.int32))
        return jax.tree.map(np.asarray, out)

    def predict(self, images: Sequence[np.ndarray]) -> list[dict]:
        """RGB images (any sizes) -> per-image prediction dicts
        ({"objects": [...], "num_boxes": N}), boxes in ORIGINAL image
        coordinates."""
        results = []
        bs = self.batch_size
        for start in range(0, len(images), bs):
            chunk = images[start:start + bs]
            pre = [preprocess_for_detection(
                im, self.canvas_hw, self.min_size, self.max_size)
                for im in chunk]
            canvases = np.stack([p[0] for p in pre])
            hws = np.array([p[1] for p in pre], np.int32)
            scales = [p[2] for p in pre]
            if len(chunk) < bs:   # pad to the compiled batch shape
                pad = bs - len(chunk)
                canvases = np.concatenate(
                    [canvases, np.zeros((pad,) + canvases.shape[1:],
                                        np.float32)])
                hws = np.concatenate([hws, np.ones((pad, 2), np.int32)])
            out = self._predict_batch(canvases, hws)
            for i, scale in enumerate(scales):
                results.append(self._to_objects(out, i, scale))
        return results

    def _to_objects(self, out: dict, i: int, scale: float) -> dict:
        objects = []
        n = int(out["num_detections"][i])
        for j in range(out["boxes"].shape[1]):
            if not out["valid"][i, j]:
                continue
            label = int(out["labels"][i, j])
            attrs, ascores = [], []
            for k in range(out["attr_labels"].shape[2]):
                s = float(out["attr_scores"][i, j, k])
                if s <= 0.0:
                    continue
                aid = int(out["attr_labels"][i, j, k])
                attrs.append(self.attr_labelmap.get(aid, str(aid)))
                ascores.append(round(s, 4))
            feat = np.asarray(out["features"][i, j], np.float32)
            x1, y1, x2, y2 = (float(v) / scale for v in out["boxes"][i, j])
            # legacy +1 box decode can emit x2 = x1 - eps on degenerate
            # boxes; the TSV contract wants monotone corners
            rect = [round(x1, 2), round(y1, 2),
                    round(max(x2, x1), 2), round(max(y2, y1), 2)]
            objects.append({
                "class": self.labelmap.get(label, str(label)),
                "rect": rect,
                "conf": round(float(out["scores"][i, j]), 4),
                "attributes": attrs,
                "attr_scores": ascores,
                "feature": base64.b64encode(feat.tobytes()).decode(),
            })
        return {"objects": objects, "num_boxes": n}


def oscar_region_features(features: np.ndarray, boxes: np.ndarray,
                          image_hw) -> np.ndarray:
    """(D, 2048) pooled features + (D, 4) xyxy boxes -> the 2054-d
    region features Oscar-style consumers use: features ⊕
    [x1/w, y1/h, x2/w, y2/h, (x2-x1)/w, (y2-y1)/h]."""
    h, w = float(image_hw[0]), float(image_hw[1])
    x1, y1, x2, y2 = (boxes[:, 0] / w, boxes[:, 1] / h,
                      boxes[:, 2] / w, boxes[:, 3] / h)
    pos = np.stack([x1, y1, x2, y2, x2 - x1, y2 - y1], -1)
    return np.concatenate([features, pos.astype(features.dtype)], -1)


def write_predictions_tsv(path: str, keys: Iterable[str],
                          predictions: Iterable[dict]) -> None:
    """Write the predictions.tsv file LoadVinVLFeatures consumes."""
    with open(path, "w") as f:
        for key, pred in zip(keys, predictions):
            f.write(f"{key}\t{json.dumps(pred)}\n")


def load_vg_labelmap(path: str) -> tuple[dict, dict]:
    """Parse a VG-SGG-dicts-style labelmap JSON (the reference's
    DATASETS.LABELMAP_FILE): returns (idx->class, idx->attribute).
    Accepts either {label_to_idx, attribute_to_idx} or the inverted
    {idx_to_label, idx_to_attribute} layouts."""
    with open(path) as f:
        d = json.load(f)
    if "idx_to_label" in d:
        lab = {int(k): v for k, v in d["idx_to_label"].items()}
    else:
        lab = {int(v): k for k, v in d.get("label_to_idx", {}).items()}
    if "idx_to_attribute" in d:
        attr = {int(k): v for k, v in d["idx_to_attribute"].items()}
    else:
        attr = {int(v): k
                for k, v in d.get("attribute_to_idx", {}).items()}
    return lab, attr
