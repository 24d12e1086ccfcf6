"""NMS + ROIAlign against torchvision (if available) / brute-force oracles."""

import numpy as np
import jax.numpy as jnp
import pytest

from ravqa_tpu.ops.vision import box_iou, nms, roi_align


def test_box_iou():
    a = jnp.array([[0, 0, 10, 10]], jnp.float32)
    b = jnp.array([[0, 0, 10, 10], [5, 5, 15, 15], [20, 20, 30, 30]],
                  jnp.float32)
    iou = np.asarray(box_iou(a, b))[0]
    np.testing.assert_allclose(iou, [1.0, 25 / 175, 0.0], rtol=1e-5)


def test_nms_greedy():
    boxes = jnp.array([
        [0, 0, 10, 10],     # score .9 keep
        [1, 1, 11, 11],     # heavy overlap with 0 -> suppressed
        [20, 20, 30, 30],   # keep
        [21, 21, 31, 31],   # overlap with 2 -> suppressed
        [50, 50, 60, 60],   # keep
    ], jnp.float32)
    scores = jnp.array([0.9, 0.8, 0.7, 0.75, 0.6], jnp.float32)
    idxs, count = nms(boxes, scores, iou_threshold=0.5, max_outputs=5)
    idxs = np.asarray(idxs)
    assert int(count) == 3
    assert list(idxs[:3]) == [0, 3, 4]   # 3 beats 2 on score
    assert (idxs[3:] == -1).all()


def test_nms_matches_torchvision():
    tv = pytest.importorskip("torchvision")
    import torch
    rng = np.random.default_rng(0)
    xy = rng.uniform(0, 50, size=(30, 2))
    wh = rng.uniform(5, 20, size=(30, 2))
    boxes = np.concatenate([xy, xy + wh], 1).astype(np.float32)
    scores = rng.random(30).astype(np.float32)
    want = tv.ops.nms(torch.tensor(boxes), torch.tensor(scores),
                      0.4).numpy()
    idxs, count = nms(jnp.array(boxes), jnp.array(scores),
                      iou_threshold=0.4, max_outputs=30)
    got = np.asarray(idxs)[:int(count)]
    np.testing.assert_array_equal(got, want)


def test_roi_align_constant_field():
    # constant feature map -> every ROI bin is that constant
    feat = jnp.ones((16, 16, 3), jnp.float32) * 5.0
    boxes = jnp.array([[2.0, 2.0, 10.0, 10.0]], jnp.float32)
    out = np.asarray(roi_align(feat, boxes, output_size=4))
    np.testing.assert_allclose(out, 5.0, rtol=1e-5)


def test_roi_align_matches_torchvision():
    tv = pytest.importorskip("torchvision")
    import torch
    rng = np.random.default_rng(1)
    feat = rng.normal(size=(16, 16, 4)).astype(np.float32)
    boxes = np.array([[1.5, 2.0, 12.0, 13.5], [0.0, 0.0, 8.0, 8.0]],
                     np.float32)
    want = tv.ops.roi_align(
        torch.tensor(feat.transpose(2, 0, 1)[None]),
        [torch.tensor(boxes)], output_size=5, sampling_ratio=2,
        aligned=False).numpy().transpose(0, 2, 3, 1)
    got = np.asarray(roi_align(jnp.array(feat), jnp.array(boxes),
                               output_size=5, sampling_ratio=2))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)
