"""VinVL-style AttrRCNN detector: forward contract, torch numerics
parity (bottleneck / box coder / anchors vs the reference's own code),
converter layout, and the extraction -> LoadVinVLFeatures roundtrip."""

import importlib.util
import json
import sys
import types

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ravqa_tpu.data.extraction import (VinVLFeatureExtractor,
                                       load_vg_labelmap,
                                       oscar_region_features,
                                       preprocess_for_detection,
                                       scale_for_detection,
                                       write_predictions_tsv)
from ravqa_tpu.data.transforms import LoadVinVLFeatures
from ravqa_tpu.models.detection import (AttrRCNN, DetectorConfig,
                                        convert_vinvl_params, decode_boxes,
                                        generate_base_anchors)

SGB = "/root/reference/materials/scene_graph_benchmark"


def _load_ref_module(name, path, package_stubs=()):
    for stub in package_stubs:
        sys.modules.setdefault(stub, types.ModuleType(stub))
    spec = importlib.util.spec_from_file_location(name, path)
    mod = importlib.util.module_from_spec(spec)
    sys.modules[name] = mod
    spec.loader.exec_module(mod)
    return mod


@pytest.fixture(scope="module")
def tiny():
    cfg = DetectorConfig.tiny()
    model = AttrRCNN(cfg)
    imgs = jnp.asarray(
        np.random.RandomState(0).randn(2, 64, 96, 3), jnp.float32)
    hw = jnp.asarray([[64, 96], [48, 80]], jnp.int32)
    params = model.init(jax.random.PRNGKey(0), imgs, hw)
    return cfg, model, params, imgs, hw


class TestForward:
    def test_output_contract(self, tiny):
        cfg, model, params, imgs, hw = tiny
        out = jax.jit(model.apply)(params, imgs, hw)
        d = cfg.detections_per_img
        assert out["boxes"].shape == (2, d, 4)
        assert out["scores"].shape == (2, d)
        assert out["labels"].shape == (2, d)
        assert out["features"].shape == (2, d, cfg.res5_out_channels)
        assert out["attr_labels"].shape == (2, d, cfg.max_attr_per_obj)
        # min-detections floor honoured (random scores rarely clear 0.2)
        assert np.all(np.asarray(out["num_detections"])
                      >= cfg.min_detections_per_img)

    def test_boxes_clipped_to_valid_region(self, tiny):
        cfg, model, params, imgs, hw = tiny
        out = jax.tree.map(np.asarray, model.apply(params, imgs, hw))
        for i in range(2):
            v = out["valid"][i]
            bx = out["boxes"][i][v]
            h, w = np.asarray(hw)[i]
            assert np.all(bx[:, 0] >= 0) and np.all(bx[:, 1] >= 0)
            assert np.all(bx[:, 2] <= w - 1) and np.all(bx[:, 3] <= h - 1)
            # valid detections carry foreground labels
            assert np.all(out["labels"][i][v] >= 1)
            assert np.all(out["labels"][i][v] < cfg.num_classes)

    def test_attr_scores_thresholded(self, tiny):
        cfg, model, params, imgs, hw = tiny
        out = jax.tree.map(np.asarray, model.apply(params, imgs, hw))
        nz = out["attr_scores"][out["attr_scores"] > 0]
        assert np.all(nz > cfg.attr_thresh)
        # background attribute (index 0) never surfaces with a score
        scored_bg = (out["attr_labels"] == 0) & (out["attr_scores"] > 0)
        assert not scored_bg.any()


class TestTorchParity:
    """Numerics vs torch on the pieces whose layout conversion could
    silently break (grouped conv + frozen BN + residual, box decode,
    anchor grid)."""

    def test_bottleneck_matches_torch(self):
        torch = pytest.importorskip("torch")
        from ravqa_tpu.models.detection import Bottleneck
        rng = np.random.RandomState(1)
        cin, cmid, cout, groups, stride = 8, 4, 16, 2, 2
        x = rng.randn(1, 9, 11, cin).astype(np.float32)

        tconv1 = torch.nn.Conv2d(cin, cmid, 1, bias=False)
        tconv2 = torch.nn.Conv2d(cmid, cmid, 3, stride=stride, padding=1,
                                 groups=groups, bias=False)
        tconv3 = torch.nn.Conv2d(cmid, cout, 1, bias=False)
        tdown = torch.nn.Conv2d(cin, cout, 1, stride=stride, bias=False)
        with torch.no_grad():
            tx = torch.from_numpy(x.transpose(0, 3, 1, 2))
            y = torch.relu(tconv1(tx))
            y = torch.relu(tconv2(y))
            y = tconv3(y)
            ty = torch.relu(y + tdown(tx)).numpy().transpose(0, 2, 3, 1)

        blk = Bottleneck(cmid, cout, stride=stride, num_groups=groups)
        ident = {"scale": np.ones(cmid, np.float32),
                 "bias": np.zeros(cmid, np.float32)}
        ident_out = {"scale": np.ones(cout, np.float32),
                     "bias": np.zeros(cout, np.float32)}

        def k(m):   # torch OIHW -> flax HWIO
            return m.weight.detach().numpy().transpose(2, 3, 1, 0)

        params = {"params": {
            "conv1": {"kernel": k(tconv1)}, "bn1": ident,
            "conv2": {"kernel": k(tconv2)}, "bn2": ident,
            "conv3": {"kernel": k(tconv3)}, "bn3": ident_out,
            "downsample_conv": {"kernel": k(tdown)},
            "downsample_bn": ident_out,
        }}
        ours = np.asarray(blk.apply(params, jnp.asarray(x)))
        np.testing.assert_allclose(ours, ty, rtol=1e-4, atol=1e-4)

    def test_frozen_bn_fold_matches_torch_batchnorm(self):
        torch = pytest.importorskip("torch")
        from ravqa_tpu.models.detection import _fold_bn
        rng = np.random.RandomState(2)
        c = 6
        sd = {"bn.weight": rng.rand(c).astype(np.float32) + 0.5,
              "bn.bias": rng.randn(c).astype(np.float32),
              "bn.running_mean": rng.randn(c).astype(np.float32),
              "bn.running_var": rng.rand(c).astype(np.float32) + 0.1}
        x = rng.randn(3, c).astype(np.float32)
        bn = torch.nn.BatchNorm1d(c, eps=1e-5).eval()
        with torch.no_grad():
            bn.weight.copy_(torch.from_numpy(sd["bn.weight"]))
            bn.bias.copy_(torch.from_numpy(sd["bn.bias"]))
            bn.running_mean.copy_(torch.from_numpy(sd["bn.running_mean"]))
            bn.running_var.copy_(torch.from_numpy(sd["bn.running_var"]))
            want = bn(torch.from_numpy(x)).numpy()
        fold = _fold_bn(sd, "bn")
        got = x * fold["scale"] + fold["bias"]
        np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)

    def test_box_decode_matches_reference_boxcoder(self):
        torch = pytest.importorskip("torch")
        ref = _load_ref_module(
            "_ref_box_coder",
            f"{SGB}/maskrcnn_benchmark/modeling/box_coder.py")
        rng = np.random.RandomState(3)
        boxes = np.sort(rng.rand(32, 4).astype(np.float32) * 100, -1)
        deltas = (rng.randn(32, 4) * 0.3).astype(np.float32)
        weights = (10.0, 10.0, 5.0, 5.0)
        coder = ref.BoxCoder(weights=weights)
        want = coder.decode(torch.from_numpy(deltas),
                            torch.from_numpy(boxes)).numpy().reshape(-1, 4)
        got = np.asarray(decode_boxes(jnp.asarray(deltas),
                                      jnp.asarray(boxes), weights))
        np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-3)

    def test_anchors_match_reference_generator(self):
        pytest.importorskip("torch")
        # bounding_box/BoxList is pure torch; anchor_generator imports it
        bb = _load_ref_module(
            "maskrcnn_benchmark.structures.bounding_box",
            f"{SGB}/maskrcnn_benchmark/structures/bounding_box.py",
            package_stubs=("maskrcnn_benchmark",
                           "maskrcnn_benchmark.structures"))
        sys.modules["maskrcnn_benchmark.structures"].bounding_box = bb
        ref = _load_ref_module(
            "_ref_anchor_gen",
            f"{SGB}/maskrcnn_benchmark/modeling/rpn/anchor_generator.py")
        np.float = float        # legacy alias the 2021 code still uses
        try:
            want = ref.generate_anchors(
                16, (32, 64, 128, 256, 512), (0.5, 1.0, 2.0)).numpy()
        finally:
            del np.float
        got = generate_base_anchors(16, (32, 64, 128, 256, 512),
                                    (0.5, 1.0, 2.0))
        np.testing.assert_allclose(got, want, rtol=0, atol=1e-4)


class TestConverter:
    def _tiny_state_dict(self, cfg: DetectorConfig):
        """Synthetic checkpoint with the reference's module names
        (resnet.py stem/layerN.i.convJ/bnJ/downsample, rpn.head.*,
        roi_heads.box.*, attribute.predictor.*)."""
        rng = np.random.RandomState(0)
        sd = {}

        def conv(name, cout, cin, k, bias=False, groups=1):
            sd[f"{name}.weight"] = rng.randn(
                cout, cin // groups, k, k).astype(np.float32) * 0.05
            if bias:
                sd[f"{name}.bias"] = np.zeros(cout, np.float32)

        def bn(name, c):
            sd[f"{name}.weight"] = np.ones(c, np.float32)
            sd[f"{name}.bias"] = np.zeros(c, np.float32)
            sd[f"{name}.running_mean"] = np.zeros(c, np.float32)
            sd[f"{name}.running_var"] = np.ones(c, np.float32)

        def linear(name, cout, cin):
            sd[f"{name}.weight"] = rng.randn(
                cout, cin).astype(np.float32) * 0.05
            sd[f"{name}.bias"] = np.zeros(cout, np.float32)

        def bottleneck(prefix, cin, cmid, cout, groups, downsample):
            conv(f"{prefix}.conv1", cmid, cin, 1)
            bn(f"{prefix}.bn1", cmid)
            conv(f"{prefix}.conv2", cmid, cmid, 3, groups=groups)
            bn(f"{prefix}.bn2", cmid)
            conv(f"{prefix}.conv3", cout, cmid, 1)
            bn(f"{prefix}.bn3", cout)
            if downsample:
                conv(f"{prefix}.downsample.0", cout, cin, 1)
                bn(f"{prefix}.downsample.1", cout)

        conv("backbone.body.stem.conv1", cfg.stem_channels, 3, 7)
        bn("backbone.body.stem.bn1", cfg.stem_channels)
        cin = cfg.stem_channels
        for si in range(len(cfg.stage_blocks)):
            cmid = cfg.bottleneck_channels[si]
            cout = cfg.stage_out_channels[si]
            for i in range(cfg.stage_blocks[si]):
                bottleneck(f"backbone.body.layer{si + 1}.{i}",
                           cin if i == 0 else cout, cmid, cout,
                           cfg.num_groups, downsample=(i == 0))
                cin = cout
        c4 = cfg.backbone_out_channels
        conv("rpn.head.conv", c4, c4, 3, bias=True)
        conv("rpn.head.cls_logits", cfg.num_anchors, c4, 1, bias=True)
        conv("rpn.head.bbox_pred", cfg.num_anchors * 4, c4, 1, bias=True)
        r5mid = cfg.num_groups * cfg.width_per_group * \
            2 ** len(cfg.stage_blocks)
        r5out = cfg.res5_out_channels
        for i in range(cfg.res5_blocks):
            bottleneck("roi_heads.box.feature_extractor.head."
                       f"layer4.{i}", c4 if i == 0 else r5out, r5mid,
                       r5out, cfg.num_groups, downsample=(i == 0))
        linear("roi_heads.box.predictor.cls_score", cfg.num_classes, r5out)
        linear("roi_heads.box.predictor.bbox_pred",
               cfg.num_classes * 4, r5out)
        sd["attribute.predictor.cls_embedding.weight"] = rng.randn(
            cfg.num_classes, cfg.cls_emd_dim).astype(np.float32) * 0.05
        linear("attribute.predictor.fc_attr", cfg.attr_emd_dim,
               r5out + cfg.cls_emd_dim)
        linear("attribute.predictor.attr_score", cfg.num_attributes,
               cfg.attr_emd_dim)
        return sd

    def test_converted_tree_matches_init_and_runs(self, tiny):
        cfg, model, params, imgs, hw = tiny
        sd = self._tiny_state_dict(cfg)
        # 'module.' prefixes (DDP checkpoints) must be stripped too
        sd = {f"module.{k}": v for k, v in sd.items()}
        conv = {"params": convert_vinvl_params(sd, cfg)}

        def flat_shapes(tree):
            return {"/".join(map(str, p)): v.shape for p, v in
                    jax.tree_util.tree_flatten_with_path(tree)[0]}

        assert flat_shapes(conv) == flat_shapes(params)
        out = model.apply(conv, imgs, hw)
        assert np.isfinite(np.asarray(out["scores"])).all()


class TestExtraction:
    def test_scale_rule(self):
        # shorter side -> 600 unless longer side would pass 1000
        assert scale_for_detection(600, 800) == pytest.approx(1.0)
        assert scale_for_detection(300, 400) == pytest.approx(2.0)
        assert scale_for_detection(500, 1250) == pytest.approx(0.8)

    def test_preprocess_pads_and_subtracts_bgr_mean(self):
        im = np.full((50, 100, 3), 128, np.uint8)
        canvas, (th, tw), scale = preprocess_for_detection(
            im, canvas_hw=(128, 128), min_size=64, max_size=128)
        assert (th, tw) == (64, 128)
        assert canvas.shape == (128, 128, 3)
        assert np.all(canvas[th:] == 0)
        np.testing.assert_allclose(
            canvas[0, 0], 128 - np.array([103.530, 116.280, 123.675]),
            atol=1e-4)

    def test_extract_to_tsv_roundtrip(self, tiny, tmp_path):
        cfg, model, params, _, _ = tiny
        labelmap = {i: f"class{i}" for i in range(1, cfg.num_classes)}
        attrmap = {i: f"attr{i}" for i in range(1, cfg.num_attributes)}
        ex = VinVLFeatureExtractor(
            cfg, params, labelmap, attrmap, canvas_hw=(64, 96),
            batch_size=2, min_size=48, max_size=96)
        rng = np.random.RandomState(0)
        images = [rng.randint(0, 255, (80, 120, 3), np.uint8),
                  rng.randint(0, 255, (40, 50, 3), np.uint8),
                  rng.randint(0, 255, (60, 60, 3), np.uint8)]
        preds = ex.predict(images)       # 3 images, batch 2 -> pad path
        assert len(preds) == 3
        for pred, im in zip(preds, images):
            assert pred["num_boxes"] >= cfg.min_detections_per_img
            for obj in pred["objects"]:
                assert obj["class"].startswith("class")
                x1, y1, x2, y2 = obj["rect"]
                assert 0 <= x1 <= x2 <= im.shape[1]
                assert 0 <= y1 <= y2 <= im.shape[0]
                assert len(obj["attributes"]) == len(obj["attr_scores"])
                assert all(s > cfg.attr_thresh
                           for s in obj["attr_scores"])

        path = str(tmp_path / "predictions.tsv")
        keys = ["000000000001", "000000000002", "000000000003"]
        write_predictions_tsv(path, keys, preds)
        loader = LoadVinVLFeatures()
        loader.setup(features_path={"test": path})
        out = loader()
        assert set(out["vinvl_features"]) == set(keys)
        first = out["vinvl_features"][keys[0]]["objects"]
        assert len(first) == len(preds[0]["objects"])
        assert "feature" not in first[0]    # loader drops it
        assert first[0]["class"] == preds[0]["objects"][0]["class"]

    def test_oscar_region_features(self):
        feats = np.ones((2, 8), np.float32)
        boxes = np.array([[0, 0, 50, 20], [10, 10, 60, 40]], np.float32)
        out = oscar_region_features(feats, boxes, (40, 100))
        assert out.shape == (2, 14)
        np.testing.assert_allclose(out[0, 8:],
                                   [0, 0, 0.5, 0.5, 0.5, 0.5], atol=1e-6)

    def test_load_vg_labelmap_both_layouts(self, tmp_path):
        p1 = tmp_path / "fwd.json"
        p1.write_text(json.dumps({"label_to_idx": {"cat": 1},
                                  "attribute_to_idx": {"furry": 2}}))
        lab, attr = load_vg_labelmap(str(p1))
        assert lab == {1: "cat"} and attr == {2: "furry"}
        p2 = tmp_path / "inv.json"
        p2.write_text(json.dumps({"idx_to_label": {"1": "cat"},
                                  "idx_to_attribute": {"2": "furry"}}))
        assert load_vg_labelmap(str(p2)) == ({1: "cat"}, {2: "furry"})
