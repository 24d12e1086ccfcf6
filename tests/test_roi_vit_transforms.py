"""ROI selection + in-pipeline ViT feature extraction."""

import numpy as np
import jax

from ravqa_tpu.data import DataPipeline
from ravqa_tpu.data.transforms import select_rois
from ravqa_tpu.models import CLIPVisionModel, ViTConfig


def test_select_rois_semantics():
    objects = [
        {"class": "cat", "rect": [0, 0, 10, 10]},
        {"class": "cat", "rect": [2, 2, 8, 8]},      # contained duplicate
        {"class": "dog", "rect": [0, 0, 100, 100]},  # biggest
        {"class": "tree", "rect": [0, 0, 50, 50]},
    ]
    sel = select_rois(objects, "where is the cat", max_objects=3)
    classes = [o["class"] for o in sel]
    # question-mentioned 'cat' first (both cats pre-selected by mention),
    # then largest non-duplicate
    assert classes[0] == "cat" and classes[1] == "cat"
    assert "dog" in classes
    sel2 = select_rois(objects, "nothing mentioned", max_objects=2)
    # area order: dog then tree; contained cat dedup only applies same class
    assert [o["class"] for o in sel2] == ["dog", "tree"]


def test_vit_feature_extraction_pipeline(tmp_path):
    vit = ViTConfig.tiny()
    model = CLIPVisionModel(vit)
    params = model.init(jax.random.PRNGKey(0),
                        np.zeros((1, 32, 32, 3), np.float32))["params"]
    rng = np.random.default_rng(0)
    images = {str(i): rng.integers(0, 255, (40, 40, 3)).astype(np.uint8)
              for i in range(3)}

    def loader(key):
        return images[key.split("|||")[0].split("_")[0]] \
            if "|||" in key else images[key]

    data = {"train": [
        {"question_id": "0", "question": "a cat", "image_id": 0,
         "objects": [{"class": "cat", "rect": [0, 0, 20, 20]}]},
        {"question_id": "1", "question": "sky", "image_id": 1,
         "objects": []},
    ]}
    dp = DataPipeline({
        "src": {"transform_name": "_Identity", "setup_kwargs": {}},
    })
    # run transforms directly (no need for the DAG here)
    from ravqa_tpu.data.transforms import (CropRegionOfInterestImages,
                                           ExtractImageFeaturesWithViT)
    crop = CropRegionOfInterestImages(); crop.setup(max_objects=2)
    data = crop(data)
    assert data["train"][0]["ROIs"], "mentioned object becomes an ROI"
    ext = ExtractImageFeaturesWithViT()
    ext.setup(image_loader=loader, vit_config=vit, vit_params=params,
              batch_size=4, image_size=32,
              cache_path=str(tmp_path / "feats.npz"))
    data = ext(data)
    f0 = data["train"][0]["image_features"]
    assert f0.shape == (2, vit.hidden_size)   # full image + 1 ROI
    assert data["train"][1]["image_features"].shape == (1, vit.hidden_size)
    # second run hits the cache (no model needed): remove params to prove it
    ext2 = ExtractImageFeaturesWithViT()
    ext2.setup(image_loader=loader, vit_config=vit, vit_params=None,
               cache_path=str(tmp_path / "feats.npz"))
    data2 = ext2({"train": list(data["train"])})
    np.testing.assert_allclose(data2["train"][0]["image_features"], f0)
