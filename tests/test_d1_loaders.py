"""D1 offline-feature loaders (VinVL / Oscar captions / Google OCR), ROI
plumbing, and the flmr_with_roi config end-to-end through the CLI on a
synthetic VinVL TSV fixture (reference: src/data_ops/vqa_data_ops.py:54-229,
434-596; module_parser.py:154-178)."""

import base64
import json
import os

import numpy as np
import pytest

from ravqa_tpu.data.transforms import (CropRandomRegionOfInterestImages,
                                       LoadGoogleOCRFeatures,
                                       LoadOKVQAData,
                                       LoadOscarCaptionFeatures,
                                       LoadVinVLFeatures)

CFG_DIR = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "configs")


def _setup(transform_cls, **kw):
    t = transform_cls.__new__(transform_cls)
    for k, v in kw.items():
        setattr(t, k, v)
    return t


def _write_vinvl_tsv(path, keys_objects):
    rows = []
    for key, objects in keys_objects.items():
        objs = []
        for cls, rect in objects:
            objs.append({
                "class": cls, "rect": rect, "conf": 0.9,
                "attributes": ["furry", "small"],
                "attr_scores": [0.8, 0.02],
                "feature": base64.b64encode(
                    np.arange(4, dtype=np.float32).tobytes()).decode(),
            })
        rows.append(f"{key}\t{json.dumps({'objects': objs})}")
    with open(path, "w") as f:
        f.write("\n".join(rows) + "\n")


class TestLoaders:
    def test_vinvl_tsv_schema_and_feature_drop(self, tmp_path):
        p = tmp_path / "predictions.tsv"
        _write_vinvl_tsv(p, {"000000000001": [("cat", [0, 0, 10, 10]),
                                              ("dog", [5, 5, 20, 20])]})
        t = _setup(LoadVinVLFeatures, features_path={"train": str(p)})
        out = t()
        pred = out["vinvl_features"]["000000000001"]
        assert len(pred["objects"]) == 2
        assert pred["objects"][0]["class"] == "cat"
        assert "feature" not in pred["objects"][0]  # dropped, like :89
        assert pred["objects"][1]["attr_scores"] == [0.8, 0.02]

    def test_oscar_captions_merge(self, tmp_path):
        a, b = tmp_path / "a.json", tmp_path / "b.json"
        a.write_text(json.dumps({"1": ["a cat photo"]}))
        b.write_text(json.dumps({"2": ["a dog photo"]}))
        t = _setup(LoadOscarCaptionFeatures,
                   caption_features={"train": str(a), "test": str(b)})
        out = t()
        assert out["caption_features"] == {"1": ["a cat photo"],
                                           "2": ["a dog photo"]}

    def test_ocr_combine_with_vinvl(self, tmp_path):
        key = "000000000007"
        d = tmp_path / "ocr"
        d.mkdir()
        (d / f"{key}_ocr.json").write_text(json.dumps({
            "filtered_text_annotations": [
                {"description": "stop\nsign",
                 "vertices": [[1, 1], [5, 1], [5, 5], [1, 5]]},
                {"description": "far away",
                 "vertices": [[90, 90], [99, 90], [99, 99], [90, 99]]},
            ]}))
        vinvl = {key: {"objects": [
            {"class": "sign", "rect": [0, 0, 10, 10]},
            {"class": "tree", "rect": [50, 50, 60, 60]},
        ]}}
        t = _setup(LoadGoogleOCRFeatures,
                   ocr_features={"train": str(d),
                                 "combine_with_vinvl": True})
        out = t({"vinvl_features": vinvl})
        sign = out["vinvl_features"][key]["objects"][0]
        # 4x4 text box inside the 10x10 sign: score = 16/100
        assert sign["ocr"][0]["text"] == "stop sign"
        assert sign["ocr"][0]["score"] == pytest.approx(0.16)
        tree = out["vinvl_features"][key]["objects"][1]
        assert "ocr" not in tree
        assert out["vinvl_features"][key]["ocr"] == 1
        assert out["ocr_features"][key]["filtered_text_annotations"]

    def _okvqa_files(self, tmp_path, image_ids=(7,)):
        q = {"questions": [{"question_id": 100 + i, "image_id": img,
                            "question": "what is the sign"}
                           for i, img in enumerate(image_ids)]}
        a = {"annotations": [{"question_id": 100 + i,
                              "answers": [{"answer": "stop"}] * 10,
                              "multiple_choice_answer": "stop",
                              "question_type": "t", "answer_type": "other"}
                             for i, _ in enumerate(image_ids)]}
        qp, ap = tmp_path / "q.json", tmp_path / "a.json"
        qp.write_text(json.dumps(q))
        ap.write_text(json.dumps(a))
        return str(qp), str(ap)

    def test_okvqa_attaches_objects_caption_ocr(self, tmp_path):
        qp, ap = self._okvqa_files(tmp_path)
        vinvl = {"000000000007": {"objects": [
            {"class": "sign", "rect": [0, 0, 10, 10],
             "attributes": ["red"], "attr_scores": [0.9],
             "ocr": [{"text": "stop", "score": 0.2}]}]}}
        ocr = {"000000000007": {"filtered_text_annotations": [
            {"description": "stop", "vertices": [[1, 1]] * 4}]}}
        t = _setup(LoadOKVQAData,
                   questions_path={"train": qp},
                   annotations_path={"train": ap},
                   add_caption_features=True, add_VinVL_features=True,
                   add_OCR_features=True)
        out = t({"vinvl_features": vinvl, "ocr_features": ocr},
                {"caption_features": {"7": ["a stop sign"]}})
        item = out["train"][0]
        assert item["img_caption"] == "a stop sign"
        assert item["objects"][0]["class"] == "sign"
        assert item["objects"][0]["attribute_scores"] == [0.9]
        assert item["img_ocr"][0]["description"] == "stop"

    def test_okvqa_missing_vinvl_raises(self, tmp_path):
        qp, ap = self._okvqa_files(tmp_path, image_ids=(8,))
        t = _setup(LoadOKVQAData,
                   questions_path={"train": qp},
                   annotations_path={"train": ap},
                   add_VinVL_features=True)
        with pytest.raises(KeyError):
            t({"vinvl_features": {}})


class TestRandomCrops:
    def test_even_split_grid(self):
        t = _setup(CropRandomRegionOfInterestImages, max_objects=4,
                   even_split=True, seed=0)
        data = {"train": [{"question_id": "1", "image_id": 3,
                           "img_size": (100, 80)}]}
        out = t(data)
        item = out["train"][0]
        assert len(item["ROIs"]) == 4
        rects = [out["roi_crops"][r]["crop"] for r in item["ROIs"]]
        assert rects[0] == [0, 0, 50, 40]
        assert rects[-1] == [50, 40, 100, 80]

    def test_random_boxes_respect_margins(self):
        t = _setup(CropRandomRegionOfInterestImages, max_objects=5,
                   even_split=False, seed=0)
        data = {"train": [{"question_id": "1", "image_id": 3,
                           "img_size": (64, 64)}]}
        out = t(data)
        for r in out["train"][0]["ROIs"]:
            xmin, ymin, xmax, ymax = out["roi_crops"][r]["crop"]
            assert 0 <= xmin < xmax <= 64 and 0 <= ymin < ymax <= 64


class TestROIPadding:
    def test_vision_input_pads_to_num_rois(self):
        from ravqa_tpu.data.module_parser import ModuleParser
        p = ModuleParser()
        module = {"type": "VisionInput", "option": "from_embeddings",
                  "use_ROI": True, "num_ROIs": 3}
        # 2 ROIs -> pad by repeating the last ROI row
        feats = np.arange(12, dtype=np.float32).reshape(3, 4)
        out = p.VisionInput({"image_features": feats}, module)
        v = out["vision_features"]
        assert v.shape == (4, 4)
        np.testing.assert_array_equal(v[3], feats[2])
        # 0 ROIs -> global feature repeats
        out0 = p.VisionInput({"image_features": feats[:1]}, module)
        assert out0["vision_features"].shape == (4, 4)
        np.testing.assert_array_equal(out0["vision_features"][2], feats[0])
        # 5 ROIs -> truncate
        big = np.random.default_rng(0).normal(size=(6, 4)).astype(np.float32)
        outb = p.VisionInput({"image_features": big}, module)
        assert outb["vision_features"].shape == (4, 4)
        np.testing.assert_array_equal(outb["vision_features"][1], big[1])

    def test_collate_with_variable_roi_counts(self):
        """The ADVICE finding: np.stack used to crash on ragged ROI stacks."""
        from ravqa_tpu.data.datasets import PassageCorpus, RetrievalDataset
        from ravqa_tpu.tokenization import (DocTokenizer, QueryTokenizer,
                                            WordPieceTokenizer,
                                            make_tiny_vocab)
        base = WordPieceTokenizer(make_tiny_vocab(["cat", "dog"]))
        corpus = PassageCorpus(["GS_0", "GS_1"], ["cat", "dog"])
        rng = np.random.default_rng(0)
        items = [{"question_id": str(i), "question": "cat",
                  "pos_item_ids": ["GS_0"],
                  "image_features":
                      rng.normal(size=(1 + n, 4)).astype(np.float32)}
                 for i, n in enumerate([0, 2, 7])]
        ds = RetrievalDataset(
            items, corpus, QueryTokenizer(base, 8), DocTokenizer(base, 8),
            nway=2,
            input_modules=[
                {"type": "QuestionInput"},
                {"type": "VisionInput", "option": "from_embeddings",
                 "use_ROI": True, "num_ROIs": 3}])
        batch = ds.collate([0, 1, 2])
        assert batch["image_features"].shape == (3, 4, 4)


def test_cli_flmr_with_roi_end_to_end(tmp_path):
    """configs/okvqa/flmr_with_roi.json runs prepare_data -> train -> test
    through the CLI on a synthetic VinVL/caption/OCR fixture."""
    from ravqa_tpu.config import load_config
    from ravqa_tpu.main import main
    from ravqa_tpu.tokenization import make_tiny_vocab

    root = tmp_path / "data"
    image_ids = [1, 2, 3, 4]
    n_questions = 8

    for split in ("train", "test"):
        d = root / "vinvl" / split
        d.mkdir(parents=True)
        _write_vinvl_tsv(
            d / "predictions.tsv",
            {str(i).zfill(12): [("cat", [0, 0, 16, 16]),
                                ("sign", [4, 4, 20, 20])][:1 + i % 2]
             for i in image_ids})
        od = root / "ocr" / split
        od.mkdir(parents=True)
        for i in image_ids:
            (od / f"{str(i).zfill(12)}_ocr.json").write_text(json.dumps({
                "filtered_text_annotations": [
                    {"description": "stop",
                     "vertices": [[1, 1], [5, 1], [5, 5], [1, 5]]}]}))
        (root / f"captions_{split}.json").write_text(json.dumps(
            {str(i): [f"a photo of thing {i}"] for i in image_ids}))
        qs = [{"question_id": 100 * (split == "test") + j,
               "image_id": image_ids[j % len(image_ids)],
               "question": "what is the cat near the sign"}
              for j in range(n_questions)]
        (root / f"questions_{split}.json").write_text(
            json.dumps({"questions": qs}))
        (root / f"annotations_{split}.json").write_text(json.dumps(
            {"annotations": [{"question_id": q["question_id"],
                              "answers": [{"answer": "cat"}] * 10,
                              "multiple_choice_answer": "cat",
                              "question_type": "t",
                              "answer_type": "other"} for q in qs]}))
        (root / f"gs_{split}.json").write_text(json.dumps(
            [{"question_id": q["question_id"],
              "ctxs": [{"id": str(1 + j % 6)}]}
             for j, q in enumerate(qs)]))
    with open(root / "corpus.csv", "w") as f:
        f.write("kid,content\n")
        for k in range(1, 13):
            f.write(f"{k},passage about thing number {k}\n")
    vocab = sorted(make_tiny_vocab(
        ["what", "is", "the", "cat", "sign", "near", "photo", "a", "of",
         "thing", "stop", "passage", "about", "number", "furry", "small",
         "red"]).items(), key=lambda kv: kv[1])
    (root / "vocab.txt").write_text("\n".join(t for t, _ in vocab) + "\n")

    cfg = load_config(os.path.join(CFG_DIR, "okvqa", "flmr_with_roi.json"))
    dp = cfg.data_pipeline
    dp.vinvl.setup_kwargs.features_path = {
        s: str(root / "vinvl" / s / "predictions.tsv")
        for s in ("train", "test")}
    dp.captions.setup_kwargs.caption_features = {
        s: str(root / f"captions_{s}.json") for s in ("train", "test")}
    dp.ocr.setup_kwargs.ocr_features = {
        "train": str(root / "ocr" / "train"),
        "test": str(root / "ocr" / "test"), "combine_with_vinvl": True}
    dp.okvqa.setup_kwargs.questions_path = {
        s: str(root / f"questions_{s}.json") for s in ("train", "test")}
    dp.okvqa.setup_kwargs.annotations_path = {
        s: str(root / f"annotations_{s}.json") for s in ("train", "test")}
    dp.corpus.setup_kwargs.passage_data_path = str(root / "corpus.csv")
    dp.annotations.setup_kwargs.annotations_path = {
        s: str(root / f"gs_{s}.json") for s in ("train", "test")}
    dp.loaders.setup_kwargs.vocab_path = str(root / "vocab.txt")
    dp.loaders.setup_kwargs.doc_maxlen = 16
    dp.loaders.setup_kwargs.nway = 2
    cfg.model_config.bert = {
        "vocab_size": 256, "hidden_size": 64, "num_layers": 1,
        "num_heads": 4, "intermediate_size": 128,
        "max_position_embeddings": 64}
    cfg.model_config.mapping_network_prefix_length = 2
    cfg.model_config.num_negative_samples = 1
    cfg.train.update({"batch_size": 4, "total_steps": 3, "log_every": 2})
    cfg.metrics = {"Ks": [1, 5]}
    cfg_path = tmp_path / "roi_config.json"
    cfg_path.write_text(json.dumps(cfg.to_dict()))

    log_dir = str(tmp_path / "exp")
    assert main(["--config", str(cfg_path), "--mode", "train",
                 "--experiment_name", "roi", "--log_dir", log_dir]) == 0
    assert os.path.exists(os.path.join(log_dir, "roi", "ckpt",
                                       "params.msgpack"))
    assert main(["--config", str(cfg_path), "--mode", "test",
                 "--experiment_name", "roi", "--log_dir", log_dir]) == 0
    metrics = json.load(open(os.path.join(log_dir, "roi",
                                          "test_metrics.json")))
    assert "pos_item_ids_recall_at_5" in metrics
