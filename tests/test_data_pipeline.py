"""Data pipeline tests: DAG caching, format-compatible loaders, ModuleParser,
negative sampling, end-to-end synthetic pipeline -> training batches."""

import csv
import json

import numpy as np
import pytest

from ravqa_tpu.data import (DataPipeline, ModuleParser, PassageCorpus,
                            RetrievalDataset, corpus_doc_batches,
                            query_eval_batches, register_transform,
                            BaseTransform)


def test_dag_runs_topologically_and_caches(tmp_path):
    calls = []

    @register_transform(name="_TestSrc")
    class Src(BaseTransform):
        def __call__(self):
            calls.append("src")
            return {"x": self.val}

    @register_transform(name="_TestAdd")
    class Add(BaseTransform):
        def __call__(self, a):
            calls.append("add")
            return {"x": a["x"] + 1}

    cfg = {
        "src": {"transform_name": "_TestSrc",
                "setup_kwargs": {"val": 41}, "cache": True},
        "add": {"transform_name": "_TestAdd", "input_node": "src",
                "cache": True},
    }
    dp = DataPipeline(cfg, cache_dir=str(tmp_path))
    assert dp.get_data("add", explode=True)["x"] == 42
    assert calls == ["src", "add"]
    # second pipeline: loads from cache, no transform calls
    dp2 = DataPipeline(cfg, cache_dir=str(tmp_path))
    assert dp2.get_data("add", explode=True)["x"] == 42
    assert calls == ["src", "add"]
    # changed setup_kwargs -> different cache key -> recompute
    cfg3 = {**cfg, "src": {**cfg["src"], "setup_kwargs": {"val": 10}}}
    dp3 = DataPipeline(cfg3, cache_dir=str(tmp_path))
    assert dp3.get_data("add", explode=True)["x"] == 11
    assert calls == ["src", "add", "src", "add"]


def test_google_search_csv_loader(tmp_path):
    path = tmp_path / "corpus.csv"
    with open(path, "w", newline="") as f:
        w = csv.writer(f)
        w.writerow(["kid", "content"])
        w.writerow(["0", "first passage"])
        w.writerow(["1", "second passage"])
        w.writerow(["112724", "first full-only passage"])
        w.writerow(["112725", "another full-only"])
    dp = DataPipeline({
        "p": {"transform_name": "LoadGoogleSearchPassages",
              "setup_kwargs": {"passage_data_path": str(path)}}})
    out = dp.get_data("p", explode=True)
    assert len(out["train_passages"]) == 2
    assert len(out["full_passages"]) == 4
    assert out["full_passages"].content_of("GS_112724") == \
        "first full-only passage"


def test_okvqa_and_annotations_loaders(tmp_path):
    qpath = tmp_path / "q.json"
    apath = tmp_path / "a.json"
    dpr = tmp_path / "dpr.json"
    cpath = tmp_path / "corpus.csv"
    json.dump({"questions": [
        {"question_id": 1, "question": "what color is the cat",
         "image_id": 7}]}, open(qpath, "w"))
    json.dump({"annotations": [
        {"question_id": 1, "multiple_choice_answer": "black",
         "question_type": "color", "answer_type": "other",
         "answers": [{"answer": "black"}] * 10}]}, open(apath, "w"))
    json.dump([{"question_id": 1, "caption": "", "ctxs":
                [{"id": "0", "has_answer": True}]}], open(dpr, "w"))
    with open(cpath, "w", newline="") as f:
        w = csv.writer(f)
        w.writerow(["kid", "content"])
        w.writerow(["0", "the cat is black"])

    dp = DataPipeline({
        "okvqa": {"transform_name": "LoadOKVQAData", "setup_kwargs": {
            "questions_path": {"train": str(qpath)},
            "annotations_path": {"train": str(apath)}}},
        "corpus": {"transform_name": "LoadGoogleSearchPassages",
                   "setup_kwargs": {"passage_data_path": str(cpath)}},
        "ann": {"transform_name": "LoadGoogleSearchAnnotations",
                "input_node": ["okvqa", "corpus"],
                "setup_kwargs": {"annotations_path": {"train": str(dpr)}}},
    })
    out = dp.get_data("ann", explode=True)
    item = out["train"][0]
    assert item["pos_item_ids"] == ["GS_0"]
    assert item["pos_item_contents"] == ["the cat is black"]
    assert item["gold_answer"] == "black"


def test_module_parser_formats():
    mp = ModuleParser()
    sample = {
        "question": "what is this",
        "img_caption": "a cat on a mat",
        "objects": [
            {"class": "cat", "attributes": ["black", "furry"],
             "attribute_scores": [0.9, 0.1]},
            {"class": "mat", "attributes": [], "attribute_scores": []},
        ],
        "img_ocr": [{"description": "EXIT"}, {"description": "EXIT"}],
    }
    modules = [
        {"type": "QuestionInput", "option": "default",
         "separation_tokens": {"start": "<BOQ>", "end": "<EOQ>"}},
        {"type": "TextBasedVisionInput", "option": "object",
         "attribute_max": 1, "attribute_thres": 0.5, "ocr": 1,
         "separation_tokens": {"start": "<BOV>", "sep": "<SOV>",
                               "end": "<EOV>"}},
        {"type": "TextBasedVisionInput", "option": "caption",
         "separation_tokens": {"start": "<BOC>", "end": "<EOC>"}},
    ]
    text = mp.parse(sample, modules)["text_sequence"]
    assert text == ("<BOQ> what is this <EOQ> "
                    "<BOV> black cat <SOV> mat <SOV> EXIT <EOV> "
                    "<BOC> a cat on a mat <EOC>")


def test_negative_sampling_rejects_positives():
    corpus = PassageCorpus([f"GS_{i}" for i in range(10)],
                           [f"passage {i}" for i in range(10)])
    from ravqa_tpu.tokenization import (DocTokenizer, QueryTokenizer,
                                        WordPieceTokenizer, make_tiny_vocab)
    tok = WordPieceTokenizer(make_tiny_vocab(["passage"]))
    ds = RetrievalDataset(
        [{"question": "q", "pos_item_ids": ["GS_3"]}], corpus,
        QueryTokenizer(tok, 8), DocTokenizer(tok, 8), nway=4)
    for _ in range(20):
        docs = ds.sample_docs(ds.items[0])
        assert docs[0] == "passage 3"
        assert "passage 3" not in docs[1:]


def test_synthetic_pipeline_to_batches():
    dp = DataPipeline({
        "raw": {"transform_name": "SyntheticOKVQA",
                "setup_kwargs": {"n_docs": 16, "n_questions": 8}},
        "loaders": {"transform_name": "PrepareDataloaders",
                    "input_node": "raw",
                    "setup_kwargs": {"query_maxlen": 12, "doc_maxlen": 12,
                                     "nway": 2}},
    })
    out = dp.get_data("loaders", explode=True)
    train = out["train"]
    batch = next(train.loader(batch_size=4, epochs=1))
    assert batch["query_input_ids"].shape == (4, 12)
    assert batch["doc_input_ids"].shape == (8, 12)
    assert batch["image_features"].shape[0] == 4
    # eval batches + corpus batches
    qb = list(query_eval_batches(out["test"], batch_size=4))
    assert qb[0]["query_input_ids"].shape[1] == 12
    db = list(corpus_doc_batches(out["passages"]["full_passages"],
                                 train.dt, batch_size=8))
    assert sum(b["doc_input_ids"].shape[0] for b in db) == 16
