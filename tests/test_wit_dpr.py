"""WIT transforms + DPR executor end-to-end slice."""

import csv

import jax
import jax.numpy as jnp
import numpy as np

from ravqa_tpu.data import DataPipeline
import ravqa_tpu.data.wit_transforms  # noqa: F401
from ravqa_tpu.executors import DPRExecutor, TrainConfig
from ravqa_tpu.models import DPRModelConfig, DPRRetriever, BertConfig


def make_wit_tsv(path, n=10):
    cols = ["image_url", "page_title", "section_title",
            "context_page_description", "caption_reference_description"]
    with open(path, "w", newline="", encoding="utf-8") as f:
        w = csv.DictWriter(f, fieldnames=cols, delimiter="\t")
        w.writeheader()
        for i in range(n):
            w.writerow({"image_url": f"http://img/{i}",
                        "page_title": f"Page {i}",
                        "section_title": "Intro",
                        "context_page_description":
                            f"description words for page {i} " * 30,
                        "caption_reference_description": f"caption {i}"})


def test_wit_pipeline(tmp_path):
    tsv = tmp_path / "wit.tsv"
    make_wit_tsv(tsv)
    dp = DataPipeline({
        "wit": {"transform_name": "LoadWITData",
                "setup_kwargs": {"tsv_path": {"train": str(tsv)}}},
        "trunc": {"transform_name": "TruncateWITPassages",
                  "input_node": "wit", "setup_kwargs": {"max_words": 12}},
        "reduce": {"transform_name": "ReduceWITPassagesSize",
                   "input_node": "trunc", "setup_kwargs": {"n_passages": 6}},
    })
    out = dp.get_data("reduce", explode=True)
    corpus = out["passages"]["full_passages"]
    assert len(corpus) >= 6
    assert all(len(c.split()) <= 12 for c in corpus.contents)
    # every positive survived the reduction
    for it in out["train"]:
        assert it["pos_item_ids"][0] in corpus.id2pos
        assert it["question"] is None   # vision-only query


def test_dpr_executor_trains_and_evaluates():
    from ravqa_tpu.tokenization import (DocTokenizer, QueryTokenizer,
                                        WordPieceTokenizer, make_tiny_vocab)
    tok = WordPieceTokenizer(make_tiny_vocab(
        ["cat", "dog", "sun", "sky", "tree", "fish"]))
    qt, dt = QueryTokenizer(tok, 8), DocTokenizer(tok, 8)
    passages = ["cat dog", "sun sky", "tree fish", "dog sun", "fish cat",
                "sky tree"]
    cfg = DPRModelConfig.tiny(bert=BertConfig.tiny(
        vocab_size=tok.vocab_size + 8))
    model = DPRRetriever(cfg)
    di, dm = dt.tensorize(passages)
    qi, qm = qt.tensorize(passages)  # queries = same text -> easy positives
    params = model.init(jax.random.PRNGKey(0), jnp.array(qi[:2]),
                        jnp.array(qm[:2]), jnp.array(di[:4]),
                        jnp.array(dm[:4]))["params"]
    ex = DPRExecutor(model, params, TrainConfig(lr=3e-3), quiet=True)
    rng = np.random.default_rng(0)
    losses = []
    for _ in range(12):
        order = rng.permutation(6)[:3]
        docs = []
        for i in order:
            docs.append(passages[i])
            docs.append(passages[(i + 3) % 6])
        bqi, bqm = qt.tensorize([passages[i] for i in order])
        bdi, bdm = dt.tensorize(docs)
        m = ex.train_step({"query_input_ids": jnp.array(bqi),
                           "query_attention_mask": jnp.array(bqm),
                           "doc_input_ids": jnp.array(bdi),
                           "doc_attention_mask": jnp.array(bdm)})
        losses.append(float(m["loss"]))
    assert losses[-1] < losses[0]
    metrics = ex.evaluate_retrieval(
        [{"query_input_ids": qi, "query_attention_mask": qm}],
        [{"doc_input_ids": di, "doc_attention_mask": dm}],
        passage_ids=[f"P{i}" for i in range(6)],
        pos_item_ids=[[f"P{i}"] for i in range(6)], ks=[1, 3])
    assert metrics["pos_item_ids_recall_at_3"] > 0.5


def test_prepare_images_filters_to_local(tmp_path):
    """PrepareImagesForWITData keeps only items whose image exists on disk
    (reference wit_data_ops.py:132-290 minus the network downloader)."""
    from ravqa_tpu.data.wit_transforms import PrepareImagesForWITData
    t = PrepareImagesForWITData.__new__(PrepareImagesForWITData)
    t.image_data_path = str(tmp_path)
    t.image_name = lambda it: f"{it['image_id']}.jpg"
    (tmp_path / "a.jpg").write_bytes(b"x")
    data = {"train": [{"question_id": "0", "image_id": "a",
                       "pos_item_ids": ["P_0"]},
                      {"question_id": "1", "image_id": "missing",
                       "pos_item_ids": ["P_1"]}]}
    out = t(data)
    assert [it["image_id"] for it in out["train"]] == ["a"]
    assert out["train"][0]["img_path"].endswith("a.jpg")
    # fetcher hook: downloads the missing one
    t2 = PrepareImagesForWITData.__new__(PrepareImagesForWITData)
    t2.image_data_path = str(tmp_path)
    t2.image_name = lambda it: f"{it['image_id']}.jpg"
    t2.fetch_images = True
    t2.fetcher = lambda image_id, path: (open(path, "wb").write(b"y"), True)[1]
    out2 = t2({"train": [{"question_id": "1", "image_id": "missing",
                          "pos_item_ids": ["P_1"]}]})
    assert len(out2["train"]) == 1


def test_split_passages_for_large_scale_training():
    """Train retrieves against the full corpus; valid/test against the
    positives-only subset (reference wit_data_ops.py:1225-1271)."""
    from ravqa_tpu.data.datasets import PassageCorpus
    from ravqa_tpu.data.wit_transforms import \
        SplitWITPassagesForLargeScaleTraining
    corpus = PassageCorpus([f"P_{i}" for i in range(10)],
                           [f"text {i}" for i in range(10)])
    data = {
        "train": [{"pos_item_ids": ["P_0"]}],
        "valid": [{"pos_item_ids": ["P_3"]}],
        "test": [{"pos_item_ids": ["P_7", "P_8"]}],
        "passages": {"train_passages": corpus, "full_passages": corpus},
    }
    t = SplitWITPassagesForLargeScaleTraining.__new__(
        SplitWITPassagesForLargeScaleTraining)
    out = t(data)
    assert len(out["passages"]["train_passages"]) == 10
    assert sorted(out["passages"]["full_passages"].ids) == \
        ["P_3", "P_7", "P_8"]
    assert out["passages"]["full_passages"].content_of("P_7") == "text 7"
