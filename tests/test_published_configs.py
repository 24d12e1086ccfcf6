"""Published-experiment configs run end-to-end through the CLI.

Each reference experiment config has a shipped translation in `configs/`
(reference `configs/okvqa/FLMR_base_preload_vision_features.jsonnet`,
`configs/rag/okvqa/RAG_BLIP2_with_FLMR.jsonnet`); these tests run the exact
shipped JSONs — paths pointed at a synthetic OK-VQA world and model dims
shrunk, every other published hyperparameter untouched — through
`python -m ravqa_tpu.main --mode train/test`. (`FLMR_with_ROI` and
`FLMR_WIT_pretraining` have the same coverage in test_d1_loaders.py /
test_cli.py.)
"""

import json
import os

import numpy as np
import pytest

from ravqa_tpu.config import load_config
from ravqa_tpu.main import main
from ravqa_tpu.tokenization import make_tiny_vocab

CFG_DIR = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "configs")

WORDS = ["what", "is", "the", "cat", "sign", "near", "photo", "a", "of",
         "thing", "stop", "passage", "about", "number"]


def _okvqa_world(root, vdim=16, image_size=8, with_images=False):
    """Synthetic OK-VQA + Google-Search world in the on-disk layout the
    shipped configs expect (reference data schemas: OpenEnded questions /
    mscoco annotations / GS csv corpus / GS annotation JSONs / npz feature
    stores)."""
    root.mkdir(parents=True, exist_ok=True)
    image_ids = [1, 2, 3, 4]
    rng = np.random.default_rng(0)
    for split in ("train", "test"):
        qs = [{"question_id": 1000 * (split == "test") + j,
               "image_id": image_ids[j % len(image_ids)],
               "question": "what is the cat near the sign"}
              for j in range(8)]
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
    np.savez(root / "clip_features.npz",
             **{str(i): rng.normal(size=(vdim,)).astype(np.float32)
                for i in image_ids})
    if with_images:
        np.savez(root / "images.npz",
                 **{str(i): rng.uniform(
                     0, 1, (image_size, image_size, 3)).astype(np.float32)
                    for i in image_ids})
    vocab = sorted(make_tiny_vocab(WORDS).items(), key=lambda kv: kv[1])
    (root / "vocab.txt").write_text("\n".join(t for t, _ in vocab) + "\n")


def _point_paths(cfg, root):
    dp = cfg.data_pipeline
    dp.okvqa.setup_kwargs.questions_path = {
        s: str(root / f"questions_{s}.json") for s in ("train", "test")}
    dp.okvqa.setup_kwargs.annotations_path = {
        s: str(root / f"annotations_{s}.json") for s in ("train", "test")}
    dp.corpus.setup_kwargs.passage_data_path = str(root / "corpus.csv")
    dp.annotations.setup_kwargs.annotations_path = {
        s: str(root / f"gs_{s}.json") for s in ("train", "test")}
    dp.features.setup_kwargs.features_path = str(root / "clip_features.npz")
    dp.loaders.setup_kwargs.vocab_path = str(root / "vocab.txt")
    dp.loaders.setup_kwargs.doc_maxlen = 16
    dp.loaders.setup_kwargs.nway = 2


TINY_BERT = {"vocab_size": 256, "hidden_size": 64, "num_layers": 1,
             "num_heads": 4, "intermediate_size": 128,
             "max_position_embeddings": 64}


def test_cli_flmr_base_preload_vision_features(tmp_path):
    """configs/okvqa/flmr_base.json (reference
    FLMR_base_preload_vision_features.jsonnet): preloaded CLIP features +
    GS corpus, train -> test through the CLI."""
    root = tmp_path / "data"
    _okvqa_world(root)
    cfg = load_config(os.path.join(CFG_DIR, "okvqa", "flmr_base.json"))
    _point_paths(cfg, root)
    cfg.model_config.bert = TINY_BERT
    cfg.model_config.vision_embedding_size = 16
    cfg.model_config.mapping_network_prefix_length = 2
    cfg.model_config.num_negative_samples = 1
    cfg.train.update({"batch_size": 4, "total_steps": 3, "log_every": 2,
                      "val_every": 0})
    cfg.metrics = {"Ks": [1, 5]}
    p = tmp_path / "cfg.json"
    p.write_text(json.dumps(cfg.to_dict()))
    log_dir = str(tmp_path / "exp")
    assert main(["--config", str(p), "--mode", "train",
                 "--experiment_name", "fb", "--log_dir", log_dir]) == 0
    assert main(["--config", str(p), "--mode", "test",
                 "--experiment_name", "fb", "--log_dir", log_dir]) == 0
    metrics = json.load(open(os.path.join(log_dir, "fb",
                                          "test_metrics.json")))
    assert "pos_item_ids_recall_at_5" in metrics


@pytest.mark.slow
def test_cli_rag_blip2_with_flmr(tmp_path):
    """configs/okvqa/rag_blip2_with_flmr.json (reference
    RAG_BLIP2_with_FLMR.jsonnet, the RAVQA-v2 headline recipe): BLIP-2
    generator over live FLMR retrieval with LoRA, Approach6 labels, the
    published loss ratios and accumulation — train -> test through the
    CLI with only dims shrunk."""
    root = tmp_path / "data"
    _okvqa_world(root, with_images=True)
    cfg = load_config(os.path.join(CFG_DIR, "okvqa",
                                   "rag_blip2_with_flmr.json"))
    _point_paths(cfg, root)
    cfg.data_pipeline.images.setup_kwargs.features_path = \
        str(root / "images.npz")
    mc = cfg.model_config
    mc.bert = TINY_BERT
    mc.num_negative_samples = 1
    mc.vision_embedding_size = 16
    mc.mapping_network_prefix_length = 2
    mc.dim = 16
    gen = mc.generator
    gen.num_query_tokens = 2
    gen.vision = {"image_size": 8, "patch_size": 4, "hidden_size": 16,
                  "num_layers": 1, "num_heads": 2, "intermediate_size": 32}
    gen.qformer = {"hidden_size": 16, "num_layers": 1, "num_heads": 2,
                   "intermediate_size": 32, "encoder_hidden_size": 16}
    gen.t5 = {"d_model": 32, "d_kv": 8, "d_ff": 64, "num_layers": 1,
              "num_decoder_layers": 1, "num_heads": 2,
              "feed_forward_proj": "gated-gelu"}
    mc.rag.update({"n_docs": 2, "gen_maxlen": 48, "label_maxlen": 4,
                   "max_decode_len": 4, "num_beams": 2, "lora_rank": 2})
    cfg.train.update({"batch_size": 2, "total_steps": 2, "log_every": 1,
                      "accumulate_grad_batches": 2})
    cfg.metrics = {"Ks": [1, 5]}
    p = tmp_path / "cfg.json"
    p.write_text(json.dumps(cfg.to_dict()))
    log_dir = str(tmp_path / "exp")
    assert main(["--config", str(p), "--mode", "train",
                 "--experiment_name", "rb", "--log_dir", log_dir]) == 0
    assert main(["--config", str(p), "--mode", "test",
                 "--experiment_name", "rb", "--log_dir", log_dir]) == 0
    metrics = json.load(open(os.path.join(log_dir, "rb",
                                          "test_rag_metrics.json")))
    assert "vqa_accuracy" in metrics and "exact_match" in metrics
