"""Observability: logger backends (jsonl/tensorboard) + prediction tables
(reference wandb.Table schema, FLMR_executor.py:897-973)."""

import json
import os

import pytest

from ravqa_tpu.executors.base import MetricsLogger
from ravqa_tpu.utils.tables import (build_prediction_table,
                                    save_prediction_table, table_columns)


def test_jsonl_backend(tmp_path):
    lg = MetricsLogger(str(tmp_path), quiet=True)
    lg.log({"loss": 1.5}, step=3, prefix="train/")
    lines = [json.loads(l) for l in open(tmp_path / "metrics.jsonl")]
    assert lines[0]["train/loss"] == 1.5 and lines[0]["step"] == 3
    assert lg.history[0]["train/loss"] == 1.5


def test_tensorboard_backend(tmp_path):
    pytest.importorskip("tensorboardX")
    lg = MetricsLogger(str(tmp_path), quiet=True,
                       backends=("jsonl", "tensorboard"))
    lg.log({"recall_at_5": 0.8}, step=10, prefix="valid/")
    tb_dir = tmp_path / "tb"
    assert tb_dir.exists() and any(tb_dir.iterdir())   # event file written


def test_wandb_backend_gracefully_absent(tmp_path):
    lg = MetricsLogger(str(tmp_path), quiet=True, backends=("wandb",))
    assert lg._wandb_run is None
    lg.log({"x": 1.0}, step=0)                          # must not raise


def test_prediction_table_schema(tmp_path):
    items = [{"question_id": "7", "question": "what is it",
              "answers": ["cat", "feline"], "gold_answer": "cat",
              "img_caption": "a cat photo", "image_id": 42,
              "img_path": "/data/COCO_42.jpg"}]
    contents = [["the cat sat", "dogs only"]]
    cols, rows = build_prediction_table(items, contents, max_k=3)
    assert cols == table_columns(3)
    row = dict(zip(cols, rows[0]))
    assert row["question_id"] == "7"
    assert row["input_image"] == "COCO_42.jpg"
    assert row["caption"] == "a cat photo"
    assert row["p_0"] == "true|the cat sat"      # answer string matched
    assert row["p_1"] == "false|dogs only"
    assert row["p_2"] == ""                      # fewer than max_k retrieved
    # image-artifact hook (log_prediction_tables_with_images equivalent)
    cols2, rows2 = build_prediction_table(
        items, contents, max_k=1, image_loader=lambda it: f"IMG:{it['image_id']}")
    assert dict(zip(cols2, rows2[0]))["input_image"] == "IMG:42"

    save_prediction_table(str(tmp_path / "t.jsonl"), cols, rows)
    rec = json.loads(open(tmp_path / "t.jsonl").readline())
    assert rec["gold_answer"] == "cat"


def test_cli_eval_writes_prediction_table(tmp_path):
    from ravqa_tpu.main import main
    cfg = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "configs", "synthetic_flmr.json")
    log_dir = str(tmp_path / "exp")
    assert main(["--config", cfg, "--mode", "train",
                 "--experiment_name", "obs", "--log_dir", log_dir,
                 "--opts", "train.total_steps=2", "train.log_every=2",
                 "train.batch_size=4",
                 "train.logger_backends=['jsonl','tensorboard']"]) == 0
    assert main(["--config", cfg, "--mode", "test",
                 "--experiment_name", "obs", "--log_dir", log_dir]) == 0
    exp = os.path.join(log_dir, "obs")
    table = [json.loads(l)
             for l in open(os.path.join(exp, "test_prediction_table.jsonl"))]
    assert table and table[0]["p_0"].split("|")[0] in ("true", "false")
    assert os.path.isdir(os.path.join(exp, "tb"))
