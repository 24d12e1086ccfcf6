"""Checkpoint manager + early stopping semantics."""

import os

import numpy as np

from ravqa_tpu.executors.callbacks import CheckpointManager, EarlyStopping


class FakeExecutor:
    def save_checkpoint(self, path):
        os.makedirs(path, exist_ok=True)
        open(os.path.join(path, "params.msgpack"), "w").write("x")


def test_checkpoint_manager_keeps_top_k(tmp_path):
    cm = CheckpointManager(str(tmp_path), monitor="recall_at_5", mode="max",
                           save_top_k=2, save_last=True)
    ex = FakeExecutor()
    assert cm.on_validation(ex, {"recall_at_5": 0.5}, 10) is True
    assert cm.on_validation(ex, {"recall_at_5": 0.7}, 20) is True
    assert cm.on_validation(ex, {"recall_at_5": 0.6}, 30) is False
    # 0.5 checkpoint evicted
    kept = sorted(d for d in os.listdir(tmp_path) if d.startswith("step"))
    assert kept == ["step_20", "step_30"]
    assert cm.best_value == 0.7
    assert os.path.exists(tmp_path / "last")
    # worse value than current worst: not saved
    assert cm.on_validation(ex, {"recall_at_5": 0.55}, 40) is False
    assert not os.path.exists(tmp_path / "step_40")


def test_early_stopping():
    es = EarlyStopping(monitor="recall", mode="max", patience=2)
    vals = [0.5, 0.6, 0.55, 0.58, 0.59]  # no improvement after 0.6
    stops = [es.update({"recall": v}) for v in vals]
    assert stops == [False, False, False, False, True]


def test_early_stopping_min_mode():
    es = EarlyStopping(monitor="loss", mode="min", patience=1)
    assert not es.update({"loss": 1.0})
    assert not es.update({"loss": 0.9})
    assert not es.update({"loss": 0.95})
    assert es.update({"loss": 0.95})
