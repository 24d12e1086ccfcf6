"""Background-thread input prefetching (data/prefetch.py) — the reference
DataLoader num_workers equivalent (common_data_opts.py:152-199)."""

import time

import numpy as np
import jax.numpy as jnp
import pytest

from ravqa_tpu.data import prefetch, prefetch_to_device


def test_order_and_completeness():
    src = [{"x": np.full((2, 2), i)} for i in range(20)]
    out = list(prefetch(iter(src), size=3))
    assert len(out) == 20
    for i, b in enumerate(out):
        np.testing.assert_array_equal(b["x"], np.full((2, 2), i))


def test_exception_propagates():
    def gen():
        yield {"x": np.zeros(2)}
        raise RuntimeError("boom in producer")

    it = prefetch(gen(), size=2)
    next(it)
    with pytest.raises(RuntimeError, match="boom in producer"):
        next(it)


def test_early_consumer_exit_stops_producer():
    produced = []

    def gen():
        for i in range(1000):
            produced.append(i)
            yield i

    it = prefetch(gen(), size=2)
    for _ in range(3):
        next(it)
    it.close()                     # consumer walks away
    time.sleep(0.3)
    n = len(produced)
    time.sleep(0.2)
    assert len(produced) == n      # producer stopped (bounded + stop event)
    assert n < 1000


def test_transform_runs_on_producer():
    import threading
    main = threading.get_ident()
    seen = []

    def tf(b):
        seen.append(threading.get_ident())
        return b * 2

    out = list(prefetch(iter([1, 2, 3]), size=2, transform=tf))
    assert out == [2, 4, 6]
    assert all(t != main for t in seen)


def test_prefetch_to_device_plain():
    src = [{"x": np.arange(4, dtype=np.int32)} for _ in range(4)]
    out = list(prefetch_to_device(iter(src), size=2))
    assert all(isinstance(b["x"], jnp.ndarray) for b in out)


def test_prefetch_to_device_sharded():
    from ravqa_tpu.parallel import make_mesh
    mesh = make_mesh({"data": 8})
    src = [{"x": np.zeros((16, 4), np.float32)} for _ in range(3)]
    out = list(prefetch_to_device(iter(src), size=2, mesh=mesh))
    for b in out:
        shard_shapes = {s.data.shape for s in b["x"].addressable_shards}
        assert shard_shapes == {(2, 4)}     # dim-0 sharded over 8 devices


def test_fit_with_prefetched_batches():
    """End-to-end: executor fit() over a prefetched sharded stream."""
    from ravqa_tpu.executors import FLMRExecutor, TrainConfig
    from ravqa_tpu.models import BertConfig, FLMRModelConfig, FLMRRetriever
    from ravqa_tpu.parallel import make_mesh
    import jax

    mesh = make_mesh({"data": 8})
    cfg = FLMRModelConfig(
        bert=BertConfig(vocab_size=128, hidden_size=32, num_layers=1,
                        num_heads=2, intermediate_size=64,
                        max_position_embeddings=32),
        dim=16, vision_dim=8, prefix_len=2, nway=2, use_ib_negatives=True)
    model = FLMRRetriever(cfg)
    rng = np.random.default_rng(0)

    def batches(n):
        for _ in range(n):
            yield dict(
                query_input_ids=rng.integers(1, 128, (8, 8)).astype(np.int32),
                query_attention_mask=np.ones((8, 8), np.int32),
                image_features=rng.normal(size=(8, 8)).astype(np.float32),
                doc_input_ids=rng.integers(1, 128, (16, 12)).astype(np.int32),
                doc_attention_mask=np.ones((16, 12), np.int32),
            )

    batch0 = next(batches(1))
    params = model.init(jax.random.PRNGKey(0), **batch0)["params"]
    ex = FLMRExecutor(model, params, TrainConfig(lr=1e-3), mesh=mesh,
                      quiet=True)
    metrics = ex.fit(prefetch_to_device(batches(4), size=2, mesh=mesh),
                     steps=4, log_every=4)
    assert np.isfinite(metrics["loss"])


def test_fit_closes_abandoned_prefetch_iterator():
    """fit(steps=N) over a longer prefetch stream must stop the daemon
    producer deterministically (ADVICE r2: an abandoned iterator parked
    the producer holding device-resident batches until GC)."""
    import threading
    import time as _time

    from ravqa_tpu.executors.base import BaseExecutor, TrainConfig

    produced = []
    released = threading.Event()

    def source():
        for i in range(100):
            produced.append(i)
            yield {"x": np.ones((2, 2), np.float32) * i}
        released.set()

    class NoopExecutor(BaseExecutor):
        def __init__(self):       # bypass model machinery
            self.mesh = None
            self.logger = type("L", (), {"log": lambda *a, **k: None})()
            self.state = type("S", (), {"step": 0})()

        def train_step(self, batch):
            return {"loss": 0.0}

    it = prefetch(source(), size=2)
    before = threading.active_count()
    NoopExecutor().fit(it, steps=3, log_every=1000)
    # the producer must wind down promptly without the stream having been
    # exhausted (far fewer than 100 batches pulled)
    deadline = _time.time() + 5.0
    while threading.active_count() > before - 1 and _time.time() < deadline:
        _time.sleep(0.05)
    assert len(produced) < 100
    assert not released.is_set()
    assert threading.active_count() <= before
