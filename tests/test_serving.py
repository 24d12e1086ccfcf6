"""RetrievalServer (serving.py): dynamic micro-batching correctness —
results equal direct search, concurrency-safe, padding rows invisible,
exceptions delivered not swallowed."""

import threading

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from ravqa_tpu.executors import FLMRExecutor, TrainConfig
from ravqa_tpu.models import BertConfig, FLMRModelConfig, FLMRRetriever
from ravqa_tpu.retrieval import LateInteractionSearcher
from ravqa_tpu.serving import RetrievalResult, RetrievalServer, ServeConfig
from ravqa_tpu.tokenization import (DocTokenizer, QueryTokenizer,
                                    WordPieceTokenizer, make_tiny_vocab)

WORDS = ["cat", "dog", "sky", "sun", "tree", "fish", "bird", "car", "red",
         "blue", "big", "old", "hot", "wet", "sad", "fast", "tall", "round"]


@pytest.fixture(scope="module")
def served():
    rng = np.random.default_rng(0)
    vocab = make_tiny_vocab(WORDS)
    tok = WordPieceTokenizer(vocab)
    qt = QueryTokenizer(tok, query_maxlen=12)
    dt = DocTokenizer(tok, doc_maxlen=12)
    n_docs = 32
    passages = [" ".join(rng.choice(WORDS, size=4, replace=False))
                for _ in range(n_docs)]
    vision_dim = 8
    cfg = FLMRModelConfig.tiny(
        bert=BertConfig.tiny(vocab_size=tok.vocab_size + 10),
        vision_dim=vision_dim, prefix_len=2, dim=16, nway=2)
    model = FLMRRetriever(cfg)
    qi, qm = qt.tensorize(passages[:2])
    di, dm = dt.tensorize(passages[:4])
    params = model.init(
        jax.random.PRNGKey(0),
        query_input_ids=jnp.array(qi), query_attention_mask=jnp.array(qm),
        image_features=jnp.zeros((2, vision_dim), jnp.float32),
        doc_input_ids=jnp.array(di),
        doc_attention_mask=jnp.array(dm))["params"]
    ex = FLMRExecutor(model, params, TrainConfig(lr=1e-4), quiet=True)
    di, dm = dt.tensorize(passages)
    # TokenIndex pids are integers; string corpus ids (e.g. "GS_...") map
    # at the corpus layer — id2content is keyed by whatever search returns
    pids = list(range(n_docs))
    index = ex.build_index([{"doc_input_ids": di,
                             "doc_attention_mask": dm}], pids=pids)
    searcher = LateInteractionSearcher(index, use_pallas=False)
    server = RetrievalServer(
        ex, searcher, qt, image_feature_dim=vision_dim,
        id2content=dict(zip(pids, passages)),
        config=ServeConfig(max_batch=8, max_wait_ms=5.0, k=3))
    yield server, ex, searcher, qt, passages, vision_dim
    server.stop()


def test_single_request_matches_direct_search(served):
    server, ex, searcher, qt, passages, vdim = served
    text = passages[5]
    res = server.submit(text).result(timeout=30)
    assert isinstance(res, RetrievalResult)
    # direct path: same tokenize -> encode -> search
    ids, mask = qt.tensorize([text])
    q = ex.encode_queries([{"query_input_ids": ids,
                            "query_attention_mask": mask,
                            "image_features":
                                np.zeros((1, vdim), np.float32)}])
    _, pids = searcher.search(q, k=3)
    np.testing.assert_array_equal(res.pids, pids[0])
    assert res.contents[0] in passages


def test_concurrent_submits_batched_and_correct(served):
    server, ex, searcher, qt, passages, vdim = served
    texts = [passages[i] for i in range(16)]
    results = [None] * 16

    def worker(i):
        results[i] = server.submit(texts[i]).result(timeout=30)

    threads = [threading.Thread(target=worker, args=(i,)) for i in range(16)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    # every request answered; each against the direct path
    ids, mask = qt.tensorize(texts)
    q = ex.encode_queries([{"query_input_ids": ids,
                            "query_attention_mask": mask,
                            "image_features":
                                np.zeros((16, vdim), np.float32)}])
    _, pids = searcher.search(q, k=3)
    for i, r in enumerate(results):
        np.testing.assert_array_equal(r.pids, pids[i])


def test_search_batch_wrapper(served):
    server, _, _, _, passages, _ = served
    out = server.search_batch(passages[:5])
    assert len(out) == 5
    assert all(len(r.pids) == 3 for r in out)


def test_dispatch_exception_delivered(served):
    server, *_ = served
    bad = object()

    class Boom:
        def tensorize(self, texts):
            raise ValueError("tokenizer boom")

    # exceptions on the caller thread surface at submit();
    # dispatcher-side failures surface through the future:
    orig = server.searcher
    try:
        class BadSearcher:
            index = orig.index

            def search_device(self, q, k):
                raise RuntimeError("searcher boom")
        server.searcher = BadSearcher()
        fut = server.submit("cat dog")
        with pytest.raises(RuntimeError, match="searcher boom"):
            fut.result(timeout=30)
    finally:
        server.searcher = orig
    # server still alive after the failure
    res = server.submit("cat dog").result(timeout=30)
    assert len(res.pids) == 3
