"""RetrievalServer (serving.py): dynamic micro-batching correctness —
results equal direct search, concurrency-safe, padding rows invisible,
exceptions delivered not swallowed."""

import threading
import time

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
    # dispatcher-side failures surface through the future (exceptions on
    # the caller thread surface at submit() directly):
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


def test_vqa_server_end_to_end():
    """VQAServer answers concurrently-submitted questions through the live
    retrieve-then-generate path; results match direct RagExecutor.generate
    row-for-row."""
    from ravqa_tpu.data import DataPipeline
    from ravqa_tpu.data.datasets import corpus_doc_batches
    from ravqa_tpu.executors import RagConfig, RagExecutor
    from ravqa_tpu.models import T5Config, T5Model
    from ravqa_tpu.serving import VQAServer

    dp = DataPipeline({
        "raw": {"transform_name": "SyntheticOKVQA",
                "setup_kwargs": {"n_docs": 24, "n_questions": 12,
                                 "vision_dim": 8}},
        "loaders": {"transform_name": "PrepareDataloaders",
                    "input_node": "raw",
                    "setup_kwargs": {"query_maxlen": 12, "doc_maxlen": 12,
                                     "nway": 2}},
    })
    world = dp.get_data("loaders", explode=True)
    tok = world["tokenizer"]
    corpus = world["passages"]["full_passages"]
    rcfg = FLMRModelConfig.tiny(
        bert=BertConfig.tiny(vocab_size=tok.vocab_size + 8),
        vision_dim=8, prefix_len=2, dim=16, nway=2)
    retriever = FLMRRetriever(rcfg)
    rp = retriever.init(
        jax.random.PRNGKey(0),
        query_input_ids=jnp.ones((2, 12), jnp.int32),
        query_attention_mask=jnp.ones((2, 12), jnp.int32),
        image_features=jnp.ones((2, 8), jnp.float32),
        doc_input_ids=jnp.ones((4, 12), jnp.int32),
        doc_attention_mask=jnp.ones((4, 12), jnp.int32))["params"]
    gcfg = T5Config.tiny(vocab_size=tok.vocab_size + 8,
                         eos_token_id=tok.sep_token_id)
    gen = T5Model(gcfg)
    gp = gen.init(jax.random.PRNGKey(1), jnp.ones((2, 8), jnp.int32),
                  jnp.ones((2, 8), jnp.int32),
                  jnp.ones((2, 3), jnp.int32))["params"]
    fe = FLMRExecutor(retriever, rp, TrainConfig(lr=1e-3), quiet=True)
    index = fe.build_index(corpus_doc_batches(
        corpus, world["doc_tokenizer"], batch_size=8))
    ex = RagExecutor(
        retriever, rp, gen, gp, gen_tokenizer=tok,
        rag_cfg=RagConfig(n_docs=3, gen_maxlen=48, label_maxlen=4,
                          max_decode_len=4, use_lora=True, lora_rank=2),
        train_cfg=TrainConfig(lr=3e-3),
        index=index, passage_contents=corpus.contents, quiet=True)

    qt = world["query_tokenizer"]
    items = [world["train"].items[i] for i in range(4)]
    server = VQAServer(ex, qt, image_feature_dim=8,
                       config=ServeConfig(max_batch=4, max_wait_ms=10.0))
    try:
        futs = [server.submit(it["question"],
                              np.asarray(it["image_features"], np.float32))
                for it in items]
        results = [f.result(timeout=120) for f in futs]
    finally:
        server.stop()

    qi, qm = qt.tensorize([it["question"] for it in items])
    direct = ex.generate({
        "questions": [it["question"] for it in items],
        "query_input_ids": qi, "query_attention_mask": qm,
        "image_features": np.stack([it["image_features"] for it in items]),
    })
    for i, r in enumerate(results):
        assert r.answer == direct["predictions"][i]
        np.testing.assert_allclose(r.doc_scores, direct["doc_scores"][i],
                                   rtol=1e-5, atol=1e-5)
        assert len(r.passages) == 3


def test_http_server_search_and_vqa(tmp_path):
    """CLI-config-built servers behind the stdlib HTTP front end: /healthz,
    /search (retrieval config) and /answer (RAG config) round-trip JSON."""
    import json as jsonlib
    import os
    import urllib.request

    from ravqa_tpu.config import load_config
    from ravqa_tpu.main import build_server
    from ravqa_tpu.serving import make_http_server

    cfg_dir = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "configs")

    def post(port, path, obj):
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}{path}",
            data=jsonlib.dumps(obj).encode(),
            headers={"Content-Type": "application/json"})
        with urllib.request.urlopen(req, timeout=120) as r:
            return jsonlib.loads(r.read())

    for conf, path, payload, want_key in [
            ("synthetic_flmr.json", "/search", {"query": "cat dog sky"},
             "pids"),
            ("synthetic_rag.json", "/answer", {"question": "cat dog sky"},
             "answer")]:
        cfg = load_config(os.path.join(cfg_dir, conf))
        from ravqa_tpu.main import build_pipeline
        dp = build_pipeline(cfg, cache_dir=str(tmp_path / "cache"))
        data = dp.get_data(cfg.data_pipeline_output_node, explode=True)
        server = build_server(cfg, data, None, str(tmp_path))
        # build_server sheds training-only state (optimizer moments; for
        # RAG also the per-generate LoRA merge) unless
        # serve.prepare_for_serving=false
        assert server.ex.inference_only
        assert server.ex.state.opt_state == () and server.ex.tx is None
        httpd = make_http_server(server, "127.0.0.1", 0)
        port = httpd.server_address[1]
        t = threading.Thread(target=httpd.serve_forever, daemon=True)
        t.start()
        try:
            with urllib.request.urlopen(
                    f"http://127.0.0.1:{port}/healthz", timeout=30) as r:
                assert jsonlib.loads(r.read())["ok"]
            out = post(port, path, payload)
            assert want_key in out, out
            if want_key == "pids":
                assert len(out["pids"]) == 10
                assert out["contents"][0]
            else:
                assert isinstance(out["answer"], str)
                assert len(out["passages"]) >= 1
            # error paths
            try:
                post(port, path, {})
            except urllib.error.HTTPError as e:
                assert e.code == 400
        finally:
            httpd.shutdown()
            server.stop()


def test_http_server_vqa_blip2_pixels(tmp_path):
    """BLIP-2 RAG configs serve /answer end-to-end: the server fabricates
    (and accepts) raw pixel_values per request — previously generate()
    KeyError'd on every request (review finding)."""
    import json as jsonlib
    import os
    import urllib.request

    from ravqa_tpu.config import load_config
    from ravqa_tpu.main import build_pipeline, build_server
    from ravqa_tpu.serving import make_http_server

    cfg_dir = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "configs")
    cfg = load_config(os.path.join(cfg_dir, "synthetic_rag.json"))
    cfg.model_config["generator"] = {
        "type": "blip2", "num_query_tokens": 2,
        "vision": {"image_size": 28, "patch_size": 14, "hidden_size": 32,
                   "num_layers": 1, "num_heads": 2,
                   "intermediate_size": 64},
        "qformer": {"hidden_size": 32, "num_layers": 1, "num_heads": 2,
                    "intermediate_size": 64, "encoder_hidden_size": 32},
        "d_model": 32, "d_kv": 8, "d_ff": 64, "num_layers": 1,
        "num_heads": 4,
    }
    dp = build_pipeline(cfg, cache_dir=str(tmp_path / "cache"))
    data = dp.get_data(cfg.data_pipeline_output_node, explode=True)
    server = build_server(cfg, data, None, str(tmp_path))
    assert server.pixel_shape == (28, 28, 3)
    httpd = make_http_server(server, "127.0.0.1", 0)
    port = httpd.server_address[1]
    t = threading.Thread(target=httpd.serve_forever, daemon=True)
    t.start()
    try:
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/answer",
            data=jsonlib.dumps({
                "question": "cat dog sky",
                "pixel_values": np.zeros((28, 28, 3)).tolist(),
                "question_id": "q7"}).encode(),
            headers={"Content-Type": "application/json"})
        with urllib.request.urlopen(req, timeout=180) as r:
            out = jsonlib.loads(r.read())
        assert isinstance(out["answer"], str)
    finally:
        httpd.shutdown()
        server.stop()


# ---------------------------------------------------------------------------
# Robustness under load: bucketed batch shapes, bounded-queue shedding
# ---------------------------------------------------------------------------

def test_batch_buckets():
    cfg = ServeConfig(max_batch=8)
    assert cfg.buckets() == (1, 2, 4, 8)
    assert ServeConfig(max_batch=8, batch_buckets=(8,)).buckets() == (8,)
    assert ServeConfig(max_batch=6).buckets() == (1, 2, 4, 6)


def test_dispatch_pads_to_bucket(served):
    """Mixed-size bursts each pad to the smallest covering bucket, and
    every request still gets the direct-search answer."""
    server, ex, searcher, qt, passages, vdim = served
    seen = []
    orig = server.__class__._dispatch

    def spy(self, batch):
        seen.append((len(batch), self._bucket(len(batch))))
        return orig(self, batch)

    server._dispatch = spy.__get__(server)
    try:
        # lone request -> bucket 1
        r = server.submit(passages[3]).result(timeout=30)
        assert len(r.pids) == 3
        # burst of 3 -> one or more dispatches, each padded to its bucket
        futs = [server.submit(passages[i]) for i in range(3)]
        rs = [f.result(timeout=30) for f in futs]
    finally:
        del server._dispatch
    assert seen[0] == (1, 1)
    for n, b in seen:
        assert b >= n and b in (1, 2, 4, 8)
    ids, mask = qt.tensorize(passages[:3])
    q = ex.encode_queries([{"query_input_ids": ids,
                            "query_attention_mask": mask,
                            "image_features":
                                np.zeros((3, vdim), np.float32)}])
    _, pids = searcher.search(q, k=3)
    for i, r in enumerate(rs):
        np.testing.assert_array_equal(r.pids, pids[i])


def test_bounded_queue_sheds_on_overload():
    """With max_queue set, a saturated server rejects at submit() with
    ServerOverloaded instead of queueing unboundedly — and recovers once
    the backlog drains."""
    from ravqa_tpu.serving import ServerOverloaded, _MicroBatchServer

    release = threading.Event()

    class SlowServer(_MicroBatchServer):
        def submit(self, x):
            return self._enqueue((x,))

        def _dispatch(self, batch):
            release.wait(timeout=30)
            for x, fut in batch:
                fut.set_result(x)

    srv = SlowServer(ServeConfig(max_batch=1, max_wait_ms=0.0, max_queue=2))
    try:
        futs = [srv.submit(0)]          # picked up by the dispatcher, blocks
        time.sleep(0.2)
        futs += [srv.submit(1), srv.submit(2)]   # fill the queue
        with pytest.raises(ServerOverloaded):
            for i in range(3, 50):      # queue=2 -> must shed quickly
                futs.append(srv.submit(i))
        release.set()
        got = sorted(f.result(timeout=30) for f in futs)
        assert got == list(range(len(futs)))     # nothing admitted was lost
        # after draining, new submits are accepted again
        assert srv.submit(99).result(timeout=30) == 99
    finally:
        release.set()
        srv.stop()

