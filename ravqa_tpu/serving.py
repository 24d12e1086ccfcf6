"""Production serving: dynamic micro-batching over the jitted paths.

The reference has no serving layer (its searcher is a single-process
Python loop, searcher.py:120-132); this is the deployment counterpart the
TPU design makes natural: ONE compiled program per stage at a fixed batch
shape, fed by a micro-batcher that coalesces concurrent requests.

Two servers share the dispatcher:
- **RetrievalServer** — encode query -> late-interaction search -> top-k
  passages.
- **VQAServer** — the full RAVQA product: retrieve -> generate -> answer
  selected by joint doc/generation score (RagExecutor.generate).

Design (TPU-first):
- **Static shapes, bucketed**: each dispatch pads to the smallest
  compiled batch bucket covering it (powers of two up to `max_batch` by
  default), so a lone low-load request runs a batch-1 executable instead
  of a 32-wide one, while the executables never recompile after their
  first hit. Padding rows reuse request 0's tokens (their results are
  discarded) — cheaper than a separate mask path through the kernels.
- **Load shedding**: with `max_queue` set, a full queue rejects at
  admission (`ServerOverloaded`, HTTP 503) — bounded worst-case latency
  under overload instead of an unbounded backlog.
- **Batching window**: the dispatcher thread collects up to `max_batch`
  requests or waits at most `max_wait_ms` (classic dynamic batching —
  bounded added latency, amortized MXU occupancy). Under full load the
  window never triggers; at low load single requests pay <= max_wait_ms.
- **Host work off the hot path**: tokenization (C++ WordPiece fast path
  when built) happens on the caller's thread at submit(); the dispatcher
  only stacks arrays and runs device code. Device intermediates stay on
  device between stages — only the final small arrays are fetched.
- **Thread-safe**: submit() from any number of threads; results delivered
  through per-request futures.
"""

from __future__ import annotations

import dataclasses
import queue
import threading
import time
from concurrent.futures import Future
from typing import Optional, Sequence

import numpy as np


@dataclasses.dataclass
class ServeConfig:
    max_batch: int = 32        # largest compiled batch shape (pad target)
    max_wait_ms: float = 2.0   # batching window at low load
    k: int = 10                # top-k passages per query (retrieval)
    max_queue: int = 0         # bounded request queue; 0 = unbounded.
    #   When full, submit() raises ServerOverloaded immediately (load
    #   shedding at admission — callers/LBs retry elsewhere) instead of
    #   letting latency grow without bound.
    batch_buckets: Optional[tuple] = None
    #   Compiled batch-shape buckets: each dispatch pads to the SMALLEST
    #   bucket >= its size instead of always max_batch (a lone request at
    #   low load runs the bucket-1 executable, not a 32-wide one). None ->
    #   powers of two up to max_batch (1,2,4,...,max_batch). One
    #   executable compiles per bucket actually hit (first hit pays the
    #   compile); pass (max_batch,) to keep the single-shape behavior.

    def buckets(self) -> tuple:
        if self.batch_buckets:
            bs = tuple(sorted(set(int(b) for b in self.batch_buckets)))
            assert bs[-1] >= self.max_batch, \
                "largest bucket must cover max_batch"
            return bs
        out, b = [], 1
        while b < self.max_batch:
            out.append(b)
            b *= 2
        out.append(self.max_batch)
        return tuple(out)


class ServerOverloaded(RuntimeError):
    """Raised by submit() when the bounded request queue is full."""


@dataclasses.dataclass
class RetrievalResult:
    pids: np.ndarray           # (k,) passage ids
    scores: np.ndarray         # (k,) MaxSim scores
    contents: Optional[list] = None


@dataclasses.dataclass
class VQAResult:
    answer: str
    doc_scores: np.ndarray     # (n_docs,) retrieval scores
    passages: Optional[list] = None   # retrieved contents


class _MicroBatchServer:
    """Bounded-window micro-batching dispatcher; subclasses implement
    `_dispatch(batch)` where batch is a list of (payload..., future)."""

    def __init__(self, config: Optional[ServeConfig] = None):
        self.cfg = config if config is not None else ServeConfig()
        self._q: queue.Queue = queue.Queue(maxsize=self.cfg.max_queue)
        self._buckets = self.cfg.buckets()
        self._stop = threading.Event()
        self._thread = threading.Thread(target=self._loop, daemon=True)
        self._thread.start()

    def _enqueue(self, item) -> Future:
        fut: Future = Future()
        try:
            self._q.put_nowait(item + (fut,))
        except queue.Full:
            # shed at admission: the caller learns IMMEDIATELY that the
            # server is saturated (LBs retry elsewhere) instead of queueing
            # into unbounded latency
            raise ServerOverloaded(
                f"request queue full ({self.cfg.max_queue})")
        return fut

    def _bucket(self, n: int) -> int:
        """Smallest compiled batch bucket covering n requests."""
        for b in self._buckets:
            if b >= n:
                return b
        return self._buckets[-1]

    def stop(self):
        self._stop.set()
        self._thread.join(timeout=5.0)
        # fail queued-but-uncollected requests instead of leaving their
        # futures pending (callers blocked in fut.result would otherwise
        # stall until their timeout)
        while True:
            try:
                item = self._q.get_nowait()
            except queue.Empty:
                break
            fut = item[-1]
            if isinstance(fut, Future) and not fut.done():
                fut.set_exception(RuntimeError("server stopped"))

    def _collect(self):
        """Block for the first request, then fill up to max_batch within
        the max_wait_ms window."""
        try:
            first = self._q.get(timeout=0.1)
        except queue.Empty:
            return []
        batch = [first]
        deadline = time.perf_counter() + self.cfg.max_wait_ms / 1e3
        while len(batch) < self.cfg.max_batch:
            left = deadline - time.perf_counter()
            if left <= 0:
                break
            try:
                batch.append(self._q.get(timeout=left))
            except queue.Empty:
                break
        return batch

    def _loop(self):
        while not self._stop.is_set():
            batch = self._collect()
            if not batch:
                continue
            try:
                self._dispatch(batch)
            except BaseException as e:          # deliver, don't kill loop
                for *_, fut in batch:
                    if not fut.done():
                        fut.set_exception(e)

    def _dispatch(self, batch):                 # pragma: no cover
        raise NotImplementedError


class RetrievalServer(_MicroBatchServer):
    """Micro-batching server over (query tokenizer, FLMR executor,
    LateInteractionSearcher).

    serve = RetrievalServer(executor, searcher, query_tokenizer,
                            image_feature_dim=768)
    fut = serve.submit("what is the capital of france?", image_features=feat)
    result = fut.result()      # RetrievalResult
    """

    def __init__(self, executor, searcher, query_tokenizer,
                 image_feature_dim: int = 0,
                 id2content: Optional[dict] = None,
                 pixel_shape: Optional[tuple] = None,
                 config: Optional[ServeConfig] = None):
        """id2content: optional {passage_id: text} map (pids may be strings
        like the GoogleSearch 'GS_...' ids) — results carry contents when
        given. pixel_shape: (H, W, 3) for in-graph-vision retrievers (raw
        pixels ride with each request instead of precomputed features)."""
        self.ex = executor
        self.searcher = searcher
        self.qt = query_tokenizer
        self.image_feature_dim = image_feature_dim
        self.id2content = id2content
        self.pixel_shape = pixel_shape
        super().__init__(config)

    # -- client side --------------------------------------------------------
    def submit(self, text: str,
               image_features: Optional[np.ndarray] = None,
               pixel_values: Optional[np.ndarray] = None) -> Future:
        """Tokenize on the caller's thread, enqueue, return a Future."""
        ids, mask = self.qt.tensorize([text])
        if image_features is None and self.image_feature_dim:
            image_features = np.zeros((self.image_feature_dim,), np.float32)
        if pixel_values is None and self.pixel_shape is not None:
            pixel_values = np.zeros(self.pixel_shape, np.float32)
        return self._enqueue(
            (np.asarray(ids)[0], np.asarray(mask)[0],
             (None if image_features is None
              else np.asarray(image_features, np.float32)),
             (None if pixel_values is None
              else np.asarray(pixel_values, np.float32))))

    def search_batch(self, texts: Sequence[str],
                     image_features: Optional[np.ndarray] = None
                     ) -> list[RetrievalResult]:
        """Blocking convenience wrapper."""
        feats = ([None] * len(texts) if image_features is None
                 else list(image_features))
        futs = [self.submit(t, f) for t, f in zip(texts, feats)]
        return [f.result() for f in futs]

    # -- dispatcher ---------------------------------------------------------
    def _dispatch(self, batch):
        n = len(batch)
        pad = self._bucket(n) - n
        ids = np.stack([b[0] for b in batch] + [batch[0][0]] * pad)
        mask = np.stack([b[1] for b in batch] + [batch[0][1]] * pad)
        enc = {"query_input_ids": ids, "query_attention_mask": mask}
        if self.image_feature_dim:
            zero = np.zeros((self.image_feature_dim,), np.float32)
            feats = np.stack(
                [b[2] if b[2] is not None else zero for b in batch]
                + [zero] * pad)
            enc["image_features"] = feats
        if self.pixel_shape is not None:
            zero = np.zeros(self.pixel_shape, np.float32)
            enc["pixel_values"] = np.stack(
                [b[3] if b[3] is not None else zero for b in batch]
                + [zero] * pad)
        # keep the encoded queries ON DEVICE between the two jitted
        # programs (encode_queries would np.asarray the (B, Lq, dim)
        # embeddings — a full host round-trip per dispatch); only the tiny
        # (B, k) result is fetched
        import jax.numpy as jnp
        q = self.ex._encode_query(
            self.ex.state.params,
            jnp.asarray(enc["query_input_ids"]),
            jnp.asarray(enc["query_attention_mask"]),
            (jnp.asarray(enc["image_features"])
             if "image_features" in enc else None),
            (jnp.asarray(enc["pixel_values"])
             if "pixel_values" in enc else None), None)
        scores, rows = self.searcher.search_device(q, self.cfg.k)
        scores = np.asarray(scores)
        pids = self.searcher.index.pids[np.asarray(rows)]
        for i, (*_, fut) in enumerate(batch):
            res = RetrievalResult(
                pids=pids[i], scores=scores[i],
                contents=([self.id2content.get(p, "")
                           for p in pids[i].tolist()]
                          if self.id2content is not None else None))
            fut.set_result(res)


class VQAServer(_MicroBatchServer):
    """End-to-end VQA serving: retrieve-then-generate through a
    RagExecutor (live retrieval + greedy/beam decode + joint answer pick
    — the deployment form of the reference's RagModelForBlip.generate,
    rag_model_blip.py:735-824).

    serve = VQAServer(rag_executor, query_tokenizer, image_feature_dim=768)
    ans = serve.submit("what animal is this?", image_features=f).result()
    ans.answer, ans.passages, ans.doc_scores
    """

    def __init__(self, rag_executor, query_tokenizer,
                 image_feature_dim: int = 0,
                 pixel_shape: Optional[tuple] = None,
                 config: Optional[ServeConfig] = None):
        """pixel_shape: (H, W, 3) when the generator is BLIP-2 (raw image
        pixels ride with each request); None for text-only generators."""
        self.ex = rag_executor
        self.qt = query_tokenizer
        self.image_feature_dim = image_feature_dim
        self.pixel_shape = pixel_shape
        super().__init__(config if config is not None
                         else ServeConfig(max_batch=8))

    def submit(self, question: str,
               image_features: Optional[np.ndarray] = None,
               pixel_values: Optional[np.ndarray] = None,
               question_id=None) -> Future:
        """question_id: pass the dataset question id when the executor uses
        STATIC retrieval (the precomputed map is keyed by it; unknown/None
        ids fall back to the reference's dummy-passage behavior)."""
        ids, mask = self.qt.tensorize([question])
        if image_features is None and self.image_feature_dim:
            image_features = np.zeros((self.image_feature_dim,), np.float32)
        if pixel_values is None and self.pixel_shape is not None:
            pixel_values = np.zeros(self.pixel_shape, np.float32)
        return self._enqueue(
            (question, np.asarray(ids)[0], np.asarray(mask)[0],
             (None if image_features is None
              else np.asarray(image_features, np.float32)),
             (None if pixel_values is None
              else np.asarray(pixel_values, np.float32)),
             question_id))

    def answer_batch(self, questions: Sequence[str],
                     image_features: Optional[np.ndarray] = None
                     ) -> list[VQAResult]:
        feats = ([None] * len(questions) if image_features is None
                 else list(image_features))
        futs = [self.submit(t, f) for t, f in zip(questions, feats)]
        return [f.result() for f in futs]

    def _dispatch(self, batch):
        n = len(batch)
        pad = self._bucket(n) - n
        rows = batch + [batch[0]] * pad
        gen_batch = {
            "questions": [r[0] for r in rows],
            # static-retrieval executors key their map by question_id;
            # None ids take the dummy-passage fallback
            "question_ids": [r[5] for r in rows],
            "query_input_ids": np.stack([r[1] for r in rows]),
            "query_attention_mask": np.stack([r[2] for r in rows]),
        }
        if self.image_feature_dim:
            zero = np.zeros((self.image_feature_dim,), np.float32)
            gen_batch["image_features"] = np.stack(
                [r[3] if r[3] is not None else zero for r in rows])
        if self.pixel_shape is not None:
            zero = np.zeros(self.pixel_shape, np.float32)
            gen_batch["pixel_values"] = np.stack(
                [r[4] if r[4] is not None else zero for r in rows])
        out = self.ex.generate(gen_batch)
        for i, (*_, fut) in enumerate(batch):
            fut.set_result(VQAResult(
                answer=out["predictions"][i],
                doc_scores=np.asarray(out["doc_scores"])[i],
                passages=(out["retrieved_contents"][i]
                          if out.get("retrieved_contents") is not None
                          else None)))


# ---------------------------------------------------------------------------
# HTTP front end (stdlib-only): JSON over POST, for deployment behind any
# standard load balancer. GET /healthz; POST /search (RetrievalServer);
# POST /answer (VQAServer).
# ---------------------------------------------------------------------------

def make_http_server(server, host: str = "0.0.0.0", port: int = 8080):
    """Wrap a RetrievalServer or VQAServer in a ThreadingHTTPServer.

    Returns the http.server instance — call .serve_forever() (blocking)
    or run it on a thread and .shutdown() to stop. Request threads block
    on the micro-batcher's futures, so concurrent HTTP requests batch
    together on the TPU exactly like direct submit() callers.
    """
    import json
    from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

    is_vqa = isinstance(server, VQAServer)

    class Handler(BaseHTTPRequestHandler):
        def log_message(self, *a):                    # quiet access log
            pass

        def _json(self, code: int, obj):
            body = json.dumps(obj).encode()
            self.send_response(code)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def do_GET(self):
            if self.path == "/healthz":
                self._json(200, {"ok": True,
                                 "mode": "vqa" if is_vqa else "retrieval"})
            else:
                self._json(404, {"error": "not found"})

        def do_POST(self):
            try:
                n = int(self.headers.get("Content-Length", 0))
                req = json.loads(self.rfile.read(n) or b"{}")
            except (ValueError, json.JSONDecodeError):
                return self._json(400, {"error": "bad json"})
            try:
                def arr(key):
                    v = req.get(key)
                    return None if v is None else np.asarray(v, np.float32)
                if self.path == "/search" and not is_vqa:
                    res = server.submit(
                        req["query"], arr("image_features"),
                        arr("pixel_values")).result(
                            timeout=req.get("timeout_s", 60))
                    return self._json(200, {
                        "pids": np.asarray(res.pids).tolist(),
                        "scores": np.asarray(res.scores,
                                             np.float64).tolist(),
                        "contents": res.contents})
                if self.path == "/answer" and is_vqa:
                    res = server.submit(
                        req["question"], arr("image_features"),
                        arr("pixel_values"),
                        question_id=req.get("question_id")).result(
                            timeout=req.get("timeout_s", 120))
                    return self._json(200, {
                        "answer": res.answer,
                        "doc_scores": np.asarray(res.doc_scores,
                                                 np.float64).tolist(),
                        "passages": res.passages})
                return self._json(404, {"error": "not found"})
            except KeyError as e:
                return self._json(400, {"error": f"missing field {e}"})
            except ServerOverloaded as e:              # shed -> retry later
                return self._json(503, {"error": str(e)})
            except Exception as e:                     # surface, don't die
                return self._json(500, {"error": str(e)})

    return ThreadingHTTPServer((host, port), Handler)
