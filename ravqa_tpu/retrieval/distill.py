"""Cross-encoder distillation scorer.

TPU-native equivalent of the reference's distillation subsystem
(/root/reference/third_party/ColBERT/colbert/distillation/scorer.py:1-70 and
ranking_scorer.py:1-60): score (qid, pid) pairs with a cross-encoder teacher
and emit per-qid `distillation_scores.json` lines consumed by triples-based
KD training.

Design differences from the reference (deliberate, TPU-first):
- The reference spawns one torch process per GPU (Scorer.launch -> Launcher)
  and loops CUDA mini-batches; here scoring is ONE jitted Flax forward per
  (bsize, seqlen-bucket) — recompiles are bounded by padding sequence length
  to power-of-two buckets, and multi-chip scale-out is `jax.pmap`-free SPMD
  handled by the caller's mesh, not process spawning.
- The reference left a "LONG-TERM TODO: sort by length in advance"
  (scorer.py:70) — done here: pairs are scored in length-sorted order so
  bucket occupancy is tight, then unsorted back.
"""

from __future__ import annotations

import json
from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ..models.reranker import (CrossEncoderReranker, RerankerConfig,
                               RerankerTokenizer)


def _bucket(n: int, lo: int = 32) -> int:
    b = lo
    while b < n:
        b *= 2
    return b


class Scorer:
    """Batched cross-encoder scoring of (query, passage) pairs."""

    def __init__(self, model: CrossEncoderReranker, params,
                 tokenizer: RerankerTokenizer, bsize: int = 256):
        self.model = model
        self.params = params
        self.tokenizer = tokenizer
        self.bsize = bsize
        self._apply = jax.jit(
            lambda p, ids, mask, tt: model.apply(
                {"params": p}, ids, mask, tt))

    def score_pairs(self, questions: Sequence[str],
                    passages: Sequence[str]) -> np.ndarray:
        assert len(questions) == len(passages)
        n = len(questions)
        if n == 0:
            return np.zeros((0,), np.float32)
        # length-sort for tight bucket packing, un-sort at the end
        lens = np.array([len(q) + len(p)
                         for q, p in zip(questions, passages)])
        order = np.argsort(lens, kind="stable")
        out = np.zeros(n, np.float32)
        maxlen_cap = self.tokenizer.total_maxlen
        for s in range(0, n, self.bsize):
            sel = order[s:s + self.bsize]
            qs = [questions[i] for i in sel]
            ps = [passages[i] for i in sel]
            ids, mask, tt = self.tokenizer.tensorize(qs, ps)
            pad_t = min(_bucket(ids.shape[1]), _bucket(maxlen_cap))
            pad_b = self.bsize
            ids = np.pad(ids, ((0, pad_b - len(sel)), (0, pad_t - ids.shape[1])))
            mask = np.pad(mask, ((0, pad_b - len(sel)), (0, pad_t - mask.shape[1])))
            tt = np.pad(tt, ((0, pad_b - len(sel)), (0, pad_t - tt.shape[1])))
            scores = np.asarray(self._apply(self.params, ids, mask, tt))
            out[sel] = scores[:len(sel)]
        return out

    def score_ranking(self, qids: Sequence, pids: Sequence,
                      queries: dict, collection,
                      save_path: Optional[str] = None) -> dict:
        """RankingScorer.run equivalent: score each (qid, pid) pair and
        group scores by qid. `queries` maps qid->text, `collection` is
        indexable by int pid or a dict. Writes the reference's
        distillation_scores.json schema (one `[qid, [[score, pid], ...]]`
        JSON line per qid, ranking_scorer.py:36-42) when save_path given."""
        assert len(qids) == len(pids)
        qtexts = [queries[q] for q in qids]
        ptexts = [collection[p] for p in pids]
        scores = self.score_pairs(qtexts, ptexts)
        by_qid: dict = {}
        for qid, pid, sc in zip(qids, pids, scores):
            by_qid.setdefault(qid, []).append((float(sc), pid))
        if save_path is not None:
            with open(save_path, "w") as f:
                for qid, entries in by_qid.items():
                    f.write(json.dumps([qid, entries]) + "\n")
        return by_qid


def load_distillation_scores(path: str) -> dict:
    by_qid = {}
    with open(path) as f:
        for line in f:
            qid, entries = json.loads(line)
            by_qid[qid] = [(float(s), p) for s, p in entries]
    return by_qid


def kd_triples_from_scores(by_qid: dict, nway: int = 2,
                           seed: int = 0) -> list:
    """Build Triples rows [qid, [pid, score], ...] for TriplesExecutor's
    KL-distillation path: per query, the teacher's top passage plus
    (nway-1) sampled others, each carrying the teacher score (the
    reference trains from exactly this file via its RerankBatcher)."""
    rng = np.random.default_rng(seed)
    rows = []
    for qid, entries in by_qid.items():
        if len(entries) < nway:
            continue
        ordered = sorted(entries, key=lambda e: -e[0])
        top = ordered[0]
        rest_idx = rng.choice(len(ordered) - 1, size=nway - 1, replace=False)
        rest = [ordered[1 + i] for i in sorted(rest_idx)]
        rows.append([qid] + [[p, s] for s, p in [top] + rest])
    return rows
