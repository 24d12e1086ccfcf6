"""Retrieval metrics: pseudo-relevance (string-match) and ground-truth
Recall/Precision@K.

Semantics match the reference exactly
(/root/reference/src/metrics/metrics_processors.py:481-604):

- pseudo-relevance: a top-K passage "hits" if any answer string appears
  (case-insensitive substring) in its content; recall@K = fraction of
  questions with >=1 hit in top K; precision@K = (#hitting passages)/K
  averaged over questions. gold_* variants use the single gold answer.
- ground-truth: hit iff retrieved passage_id ∈ pos_item_ids.
"""

from __future__ import annotations

from typing import Sequence


def pseudo_relevance_scores(
    retrieved_contents: Sequence[Sequence[str]],
    answers: Sequence[Sequence[str]],
    ks: Sequence[int],
    gold_answers: Sequence[str] | None = None,
) -> dict[str, float]:
    """retrieved_contents[i] = top-maxK passage texts for question i."""
    n = len(retrieved_contents)
    out = {f"recall_at_{k}": 0.0 for k in ks}
    out.update({f"precision_at_{k}": 0.0 for k in ks})
    if gold_answers is not None:
        out.update({f"gold_recall_at_{k}": 0.0 for k in ks})
        out.update({f"gold_precision_at_{k}": 0.0 for k in ks})
    for i in range(n):
        contents = [c.lower() for c in retrieved_contents[i]]
        ans = [a.lower() for a in answers[i]]
        hits = [any(a in c for a in ans) for c in contents]
        gold_hits = None
        if gold_answers is not None:
            g = gold_answers[i].lower()
            gold_hits = [g in c for c in contents]
        for k in ks:
            nh = sum(hits[:k])
            out[f"recall_at_{k}"] += float(nh > 0)
            out[f"precision_at_{k}"] += nh / k
            if gold_hits is not None:
                ngh = sum(gold_hits[:k])
                out[f"gold_recall_at_{k}"] += float(ngh > 0)
                out[f"gold_precision_at_{k}"] += ngh / k
    return {name: v / max(n, 1) for name, v in out.items()}


def positive_id_scores(
    retrieved_ids: Sequence[Sequence],
    pos_item_ids: Sequence[Sequence],
    ks: Sequence[int],
    field: str = "pos_item_ids",
) -> dict[str, float]:
    """Ground-truth Recall/Precision@K against positive passage ids."""
    n = len(retrieved_ids)
    out = {f"{field}_recall_at_{k}": 0.0 for k in ks}
    out.update({f"{field}_precision_at_{k}": 0.0 for k in ks})
    for i in range(n):
        pos = set(pos_item_ids[i])
        hits = [rid in pos for rid in retrieved_ids[i]]
        for k in ks:
            nh = sum(hits[:k])
            out[f"{field}_recall_at_{k}"] += float(nh > 0)
            out[f"{field}_precision_at_{k}"] += nh / k
    return {name: v / max(n, 1) for name, v in out.items()}


def exact_match(predictions: Sequence[str], answers: Sequence[Sequence[str]],
                normalize=lambda s: s.strip().lower()) -> float:
    """EM over multiple acceptable answers (reference compute_exact_match)."""
    n = len(predictions)
    hit = sum(
        any(normalize(p) == normalize(a) for a in ans)
        for p, ans in zip(predictions, answers))
    return hit / max(n, 1)
