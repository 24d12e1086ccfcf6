"""EVQA answer-equivalence (BEM) scoring.

The reference scores Encyclopedic-VQA answers with the TF-Hub BEM (BERT
answer-equivalence) model (/root/reference/src/tools/evaluation_utils.py:
282-371 initialize_bem_scoring_function): inputs are

    [CLS] candidate [SEP] reference [SEP] question [SEP]

with segment ids 0/1/2 per segment (tensorflow_text.combine_segments
semantics), padded to 512; the score is softmax(logits)[1], thresholded at
0.5. List-type references replace '&&' with ',' first (:360-361).

This module reproduces that wiring with injectable parts so it runs
offline: `tokenizer` may be any encode(text, add_special_tokens=False)
object (ravqa_tpu WordPieceTokenizer or an HF BertTokenizer built from the
BEM vocab), and `bem_model` any callable({'input_ids', 'segment_ids'}) ->
(B, 2) logits — a TF-Hub handle, a Flax BERT classifier, or a test mock.
When neither TF-Hub nor an injected model is available, scoring falls back
to normalized exact/substring match (the reference requires network).
"""

from __future__ import annotations

from typing import Callable, Optional, Sequence

import numpy as np

from .vqa import normalize_answer

BEM_MAX_LEN = 512


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


def bertify_example(question: str, reference: str, candidate: str,
                    tokenizer, max_len: int = BEM_MAX_LEN):
    """-> (input_ids (max_len,), segment_ids (max_len,)) int32 — the
    reference's preprocess_example + pad (evaluation_utils.py:308-335):
    [CLS] candidate [SEP] reference [SEP] question [SEP], segments 0/1/2."""
    cls_id = tokenizer.cls_token_id
    sep_id = tokenizer.sep_token_id
    segs = [tokenizer.encode(t, add_special_tokens=False)
            for t in (candidate, reference, question)]
    ids = [cls_id]
    seg_ids = [0]
    for i, seg in enumerate(segs):
        ids.extend(list(seg) + [sep_id])
        seg_ids.extend([i] * (len(seg) + 1))
    ids = ids[:max_len]
    seg_ids = seg_ids[:max_len]
    out_ids = np.zeros((max_len,), np.int32)
    out_seg = np.zeros((max_len,), np.int32)
    out_ids[:len(ids)] = ids
    out_seg[:len(seg_ids)] = seg_ids
    return out_ids, out_seg


def make_bem_scorer(bem_model: Callable, tokenizer,
                    threshold: Optional[float] = None,
                    max_len: int = BEM_MAX_LEN):
    """scoring_fn(question, reference, candidate) -> [0, 1] from a logits
    model. threshold None returns the raw softmax probability; a float
    applies the reference's >= 0.5 binarization (evaluation_utils.py:365)."""

    def score(question: str, reference: str, candidate: str) -> float:
        # list/multi-answer references join with '&&' (reference :360-361)
        reference = reference.replace("&&", ",")
        if not reference:
            raise ValueError("Reference answer cannot be empty.")
        ids, segs = bertify_example(question, reference, candidate,
                                    tokenizer, max_len)
        logits = np.asarray(bem_model({
            "input_ids": ids[None], "segment_ids": segs[None]}))
        logits = np.squeeze(logits)
        e = np.exp(logits - logits.max())
        p = float((e / e.sum())[1])
        if threshold is not None:
            return float(p >= threshold)
        return p

    return score


def initialize_bem_scoring_function(
        model_url: str = "https://tfhub.dev/google/answer_equivalence/bem/1",
        tokenizer=None,
        bem_model: Optional[Callable] = None,
        threshold: Optional[float] = None,
) -> Callable[[str, str, str], float]:
    """Returns scoring_fn(question, reference, candidate) -> [0, 1].

    bem_model + tokenizer given: fully offline. Otherwise tries the TF-Hub
    BEM model (requires tensorflow_hub + network); falls back to
    normalized-match scoring with a warning.
    """
    if bem_model is not None and tokenizer is not None:
        return make_bem_scorer(bem_model, tokenizer, threshold=threshold)
    try:  # pragma: no cover - network-dependent
        import tensorflow_hub as hub
        hub_model = hub.load(model_url)
        if tokenizer is None:
            raise ValueError(
                "pass a tokenizer built from the BEM vocab "
                "(e.g. WordPieceTokenizer(vocab_path))")

        def tf_model(inputs):
            import tensorflow as tf
            return hub_model({
                "input_ids": tf.convert_to_tensor(inputs["input_ids"]),
                "segment_ids": tf.convert_to_tensor(
                    inputs["segment_ids"])}).numpy()
        return make_bem_scorer(tf_model, tokenizer, threshold=threshold)
    except Exception:
        import logging
        logging.getLogger(__name__).warning(
            "BEM model unavailable; using normalized-match fallback")
        return _fallback_scoring


def evqa_score_example(question: str, references: Sequence[str],
                       candidate: str,
                       bem_scoring_fn: Callable[[str, str, str], float],
                       question_type: str = "single") -> float:
    """Encyclopedic-VQA evaluation (evaluation_utils.py:374+): Exact Match
    first; only on EM failure fall back to BEM (same result, much faster —
    EM is stricter than BEM for single answers)."""
    norm_c = normalize_answer(candidate)
    for r in references:
        if normalize_answer(r) == norm_c:
            return 1.0
    return max((bem_scoring_fn(question, r, candidate)
                for r in references if r), default=0.0)


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
