"""BEM (answer-equivalence) scoring: input construction parity with the
reference's bertify (evaluation_utils.py:308-335), scorer behavior with a
mocked model, EVQA EM-then-BEM evaluation, and the offline fallback."""

import numpy as np

from ravqa_tpu.metrics.bem import (bertify_example, evqa_accuracy,
                                   evqa_score_example,
                                   initialize_bem_scoring_function,
                                   make_bem_scorer)
from ravqa_tpu.tokenization import WordPieceTokenizer, make_tiny_vocab

TOK = WordPieceTokenizer(make_tiny_vocab(
    ["what", "is", "the", "cat", "a", "big", "feline", "animal", "dog"]))


def test_bertify_segments_and_padding():
    ids, segs = bertify_example("what is the cat", "a feline", "a cat",
                                TOK, max_len=32)
    assert ids.shape == (32,) and segs.shape == (32,)
    cls, sep = TOK.cls_token_id, TOK.sep_token_id
    cand = TOK.encode("a cat", add_special_tokens=False)
    ref = TOK.encode("a feline", add_special_tokens=False)
    q = TOK.encode("what is the cat", add_special_tokens=False)
    want = [cls] + cand + [sep] + ref + [sep] + q + [sep]
    assert ids[:len(want)].tolist() == want
    assert (ids[len(want):] == 0).all()
    # segment ids: 0 for [CLS]+candidate(+sep), 1 reference(+sep), 2 question
    want_seg = [0] * (1 + len(cand) + 1) + [1] * (len(ref) + 1) \
        + [2] * (len(q) + 1)
    assert segs[:len(want_seg)].tolist() == want_seg


def test_mock_model_scoring_and_threshold():
    def fake_bem(inputs):
        # "equivalent" iff the candidate segment contains token for 'cat'
        ids = inputs["input_ids"][0]
        segs = inputs["segment_ids"][0]
        cat = TOK.encode("cat", add_special_tokens=False)[0]
        hit = bool(((ids == cat) & (segs == 0) & (ids != 0)).any())
        return np.array([[0.0, 3.0]] if hit else [[3.0, 0.0]])

    raw = make_bem_scorer(fake_bem, TOK)
    assert raw("what is the cat", "a feline", "a cat") > 0.9
    assert raw("what is the cat", "a feline", "a dog") < 0.1
    binarized = make_bem_scorer(fake_bem, TOK, threshold=0.5)
    assert binarized("q", "a feline", "the cat") == 1.0
    assert binarized("q", "a feline", "the dog") == 0.0
    # '&&' list references are comma-joined before scoring (:360-361)
    assert raw("q", "feline && animal", "a cat") > 0.9

    via_init = initialize_bem_scoring_function(bem_model=fake_bem,
                                               tokenizer=TOK)
    assert via_init("q", "a feline", "a cat") > 0.9


def test_evqa_em_then_bem():
    calls = []

    def spy_bem(question, reference, candidate):
        calls.append(candidate)
        return 0.9

    # EM hit -> BEM never called
    assert evqa_score_example("q", ["the cat"], "the cat", spy_bem) == 1.0
    assert not calls
    # EM miss -> BEM decides
    assert evqa_score_example("q", ["a feline"], "the cat", spy_bem) == 0.9
    assert calls == ["the cat"]


def test_fallback_and_accuracy():
    fn = initialize_bem_scoring_function(bem_model=None, tokenizer=None)
    acc = evqa_accuracy(["the cat", "wrong"],
                        [["cat"], ["dog"]],
                        ["q1", "q2"], scoring_fn=fn)
    assert acc == 0.5
