"""Metric semantics tests, including parity with the official VQAEval
formula on hand-computed cases."""

import numpy as np

from ravqa_tpu.metrics import (exact_match, positive_id_scores,
                               pseudo_relevance_scores, vqa_accuracy_single)


def test_pseudo_relevance():
    retrieved = [["the sky is blue today", "cats are mammals"],
                 ["paris is in france", "rome is in italy"]]
    answers = [["blue"], ["london"]]
    m = pseudo_relevance_scores(retrieved, answers, ks=[1, 2])
    assert m["recall_at_1"] == 0.5       # q0 hits at rank 1, q1 never
    assert m["recall_at_2"] == 0.5
    assert m["precision_at_2"] == 0.25   # q0: 1/2, q1: 0/2


def test_pseudo_relevance_gold():
    retrieved = [["a blue answer here", "blue again"]]
    answers = [["blue", "azure"]]
    m = pseudo_relevance_scores(retrieved, answers, ks=[2],
                                gold_answers=["azure"])
    assert m["recall_at_2"] == 1.0
    assert m["gold_recall_at_2"] == 0.0


def test_positive_id_scores():
    retrieved = [["GS_1", "GS_2", "GS_3"], ["GS_9", "GS_1", "GS_4"]]
    pos = [["GS_2"], ["GS_7"]]
    m = positive_id_scores(retrieved, pos, ks=[1, 3])
    assert m["pos_item_ids_recall_at_1"] == 0.0
    assert m["pos_item_ids_recall_at_3"] == 0.5
    np.testing.assert_allclose(m["pos_item_ids_precision_at_3"], 1 / 6)


def test_exact_match():
    assert exact_match(["Blue ", "red"], [["blue"], ["green"]]) == 0.5


class TestVQAAccuracy:
    def test_full_consensus(self):
        # all 10 humans agree with prediction -> 1.0
        assert vqa_accuracy_single("cat", ["cat"] * 10) == 1.0

    def test_three_matches_gives_one(self):
        # 3 other humans matching -> min(1, 3/3) = 1 for the 7 non-matching
        # leave-outs; leaving out a matching answer gives 2/3.
        ans = ["cat"] * 3 + ["dog"] * 7
        acc = vqa_accuracy_single("cat", ans)
        want = (3 * (2 / 3) + 7 * 1.0) / 10
        np.testing.assert_allclose(acc, want)

    def test_single_match(self):
        ans = ["cat"] + ["dog"] * 9
        acc = vqa_accuracy_single("cat", ans)
        want = (1 * 0 + 9 * (1 / 3)) / 10
        np.testing.assert_allclose(acc, want)

    def test_normalization_applied_when_answers_differ(self):
        # "a cat" normalizes to "cat" (article dropped)
        ans = ["a cat"] * 5 + ["dog"] * 5
        acc = vqa_accuracy_single("cat", ans)
        want = (5 * 1.0 + 5 * 1.0) / 10  # 4 or 5 matching others -> >=3
        np.testing.assert_allclose(acc, want)

    def test_no_normalization_when_degenerate(self):
        # official quirk: if all gt answers identical, no normalization
        ans = ["a cat"] * 10
        assert vqa_accuracy_single("cat", ans) == 0.0
        assert vqa_accuracy_single("a cat", ans) == 1.0

    def test_number_words(self):
        ans = ["two"] * 6 + ["2"] * 4
        assert vqa_accuracy_single("2", ans) == 1.0


def test_em_with_numeric_ranges():
    from ravqa_tpu.metrics import exact_match_with_numeric_ranges
    acc = exact_match_with_numeric_ranges(
        ["42", "blue", "7.5"],
        [["forty-two"], ["blue"], ["eight"]],
        [(40, 45), None, (8, 9)])
    # 42 in range -> hit; blue exact -> hit; 7.5 outside [8,9] -> miss
    np.testing.assert_allclose(acc, 2 / 3)


def test_bleu_score():
    from ravqa_tpu.metrics import bleu_score
    assert bleu_score(["the cat sat on the mat"],
                      [["the cat sat on the mat"]]) == 1.0
    partial = bleu_score(["the cat sat there now ok"],
                         [["the cat sat on the mat"]])
    assert 0 < partial < 1
    assert bleu_score(["zzz"], [["the cat"]]) == 0.0


def test_mrr_and_success():
    from ravqa_tpu.metrics import mrr_at_k, success_at_k
    retrieved = [["a", "b", "c"], ["x", "y", "z"]]
    pos = [["b"], ["q"]]
    np.testing.assert_allclose(mrr_at_k(retrieved, pos, 3), 0.25)  # (1/2+0)/2
    assert success_at_k(retrieved, pos, 3) == 0.5


def test_ranking_tsv(tmp_path):
    from ravqa_tpu.metrics import save_ranking_tsv
    p = tmp_path / "rank.tsv"
    save_ranking_tsv(str(p), ["q1"], [["p1", "p2"]], [[0.9, 0.3]])
    lines = p.read_text().strip().split("\n")
    assert lines[0].split("\t") == ["q1", "p1", "1", "0.9"]


def test_text_cleaner():
    from ravqa_tpu.metrics import TextCleaner
    assert TextCleaner().clean_texts(["A cat!", "isnt two"]) == \
        ["cat", "isn't 2"]


class TestRankingEvalUtilities:
    """R22 leftovers: msmarco-style ranking eval + EM annotation
    (reference utility/evaluate/{msmarco_passages,annotate_EM}.py)."""

    def _ranking(self, tmp_path):
        from ravqa_tpu.metrics.retrieval_metrics import save_ranking_tsv
        p = tmp_path / "ranking.tsv"
        save_ranking_tsv(str(p), ["1", "2"],
                         [["10", "11", "12"], ["20", "21", "22"]],
                         [[3.0, 2.0, 1.0], [3.0, 2.0, 1.0]])
        return str(p)

    def test_msmarco_eval(self, tmp_path):
        from ravqa_tpu.metrics.retrieval_metrics import \
            evaluate_msmarco_ranking
        rp = self._ranking(tmp_path)
        qrels = tmp_path / "qrels.tsv"
        # q1's positive at rank 2; q2's positive at rank 1
        qrels.write_text("1 0 11 1\n2 0 20 1\n")
        m = evaluate_msmarco_ranking(rp, str(qrels), mrr_depth=10,
                                     recall_depths=(1, 3))
        assert m["mrr@10"] == (0.5 + 1.0) / 2
        assert m["recall@1"] == 0.5 and m["recall@3"] == 1.0
        assert m["num_judged_queries"] == 2

    def test_annotate_em(self, tmp_path):
        from ravqa_tpu.metrics.retrieval_metrics import \
            annotate_ranking_with_answers
        rp = self._ranking(tmp_path)
        collection = {"10": "about the red cat", "11": "dogs here",
                      "12": "nothing", "20": "a blue fish swims",
                      "21": "red cat again", "22": "empty"}
        answers = {"1": ["red cat"], "2": ["green bird"]}
        out = tmp_path / "labeled.tsv"
        m = annotate_ranking_with_answers(rp, collection, answers,
                                          output_path=str(out),
                                          cutoffs=(1, 3, "all"))
        assert m["success"][1] == 0.5          # q1 hits at rank 1, q2 never
        assert m["success"]["all"] == 0.5
        assert m["counts"][3] == 0.5           # q1 has 1 hit, q2 zero
        rows = [l.split("\t") for l in out.read_text().splitlines()]
        assert rows[0] == ["1", "10", "1", "1"]
        assert rows[1][3] == "0"
