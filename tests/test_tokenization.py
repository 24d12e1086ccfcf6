"""WordPiece + ColBERT query/doc tokenizer tests (incl. HF parity when the
transformers BertTokenizer can be constructed from a local vocab)."""

import numpy as np
import pytest

from ravqa_tpu.tokenization import (DocTokenizer, QueryTokenizer,
                                    WordPieceTokenizer, make_tiny_vocab)


@pytest.fixture(scope="module")
def tok():
    vocab = make_tiny_vocab(["what", "is", "the", "cat", "dog", "answer",
                             "##ing", "play"])
    return WordPieceTokenizer(vocab)


def test_wordpiece_greedy_longest_match(tok):
    assert tok.tokenize("playing") == ["play", "##ing"]
    assert tok.tokenize("cat dog") == ["cat", "dog"]
    # unknown word decomposes into letters
    assert tok.tokenize("ab") == ["a", "##b"]


def test_punctuation_split_and_lowercase(tok):
    assert tok.tokenize("What, is") == ["what", ",", "is"]
    assert tok.tokenize("CAT") == ["cat"]


def test_decode_roundtrip(tok):
    ids = tok.encode("what is the answer")
    assert tok.decode(ids) == "what is the answer"


def test_hf_parity_on_standard_vocab(tmp_path):
    """Build a vocab file and compare against HF BertTokenizer (offline)."""
    transformers = pytest.importorskip("transformers")
    words = ["[PAD]", "[unused0]", "[unused1]", "[UNK]", "[CLS]", "[SEP]",
             "[MASK]", "the", "quick", "brown", "fox", "jump", "##ed",
             "##s", "over", "lazy", "dog", ".", ",", "un", "##break",
             "##able"] + list("abcdefghijklmnopqrstuvwxyz")
    vf = tmp_path / "vocab.txt"
    vf.write_text("\n".join(words) + "\n")
    hf = transformers.BertTokenizer(str(vf), do_lower_case=True)
    ours = WordPieceTokenizer(str(vf))
    for text in ["The quick brown fox jumped over the lazy dog.",
                 "unbreakable, unbreakables", "Fox... jumps!?"]:
        assert ours.tokenize(text) == hf.tokenize(text), text
        assert ours.encode(text) == hf.encode(text,
                                              add_special_tokens=False), text


class TestColbertTokenizers:
    @pytest.fixture(scope="class")
    def base(self):
        return WordPieceTokenizer(make_tiny_vocab(["what", "is", "cat"]))

    def test_query_marker_and_mask_augmentation(self, base):
        qt = QueryTokenizer(base, query_maxlen=12)
        ids, mask = qt.tensorize(["what is cat"])
        assert ids.shape == (1, 12)
        assert ids[0, 0] == base.cls_token_id
        assert ids[0, 1] == qt.q_marker_id            # [Q] = [unused0]
        # body then [SEP]
        body = base.encode("what is cat")
        assert list(ids[0, 2:2 + len(body)]) == body
        assert ids[0, 2 + len(body)] == base.sep_token_id
        # remaining positions are [MASK], attention only on real tokens
        assert (ids[0, 3 + len(body):] == base.mask_token_id).all()
        assert mask[0].sum() == 3 + len(body)

    def test_query_attend_to_mask(self, base):
        qt = QueryTokenizer(base, query_maxlen=10, attend_to_mask_tokens=True)
        _, mask = qt.tensorize(["cat"])
        assert mask.sum() == 10

    def test_query_truncation_keeps_sep(self, base):
        qt = QueryTokenizer(base, query_maxlen=6)
        ids, _ = qt.tensorize(["what is cat what is cat what is cat"])
        assert ids.shape == (1, 6)
        assert ids[0, -1] == base.sep_token_id

    def test_doc_marker_and_padding(self, base):
        dt = DocTokenizer(base, doc_maxlen=16)
        ids, mask = dt.tensorize(["cat is what", "cat"])
        assert ids.shape == (2, 16)
        assert (ids[:, 1] == dt.d_marker_id).all()    # [D] = [unused1]
        # pads stay [PAD] (no mask augmentation for docs)
        assert (ids[1, mask[1] == 0] == base.pad_token_id).all()
        assert mask[1].sum() < 16


def test_cjk_isolation_multilingual():
    """CJK chars isolate into single tokens (ENCN multilingual support)."""
    vocab = make_tiny_vocab(["what"])
    vocab["猫"] = len(vocab)
    vocab["狗"] = len(vocab)
    tok = WordPieceTokenizer(vocab)
    assert tok.tokenize("what猫狗what") == ["what", "猫", "狗", "what"]
    # unknown CJK char -> [UNK], not merged into neighbors
    assert tok.tokenize("猫犬") == ["猫", "[UNK]"]
