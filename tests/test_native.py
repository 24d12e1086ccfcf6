"""Native C++ tokenizer: parity with the Python WordPiece + throughput."""

import time

import numpy as np
import pytest

from ravqa_tpu.tokenization import WordPieceTokenizer


@pytest.fixture(scope="module")
def vocab_file(tmp_path_factory):
    words = ["[PAD]", "[unused0]", "[unused1]", "[UNK]", "[CLS]", "[SEP]",
             "[MASK]", "the", "quick", "brown", "fox", "jump", "##ed",
             "##s", "over", "lazy", "dog", ".", ",", "!", "un", "##break",
             "##able", "play", "##ing"] + list("abcdefghijklmnopqrstuvwxyz") \
            + ["##" + c for c in "abcdefghijklmnopqrstuvwxyz"]
    p = tmp_path_factory.mktemp("vocab") / "vocab.txt"
    p.write_text("\n".join(words) + "\n")
    return str(p)


@pytest.fixture(scope="module")
def fast(vocab_file):
    from ravqa_tpu.native import FastWordPiece
    try:
        return FastWordPiece(vocab_file, unk_id=3)
    except RuntimeError:
        pytest.skip("no C++ compiler")


def test_parity_with_python(vocab_file, fast):
    py = WordPieceTokenizer(vocab_file)
    rng = np.random.default_rng(0)
    words = ["the", "quick", "brown", "Fox", "jumped", "PLAYING", "dog!",
             "unbreakable,", "zap", "qq"]
    texts = [" ".join(rng.choice(words, size=rng.integers(1, 12)))
             for _ in range(50)]
    # ASCII control edge cases the reference drops: DEL inside a word,
    # NUL joining the surrounding word (no fallback fires — must match)
    texts += ["dog\x7f", "ab\x00cd dog", "the\x7fquick"]
    ids, lens = fast.encode_batch(texts, maxlen=64)
    for i, t in enumerate(texts):
        want = py.encode(t)[:64]
        got = list(ids[i, :lens[i]])
        assert got == want, (t, got, want)


def test_throughput_beats_python(vocab_file, fast):
    py = WordPieceTokenizer(vocab_file)
    texts = ["the quick brown fox jumped over the lazy dog playing"] * 2000
    t0 = time.perf_counter()
    fast.encode_batch(texts, maxlen=32)
    t_fast = time.perf_counter() - t0
    t0 = time.perf_counter()
    for t in texts[:200]:
        py.encode(t)
    t_py = (time.perf_counter() - t0) * 10  # scaled to 2000
    assert t_fast < t_py, (t_fast, t_py)


def test_large_batch_parity(vocab_file, fast):
    """>256-rows batches take the multi-worker path on multi-core hosts
    (wp_encode_batch row-range threading; on a 1-core box it stays serial
    — either way results must match the Python reference row-for-row)."""
    py = WordPieceTokenizer(vocab_file)
    rng = np.random.default_rng(3)
    words = ["the", "quick", "brown", "fox", "dog", "play", "##ing", "over"]
    base = [w for w in words if not w.startswith("##")]
    texts = [" ".join(rng.choice(base, size=rng.integers(1, 10)))
             for _ in range(1500)]
    ids, lens = fast.encode_batch(texts, maxlen=24)
    for i in rng.choice(1500, 100, replace=False):
        want = py.encode(texts[i])[:24]
        assert list(ids[i, :lens[i]]) == want


@pytest.fixture(scope="module")
def cjk_vocab_file(tmp_path_factory):
    words = ["[PAD]", "[unused0]", "[unused1]", "[UNK]", "[CLS]", "[SEP]",
             "[MASK]", "the", "cat", "dog", ".", ",", "。", "，",
             "北", "京", "天", "安", "门", "中", "国", "##京"] \
            + list("abcdefghijklmnopqrstuvwxyz") \
            + ["##" + c for c in "abcdefghijklmnopqrstuvwxyz"]
    p = tmp_path_factory.mktemp("cjkvocab") / "vocab.txt"
    p.write_text("\n".join(words) + "\n", encoding="utf-8")
    return str(p)


def test_cjk_parity_and_fallback(cjk_vocab_file):
    """Native path isolates CJK ideographs + fullwidth punctuation exactly
    like the Python reference (ENCN serving path); rows with accents fall
    back to Python via the -1 marker and still come out byte-identical."""
    from ravqa_tpu.native import FastWordPiece
    try:
        fast = FastWordPiece(cjk_vocab_file, unk_id=3)
    except RuntimeError:
        pytest.skip("no C++ compiler")
    py = WordPieceTokenizer(cjk_vocab_file, use_native=False)
    texts = ["北京天安门",                     # pure CJK: isolate each char
             "the cat 在 北京。",              # mixed + fullwidth stop
             "中国 dog，cat",                  # fullwidth comma
             "café résumé",                    # accents -> Python fallback
             "北京 the dog."]
    # direct native call shows which rows were natively handled
    ids_n, lens_n = fast.encode_batch(texts, maxlen=32)
    assert lens_n[3] == -1          # accents flagged for fallback
    assert (lens_n[[0, 1, 2, 4]] >= 0).all()
    # the integrated tokenizer path must equal the pure-Python path per row
    integrated = WordPieceTokenizer(cjk_vocab_file)   # native + fallback
    ids, lens = integrated.encode_batch(texts, maxlen=32)
    for i, t in enumerate(texts):
        want = py.encode(t)[:32]
        assert list(ids[i, :lens[i]]) == want, (t, list(ids[i, :lens[i]]),
                                                want)
