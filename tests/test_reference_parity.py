"""Golden-parity gates: ravqa_tpu vs the VENDORED REFERENCE code itself.

Unlike the clean-room parity tests (tests/test_convert_flmr.py etc., which
rebuild torch models by hand), these import the reference implementation
from /root/reference and assert equality directly:

- ColBERT scoring: colbert_score / colbert_score_reduce / flipr interaction
  (third_party/ColBERT/colbert/modeling/colbert.py:235-311)
  vs ravqa_tpu.ops.maxsim.
- segmented_maxsim.cpp (the reference's N1 native kernel) vs our padded
  MaxSim, when the torch C++ extension compiles on this box.
- Query/Doc tokenizers: byte equality of tensorize() outputs on a real
  bert-layout vocab (tokenization/{query,doc}_tokenization.py:51-99,49-72).
- Official VQA accuracy: src/utils/vqaEval.py:11-191 vs ravqa_tpu.metrics.vqa.

If any scoring/tokenization detail drifts, these fail.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

from _reference_loader import (load_reference_colbert,  # noqa: E402
                               load_reference_vqaeval,
                               make_standard_layout_vocab)

import jax.numpy as jnp  # noqa: E402

from ravqa_tpu.ops.maxsim import (flipr_reduce, maxsim_pair_xla,  # noqa: E402
                                  maxsim_reduce, maxsim_search_xla)


@pytest.fixture(scope="module")
def ref():
    return load_reference_colbert()


@pytest.fixture(scope="module")
def ref_score(ref):
    from colbert.infra.config.config import ColBERTConfig
    from colbert.modeling.colbert import colbert_score, colbert_score_reduce
    return ColBERTConfig, colbert_score, colbert_score_reduce


def _rand_qd(rng, b, lq, n, ld, dim=128, q_rows_zeroed=0):
    q = rng.standard_normal((b, lq, dim)).astype(np.float32)
    q /= np.linalg.norm(q, axis=-1, keepdims=True)
    if q_rows_zeroed:
        q[:, -q_rows_zeroed:, :] = 0.0
    d = rng.standard_normal((n, ld, dim)).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    d_mask = (rng.random((n, ld)) > 0.25)
    d_mask[:, 0] = True  # no fully-masked doc
    return q, d, d_mask


class TestColbertScoreParity:
    def test_aligned_pairs(self, ref_score):
        ColBERTConfig, colbert_score, _ = ref_score
        rng = np.random.default_rng(0)
        q, d, d_mask = _rand_qd(rng, b=6, lq=32, n=6, ld=50)
        want = colbert_score(torch.from_numpy(q), torch.from_numpy(d),
                             torch.from_numpy(d_mask).unsqueeze(-1),
                             config=ColBERTConfig()).numpy()
        got = np.asarray(maxsim_pair_xla(jnp.asarray(q), jnp.asarray(d),
                                         jnp.asarray(d_mask)))
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-4)

    def test_one_query_broadcast(self, ref_score):
        """Q.size(0)==1 compares the query against every passage."""
        ColBERTConfig, colbert_score, _ = ref_score
        rng = np.random.default_rng(1)
        q, d, d_mask = _rand_qd(rng, b=1, lq=32, n=17, ld=40)
        want = colbert_score(torch.from_numpy(q), torch.from_numpy(d),
                             torch.from_numpy(d_mask).unsqueeze(-1),
                             config=ColBERTConfig()).numpy()
        got = np.asarray(maxsim_search_xla(jnp.asarray(q), jnp.asarray(d),
                                           jnp.asarray(d_mask)))[0]
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-4)

    def test_zeroed_query_rows(self, ref_score):
        """FLMR zeroes masked query embeddings; scores must still agree."""
        ColBERTConfig, colbert_score, _ = ref_score
        rng = np.random.default_rng(2)
        q, d, d_mask = _rand_qd(rng, b=4, lq=32, n=4, ld=30, q_rows_zeroed=7)
        want = colbert_score(torch.from_numpy(q), torch.from_numpy(d),
                             torch.from_numpy(d_mask).unsqueeze(-1),
                             config=ColBERTConfig()).numpy()
        got = np.asarray(maxsim_pair_xla(jnp.asarray(q), jnp.asarray(d),
                                         jnp.asarray(d_mask)))
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-4)

    def test_reduce_parity_raw_scores(self, ref_score):
        ColBERTConfig, _, colbert_score_reduce = ref_score
        rng = np.random.default_rng(3)
        scores = rng.standard_normal((5, 41, 32)).astype(np.float32)
        d_mask = (rng.random((5, 41)) > 0.3)
        d_mask[:, 0] = True
        want = colbert_score_reduce(torch.from_numpy(scores.copy()),
                                    torch.from_numpy(d_mask).unsqueeze(-1),
                                    ColBERTConfig()).numpy()
        got = np.asarray(maxsim_reduce(jnp.asarray(scores),
                                       jnp.asarray(d_mask)))
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-4)

    @pytest.mark.parametrize("extra_ctx", [16, 8, 64])
    def test_flipr_parity(self, ref_score, extra_ctx):
        """PreFLMR flipr interaction: top-K1 question part + top-K2 context
        part (colbert.py:248-261; K1=qmaxlen//2, K2=8)."""
        ColBERTConfig, colbert_score, _ = ref_score
        cfg = ColBERTConfig(interaction="flipr", query_maxlen=64)
        rng = np.random.default_rng(4)
        q, d, d_mask = _rand_qd(rng, b=5, lq=64 + extra_ctx, n=5, ld=48)
        want = colbert_score(torch.from_numpy(q), torch.from_numpy(d),
                             torch.from_numpy(d_mask).unsqueeze(-1),
                             config=cfg).numpy()
        scores = jnp.einsum("bld,bqd->blq", jnp.asarray(d), jnp.asarray(q))
        got = np.asarray(flipr_reduce(scores, jnp.asarray(d_mask),
                                      query_part_len=64, k1=32, k2=8))
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-4)

    def test_flipr_short_context_contributes_nothing(self, ref_score):
        """Reference adds the context-part sum only when >= K2 context
        tokens exist (colbert.py:258); 0 < ctx < K2 contributes nothing."""
        ColBERTConfig, colbert_score, _ = ref_score
        cfg = ColBERTConfig(interaction="flipr", query_maxlen=64)
        rng = np.random.default_rng(5)
        q, d, d_mask = _rand_qd(rng, b=3, lq=64 + 3, n=3, ld=20)
        want = colbert_score(torch.from_numpy(q), torch.from_numpy(d),
                             torch.from_numpy(d_mask).unsqueeze(-1),
                             config=cfg).numpy()
        scores = jnp.einsum("bld,bqd->blq", jnp.asarray(d), jnp.asarray(q))
        got = np.asarray(flipr_reduce(scores, jnp.asarray(d_mask),
                                      query_part_len=64, k1=32, k2=8))
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-4)


class TestSegmentedMaxsimCppParity:
    """Gate against the reference's actual N1 C++ kernel when it compiles."""

    @pytest.fixture(scope="class")
    def segmented_maxsim(self, ref):
        try:
            from colbert.modeling.colbert import ColBERT
            ColBERT.try_load_torch_extensions(use_gpu=False)
            return ColBERT.segmented_maxsim
        except Exception as e:  # no compiler / ninja on this box
            pytest.skip(f"reference C++ extension unavailable: {e}")

    def test_packed_vs_padded(self, segmented_maxsim):
        """Reference-internal quirk, encoded exactly: segmented_maxsim.cpp
        initializes its accumulator with torch::zeros (:60) and folds maxima
        into it, so each per-query-token max is FLOORED AT 0 — unlike the
        padded colbert_score path (-9999 fill, true max). We reproduce the
        floor here by appending one valid zero doc token per doc."""
        rng = np.random.default_rng(6)
        lengths = np.array([7, 1, 13, 5, 9], np.int64)
        lq, dim = 32, 128
        q = rng.standard_normal((lq, dim)).astype(np.float32)
        d_packed = rng.standard_normal((int(lengths.sum()), dim)) \
            .astype(np.float32)
        scores_packed = torch.from_numpy(d_packed @ q.T)
        want = segmented_maxsim(scores_packed,
                                torch.from_numpy(lengths)).numpy()
        # pad to (n_docs, max_len + 1, dim); the extra VALID zero row makes
        # every per-query-token max >= 0, matching the kernel's zero-init.
        n, ld = len(lengths), int(lengths.max()) + 1
        d_pad = np.zeros((n, ld, dim), np.float32)
        m = np.zeros((n, ld), bool)
        off = 0
        for i, L in enumerate(lengths):
            d_pad[i, :L] = d_packed[off:off + L]
            m[i, :L + 1] = True  # includes one zero row -> 0-floor
            off += L
        got = np.asarray(maxsim_pair_xla(
            jnp.asarray(np.broadcast_to(q, (n, lq, dim))),
            jnp.asarray(d_pad), jnp.asarray(m)))
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-4)


class TestTokenizerParity:
    WORDS = ["the", "quick", "brown", "fox", "jump", "##ed", "##s", "over",
             "lazy", "dog", "what", "is", "man", "holding", "who", "on",
             "first", "really", "color", "of", "cat", "hat", "wearing",
             "picture", "##ing", "play", "un", "##break", "##able",
             ".", ",", "?", "!", "(", ")", "'", '"', "1", "2", "5", "0",
             "##0", "##5", "000", "10"] + \
        list("abcdefghijklmnopqrstuvwxyz") + \
        ["##" + c for c in "abcdefghijklmnopqrstuvwxyz"] + \
        ["\u732b", "\u662f"]          # CJK (the PreFLMR ENCN path)

    TEXTS = [
        "What is the man holding?",
        "what is \u732b\u662f really",   # CJK isolation parity
        "who's on first? (really)",
        "the color of the cat's hat",
        "a",
        "what is 1,000 + 2.5?",
        "unbreakable, unbreakables playing",
        "the quick brown fox jumped over the lazy dog " * 8,  # truncation
    ]

    @pytest.fixture(scope="class")
    def vocab_dir(self, ref, tmp_path_factory):
        return make_standard_layout_vocab(
            tmp_path_factory.mktemp("refparity"), self.WORDS)

    @pytest.fixture(scope="class")
    def ref_tokenizers(self, ref, vocab_dir):
        from colbert.infra.config.config import ColBERTConfig
        from colbert.modeling.tokenization import (DocTokenizer,
                                                   QueryTokenizer)
        d, _ = vocab_dir
        return ColBERTConfig, QueryTokenizer, DocTokenizer, d

    @pytest.fixture(scope="class")
    def our_base(self, vocab_dir):
        from ravqa_tpu.tokenization import WordPieceTokenizer
        _, vf = vocab_dir
        return WordPieceTokenizer(vf)

    @pytest.mark.parametrize("qmax", [32, 16])
    def test_query_tensorize_byte_equality(self, ref_tokenizers, our_base,
                                           qmax):
        ColBERTConfig, RefQT, _, ckpt = ref_tokenizers
        ref_qt = RefQT(ColBERTConfig(checkpoint=ckpt, query_maxlen=qmax))
        from ravqa_tpu.tokenization import QueryTokenizer
        our_qt = QueryTokenizer(our_base, query_maxlen=qmax)
        want_ids, want_mask = ref_qt.tensorize(list(self.TEXTS))
        got_ids, got_mask = our_qt.tensorize(list(self.TEXTS))
        np.testing.assert_array_equal(got_ids, want_ids.numpy())
        np.testing.assert_array_equal(got_mask, want_mask.numpy())

    def test_query_attend_to_mask_tokens(self, ref_tokenizers, our_base):
        ColBERTConfig, RefQT, _, ckpt = ref_tokenizers
        ref_qt = RefQT(ColBERTConfig(checkpoint=ckpt, query_maxlen=32,
                                     attend_to_mask_tokens=True))
        from ravqa_tpu.tokenization import QueryTokenizer
        our_qt = QueryTokenizer(our_base, query_maxlen=32,
                                attend_to_mask_tokens=True)
        want_ids, want_mask = ref_qt.tensorize(list(self.TEXTS[:4]))
        got_ids, got_mask = our_qt.tensorize(list(self.TEXTS[:4]))
        np.testing.assert_array_equal(got_ids, want_ids.numpy())
        np.testing.assert_array_equal(got_mask, want_mask.numpy())

    @pytest.mark.parametrize("dmax", [64, 24])
    def test_doc_tensorize_byte_equality(self, ref_tokenizers, our_base,
                                         dmax):
        ColBERTConfig, _, RefDT, ckpt = ref_tokenizers
        ref_dt = RefDT(ColBERTConfig(checkpoint=ckpt, doc_maxlen=dmax))
        from ravqa_tpu.tokenization import DocTokenizer
        our_dt = DocTokenizer(our_base, doc_maxlen=dmax)
        want_ids, want_mask = ref_dt.tensorize(list(self.TEXTS))
        got_ids, got_mask = our_dt.tensorize(list(self.TEXTS))
        np.testing.assert_array_equal(got_ids, want_ids.numpy())
        np.testing.assert_array_equal(got_mask, want_mask.numpy())


class TestVQAEvalParity:
    CASES = [
        # (prediction, 10 human answers)
        ("umbrella", ["umbrella"] * 6 + ["parasol"] * 4),
        ("two", ["2"] * 5 + ["two"] * 3 + ["3", "4"]),
        ("don't know", ["dont know", "don't know", "unknown", "dunno",
                        "no idea", "dont know", "don't know", "dk",
                        "unknown", "dont know"]),
        ("a red car", ["red car"] * 7 + ["car", "red", "truck"]),
        ("cat", ["dog"] * 10),                 # degenerate set: no norm
        ("1,000", ["1,000", "1000", "one thousand", "1,000", "1000",
                   "1,000", "thousand", "1000", "1,000", "one thousand"]),
        ("skiing?!", ["skiing"] * 4 + ["ski", "skis", "skiing", "snowboard",
                      "skiing", "sledding"]),
        ("the man", ["man"] * 10),             # degenerate: keeps article
    ]

    def test_per_question_and_overall(self):
        VQAEval = load_reference_vqaeval()
        qids = list(range(len(self.CASES)))
        gts, res = {}, {}
        for qid, (pred, answers) in zip(qids, self.CASES):
            gts[qid] = {
                "answers": [{"answer": a, "answer_id": i + 1}
                            for i, a in enumerate(answers)],
                "question_type": "t", "answer_type": "other",
            }
            res[qid] = {"answer": pred}

        class _Duck:
            def __init__(self, qa):
                self.qa = qa

            def getQuesIds(self):
                return list(self.qa.keys())

        ev = VQAEval(_Duck(gts), _Duck(res), n=2)
        ev.evaluate()

        from ravqa_tpu.metrics.vqa import vqa_accuracy, vqa_accuracy_single
        for qid, (pred, answers) in zip(qids, self.CASES):
            ours = round(100 * vqa_accuracy_single(pred, answers), 2)
            assert ours == ev.evalQA[qid], (qid, pred, answers)
        overall = 100 * vqa_accuracy([c[0] for c in self.CASES],
                                     [c[1] for c in self.CASES])
        assert round(overall, 2) == ev.accuracy["overall"]


class TestResidualCodecParity:
    """ravqa_tpu.ops.residual vs the reference ResidualCodec
    (colbert/indexing/codecs/residual.py:169-278, CPU path) with IDENTICAL
    centroids / bucket cutoffs / bucket weights: codes agree and the
    (normalized) reconstructions match. Packing layouts differ by design
    (planar vs reversed-bit), so parity is asserted on the decompressed
    values, which is what scoring consumes. This gate also pins the
    reference's post-decompress L2 normalization (residual.py:273-276),
    which ravqa_tpu carries as per-token `scales`."""

    @pytest.fixture(scope="class", params=[2, 4])
    def both(self, ref, request):
        nbits = request.param
        from colbert.indexing.codecs.residual import ResidualCodec
        from colbert.infra.config.config import ColBERTConfig

        rng = np.random.default_rng(3)
        dim, n_cent, t = 128, 128, 4096
        embs = rng.standard_normal((t, dim)).astype(np.float32)
        embs /= np.linalg.norm(embs, axis=-1, keepdims=True)
        cent = rng.standard_normal((n_cent, dim)).astype(np.float32)
        cent /= np.linalg.norm(cent, axis=-1, keepdims=True)
        assign = np.argmax(embs @ cent.T, axis=-1)
        resid = (embs - cent[assign]).reshape(-1)
        nb = 2 ** nbits
        cutoffs = np.quantile(resid, np.arange(1, nb) / nb).astype(np.float32)
        weights = np.quantile(resid,
                              (np.arange(nb) + 0.5) / nb).astype(np.float32)

        cfg = ColBERTConfig(dim=dim, nbits=nbits, total_visible_gpus=0)
        ref_codec = ResidualCodec(
            config=cfg, centroids=torch.tensor(cent),
            bucket_cutoffs=torch.tensor(cutoffs),
            bucket_weights=torch.tensor(weights))
        return nbits, embs, cent, cutoffs, weights, ref_codec

    def test_codes_and_reconstruction_parity(self, both):
        nbits, embs, cent, cutoffs, weights, ref_codec = both
        from ravqa_tpu.ops.residual import _compress_block, decompress

        ref_comp = ref_codec.compress(torch.tensor(embs))
        ref_rec = ref_codec.decompress(ref_comp).numpy()   # L2-normalized

        t, dim = embs.shape
        mask = jnp.ones((t, 1), jnp.int8)
        codes, packed, scales = _compress_block(
            jnp.asarray(embs).reshape(t, 1, dim), mask,
            jnp.asarray(cent), jnp.asarray(cutoffs), jnp.asarray(weights),
            nbits=nbits)
        our_codes = np.asarray(codes).reshape(-1)
        ref_codes = ref_comp.codes.numpy()
        same = our_codes == ref_codes
        # ties in the nearest-centroid argmax may break differently
        assert same.mean() > 0.999, same.mean()

        rec = decompress(codes, packed, jnp.asarray(cent),
                         jnp.asarray(weights), nbits, dtype=jnp.float32)
        our_rec = (np.asarray(rec) * np.asarray(scales)[..., None]) \
            .reshape(t, dim)
        np.testing.assert_allclose(our_rec[same], ref_rec[same],
                                   atol=2e-4, rtol=1e-3)

    def test_search_scores_match_reference_decompressed_maxsim(self, both):
        """End-to-end: our residual fine-stage scores equal MaxSim over the
        reference's own decompressed (normalized) embeddings."""
        nbits, embs, cent, cutoffs, weights, ref_codec = both
        from ravqa_tpu.ops.residual import _compress_block, pack_records
        from ravqa_tpu.retrieval.coarse import _fine_stage

        t, dim = embs.shape
        ld = 8
        n = t // ld
        rng = np.random.default_rng(5)
        q = rng.standard_normal((3, 6, dim)).astype(np.float32)
        q /= np.linalg.norm(q, axis=-1, keepdims=True)
        # unique candidates per query so the row-level assertion below is
        # well-defined (duplicates would make top-5 membership ambiguous)
        cand = jnp.asarray(
            np.stack([rng.choice(n, 16, replace=False) for _ in range(3)]))

        mask = jnp.ones((n, ld), jnp.int8)
        codes, packed, scales = _compress_block(
            jnp.asarray(embs).reshape(n, ld, dim), mask,
            jnp.asarray(cent), jnp.asarray(cutoffs), jnp.asarray(weights),
            nbits=nbits)
        records = pack_records(codes, scales.astype(jnp.bfloat16), packed)
        scores, rows = _fine_stage(
            jnp.asarray(q), cand, None, mask, k=5,
            records=records, centroids=jnp.asarray(cent),
            bucket_weights=jnp.asarray(weights), nbits=nbits)

        ref_comp = ref_codec.compress(torch.tensor(embs))
        ref_rec = ref_codec.decompress(ref_comp).numpy().reshape(n, ld, dim)
        # per-query check against the reference reconstruction
        for b in range(3):
            rr = ref_rec[np.asarray(cand)[b]]                # (16, ld, dim)
            sb = np.einsum("cld,qd->clq", rr, q[b])
            sc = sb.max(axis=1).sum(axis=-1)                 # (16,)
            order = np.argsort(-sc)[:5]
            expect = np.asarray(cand)[b][order]
            got_scores = np.asarray(scores)[b]
            np.testing.assert_allclose(got_scores, np.sort(sc)[::-1][:5],
                                       atol=5e-2, rtol=1e-2)
            # row-level parity: the fine stage must RETURN the same top-5
            # candidates the reference reconstruction ranks first (multiset
            # compare — equal-score rows may legally permute)
            got_rows = np.asarray(rows)[b]
            np.testing.assert_array_equal(np.sort(got_rows),
                                          np.sort(expect))


class TestTokenizerParityCJK:
    """ENCN proof (the PreFLMR ViT-L_ENCN path, BASELINE.md CN rows):
    byte-parity of Query/Doc tensorization on a CJK-HEAVY vocab with
    Chinese fixtures — CJK char isolation, mixed-script text, unknown
    CJK -> [UNK], and full-width punctuation — against the reference
    tokenizers. The native wordpiece CJK fast path and the Python
    fallback are additionally held equal to each other."""

    CJK = list("猫是狗天空太阳树鱼"
               "鸟车红蓝大老热湿什"
               "么颜色中的图片问题")
    WORDS = CJK + ["##" + c for c in CJK[:8]] \
        + ["what", "is", "the", "color", "of", "in", "image",
           ",", "?", ".", "？", "，", "。"] \
        + list("abcdefghijklmnopqrstuvwxyz") \
        + ["##" + c for c in "abcdefghijklmnopqrstuvwxyz"]

    TEXTS = [
        "猫是什么颜色？",      # pure CJK + fw ?
        "what color is the 狗 in the image?",          # mixed script
        "图片中的龙",                  # 龙 -> [UNK]
        "天空，太阳。",            # fw punctuation
        "猫是狗" * 40,                         # truncation, no
        #   whitespace anywhere (the CJK isolation path must split it)
        "abc猫def是",                              # CJK inside a
        #   Latin word: isolation must cut the word at the char boundary
    ]

    @pytest.fixture(scope="class")
    def vocab_dir(self, ref, tmp_path_factory):
        return make_standard_layout_vocab(
            tmp_path_factory.mktemp("refparity_cjk"), self.WORDS)

    @pytest.fixture(scope="class")
    def ref_tokenizers(self, ref, vocab_dir):
        from colbert.infra.config.config import ColBERTConfig
        from colbert.modeling.tokenization import (DocTokenizer,
                                                   QueryTokenizer)
        d, _ = vocab_dir
        return ColBERTConfig, QueryTokenizer, DocTokenizer, d

    @pytest.mark.parametrize("qmax", [32, 12])
    def test_cjk_query_byte_equality(self, ref_tokenizers, vocab_dir, qmax):
        from ravqa_tpu.tokenization import QueryTokenizer, WordPieceTokenizer
        ColBERTConfig, RefQT, _, ckpt = ref_tokenizers
        _, vf = vocab_dir
        ref_qt = RefQT(ColBERTConfig(checkpoint=ckpt, query_maxlen=qmax))
        want_ids, want_mask = ref_qt.tensorize(list(self.TEXTS))
        for use_native in (True, False):
            our_qt = QueryTokenizer(
                WordPieceTokenizer(vf, use_native=use_native),
                query_maxlen=qmax)
            got_ids, got_mask = our_qt.tensorize(list(self.TEXTS))
            np.testing.assert_array_equal(got_ids, want_ids.numpy(),
                                          err_msg=f"native={use_native}")
            np.testing.assert_array_equal(got_mask, want_mask.numpy())

    @pytest.mark.parametrize("dmax", [48, 16])
    def test_cjk_doc_byte_equality(self, ref_tokenizers, vocab_dir, dmax):
        from ravqa_tpu.tokenization import DocTokenizer, WordPieceTokenizer
        ColBERTConfig, _, RefDT, ckpt = ref_tokenizers
        _, vf = vocab_dir
        ref_dt = RefDT(ColBERTConfig(checkpoint=ckpt, doc_maxlen=dmax))
        want_ids, want_mask = ref_dt.tensorize(list(self.TEXTS))
        for use_native in (True, False):
            our_dt = DocTokenizer(
                WordPieceTokenizer(vf, use_native=use_native),
                doc_maxlen=dmax)
            got_ids, got_mask = our_dt.tensorize(list(self.TEXTS))
            np.testing.assert_array_equal(got_ids, want_ids.numpy(),
                                          err_msg=f"native={use_native}")
            np.testing.assert_array_equal(got_mask, want_mask.numpy())
