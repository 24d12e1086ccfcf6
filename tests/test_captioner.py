"""Oscar-style captioner: s2s mask semantics, masked-LM greedy decode,
checkpoint conversion, and the caption-JSON -> D1 loader roundtrip."""

import json

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ravqa_tpu.data.transforms import LoadOscarCaptionFeatures
from ravqa_tpu.models.captioner import (CaptionerConfig, OscarCaptioner,
                                        caption_attention_mask,
                                        convert_oscar_captioner_params,
                                        decode_captions, greedy_caption,
                                        write_caption_predictions)


@pytest.fixture(scope="module")
def tiny():
    cfg = CaptionerConfig.tiny()
    model = OscarCaptioner(cfg)
    rng = np.random.RandomState(0)
    b = 2
    tags = cfg.max_seq_len - cfg.max_seq_a_len
    text = np.concatenate([
        np.full((b, cfg.max_seq_a_len), cfg.mask_token_id),
        rng.randint(5, cfg.bert.vocab_size, (b, tags))], -1).astype(np.int32)
    text[:, 0] = cfg.cls_token_id
    segs = np.concatenate([np.zeros((b, cfg.max_seq_a_len)),
                           np.ones((b, tags))], -1).astype(np.int32)
    img = rng.randn(b, cfg.max_img_seq_len,
                    cfg.img_feature_dim).astype(np.float32)
    tag_mask = np.ones((b, tags), np.int32)
    tag_mask[1, 3:] = 0
    img_mask = np.ones((b, cfg.max_img_seq_len), np.int32)
    img_mask[1, 4:] = 0
    attn = caption_attention_mask(cfg, jnp.asarray(tag_mask),
                                  jnp.asarray(img_mask))
    params = model.init(jax.random.PRNGKey(0), jnp.asarray(text),
                        jnp.asarray(segs), jnp.asarray(img), attn)
    return (cfg, model, params, text, segs, img, tag_mask, img_mask,
            np.asarray(attn))


class TestMask:
    def test_structure(self, tiny):
        cfg = tiny[0]
        attn = tiny[8]
        a, s = cfg.max_seq_a_len, cfg.max_seq_len
        # caption block is lower-triangular (run_captioning.py:307)
        np.testing.assert_array_equal(attn[0, :a, :a],
                                      np.tril(np.ones((a, a))))
        # context rows never see the caption (:309-316 leave those 0)
        assert np.all(attn[:, a:, :a] == 0)
        # padded tags/regions are invisible everywhere
        assert np.all(attn[1, :, a + 3:s] == 0)
        assert np.all(attn[1, :, s + 4:] == 0)
        # real context fully bidirectional (batch row 0 has no padding)
        assert np.all(attn[0, a:, a:] == 1)

    def test_context_logits_blind_to_caption(self, tiny):
        cfg, model, params, text, segs, img, tag_mask, img_mask, _ = tiny
        attn = jnp.asarray(tiny[8])
        a = cfg.max_seq_a_len
        out1 = model.apply(params, jnp.asarray(text), jnp.asarray(segs),
                           jnp.asarray(img), attn)
        text2 = text.copy()
        text2[:, 1:a] = 7     # rewrite the whole caption region
        out2 = model.apply(params, jnp.asarray(text2), jnp.asarray(segs),
                           jnp.asarray(img), attn)
        # only REAL context rows: fully-padded attention rows fall back
        # to uniform attention (same as torch additive-mask semantics)
        # and are never consumed
        real = np.concatenate([tag_mask, img_mask], -1).astype(bool)
        d1 = np.asarray(out1[:, a:])[real]
        d2 = np.asarray(out2[:, a:])[real]
        np.testing.assert_allclose(d1, d2, atol=1e-5)

    def test_caption_position_causal(self, tiny):
        cfg, model, params, text, segs, img, *_ = tiny
        attn = jnp.asarray(tiny[8])
        out1 = model.apply(params, jnp.asarray(text), jnp.asarray(segs),
                           jnp.asarray(img), attn)
        text2 = text.copy()
        text2[:, 5] = 9       # future caption slot (t=5)
        out2 = model.apply(params, jnp.asarray(text2), jnp.asarray(segs),
                           jnp.asarray(img), attn)
        np.testing.assert_allclose(np.asarray(out1[:, :5]),
                                   np.asarray(out2[:, :5]), atol=1e-5)
        # ...but positions >= 5 do change
        assert not np.allclose(np.asarray(out1[:, 5]),
                               np.asarray(out2[:, 5]), atol=1e-5)

    def test_tags_do_change_caption_logits(self, tiny):
        cfg, model, params, text, segs, img, *_ = tiny
        attn = jnp.asarray(tiny[8])
        a = cfg.max_seq_a_len
        out1 = model.apply(params, jnp.asarray(text), jnp.asarray(segs),
                           jnp.asarray(img), attn)
        text2 = text.copy()
        text2[:, a] = (text2[:, a] + 1) % cfg.bert.vocab_size
        out2 = model.apply(params, jnp.asarray(text2), jnp.asarray(segs),
                           jnp.asarray(img), attn)
        assert not np.allclose(np.asarray(out1[:, 1]),
                               np.asarray(out2[:, 1]), atol=1e-5)


class TestGreedy:
    def test_decode_contract(self, tiny):
        cfg, model, params, text, segs, img, tag_mask, img_mask, _ = tiny
        a = cfg.max_seq_a_len
        tags = jnp.asarray(text[:, a:])
        cap, lengths = jax.jit(
            lambda p, t, tm, i, im: greedy_caption(model, p, t, tm, i, im)
        )(params, tags, jnp.asarray(tag_mask), jnp.asarray(img),
          jnp.asarray(img_mask))
        cap, lengths = np.asarray(cap), np.asarray(lengths)
        assert cap.shape == (2, a)
        assert np.all(cap[:, 0] == cfg.cls_token_id)
        for row, n in zip(cap, lengths):
            sep = np.where(row == cfg.sep_token_id)[0]
            assert len(sep) >= 1           # always terminated
            first = sep[0]
            assert n == first + 1
            assert np.all(row[first + 1:] == cfg.pad_token_id)
            assert cfg.mask_token_id not in row

    def test_decode_captions_merges_wordpieces(self):
        vocab = {0: "[PAD]", 1: "[CLS]", 2: "[SEP]", 5: "play",
                 6: "##ing", 7: "dog"}
        ids = np.array([[1, 7, 5, 6, 2, 0]])
        out = decode_captions(ids, np.array([5]), vocab.__getitem__)
        assert out == ["dog playing"]


class TestConverter:
    def test_oscar_state_dict_roundtrip(self, tiny):
        torch = pytest.importorskip("torch")
        from transformers import BertConfig as HFBertConfig
        from transformers import BertModel as HFBert

        cfg, model, params, text, segs, img, *_ = tiny
        bc = cfg.bert
        hf_cfg = HFBertConfig(
            vocab_size=bc.vocab_size, hidden_size=bc.hidden_size,
            num_hidden_layers=bc.num_layers, num_attention_heads=bc.num_heads,
            intermediate_size=bc.intermediate_size,
            max_position_embeddings=bc.max_position_embeddings,
            type_vocab_size=bc.type_vocab_size)
        torch.manual_seed(0)
        hf = HFBert(hf_cfg).eval()
        sd = {f"bert.{k}": v for k, v in hf.state_dict().items()}
        rng = np.random.RandomState(1)
        h, v = bc.hidden_size, bc.vocab_size
        sd["bert.img_embedding.weight"] = torch.from_numpy(
            rng.randn(h, cfg.img_feature_dim).astype(np.float32))
        sd["bert.img_embedding.bias"] = torch.zeros(h)
        sd["cls.predictions.transform.dense.weight"] = torch.from_numpy(
            rng.randn(h, h).astype(np.float32))
        sd["cls.predictions.transform.dense.bias"] = torch.zeros(h)
        sd["cls.predictions.transform.LayerNorm.weight"] = torch.ones(h)
        sd["cls.predictions.transform.LayerNorm.bias"] = torch.zeros(h)
        sd["cls.predictions.bias"] = torch.zeros(v)
        conv = {"params": convert_oscar_captioner_params(sd, cfg)}

        def flat_shapes(tree):
            return {"/".join(map(str, p)): np.shape(x) for p, x in
                    jax.tree_util.tree_flatten_with_path(tree)[0]}

        assert flat_shapes(conv) == flat_shapes(params)
        attn = jnp.asarray(tiny[8])
        out = model.apply(conv, jnp.asarray(text), jnp.asarray(segs),
                          jnp.asarray(img), attn)
        assert np.isfinite(np.asarray(out)).all()


class TestPipelineChain:
    def test_vinvl_tsv_feeds_caption_inputs(self):
        """The VinVL TSV (raw 2048-d features) chains into the
        captioning driver's region builder: geometry is appended to
        reach img_feature_dim, tags come from detected classes."""
        import importlib.util
        import os
        spec = importlib.util.spec_from_file_location(
            "_run_captioning", os.path.join(
                os.path.dirname(__file__), "..", "scripts",
                "run_captioning.py"))
        rc = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(rc)

        import base64
        feat = np.arange(8, dtype=np.float32)
        pred = {"objects": [
            {"class": "dog", "rect": [0.0, 0.0, 50.0, 20.0], "conf": 0.9,
             "feature": base64.b64encode(feat.tobytes()).decode()},
            {"class": "cat", "rect": [5.0, 5.0, 30.0, 30.0], "conf": 0.8,
             "feature": base64.b64encode(feat.tobytes()).decode()}]}
        cfg = CaptionerConfig.tiny(img_feature_dim=14)   # 8 + 6 geometry
        img, mask, tags = rc.region_inputs(pred, cfg)
        assert img.shape == (cfg.max_img_seq_len, 14)
        assert mask.tolist() == [1, 1, 0, 0, 0, 0]
        assert tags == "dog cat"
        np.testing.assert_allclose(img[0, :8], feat)
        np.testing.assert_allclose(img[0, 8:],
                                   [0, 0, 1, 1, 1, 1], atol=1e-6)
        assert np.all(img[2:] == 0)


class TestOutputs:
    def test_caption_json_roundtrip(self, tmp_path):
        path = str(tmp_path / "test_predictions.json")
        write_caption_predictions(path, {"000000000009": "a dog runs",
                                         "000000000010": ["two cats"]})
        loader = LoadOscarCaptionFeatures()
        loader.setup(caption_features={"coco": path})
        out = loader()
        assert out["caption_features"]["000000000009"] == ["a dog runs"]
        assert out["caption_features"]["000000000010"] == ["two cats"]
