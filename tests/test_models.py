"""Model-architecture tests: shapes, invariants, and numerical parity of the
Flax encoders against HF torch implementations (tiny random configs)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ravqa_tpu.models import (
    BertConfig, BertModel, CLIPVisionModel, DPRModelConfig, DPRRetriever,
    FLMRModelConfig, FLMRRetriever, ViTConfig, convert_hf_bert_params,
    convert_hf_clip_vision_params, skiplist_mask,
)


def test_bert_parity_with_hf():
    import torch
    from transformers import BertConfig as HFBertConfig, BertModel as HFBert

    hf_cfg = HFBertConfig(vocab_size=128, hidden_size=32, num_hidden_layers=2,
                          num_attention_heads=4, intermediate_size=64,
                          max_position_embeddings=64, type_vocab_size=2,
                          hidden_dropout_prob=0.0,
                          attention_probs_dropout_prob=0.0)
    torch.manual_seed(0)
    hf = HFBert(hf_cfg).eval()
    cfg = BertConfig(vocab_size=128, hidden_size=32, num_layers=2,
                     num_heads=4, intermediate_size=64,
                     max_position_embeddings=64)
    params = convert_hf_bert_params(
        {("bert." + k): v for k, v in hf.state_dict().items()}, cfg)

    rng = np.random.default_rng(0)
    ids = rng.integers(1, 128, size=(2, 10)).astype(np.int32)
    mask = np.ones((2, 10), np.int32)
    mask[1, 7:] = 0

    with torch.no_grad():
        out = hf(input_ids=torch.tensor(ids.astype(np.int64)),
                 attention_mask=torch.tensor(mask.astype(np.int64)))
    got_h, got_p = BertModel(cfg).apply({"params": params}, jnp.array(ids),
                                        jnp.array(mask))
    np.testing.assert_allclose(np.asarray(got_h),
                               out.last_hidden_state.numpy(),
                               rtol=2e-4, atol=2e-5)
    np.testing.assert_allclose(np.asarray(got_p), out.pooler_output.numpy(),
                               rtol=2e-4, atol=2e-5)


def test_clip_vision_parity_with_hf():
    import torch
    from transformers import CLIPVisionConfig as HFC, CLIPVisionModel as HFM

    hf_cfg = HFC(hidden_size=32, intermediate_size=64, num_hidden_layers=2,
                 num_attention_heads=4, image_size=32, patch_size=8,
                 attention_dropout=0.0)
    torch.manual_seed(0)
    hf = HFM(hf_cfg).eval()
    cfg = ViTConfig(image_size=32, patch_size=8, hidden_size=32, num_layers=2,
                    num_heads=4, intermediate_size=64)
    params = convert_hf_clip_vision_params(hf.state_dict(), cfg)

    rng = np.random.default_rng(1)
    # HF expects (B, 3, H, W); ours is (B, H, W, 3)
    px = rng.normal(size=(2, 32, 32, 3)).astype(np.float32)
    with torch.no_grad():
        out = hf(pixel_values=torch.tensor(px.transpose(0, 3, 1, 2)))
    got_h, got_cls = CLIPVisionModel(cfg).apply({"params": params},
                                                jnp.array(px))
    np.testing.assert_allclose(np.asarray(got_h),
                               out.last_hidden_state.numpy(),
                               rtol=2e-4, atol=3e-5)
    # HF pooler_output = post_layernorm(CLS)
    np.testing.assert_allclose(np.asarray(got_cls),
                               out.pooler_output.numpy(),
                               rtol=2e-4, atol=3e-5)


class TestFLMR:
    @pytest.fixture(scope="class")
    def model(self):
        cfg = FLMRModelConfig.tiny()
        model = FLMRRetriever(cfg)
        rng = np.random.default_rng(2)
        b, nway, lq, ld = 2, 2, 8, 12
        batch = dict(
            query_input_ids=jnp.array(
                rng.integers(1, 512, size=(b, lq)), jnp.int32),
            query_attention_mask=jnp.ones((b, lq), jnp.int32),
            image_features=jnp.array(
                rng.normal(size=(b, 3, cfg.vision_dim)), jnp.float32),
            doc_input_ids=jnp.array(
                rng.integers(1, 512, size=(b * nway, ld)), jnp.int32),
            doc_attention_mask=jnp.ones((b * nway, ld), jnp.int32),
        )
        params = model.init(jax.random.PRNGKey(0), **batch)["params"]
        return cfg, model, params, batch

    def test_forward_and_shapes(self, model):
        cfg, m, params, batch = model
        out = m.apply({"params": params}, **batch)
        assert out["scores"].shape == (2, cfg.nway)
        assert np.isfinite(float(out["loss"]))
        assert float(out["ib_loss"]) >= 0

    def test_query_normalized_and_vision_tokens(self, model):
        cfg, m, params, batch = model
        q = m.apply({"params": params}, batch["query_input_ids"],
                    batch["query_attention_mask"], batch["image_features"],
                    method=FLMRRetriever.query)
        lq = batch["query_input_ids"].shape[1]
        n_vision = 3 * cfg.prefix_len  # 3 "ROIs" x prefix tokens
        assert q.shape == (2, lq + n_vision, cfg.dim)
        norms = np.linalg.norm(np.asarray(q), axis=-1)
        np.testing.assert_allclose(norms, 1.0, atol=1e-5)

    def test_query_pad_rows_zero(self, model):
        cfg, m, params, batch = model
        ids = np.asarray(batch["query_input_ids"]).copy()
        ids[:, -3:] = 0  # pad token
        q = m.apply({"params": params}, jnp.array(ids),
                    batch["query_attention_mask"], batch["image_features"],
                    method=FLMRRetriever.query)
        lq = ids.shape[1]
        np.testing.assert_allclose(np.asarray(q[:, lq - 3:lq]), 0.0,
                                   atol=1e-6)

    def test_doc_skiplist(self, model):
        cfg, m, params, batch = model
        skip = skiplist_mask(batch["doc_input_ids"], skip_ids=[5, 7])
        d, mask = m.apply({"params": params}, batch["doc_input_ids"],
                          batch["doc_attention_mask"], skip,
                          method=FLMRRetriever.doc)
        ids = np.asarray(batch["doc_input_ids"])
        zeroed = (ids == 5) | (ids == 7)
        assert np.allclose(np.asarray(mask)[zeroed], 0.0)
        assert np.allclose(np.asarray(d)[zeroed], 0.0, atol=1e-6)

    def test_vision_only_pretraining_query(self):
        cfg = FLMRModelConfig.tiny(query_mode="vision_only")
        m = FLMRRetriever(cfg)
        rng = np.random.default_rng(3)
        feats = jnp.array(rng.normal(size=(2, cfg.vision_dim)), jnp.float32)
        params = m.init(jax.random.PRNGKey(0), image_features=feats,
                        doc_input_ids=jnp.ones((4, 6), jnp.int32),
                        doc_attention_mask=jnp.ones((4, 6), jnp.int32))["params"]
        q = m.apply({"params": params}, image_features=feats,
                    method=FLMRRetriever.query)
        assert q.shape == (2, cfg.prefix_len, cfg.dim)


def test_flmr_in_graph_vision():
    vit = ViTConfig.tiny()
    cfg = FLMRModelConfig.tiny(in_graph_vision=True, vit=vit,
                               vision_dim=vit.hidden_size)
    m = FLMRRetriever(cfg)
    rng = np.random.default_rng(4)
    b, lq, ld, nway = 2, 6, 8, 2
    batch = dict(
        query_input_ids=jnp.array(rng.integers(1, 512, (b, lq)), jnp.int32),
        query_attention_mask=jnp.ones((b, lq), jnp.int32),
        pixel_values=jnp.array(rng.normal(size=(b, 32, 32, 3)), jnp.float32),
        doc_input_ids=jnp.array(rng.integers(1, 512, (b * nway, ld)),
                                jnp.int32),
        doc_attention_mask=jnp.ones((b * nway, ld), jnp.int32),
    )
    params = m.init(jax.random.PRNGKey(0), **batch)["params"]
    out = m.apply({"params": params}, **batch)
    assert np.isfinite(float(out["loss"]))


def test_dpr_retriever():
    cfg = DPRModelConfig.tiny()
    m = DPRRetriever(cfg)
    rng = np.random.default_rng(5)
    b, nway, l = 3, 2, 7
    batch = dict(
        query_input_ids=jnp.array(rng.integers(1, 512, (b, l)), jnp.int32),
        query_attention_mask=jnp.ones((b, l), jnp.int32),
        item_input_ids=jnp.array(rng.integers(1, 512, (b * nway, l)),
                                 jnp.int32),
        item_attention_mask=jnp.ones((b * nway, l), jnp.int32),
    )
    params = m.init(jax.random.PRNGKey(0), **batch)["params"]
    out = m.apply({"params": params}, **batch)
    assert out["scores"].shape == (b, b * nway)
    assert np.isfinite(float(out["loss"]))


def test_flmr_flipr_interaction():
    """FLIPR-configured model trains with partial top-k scoring."""
    import jax
    cfg = FLMRModelConfig.tiny(interaction="flipr",
                               flipr_query_part_len=8, flipr_k1=4,
                               flipr_k2=2)
    m = FLMRRetriever(cfg)
    rng = np.random.default_rng(7)
    batch = dict(
        query_input_ids=jnp.array(rng.integers(1, 512, (2, 8)), jnp.int32),
        query_attention_mask=jnp.ones((2, 8), jnp.int32),
        image_features=jnp.array(rng.normal(size=(2, cfg.vision_dim)),
                                 jnp.float32),
        doc_input_ids=jnp.array(rng.integers(1, 512, (4, 10)), jnp.int32),
        doc_attention_mask=jnp.ones((4, 10), jnp.int32),
    )
    params = m.init(jax.random.PRNGKey(0), **batch)["params"]
    out = m.apply({"params": params}, **batch)
    assert np.isfinite(float(out["loss"]))
    # flipr score must differ from colbert score for the same params
    cfg2 = FLMRModelConfig.tiny()
    out2 = FLMRRetriever(cfg2).apply({"params": params}, **batch)
    assert not np.allclose(np.asarray(out["scores"]),
                           np.asarray(out2["scores"]))


def test_multimodal_docs():
    """Doc-side vision tokens (the reference's latent multimodal-doc path,
    implemented live here): doc embeddings gain doc_prefix_len tokens."""
    import jax
    cfg = FLMRModelConfig.tiny(multimodal_docs=True, doc_prefix_len=3)
    m = FLMRRetriever(cfg)
    rng = np.random.default_rng(8)
    batch = dict(
        query_input_ids=jnp.array(rng.integers(1, 512, (2, 8)), jnp.int32),
        query_attention_mask=jnp.ones((2, 8), jnp.int32),
        image_features=jnp.array(rng.normal(size=(2, cfg.vision_dim)),
                                 jnp.float32),
        doc_input_ids=jnp.array(rng.integers(1, 512, (4, 10)), jnp.int32),
        doc_attention_mask=jnp.ones((4, 10), jnp.int32),
        doc_image_features=jnp.array(rng.normal(size=(4, cfg.vision_dim)),
                                     jnp.float32),
    )
    params = m.init(jax.random.PRNGKey(0), **batch)["params"]
    assert "doc_vision_projection" in params
    d, mask = m.apply({"params": params}, batch["doc_input_ids"],
                      batch["doc_attention_mask"], None,
                      batch["doc_image_features"],
                      method=FLMRRetriever.doc)
    assert d.shape == (4, 10 + 3, cfg.dim)
    assert mask.shape == (4, 13) and np.asarray(mask)[:, -3:].all()
    out = m.apply({"params": params}, **batch)
    assert np.isfinite(float(out["loss"]))


def test_transformer_mapping_query():
    """PreFLMR transformer mapping: patch features cross-attend to text and
    add one late-interaction token per patch (companion FLMR repo's
    transformer_mapping_network; not in the /root/reference snapshot)."""
    import jax
    cfg = FLMRModelConfig.tiny(use_transformer_mapping=True,
                               transformer_mapping_hidden=32,
                               transformer_mapping_num_heads=4,
                               vision_patch_dim=24)
    m = FLMRRetriever(cfg)
    rng = np.random.default_rng(9)
    b, lq, n_patch = 2, 8, 5
    ids = jnp.array(rng.integers(1, 512, (b, lq)), jnp.int32)
    amask = jnp.ones((b, lq), jnp.int32)
    feats = jnp.array(rng.normal(size=(b, cfg.vision_dim)), jnp.float32)
    patches = jnp.array(rng.normal(size=(b, n_patch, 24)), jnp.float32)
    batch = dict(query_input_ids=ids, query_attention_mask=amask,
                 image_features=feats, image_patch_features=patches,
                 doc_input_ids=jnp.array(rng.integers(1, 512, (4, 10)),
                                         jnp.int32),
                 doc_attention_mask=jnp.ones((4, 10), jnp.int32))
    params = m.init(jax.random.PRNGKey(0), **batch)["params"]
    assert "transformer_mapping" in params
    q = m.apply({"params": params}, ids, amask, feats, None, patches,
                method=FLMRRetriever.query)
    # text tokens + MLP prefix tokens + one token per patch
    assert q.shape == (b, lq + cfg.prefix_len + n_patch, cfg.dim)
    np.testing.assert_allclose(np.linalg.norm(np.asarray(q), axis=-1),
                               1.0, atol=1e-5)
    # the mapping is text-conditioned: different text -> different
    # transformer-mapping tokens for the same image
    ids2 = jnp.array(rng.integers(1, 512, (b, lq)), jnp.int32)
    q2 = m.apply({"params": params}, ids2, amask, feats, None, patches,
                 method=FLMRRetriever.query)
    tm1, tm2 = np.asarray(q[:, -n_patch:]), np.asarray(q2[:, -n_patch:])
    assert np.abs(tm1 - tm2).max() > 1e-4
    # training forward runs and is finite
    out = m.apply({"params": params}, **batch)
    assert np.isfinite(float(out["loss"]))


def test_transformer_mapping_in_graph_vision():
    """With in_graph_vision and no precomputed patches, the vision model's
    patch rows feed the transformer mapping."""
    import jax
    vit = ViTConfig.tiny()
    cfg = FLMRModelConfig.tiny(use_transformer_mapping=True,
                               transformer_mapping_hidden=32,
                               transformer_mapping_num_heads=4,
                               in_graph_vision=True, vit=vit,
                               vision_dim=vit.hidden_size,
                               vision_patch_dim=vit.hidden_size)
    m = FLMRRetriever(cfg)
    rng = np.random.default_rng(10)
    b, lq = 2, 6
    batch = dict(
        query_input_ids=jnp.array(rng.integers(1, 512, (b, lq)), jnp.int32),
        query_attention_mask=jnp.ones((b, lq), jnp.int32),
        pixel_values=jnp.array(rng.normal(size=(b, 32, 32, 3)), jnp.float32),
        doc_input_ids=jnp.array(rng.integers(1, 512, (4, 8)), jnp.int32),
        doc_attention_mask=jnp.ones((4, 8), jnp.int32),
    )
    params = m.init(jax.random.PRNGKey(0), **batch)["params"]
    q = m.apply({"params": params}, batch["query_input_ids"],
                batch["query_attention_mask"], None, batch["pixel_values"],
                method=FLMRRetriever.query)
    n_patch = vit.num_patches
    assert q.shape == (b, lq + cfg.prefix_len + n_patch, cfg.dim)
    out = m.apply({"params": params}, **batch)
    assert np.isfinite(float(out["loss"]))
