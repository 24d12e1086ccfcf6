"""FLMR checkpoint conversion parity: build the reference architecture in
torch (BERT + bias-free linear + Tanh-MLP vision projection), convert, and
compare query()/doc() outputs computed both ways."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from ravqa_tpu.models import FLMRModelConfig, FLMRRetriever, BertConfig
from ravqa_tpu.models.convert_flmr import (convert_hf_flmr_params,
                                           convert_mlp_params)


@pytest.fixture(scope="module")
def torch_world():
    import torch
    from transformers import BertConfig as HFBertConfig, BertModel as HFBert

    torch.manual_seed(0)
    hf_cfg = HFBertConfig(vocab_size=128, hidden_size=32,
                          num_hidden_layers=2, num_attention_heads=4,
                          intermediate_size=64, max_position_embeddings=64,
                          hidden_dropout_prob=0.0,
                          attention_probs_dropout_prob=0.0)
    bert = HFBert(hf_cfg).eval()
    dim, vdim, prefix = 16, 24, 4
    linear = torch.nn.Linear(32, dim, bias=False)
    mlp = torch.nn.Sequential(
        torch.nn.Linear(vdim, (dim * prefix) // 2), torch.nn.Tanh(),
        torch.nn.Linear((dim * prefix) // 2, dim * prefix))
    sd = {("bert." + k): v for k, v in bert.state_dict().items()}
    sd["linear.weight"] = linear.weight
    vp_sd = {("model." + k): v for k, v in mlp.state_dict().items()}
    return bert, linear, mlp, sd, vp_sd, (dim, vdim, prefix)


def test_flmr_query_doc_parity(torch_world):
    import torch
    bert, linear, mlp, sd, vp_sd, (dim, vdim, prefix) = torch_world
    cfg = FLMRModelConfig(
        bert=BertConfig(vocab_size=128, hidden_size=32, num_layers=2,
                        num_heads=4, intermediate_size=64,
                        max_position_embeddings=64),
        dim=dim, vision_dim=vdim, prefix_len=prefix)
    params = convert_hf_flmr_params(sd, cfg, vision_projection_sd=vp_sd)
    model = FLMRRetriever(cfg)

    rng = np.random.default_rng(0)
    ids = rng.integers(1, 128, (2, 10)).astype(np.int32)
    ids[1, 7:] = 0  # pads
    mask = (ids != 0).astype(np.int32)
    feats = rng.normal(size=(2, vdim)).astype(np.float32)

    # reference computation in torch (FLMR.query semantics)
    with torch.no_grad():
        h = bert(input_ids=torch.tensor(ids.astype(np.int64)),
                 attention_mask=torch.tensor(mask.astype(np.int64)))[0]
        q = linear(h)
        m = torch.tensor((ids != 0).astype(np.float32)).unsqueeze(2)
        q = q * m
        v = mlp(torch.tensor(feats)).reshape(2, -1, dim)
        qq = torch.cat([q, v], dim=1)
        want = torch.nn.functional.normalize(qq, p=2, dim=2).numpy()

    got = np.asarray(model.apply({"params": params}, jnp.array(ids),
                                 jnp.array(mask), jnp.array(feats),
                                 method=FLMRRetriever.query))
    np.testing.assert_allclose(got, want, rtol=3e-4, atol=3e-5)

    # doc parity (empty skiplist)
    with torch.no_grad():
        d = linear(bert(input_ids=torch.tensor(ids.astype(np.int64)),
                        attention_mask=torch.tensor(
                            mask.astype(np.int64)))[0])
        d = d * m
        want_d = torch.nn.functional.normalize(d, p=2, dim=2).numpy()
    got_d, _ = model.apply({"params": params}, jnp.array(ids),
                           jnp.array(mask), method=FLMRRetriever.doc)
    np.testing.assert_allclose(np.asarray(got_d), want_d, rtol=3e-4,
                               atol=3e-5)


def test_separate_question_encoder_conversion(torch_world):
    _, _, _, sd, vp_sd, (dim, vdim, prefix) = torch_world
    cfg = FLMRModelConfig(
        bert=BertConfig(vocab_size=128, hidden_size=32, num_layers=2,
                        num_heads=4, intermediate_size=64,
                        max_position_embeddings=64),
        dim=dim, vision_dim=vdim, prefix_len=prefix,
        separate_question_encoder=True)
    params = convert_hf_flmr_params(sd, cfg, vision_projection_sd=vp_sd)
    assert "query_encoder" in params
    a = jax.tree.leaves(params["query_encoder"])[0]
    b = jax.tree.leaves(params["doc_encoder"])[0]
    np.testing.assert_array_equal(a, b)  # falls back to shared weights


def test_export_roundtrip(tmp_path, torch_world):
    """Export our params to the HF format and re-import: identity."""
    import torch
    from ravqa_tpu.models.convert_flmr import export_flmr_to_hf_format
    _, _, _, sd, vp_sd, (dim, vdim, prefix) = torch_world
    cfg = FLMRModelConfig(
        bert=BertConfig(vocab_size=128, hidden_size=32, num_layers=2,
                        num_heads=4, intermediate_size=64,
                        max_position_embeddings=64),
        dim=dim, vision_dim=vdim, prefix_len=prefix)
    params = convert_hf_flmr_params(sd, cfg, vision_projection_sd=vp_sd)
    export_flmr_to_hf_format(params, cfg, str(tmp_path / "hf"))
    sd2 = torch.load(tmp_path / "hf" / "pytorch_model.bin",
                     weights_only=True)
    vp2 = torch.load(tmp_path / "hf" / "vision_projection.pt",
                     weights_only=True)
    params2 = convert_hf_flmr_params(sd2, cfg, vision_projection_sd=vp2)
    import jax
    for a, b in zip(jax.tree.leaves(params), jax.tree.leaves(params2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-6, atol=1e-6)


def test_transformer_mapping_conversion_parity():
    """TransformerMapping vs the companion repo's construction: a HF
    BertLayer with add_cross_attention=True bracketed by input/output
    linears. Converted weights must reproduce torch outputs."""
    import torch
    from transformers.models.bert.modeling_bert import BertLayer
    from transformers import BertConfig as HFBertConfig
    from ravqa_tpu.models.convert_flmr import (
        convert_transformer_mapping_params)
    from ravqa_tpu.models.mapping import TransformerMapping

    torch.manual_seed(1)
    h, nh, inter, vdim, lmdim = 32, 4, 64, 24, 16
    hf_cfg = HFBertConfig(hidden_size=h, num_attention_heads=nh,
                          intermediate_size=inter, is_decoder=True,
                          add_cross_attention=True,
                          hidden_dropout_prob=0.0,
                          attention_probs_dropout_prob=0.0)
    hf_cfg._attn_implementation = "eager"
    layer = BertLayer(hf_cfg).eval()
    lin_in = torch.nn.Linear(vdim, h)
    lin_out = torch.nn.Linear(h, lmdim)

    sd = {"transformer_mapping_input_linear.weight": lin_in.weight,
          "transformer_mapping_input_linear.bias": lin_in.bias,
          "transformer_mapping_output_linear.weight": lin_out.weight,
          "transformer_mapping_output_linear.bias": lin_out.bias}
    sd.update({f"transformer_mapping_network.layer.0.{k}": v
               for k, v in layer.state_dict().items()})

    params = convert_transformer_mapping_params(sd, num_layers=1,
                                                num_heads=nh)
    m = TransformerMapping(vision_dim=vdim, hidden_size=h, lm_dim=lmdim,
                           num_layers=1, num_heads=nh,
                           intermediate_size=inter)

    rng = np.random.default_rng(3)
    patches = rng.normal(size=(2, 5, vdim)).astype(np.float32)
    text = rng.normal(size=(2, 7, h)).astype(np.float32)
    tmask = np.ones((2, 7), np.int32)
    tmask[1, 5:] = 0

    with torch.no_grad():
        x = lin_in(torch.tensor(patches))
        ext = (1.0 - torch.tensor(tmask, dtype=torch.float32)) * -1e9
        ext = ext[:, None, None, :]
        y = layer(x, attention_mask=None,
                  encoder_hidden_states=torch.tensor(text),
                  encoder_attention_mask=ext)[0]
        want = lin_out(y).numpy()

    got = np.asarray(m.apply({"params": params}, jnp.array(patches),
                             jnp.array(text), jnp.array(tmask)))
    np.testing.assert_allclose(got, want, atol=2e-5)


def test_transformer_mapping_export_roundtrip():
    """export_transformer_mapping_params inverts the converter exactly."""
    import jax
    from ravqa_tpu.models.convert_flmr import (
        convert_transformer_mapping_params, export_transformer_mapping_params)
    from ravqa_tpu.models.mapping import TransformerMapping

    h, nh, inter, vdim, lmdim = 32, 4, 64, 24, 16
    m = TransformerMapping(vision_dim=vdim, hidden_size=h, lm_dim=lmdim,
                           num_layers=2, num_heads=nh,
                           intermediate_size=inter)
    rng = np.random.default_rng(4)
    patches = jnp.array(rng.normal(size=(1, 3, vdim)), jnp.float32)
    text = jnp.array(rng.normal(size=(1, 5, h)), jnp.float32)
    tmask = jnp.ones((1, 5), jnp.int32)
    params = m.init(jax.random.PRNGKey(2), patches, text, tmask)["params"]

    sd = export_transformer_mapping_params(params, num_heads=nh)
    back = convert_transformer_mapping_params(sd, num_layers=2, num_heads=nh)
    flat_a = jax.tree_util.tree_leaves_with_path(params)
    flat_b = dict(jax.tree_util.tree_leaves_with_path(back))
    assert len(flat_a) == len(flat_b)
    for path, leaf in flat_a:
        np.testing.assert_allclose(np.asarray(leaf), flat_b[path],
                                   atol=1e-6, err_msg=str(path))
