"""BLIP-2 parity test against HF Blip2ForConditionalGeneration (tiny T5)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from ravqa_tpu.models.blip2 import (Blip2Config, Blip2T5, Blip2VisionConfig,
                                    QFormerConfig, convert_hf_blip2_params)
from ravqa_tpu.models.t5 import T5Config


@pytest.fixture(scope="module")
def hf_blip2():
    import torch
    from transformers import (Blip2Config as HFBlip2Config,
                              Blip2ForConditionalGeneration)
    from transformers import Blip2QFormerConfig, Blip2VisionConfig as HFV
    from transformers import T5Config as HFT5

    vis = HFV(hidden_size=32, intermediate_size=64, num_hidden_layers=2,
              num_attention_heads=4, image_size=32, patch_size=8,
              attention_dropout=0.0)
    qf = Blip2QFormerConfig(hidden_size=32, num_hidden_layers=2,
                            num_attention_heads=4, intermediate_size=64,
                            encoder_hidden_size=32,
                            cross_attention_frequency=2,
                            hidden_dropout_prob=0.0,
                            attention_probs_dropout_prob=0.0)
    t5 = HFT5(vocab_size=128, d_model=32, d_kv=8, d_ff=64, num_layers=2,
              num_heads=4, dropout_rate=0.0, tie_word_embeddings=True,
              feed_forward_proj="relu")
    cfg = HFBlip2Config.from_vision_qformer_text_configs(vis, qf, t5)
    cfg.num_query_tokens = 4
    cfg.use_decoder_only_language_model = False
    cfg.image_token_id = 126  # newer HF: vision embeds fill these slots
    torch.manual_seed(0)
    hf = Blip2ForConditionalGeneration(cfg).eval()
    return hf


def test_blip2_parity(hf_blip2):
    import torch
    hf = hf_blip2
    cfg = Blip2Config(
        vision=Blip2VisionConfig.tiny(),
        qformer=QFormerConfig.tiny(),
        t5=T5Config(vocab_size=128, d_model=32, d_kv=8, d_ff=64,
                    num_layers=2, num_heads=4),
        num_query_tokens=4)
    params = convert_hf_blip2_params(hf.state_dict(), cfg)
    model = Blip2T5(cfg)

    rng = np.random.default_rng(0)
    px = rng.normal(size=(2, 32, 32, 3)).astype(np.float32)
    ids = rng.integers(2, 126, (2, 6)).astype(np.int64)
    mask = np.ones((2, 6), np.int64)
    dec = rng.integers(2, 126, (2, 3)).astype(np.int64)

    # HF expects image-token placeholders; prepend num_query_tokens of them
    # (equivalent to our model's prepend-vision-embeds layout)
    img_tok = np.full((2, 4), 126, np.int64)
    ids_hf = np.concatenate([img_tok, ids], 1)
    mask_hf = np.concatenate([np.ones((2, 4), np.int64), mask], 1)
    with torch.no_grad():
        out = hf(pixel_values=torch.tensor(px.transpose(0, 3, 1, 2)),
                 input_ids=torch.tensor(ids_hf),
                 attention_mask=torch.tensor(mask_hf),
                 decoder_input_ids=torch.tensor(dec))
    got = model.apply({"params": params}, jnp.array(px),
                      jnp.array(ids, jnp.int32), jnp.array(mask, jnp.int32),
                      jnp.array(dec, jnp.int32))
    np.testing.assert_allclose(np.asarray(got), out.logits.numpy(),
                               rtol=5e-4, atol=5e-4)


def test_blip2_generation_pipeline(hf_blip2):
    """Greedy generation through the Blip2T5 decode API."""
    from ravqa_tpu.models.generation import greedy_generate
    hf = hf_blip2
    cfg = Blip2Config(
        vision=Blip2VisionConfig.tiny(), qformer=QFormerConfig.tiny(),
        t5=T5Config(vocab_size=128, d_model=32, d_kv=8, d_ff=64,
                    num_layers=2, num_heads=4),
        num_query_tokens=4)
    params = convert_hf_blip2_params(hf.state_dict(), cfg)
    model = Blip2T5(cfg)
    rng = np.random.default_rng(1)
    px = jnp.array(rng.normal(size=(2, 32, 32, 3)), jnp.float32)
    ids = jnp.array(rng.integers(2, 128, (2, 5)), jnp.int32)
    mask = jnp.ones((2, 5), jnp.int32)
    enc, full_mask = model.apply({"params": params}, px, ids, mask,
                                 method=Blip2T5.encode)

    def step(tok, cache):
        return model.apply({"params": params}, tok, enc, full_mask, cache,
                           method=Blip2T5.decode_step)
    cache = model.apply({"params": params}, 2, 6, method=Blip2T5.init_cache)
    toks, lp = greedy_generate(step, cache, batch=2, max_len=6, start_id=0,
                               eos_id=1)
    assert toks.shape == (2, 6)
    assert np.isfinite(np.asarray(lp)).all()
