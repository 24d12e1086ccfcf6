"""T5 tests: HF numerical parity, incremental-decode consistency, greedy and
beam generation."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ravqa_tpu.models.t5 import (T5Config, T5Model, convert_hf_t5_params,
                                 shift_right)
from ravqa_tpu.models.generation import beam_generate, greedy_generate


@pytest.fixture(scope="module")
def hf_pair():
    import torch
    from transformers import T5Config as HFC, T5ForConditionalGeneration

    hf_cfg = HFC(vocab_size=128, d_model=32, d_kv=8, d_ff=64, num_layers=2,
                 num_heads=4, dropout_rate=0.0, tie_word_embeddings=True,
                 feed_forward_proj="relu")
    torch.manual_seed(0)
    hf = T5ForConditionalGeneration(hf_cfg).eval()
    cfg = T5Config(vocab_size=128, d_model=32, d_kv=8, d_ff=64, num_layers=2,
                   num_heads=4)
    params = convert_hf_t5_params(hf.state_dict(), cfg)
    return hf, cfg, params


def test_t5_parity_with_hf(hf_pair):
    import torch
    hf, cfg, params = hf_pair
    rng = np.random.default_rng(0)
    ids = rng.integers(2, 128, (2, 9)).astype(np.int64)
    mask = np.ones((2, 9), np.int64); mask[1, 6:] = 0
    dec = rng.integers(2, 128, (2, 5)).astype(np.int64)
    with torch.no_grad():
        out = hf(input_ids=torch.tensor(ids),
                 attention_mask=torch.tensor(mask),
                 decoder_input_ids=torch.tensor(dec))
    model = T5Model(cfg)
    got = model.apply({"params": params}, jnp.array(ids, jnp.int32),
                      jnp.array(mask, jnp.int32), jnp.array(dec, jnp.int32))
    np.testing.assert_allclose(np.asarray(got), out.logits.numpy(),
                               rtol=3e-4, atol=3e-4)


def test_t5_gated_gelu_parity():
    import torch
    from transformers import T5Config as HFC, T5ForConditionalGeneration
    hf_cfg = HFC(vocab_size=96, d_model=32, d_kv=8, d_ff=64, num_layers=2,
                 num_heads=4, dropout_rate=0.0, tie_word_embeddings=False,
                 feed_forward_proj="gated-gelu")
    torch.manual_seed(1)
    hf = T5ForConditionalGeneration(hf_cfg).eval()
    cfg = T5Config(vocab_size=96, d_model=32, d_kv=8, d_ff=64, num_layers=2,
                   num_heads=4, feed_forward_proj="gated-gelu",
                   tie_word_embeddings=False)
    params = convert_hf_t5_params(hf.state_dict(), cfg)
    rng = np.random.default_rng(2)
    ids = rng.integers(2, 96, (2, 7)).astype(np.int64)
    dec = rng.integers(2, 96, (2, 4)).astype(np.int64)
    with torch.no_grad():
        out = hf(input_ids=torch.tensor(ids),
                 decoder_input_ids=torch.tensor(dec))
    got = T5Model(cfg).apply({"params": params}, jnp.array(ids, jnp.int32),
                             jnp.ones_like(jnp.array(ids, jnp.int32)),
                             jnp.array(dec, jnp.int32))
    np.testing.assert_allclose(np.asarray(got), out.logits.numpy(),
                               rtol=3e-4, atol=3e-4)


def test_incremental_decode_matches_teacher_forcing(hf_pair):
    _, cfg, params = hf_pair
    model = T5Model(cfg)
    rng = np.random.default_rng(3)
    ids = jnp.array(rng.integers(2, 128, (2, 6)), jnp.int32)
    mask = jnp.ones((2, 6), jnp.int32)
    dec = jnp.array(rng.integers(2, 128, (2, 4)), jnp.int32)

    enc = model.apply({"params": params}, ids, mask, method=T5Model.encode)
    full = model.apply({"params": params}, dec, enc, mask,
                       method=T5Model.decode)
    cache = model.apply({"params": params}, 2, 8, method=T5Model.init_cache)
    logits_steps = []
    for t in range(4):
        lg, cache = model.apply({"params": params}, dec[:, t:t + 1], enc,
                                mask, cache, method=T5Model.decode_step)
        logits_steps.append(np.asarray(lg[:, 0]))
    inc = np.stack(logits_steps, axis=1)
    np.testing.assert_allclose(inc, np.asarray(full), rtol=2e-4, atol=2e-4)


def test_shift_right():
    labels = jnp.array([[5, 6, -100]], jnp.int32)
    got = shift_right(labels, decoder_start_token_id=0, pad_token_id=0)
    np.testing.assert_array_equal(np.asarray(got), [[0, 5, 6]])


@pytest.fixture(scope="module")
def gen_setup(hf_pair):
    _, cfg, params = hf_pair
    model = T5Model(cfg)
    ids = jnp.array([[7, 8, 9, 10], [11, 12, 13, 14]], jnp.int32)
    mask = jnp.ones_like(ids)
    enc = model.apply({"params": params}, ids, mask, method=T5Model.encode)
    return cfg, model, params, enc, mask


def test_greedy_generate(gen_setup):
    cfg, model, params, enc, mask = gen_setup
    max_len = 6

    def step(tok, cache):
        return model.apply({"params": params}, tok, enc, mask, cache,
                           method=T5Model.decode_step)
    cache = model.apply({"params": params}, 2, max_len,
                        method=T5Model.init_cache)
    toks, lp = greedy_generate(step, cache, batch=2, max_len=max_len,
                               start_id=cfg.decoder_start_token_id,
                               eos_id=cfg.eos_token_id)
    assert toks.shape == (2, max_len)
    assert np.isfinite(np.asarray(lp)).all()


def test_beam_contains_greedy(gen_setup):
    """Beam-1 must equal greedy; beam-3's best score >= beam-1's."""
    cfg, model, params, enc, mask = gen_setup
    max_len = 5
    b = 2

    def make_step(n_rep):
        enc_r = jnp.repeat(enc, n_rep, 0)
        mask_r = jnp.repeat(mask, n_rep, 0)
        def step(tok, cache):
            return model.apply({"params": params}, tok, enc_r, mask_r,
                               cache, method=T5Model.decode_step)
        return step

    def cache_fn(n):
        return model.apply({"params": params}, n, max_len,
                           method=T5Model.init_cache)

    greedy_toks, greedy_lp = greedy_generate(
        make_step(1), cache_fn(b), batch=b, max_len=max_len,
        start_id=0, eos_id=cfg.eos_token_id)
    b1_toks, b1_scores = beam_generate(
        make_step(1), cache_fn, batch=b, n_beams=1, max_len=max_len,
        start_id=0, eos_id=cfg.eos_token_id)
    np.testing.assert_array_equal(np.asarray(b1_toks[:, 0]),
                                  np.asarray(greedy_toks))
    np.testing.assert_allclose(np.asarray(b1_scores[:, 0]),
                               np.asarray(greedy_lp), rtol=1e-4, atol=1e-4)
    b3_toks, b3_scores = beam_generate(
        make_step(3), cache_fn, batch=b, n_beams=3, max_len=max_len,
        start_id=0, eos_id=cfg.eos_token_id)
    assert (np.asarray(b3_scores[:, 0])
            >= np.asarray(b1_scores[:, 0]) - 1e-4).all()
