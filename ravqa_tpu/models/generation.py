"""Autoregressive decoding (greedy + beam) for the T5/BLIP-2 generators.

lax.scan-based with static shapes and KV caches — the TPU equivalent of the
reference's HF `generate()` calls (rag_model_blip.py:735-824). Beam search
returns per-sequence log-probs so the RAG answer selection can combine
log g(z|x) + log p(y|x,z).
"""

from __future__ import annotations

import functools
from typing import Callable

import jax
import jax.numpy as jnp

NEG = -1e9


def greedy_generate(decode_step: Callable, init_cache, batch: int,
                    max_len: int, start_id: int, eos_id: int,
                    pad_id: int = 0):
    """decode_step(tokens (B,1), cache) -> (logits (B,1,V), cache).

    Returns (tokens (B, max_len), seq_logprob (B,)). Sequences stop at EOS
    (pad after); logprob sums only pre-EOS tokens (incl. the EOS itself).
    """
    def body(carry, _):
        tok, cache, done, lp = carry
        logits, cache = decode_step(tok, cache)
        logp = jax.nn.log_softmax(logits[:, -1].astype(jnp.float32), -1)
        nxt = jnp.argmax(logp, -1)                      # (B,)
        step_lp = jnp.take_along_axis(logp, nxt[:, None], -1)[:, 0]
        nxt = jnp.where(done, pad_id, nxt)
        lp = lp + jnp.where(done, 0.0, step_lp)
        done = done | (nxt == eos_id)
        return (nxt[:, None], cache, done, lp), nxt

    tok0 = jnp.full((batch, 1), start_id, jnp.int32)
    done0 = jnp.zeros((batch,), bool)
    lp0 = jnp.zeros((batch,), jnp.float32)
    (_, _, _, lp), toks = jax.lax.scan(
        body, (tok0, init_cache, done0, lp0), None, length=max_len)
    return toks.T.astype(jnp.int32), lp                 # (B, max_len), (B,)


def beam_generate(decode_step: Callable, init_cache_fn, batch: int,
                  n_beams: int, max_len: int, start_id: int, eos_id: int,
                  pad_id: int = 0, length_penalty: float = 0.0):
    """Beam search.

    decode_step(tokens (B*beam, 1), cache) -> (logits, cache); the cache must
    be created by init_cache_fn(batch*n_beams) so beams ride the batch dim.

    Returns (tokens (B, n_beams, max_len), scores (B, n_beams)) sorted best
    first; scores are total log-probs (optionally length-normalized).
    """
    v_done_mask = None

    def body(carry, _):
        toks, cache, beam_lp, done, lengths, t = carry
        # toks: (B*beam, 1); beam_lp: (B, beam)
        logits, cache = decode_step(toks, cache)
        logp = jax.nn.log_softmax(logits[:, -1].astype(jnp.float32), -1)
        vocab = logp.shape[-1]
        logp = logp.reshape(batch, n_beams, vocab)
        # finished beams: only allow emitting pad with 0 logprob
        pad_only = jnp.full((vocab,), NEG).at[pad_id].set(0.0)
        logp = jnp.where(done[:, :, None], pad_only[None, None], logp)
        cand = beam_lp[:, :, None] + logp               # (B, beam, V)
        flat = cand.reshape(batch, n_beams * vocab)
        top_lp, top_idx = jax.lax.top_k(flat, n_beams)  # (B, beam)
        src_beam = top_idx // vocab
        nxt_tok = top_idx % vocab
        # reorder cache & outputs along the beam dim
        def reorder(x):
            xb = x.reshape((batch, n_beams) + x.shape[1:])
            xb = jnp.take_along_axis(
                xb, src_beam.reshape((batch, n_beams) +
                                     (1,) * (xb.ndim - 2)), axis=1)
            return xb.reshape((batch * n_beams,) + x.shape[1:])
        cache = jax.tree.map(
            lambda x: reorder(x) if x.ndim > 1 else x, cache)
        done = jnp.take_along_axis(done, src_beam, 1)
        lengths = jnp.take_along_axis(lengths, src_beam, 1)
        lengths = lengths + (~done).astype(jnp.int32)
        done = done | (nxt_tok == eos_id)
        nxt_flat = nxt_tok.reshape(batch * n_beams, 1).astype(jnp.int32)
        return (nxt_flat, cache, top_lp, done, lengths, t + 1), \
            (nxt_tok, src_beam)

    tok0 = jnp.full((batch * n_beams, 1), start_id, jnp.int32)
    cache0 = init_cache_fn(batch * n_beams)
    # first step: only beam 0 is live (others start at -inf)
    lp0 = jnp.tile(jnp.array([0.0] + [NEG] * (n_beams - 1))[None],
                   (batch, 1))
    done0 = jnp.zeros((batch, n_beams), bool)
    len0 = jnp.zeros((batch, n_beams), jnp.int32)
    (_, _, beam_lp, done, lengths, _), (toks, srcs) = jax.lax.scan(
        body, (tok0, cache0, lp0, done0, len0, jnp.zeros((), jnp.int32)),
        None, length=max_len)
    # backtrack: toks (T, B, beam), srcs (T, B, beam)
    def backtrack(carry, xs):
        beam_ptr = carry                                 # (B, beam)
        tok_t, src_t = xs
        tok = jnp.take_along_axis(tok_t, beam_ptr, 1)
        beam_ptr = jnp.take_along_axis(src_t, beam_ptr, 1)
        return beam_ptr, tok
    ptr0 = jnp.tile(jnp.arange(n_beams)[None], (batch, 1))
    _, rev = jax.lax.scan(backtrack, ptr0, (toks[::-1], srcs[::-1]))
    seqs = rev[::-1].transpose(1, 2, 0)                  # (B, beam, T)
    scores = beam_lp
    if length_penalty > 0:
        scores = scores / (lengths.astype(jnp.float32) ** length_penalty)
    order = jnp.argsort(-scores, axis=1)
    seqs = jnp.take_along_axis(seqs, order[:, :, None], 1)
    scores = jnp.take_along_axis(scores, order, 1)
    return seqs.astype(jnp.int32), scores
