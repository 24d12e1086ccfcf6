"""Unit tests for MaxSim ops against brute-force numpy oracles."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ravqa_tpu.ops import (
    flipr_reduce,
    in_batch_negative_loss,
    maxsim_all_pairs_xla,
    maxsim_pair_xla,
    maxsim_search_pallas,
    maxsim_search_xla,
    nway_ce_loss,
)


def brute_maxsim(q, d, d_mask, q_mask=None):
    """Numpy oracle: sum_q max over *valid* doc tokens of q·d."""
    out = np.zeros(q.shape[0])
    for i in range(q.shape[0]):
        s = d[i] @ q[i].T                     # (Ld, Lq)
        s[~d_mask[i].astype(bool)] = -9999.0
        per_q = s.max(axis=0)
        if q_mask is not None:
            per_q = per_q * q_mask[i]
        out[i] = per_q.sum()
    return out


@pytest.fixture
def rand():
    rng = np.random.default_rng(0)
    b, lq, ld, dim = 4, 6, 9, 16
    q = rng.normal(size=(b, lq, dim)).astype(np.float32)
    d = rng.normal(size=(b, ld, dim)).astype(np.float32)
    d_mask = (rng.random((b, ld)) > 0.3).astype(np.float32)
    d_mask[:, 0] = 1.0  # at least one valid token
    return q, d, d_mask


def test_pair_matches_bruteforce(rand):
    q, d, d_mask = rand
    got = np.asarray(maxsim_pair_xla(jnp.array(q), jnp.array(d),
                                     jnp.array(d_mask)))
    want = brute_maxsim(q, d, d_mask)
    np.testing.assert_allclose(got, want, rtol=1e-5)


def test_pair_with_qmask(rand):
    q, d, d_mask = rand
    q_mask = np.ones(q.shape[:2], np.float32)
    q_mask[:, -2:] = 0.0
    got = np.asarray(maxsim_pair_xla(jnp.array(q), jnp.array(d),
                                     jnp.array(d_mask), jnp.array(q_mask)))
    want = brute_maxsim(q, d, d_mask, q_mask)
    np.testing.assert_allclose(got, want, rtol=1e-5)


def test_all_pairs_matches_pairwise_loop(rand):
    q, d, d_mask = rand
    got = np.asarray(maxsim_all_pairs_xla(jnp.array(q), jnp.array(d),
                                          jnp.array(d_mask)))
    for i in range(q.shape[0]):
        for j in range(d.shape[0]):
            s = d[j] @ q[i].T
            s[~d_mask[j].astype(bool)] = -9999.0
            want = s.max(axis=0).sum()
            np.testing.assert_allclose(got[i, j], want, rtol=1e-5)


def test_search_xla_shape_and_values():
    rng = np.random.default_rng(1)
    b, lq, n, ld, dim = 3, 4, 10, 5, 8
    q = rng.normal(size=(b, lq, dim)).astype(np.float32)
    idx = rng.normal(size=(n, ld, dim)).astype(np.float32)
    mask = np.ones((n, ld), np.float32)
    mask[:, -1] = 0.0
    got = np.asarray(maxsim_search_xla(jnp.array(q), jnp.array(idx),
                                       jnp.array(mask)))
    assert got.shape == (b, n)
    # doc 0 vs query 0 by hand
    s = idx[0] @ q[0].T
    s[-1] = -9999.0
    np.testing.assert_allclose(got[0, 0], s.max(axis=0).sum(), rtol=1e-5)


def test_search_pallas_interpret_matches_xla():
    """Pallas kernel (interpreter mode on CPU) == XLA reference."""
    rng = np.random.default_rng(2)
    b, lq, n, ld, dim = 2, 8, 32, 16, 128
    q = rng.normal(size=(b, lq, dim)).astype(np.float32)
    idx = rng.normal(size=(n, ld, dim)).astype(np.float32)
    mask = (rng.random((n, ld)) > 0.2).astype(np.float32)
    mask[:, 0] = 1.0

    from jax.experimental.pallas import tpu as pltpu
    with pltpu.force_tpu_interpret_mode():
        got = np.asarray(maxsim_search_pallas(jnp.array(q), jnp.array(idx),
                                              jnp.array(mask), tile_d=8))
    want = np.asarray(maxsim_search_xla(jnp.array(q), jnp.array(idx),
                                        jnp.array(mask)))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_coarse_sweep_pallas_interpret_matches_numpy():
    """Chunked slot-major coarse-sweep kernel (interpreter mode) == the
    hand-computed max-over-slots / sum-over-query-tokens reference,
    including the in-kernel doc-validity mask."""
    from ravqa_tpu.ops.maxsim import NEG_INF, coarse_sweep_pallas
    rng = np.random.default_rng(7)
    b, lq, n, s, dim = 6, 8, 512, 4, 128
    q = rng.normal(size=(b, lq, dim)).astype(np.float32)
    summ = rng.normal(size=(n, s, dim)).astype(np.float32)
    valid = (rng.random(n) > 0.1)

    from jax.experimental.pallas import tpu as pltpu
    with pltpu.force_tpu_interpret_mode():
        got = np.asarray(coarse_sweep_pallas(
            jnp.array(q), jnp.swapaxes(jnp.array(summ), 0, 1),
            jnp.array(valid), tile_n=128, queries_per_chunk=3))
    sc = np.einsum("nsd,bqd->nsbq", summ, q)
    want = sc.max(axis=1).sum(axis=-1).T                  # (b, n)
    want = np.where(valid[None, :], want, float(NEG_INF))
    np.testing.assert_allclose(got, want, rtol=2e-3, atol=1e-2)
    # ranking must agree exactly on well-separated random data
    np.testing.assert_array_equal(np.argsort(-got, axis=1)[:, :10],
                                  np.argsort(-want, axis=1)[:, :10])


def test_coarse_sweep_pallas_int8_interpret_matches_numpy():
    """int8 coarse-sweep kernel (interpreter mode) == the numpy
    reconstruction of its quantized math: per-token query scales folded
    into the Lq-sum selector, per-doc summary scales applied after the
    int32 max over slots, global scale dropped (ranking-invariant)."""
    from ravqa_tpu.ops.maxsim import NEG_INF, coarse_sweep_pallas
    from ravqa_tpu.ops.quant import quantize_summaries_t_int8
    rng = np.random.default_rng(17)
    b, lq, n, s, dim = 4, 8, 256, 4, 128
    q = rng.normal(size=(b, lq, dim)).astype(np.float32)
    q[1, 5:] = 0.0                                  # masked query rows
    summ = rng.normal(size=(n, s, dim)).astype(np.float32)
    summ /= np.linalg.norm(summ, axis=-1, keepdims=True)
    valid = (rng.random(n) > 0.1)
    summ_t = np.swapaxes(summ, 0, 1).copy()         # (s, n, dim)

    st8, dsc = quantize_summaries_t_int8(jnp.array(summ_t))
    assert st8.dtype == jnp.int8 and dsc.shape == (n,)

    from jax.experimental.pallas import tpu as pltpu
    with pltpu.force_tpu_interpret_mode():
        got = np.asarray(coarse_sweep_pallas(
            jnp.array(q), st8, jnp.array(valid), tile_n=64,
            queries_per_chunk=2, dscale=dsc))

    # numpy replay of the quantized math
    q32 = q.reshape(b * lq, dim)
    qs = np.maximum(np.abs(q32).max(-1, keepdims=True), 1e-8) / 127.0
    q8 = np.round(q32 / qs).astype(np.int32)
    d8 = np.asarray(st8).astype(np.int32)
    m = np.einsum("qd,snd->sqn", q8, d8).max(axis=0)         # (b*lq, n)
    mf = m.astype(np.float32) * np.asarray(dsc)[None, :]
    want = (qs.astype(np.float32) * mf).reshape(b, lq, n).sum(axis=1)
    want = np.where(valid[None, :], want, float(NEG_INF))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)

    # ranking sanity vs the FLOAT sweep: int8 noise must not move top-1
    # and must keep strong top-10 overlap on unit-norm random data
    sc = np.einsum("nsd,bqd->nsbq", summ, q)
    ref = sc.max(axis=1).sum(axis=-1).T
    ref = np.where(valid[None, :], ref, float(NEG_INF))
    got_top = np.argsort(-got, axis=1)
    ref_top = np.argsort(-ref, axis=1)
    np.testing.assert_array_equal(got_top[:, 0], ref_top[:, 0])
    overlap = np.mean([len(set(got_top[i, :10]) & set(ref_top[i, :10]))
                       for i in range(b)]) / 10
    assert overlap >= 0.8, overlap


def test_flipr_reduce():
    rng = np.random.default_rng(3)
    ld, lq = 7, 6
    scores = rng.normal(size=(1, ld, lq)).astype(np.float32)
    d_mask = np.ones((1, ld), np.float32)
    got = np.asarray(flipr_reduce(jnp.array(scores), jnp.array(d_mask),
                                  query_part_len=4, k1=2, k2=1))
    per_q = scores[0].max(axis=0)
    want = np.sort(per_q[:4])[-2:].sum() + np.sort(per_q[4:])[-1:].sum()
    np.testing.assert_allclose(got[0], want, rtol=1e-5)


def test_nway_loss_prefers_positive():
    """Loss must be lower when positives really align with queries."""
    rng = np.random.default_rng(4)
    b, lq, ld, dim, nway = 4, 3, 3, 8, 2
    q = rng.normal(size=(b, lq, dim)).astype(np.float32)
    pos = q[:, :ld] + 0.01 * rng.normal(size=(b, ld, dim)).astype(np.float32)
    neg = rng.normal(size=(b, ld, dim)).astype(np.float32)
    d = np.stack([pos, neg], axis=1).reshape(b * nway, ld, dim)
    mask = np.ones((b * nway, ld), np.float32)
    loss_good, scores = nway_ce_loss(jnp.array(q), jnp.array(d),
                                     jnp.array(mask), nway)
    assert scores.shape == (b, nway)
    # swapped: negatives in the positive slot
    d_bad = np.stack([neg, pos], axis=1).reshape(b * nway, ld, dim)
    loss_bad, _ = nway_ce_loss(jnp.array(q), jnp.array(d_bad),
                               jnp.array(mask), nway)
    assert float(loss_good) < float(loss_bad)


def test_ib_loss_gradients_flow():
    rng = np.random.default_rng(5)
    b, lq, ld, dim, nway = 2, 3, 4, 8, 2
    q = jnp.array(rng.normal(size=(b, lq, dim)), jnp.float32)
    d = jnp.array(rng.normal(size=(b * nway, ld, dim)), jnp.float32)
    mask = jnp.ones((b * nway, ld), jnp.float32)

    def f(q):
        loss, _ = in_batch_negative_loss(q, d, mask, nway)
        return loss

    g = jax.grad(f)(q)
    assert np.isfinite(np.asarray(g)).all()
    assert float(jnp.abs(g).sum()) > 0


def test_stage1_sweep_pallas_interpret_matches_numpy():
    """Fused gathered stage-1 sweep (scalar-prefetch block DMA,
    interpreter mode) == the hand-computed per-query gather + max/sum
    over each query's own selected blocks."""
    from ravqa_tpu.ops.maxsim import stage1_rows, stage1_sweep_pallas
    import ml_dtypes
    rng = np.random.default_rng(11)
    n, s, bs, dim, b, lq, nbl = 512, 4, 64, 128, 4, 32, 4
    summ = rng.normal(size=(n, s, dim)).astype(np.float32)
    summ /= np.linalg.norm(summ, axis=-1, keepdims=True)
    q = rng.normal(size=(b, lq, dim)).astype(np.float32)
    blk = np.stack([rng.permutation(n // bs)[:nbl]
                    for _ in range(b)]).astype(np.int32)
    rows = stage1_rows(jnp.asarray(summ).astype(jnp.bfloat16), bs)

    from jax.experimental.pallas import tpu as pltpu
    with pltpu.force_tpu_interpret_mode():
        got = np.asarray(stage1_sweep_pallas(
            jnp.asarray(q), rows, jnp.asarray(blk), tile_b=2))
    # numpy replay at the kernel's dtypes (bf16 summaries and q)
    sb = summ.astype(ml_dtypes.bfloat16).astype(np.float32)
    qb = q.astype(ml_dtypes.bfloat16).astype(np.float32)
    want = np.zeros((b, nbl * bs), np.float32)
    for bi in range(b):
        for t, blki in enumerate(blk[bi]):
            docs = sb[blki * bs:(blki + 1) * bs]           # (bs, S, d)
            sc = np.einsum("qd,jsd->jsq", qb[bi], docs)
            want[bi, t * bs:(t + 1) * bs] = sc.max(1).sum(-1)
    np.testing.assert_allclose(got, want, rtol=2e-3, atol=1e-2)
    np.testing.assert_array_equal(np.argsort(-got, 1)[:, :10],
                                  np.argsort(-want, 1)[:, :10])


def test_stage1_sweep_pallas_int8_matches_xla_stage1():
    """int8 stage-1 kernel path (int8 summ_rows + post-hoc per-doc
    dscale) must produce the same scores as the XLA int8 stage-1 branch
    of hierarchical_search's _stage1_scores (bf16 dot over int8 codes,
    scale applied after max/sum)."""
    from ravqa_tpu.ops.maxsim import stage1_rows, stage1_sweep_pallas
    from ravqa_tpu.ops.quant import quantize_summaries_int8
    import ml_dtypes
    rng = np.random.default_rng(12)
    n, s, bs, dim, b, lq, nbl = 256, 2, 32, 128, 4, 16, 4
    summ = rng.normal(size=(n, s, dim)).astype(np.float32)
    summ /= np.linalg.norm(summ, axis=-1, keepdims=True)
    q = rng.normal(size=(b, lq, dim)).astype(np.float32)
    blk = np.stack([rng.permutation(n // bs)[:nbl]
                    for _ in range(b)]).astype(np.int32)
    si8, ssc = quantize_summaries_int8(jnp.asarray(summ))
    rows = stage1_rows(si8, bs)

    from jax.experimental.pallas import tpu as pltpu
    with pltpu.force_tpu_interpret_mode():
        got = np.asarray(stage1_sweep_pallas(
            jnp.asarray(q), rows, jnp.asarray(blk), tile_b=4,
            dscale=ssc))
    # XLA int8 stage-1 replay: bf16 dot over the int8 codes, per-doc
    # scale after the max/sum (coarse._stage1_scores int8 branch)
    codes = np.asarray(si8, np.float32)
    qb = q.astype(ml_dtypes.bfloat16).astype(np.float32)
    scale = np.asarray(ssc, np.float32)
    want = np.zeros((b, nbl * bs), np.float32)
    for bi in range(b):
        for t, blki in enumerate(blk[bi]):
            sl = slice(blki * bs, (blki + 1) * bs)
            sc = np.einsum("qd,jsd->jsq", qb[bi], codes[sl])
            want[bi, t * bs:(t + 1) * bs] = sc.max(1).sum(-1) * scale[sl]
    np.testing.assert_allclose(got, want, rtol=2e-3, atol=1e-2)
    np.testing.assert_array_equal(np.argsort(-got, 1)[:, :10],
                                  np.argsort(-want, 1)[:, :10])


@pytest.mark.parametrize("int8", [False, True])
def test_stage1_sweep_xla_twin_matches_kernel(int8):
    """stage1_sweep_xla (the non-TPU twin) == stage1_sweep_pallas
    (interpret mode) on the same rows/blk/dscale — pins the twin to the
    kernel so sharded CPU tests of the summ_rows program certify the
    TPU program's math."""
    from jax.experimental.pallas import tpu as pltpu
    from ravqa_tpu.ops.maxsim import (stage1_rows, stage1_sweep_pallas,
                                      stage1_sweep_xla)
    rng = np.random.default_rng(11)
    n, s_, bs, d = 256, 4, 16, 64
    summ = rng.normal(size=(n, s_, d)).astype(np.float32)
    if int8:
        from ravqa_tpu.ops.quant import quantize_summaries_int8
        si8, dscale = quantize_summaries_int8(jnp.asarray(summ))
        rows = stage1_rows(si8, bs)
    else:
        rows, dscale = stage1_rows(jnp.asarray(summ, jnp.bfloat16),
                                   bs), None
    q = jnp.asarray(rng.normal(size=(4, 8, d)), jnp.float32)
    blk = jnp.asarray(rng.integers(0, n // bs, size=(4, 8)), jnp.int32)
    with pltpu.force_tpu_interpret_mode():
        want = np.asarray(stage1_sweep_pallas(q, rows, blk, tile_b=8,
                                              dscale=dscale))
    got = np.asarray(stage1_sweep_xla(q, rows, blk, dscale=dscale))
    np.testing.assert_allclose(got, want, rtol=2e-2, atol=1e-3)
    # ranking-grade agreement: per-query argmax identical
    assert (got.argmax(1) == want.argmax(1)).all()


@pytest.mark.parametrize("block_n,pad", [(0, False), (4, False), (4, True),
                                         (16, True)])
def test_blocked_all_pairs_matches_unblocked(block_n, pad):
    """maxsim_all_pairs_blocked == maxsim_all_pairs_xla in values AND
    grads (the training in-batch-negative loss's fused/blocked rewrite,
    VERDICT r4 Next #2) — incl. non-divisible Bd (internal padding)."""
    from ravqa_tpu.ops.maxsim import (maxsim_all_pairs_blocked,
                                      maxsim_all_pairs_xla)

    rng = np.random.default_rng(0)
    bq, bd, lq, ld, dim = 3, 10 if pad else 8, 5, 7, 16
    q = jnp.asarray(rng.normal(size=(bq, lq, dim)), jnp.float32)
    d = jnp.asarray(rng.normal(size=(bd, ld, dim)), jnp.float32)
    d_mask = jnp.asarray(rng.integers(0, 2, (bd, ld)), jnp.float32)
    d_mask = d_mask.at[:, 0].set(1.0)  # every doc has >= 1 valid token
    q_mask = jnp.asarray(rng.integers(0, 2, (bq, lq)), jnp.float32)

    ref = maxsim_all_pairs_xla(q, d, d_mask, q_mask)
    out = maxsim_all_pairs_blocked(q, d, d_mask, q_mask, block_n=block_n)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)

    def loss_ref(q, d):
        return jnp.sum(jnp.tanh(
            maxsim_all_pairs_xla(q, d, d_mask, q_mask) / 10))

    def loss_blk(q, d):
        return jnp.sum(jnp.tanh(maxsim_all_pairs_blocked(
            q, d, d_mask, q_mask, block_n=block_n) / 10))

    gq_ref, gd_ref = jax.grad(loss_ref, argnums=(0, 1))(q, d)
    gq, gd = jax.jit(jax.grad(loss_blk, argnums=(0, 1)))(q, d)
    np.testing.assert_allclose(np.asarray(gq), np.asarray(gq_ref),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(gd), np.asarray(gd_ref),
                               rtol=1e-4, atol=1e-5)


def test_ib_loss_blocked_matches_xla():
    """in_batch_negative_loss with block_n set matches the unblocked path
    (loss value + grads through both towers' embeddings)."""
    from ravqa_tpu.ops.losses import in_batch_negative_loss

    rng = np.random.default_rng(1)
    b, nway, lq, ld, dim = 4, 3, 5, 6, 8
    q = jnp.asarray(rng.normal(size=(b, lq, dim)), jnp.float32)
    d = jnp.asarray(rng.normal(size=(b * nway, ld, dim)), jnp.float32)
    d_mask = jnp.ones((b * nway, ld), jnp.float32)

    loss_ref, s_ref = in_batch_negative_loss(q, d, d_mask, nway)
    loss_blk, s_blk = in_batch_negative_loss(q, d, d_mask, nway, block_n=5)
    np.testing.assert_allclose(float(loss_blk), float(loss_ref), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(s_blk), np.asarray(s_ref),
                               rtol=1e-5, atol=1e-5)

    g_ref = jax.grad(lambda q, d: in_batch_negative_loss(
        q, d, d_mask, nway)[0], argnums=(0, 1))(q, d)
    g_blk = jax.jit(jax.grad(lambda q, d: in_batch_negative_loss(
        q, d, d_mask, nway, block_n=5)[0], argnums=(0, 1)))(q, d)
    for a, r in zip(g_blk, g_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(r),
                                   rtol=1e-4, atol=1e-6)

    # bf16 scoring: same ranking, tolerant values (the reference's
    # half-precision doc scoring, colbert.py:204)
    loss_bf, s_bf = in_batch_negative_loss(q, d, d_mask, nway, block_n=5,
                                           compute_dtype=jnp.bfloat16)
    assert np.isfinite(float(loss_bf))
    np.testing.assert_allclose(np.asarray(s_bf), np.asarray(s_ref),
                               rtol=0.05, atol=0.2)
