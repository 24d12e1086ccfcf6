"""CI coverage for the driver-called entry points in __graft_entry__.py.

Round-4 postmortem: the driver gate (`dryrun_multichip`) went red because no
test executed the actual entry point — the 8-mesh pytest coverage exercised
the same *programs* but not the function the driver calls (VERDICT.md r4
Weak #1/#2). These tests run the real thing on the virtual 8-device CPU mesh.
"""

import numpy as np
import pytest


@pytest.mark.slow
def test_dryrun_multichip_8():
    import __graft_entry__ as graft
    graft.dryrun_multichip(8)  # asserts internally; must not raise


def test_entry_compiles():
    import jax

    import __graft_entry__ as graft
    fn, (params, batch) = graft.entry()
    jax.jit(fn).lower(params, batch).compile()


def test_fast_preset_stage1_gate_tiny_vs_aligned():
    """The fast preset derives stage1_kernel=False on indexes below the
    kernel's per-shard lane requirement and True at/above it — the exact
    contract the round-4 gate regression violated (search.py preset gate
    vs __graft_entry__ assert)."""
    import jax

    from ravqa_tpu.parallel import make_mesh
    from ravqa_tpu.retrieval import (LateInteractionSearcher,
                                     build_index_from_embeddings)

    mesh = make_mesh({"data": 8})
    rng = np.random.default_rng(0)
    dim = 16

    def build(n_docs):
        toks = rng.normal(size=(n_docs, 6, dim)).astype(np.float32)
        msk = np.ones((n_docs, 6), bool)
        idx = build_index_from_embeddings(toks, msk, pad_multiple=32,
                                          mesh=mesh, axis="data")
        idx.build_summaries(n_summary=2, iters=2, mesh=mesh, axis="data")
        idx.build_block_summaries(block_size=4, n_block_summary=2,
                                  mesh=mesh, axis="data")
        return idx

    q = rng.normal(size=(2, 4, dim)).astype(np.float32)

    # 64 docs / 8 shards / block 4 -> 2 blocks per shard < req=32: fallback
    tiny = build(64)
    s_tiny = LateInteractionSearcher(tiny, mesh=mesh, axis="data",
                                     use_pallas=False, mode="hierarchical",
                                     preset="fast")
    assert s_tiny._summ_rows is None
    assert s_tiny._summ_i8 is not None  # int8 pruning survives the fallback
    _, pids = s_tiny.search(q, k=3)
    assert pids.shape == (2, 3)

    # 1024 docs -> 32 blocks/shard == req: the kernel program engages
    big = build(1024)
    s_big = LateInteractionSearcher(big, mesh=mesh, axis="data",
                                    use_pallas=False, mode="hierarchical",
                                    preset="fast")
    assert s_big._summ_rows is not None
    scores, pids = s_big.search(q, k=5)
    assert pids.shape == (2, 5)

    # parity with the exact searcher's top-1 on this random corpus
    s_exact = LateInteractionSearcher(big, mesh=mesh, axis="data",
                                      use_pallas=False)
    _, pids_exact = s_exact.search(q, k=5)
    assert (pids[:, 0] == pids_exact[:, 0]).all()


def test_single_device_fast_preset_unaligned_k():
    """ADVICE r4 (medium): single-device fast preset with a k whose
    resolved block count is not lane-aligned must round up / fall back
    instead of crashing at kernel trace time. CPU runs the XLA twin so
    here we assert the resolved count logic directly via search()."""
    from ravqa_tpu.retrieval import (LateInteractionSearcher,
                                     build_index_from_embeddings)

    rng = np.random.default_rng(1)
    dim = 16
    toks = rng.normal(size=(4096, 6, dim)).astype(np.float32)
    msk = np.ones((4096, 6), bool)
    idx = build_index_from_embeddings(toks, msk, pad_multiple=64)
    idx.build_summaries(n_summary=2, iters=2)
    idx.build_block_summaries(block_size=16, n_block_summary=2)

    s = LateInteractionSearcher(idx, mesh=None, use_pallas=False,
                                mode="hierarchical", preset="fast")
    # req = 128/gcd(16,128) = 8; k=600 used to resolve 38 blocks (not a
    # multiple of 8) and would trace-fail stage1_sweep_pallas on TPU
    q = rng.normal(size=(2, 4, dim)).astype(np.float32)
    scores, pids = s.search(q, k=600)
    assert pids.shape == (2, 600)

    # deep-k candidate scaling (ADVICE low): candidates grow with k
    assert s.resolve_candidates(600) >= 4 * 600
    assert s.resolve_candidates(10) == 256
