"""SPMD late-interaction search over a sharded TokenIndex.

Replaces the reference's multi-stage CPU/CUDA searcher (candidate generation
-> centroid pruning -> decompress -> exact MaxSim; SURVEY.md §2.3 R16-R18,
§2.4 N1/N4/N5) with one collective program: each device scores the query
batch against its HBM-resident index shard (fused Pallas MaxSim on TPU),
takes a local top-k, and the shards merge via all_gather + final top-k over
ICI. Exact by construction at OK-VQA scale (no quantization error unless the
int8 codec is enabled); a centroid coarse stage for >10M-token corpora lives
in centroids.py.

Zero query rows (masked [MASK]-augmentation rows removed by the reference's
`remove_zero_tensors`, searcher.py:120-128) contribute exactly 0 to every
doc's score here, which is equivalent to removing them.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..ops.maxsim import maxsim_search_pallas, maxsim_search_xla
from ..ops.quant import maxsim_search_int8_xla
from .index import TokenIndex

def mesh_axis_size(mesh, axis) -> int:
    """Total shard count over `axis`, which may be one mesh axis name or a
    tuple of names (e.g. ("dcn", "ici") for a multi-pod sharded index —
    collectives over the tuple ride ICI within a pod and DCN across)."""
    if isinstance(axis, (tuple, list)):
        n = 1
        for a in axis:
            n *= mesh.shape[a]
        return n
    return mesh.shape[axis]


def shard_map(f, mesh, in_specs, out_specs):
    # check_vma=False: outputs are replicated by construction (every shard
    # computes the same merged top-k after all_gather) but the static
    # varying-manifest check cannot infer that.
    return jax.shard_map(f, mesh=mesh, in_specs=in_specs,
                         out_specs=out_specs, check_vma=False)


def _local_scores(q, tokens, mask, scales, use_pallas: bool, tile_d: int):
    if scales is not None:
        if use_pallas:
            # fused int8 kernel: no (N, Ld, B, Lq) HBM intermediate
            from ..ops.quant import (maxsim_search_int8_pallas,
                                     quantize_queries_int8)
            q8, qs = quantize_queries_int8(q.astype(jnp.float32))
            return maxsim_search_int8_pallas(q8, qs, tokens, scales,
                                             tile_d=tile_d)
        return maxsim_search_int8_xla(q, tokens, scales, mask)
    if use_pallas:
        return maxsim_search_pallas(q, tokens, mask, tile_d=tile_d)
    return maxsim_search_xla(q, tokens, mask)


@functools.partial(jax.jit,
                   static_argnames=("k", "use_pallas", "tile_d"))
def search_single_device(q, tokens, mask, scales=None, *, k: int,
                         use_pallas: bool = False, tile_d: int = 16):
    """Exact search on one device. Returns (scores (B,k), rows (B,k))."""
    scores = _local_scores(q, tokens, mask, scales, use_pallas, tile_d)
    return jax.lax.top_k(scores, k)


def make_sharded_search(mesh: Mesh, n_pad: int, *, k: int,
                        axis: str = "index", use_pallas: bool = False,
                        tile_d: int = 16, quantized: bool = False,
                        two_stage: bool = False, n_candidates: int = 1024,
                        hierarchical: bool = False,
                        n_blocks: Optional[int] = None,
                        block_size: int = 64,
                        coarse_query_len: Optional[int] = None,
                        residual_nbits: int = 0,
                        group_size: int = 0,
                        use_summ_t: bool = False,
                        use_summ_t_scale: bool = False,
                        approx_topk: bool = False,
                        approx_recall: float = 0.95,
                        centroid_prune: int = 0,
                        use_summ_i8: bool = False,
                        use_summ_rows: bool = False,
                        stage1_tile_b: int = 8,
                        factored_codec: bool = False,
                        use_bsum_i8: bool = False):
    """Build a jitted collective search fn over `mesh`.

    Returned fn(q, tokens, mask[, summaries[, block_summaries]][, scales])
    -> (scores (B,k), rows (B,k)), with index arrays sharded over dim 0 on
    `axis` and q replicated. Rows are global (pre-pid-mapping) indices into
    the padded index. two_stage: each shard runs coarse->fine over its
    slice (with n_candidates/nshards local candidates) before the
    cross-shard merge. hierarchical: 3-stage (block summaries -> doc
    summaries -> exact) per shard, with n_blocks/nshards local blocks.
    """
    from .coarse import hierarchical_search, two_stage_search

    nshards = mesh_axis_size(mesh, axis)
    n_local = n_pad // nshards
    k_local = min(k, n_local)
    c_local = min(max(n_candidates // nshards, k_local), n_local)
    # residual centroid-only cut scales with the per-shard candidate
    # count (same rule as c_local); disabled when it would not cut
    cp_local = min(max(centroid_prune // nshards, k_local), c_local) \
        if centroid_prune else 0
    if cp_local >= c_local:
        cp_local = 0
    rows_fallback = False
    if hierarchical:
        nb_local = n_local // block_size
        if n_blocks is None:
            n_blocks = max(n_candidates // 2, nshards)
        # the per-shard stage-1 cut must COVER k_local docs: c_local is
        # clamped to the selected blocks' coverage below, and the fine
        # stage's top_k(k_local) traces only when c_local >= k_local
        # (a thin explicit n_blocks with a large k used to crash there)
        b_need = -(-k_local // block_size)
        b_local = min(max(n_blocks // nshards, b_need, 1), nb_local)
        if use_summ_rows:
            # the fused stage-1 kernel's output block is (tb*bs,) lanes:
            # the per-shard block count must be a multiple of
            # 128/gcd(bs, 128) (ops.maxsim.stage1_sweep_pallas). When an
            # aligned count cannot both fit the shard and cover k docs,
            # this program disables the kernel stage 1 and reconstructs
            # doc-major summaries from the rows layout inside the shard
            # (an unaligned count would trace-fail the kernel on TPU;
            # the XLA twin merely tolerates it).
            import math
            req = 128 // math.gcd(block_size, 128)
            b_aligned = min(-(-b_local // req) * req,
                            (nb_local // req) * req)
            if nb_local >= req and b_aligned >= b_need:
                if b_aligned < b_local:
                    import warnings
                    warnings.warn(
                        f"stage-1 kernel alignment reduced the "
                        f"per-shard block cut {b_local} -> "
                        f"{b_aligned} of {nb_local} blocks "
                        f"(multiple-of-{req} constraint) — a recall "
                        "knob you set was narrowed; pass "
                        "stage1_kernel=False to keep it exact")
                b_local = b_aligned
            else:
                rows_fallback = True
        c_local = min(c_local, b_local * block_size)

    def _merge(q, s, i):
        i = i + jax.lax.axis_index(axis) * n_local
        s_all = jax.lax.all_gather(s, axis)          # (nshards, B, k_local)
        i_all = jax.lax.all_gather(i, axis)
        b = q.shape[0]
        s_cat = jnp.moveaxis(s_all, 0, 1).reshape(b, nshards * k_local)
        i_cat = jnp.moveaxis(i_all, 0, 1).reshape(b, nshards * k_local)
        s_top, sel = jax.lax.top_k(s_cat, min(k, nshards * k_local))
        i_top = jnp.take_along_axis(i_cat, sel, axis=1)
        return s_top, i_top

    def _local(q, tok, msk, scl):
        scores = _local_scores(q, tok, msk, scl, use_pallas, tile_d)
        s, i = jax.lax.top_k(scores, k_local)
        return _merge(q, s, i)

    def _local_two_stage(q, tok, msk, summ, summ_t=None, summ_ts=None):
        # use_pallas routes the coarse sweep through a fused Pallas kernel:
        # the XLA einsum materializes an (N_local, S, B, Lq) f32
        # intermediate that OOMs a shard at 1M+ docs (see scripts/bench_1m.py).
        # summ_t (slot-major, sharded on its DOC dim) selects the fast
        # chunked sweep kernel (ops.maxsim.coarse_sweep_pallas);
        # summ_ts — its per-doc scales when summ_t is int8-quantized.
        s, i = two_stage_search(q, tok, msk, summ, k=k_local,
                                n_candidates=c_local,
                                coarse_query_len=coarse_query_len,
                                use_pallas_coarse=use_pallas,
                                group_size=group_size,
                                summaries_t=summ_t,
                                summaries_t_scale=summ_ts,
                                approx_topk=approx_topk,
                                approx_recall=approx_recall)
        return _merge(q, s, i)

    def _local_two_stage_int8(q, tok, msk, summ, scl, summ_t=None,
                              summ_ts=None):
        s, i = two_stage_search(q, tok, msk, summ, k=k_local,
                                n_candidates=c_local, scales=scl,
                                coarse_query_len=coarse_query_len,
                                use_pallas_coarse=use_pallas,
                                group_size=group_size,
                                summaries_t=summ_t,
                                summaries_t_scale=summ_ts,
                                approx_topk=approx_topk,
                                approx_recall=approx_recall)
        return _merge(q, s, i)

    def _summ_kwargs(summ, summ_scale):
        """Map the summaries slot (+ optional per-doc scale) onto
        hierarchical_search's summaries/summ_int8/summ_rows kwargs.
        With rows_fallback the stage1_rows layout is undone in-shard
        (cheap transpose) so stage 1 runs the plain XLA path."""
        if use_summ_rows:
            if not rows_fallback:
                return dict(summaries=None, summ_int8=None,
                            summ_scale=summ_scale, summ_rows=summ)
            nb_r, s_r, bs_r, d_r = summ.shape
            flat = jnp.swapaxes(summ, 1, 2).reshape(nb_r * bs_r, s_r, d_r)
            if flat.dtype == jnp.int8:
                return dict(summaries=None, summ_int8=flat,
                            summ_scale=summ_scale, summ_rows=None)
            return dict(summaries=flat, summ_int8=None, summ_scale=None,
                        summ_rows=None)
        if use_summ_i8:
            return dict(summaries=None, summ_int8=summ,
                        summ_scale=summ_scale, summ_rows=None)
        return dict(summaries=summ, summ_int8=None, summ_scale=None,
                    summ_rows=None)

    def _bsum_kwargs(bsum, bsum_scale):
        """Stage-0 block summaries: int8 copy + per-block scale when
        use_bsum_i8 (sharded stage-0 int8), else the bf16/f32 original."""
        if use_bsum_i8:
            return dict(block_summ=None, block_summ_int8=bsum,
                        block_summ_scale=bsum_scale)
        return dict(block_summ=bsum)

    def _local_hier(q, tok, msk, summ, bsum, scl=None, summ_scale=None,
                    bsum_scale=None):
        # use_summ_i8: the `summ` slot carries the int8 doc-major copy
        # (quantize_summaries_int8) and `summ_scale` its per-doc scales —
        # stage 1's gather then moves half the HBM bytes (coarse.py).
        # use_summ_rows: the slot carries stage1_rows layout instead and
        # stage 1 runs the fused scalar-prefetch kernel per shard
        # (ops.maxsim.stage1_sweep_pallas; on-chip 1M: 6030 vs 4962 QPS
        # at B128/C1024 — STATUS.md round-4 table).
        s, i = hierarchical_search(q, tok, msk,
                                   k=k_local,
                                   n_blocks=b_local, n_candidates=c_local,
                                   block_size=block_size, scales=scl,
                                   coarse_query_len=coarse_query_len,
                                   group_size=group_size,
                                   approx_topk=approx_topk,
                                   approx_recall=approx_recall,
                                   stage1_tile_b=stage1_tile_b,
                                   **_bsum_kwargs(bsum, bsum_scale),
                                   **_summ_kwargs(summ, summ_scale))
        return _merge(q, s, i)

    # residual-codec variants: per-doc arrays (packed records) shard over
    # `axis`; the small codec tables (centroids / bucket weights) replicate
    def _local_two_stage_res(q, msk, summ, recs, cent, bw, summ_t=None,
                             summ_ts=None, codec_coarse=None,
                             codec_fine=None):
        s, i = two_stage_search(q, None, msk, summ, k=k_local,
                                n_candidates=c_local,
                                coarse_query_len=coarse_query_len,
                                use_pallas_coarse=use_pallas,
                                use_pallas_residual=use_pallas,
                                records=recs, centroids=cent,
                                bucket_weights=bw, nbits=residual_nbits,
                                summaries_t=summ_t,
                                summaries_t_scale=summ_ts,
                                approx_topk=approx_topk,
                                approx_recall=approx_recall,
                                centroid_prune=cp_local,
                                codec_coarse=codec_coarse,
                                codec_fine=codec_fine)
        return _merge(q, s, i)

    def _local_hier_res(q, msk, summ, bsum, recs, cent, bw,
                        summ_scale=None, bsum_scale=None,
                        codec_coarse=None, codec_fine=None):
        s, i = hierarchical_search(q, None, msk,
                                   k=k_local,
                                   n_blocks=b_local, n_candidates=c_local,
                                   block_size=block_size,
                                   coarse_query_len=coarse_query_len,
                                   use_pallas_residual=use_pallas,
                                   records=recs, centroids=cent,
                                   bucket_weights=bw, nbits=residual_nbits,
                                   approx_topk=approx_topk,
                                   approx_recall=approx_recall,
                                   centroid_prune=cp_local,
                                   stage1_tile_b=stage1_tile_b,
                                   codec_coarse=codec_coarse,
                                   codec_fine=codec_fine,
                                   **_bsum_kwargs(bsum, bsum_scale),
                                   **_summ_kwargs(summ, summ_scale))
        return _merge(q, s, i)

    def _hier_jit(fn0, specs):
        """shard_map + jit a hierarchical leg; with use_summ_i8 the
        int8 stage-1 per-doc scales ride as one extra trailing arg
        sharded over `axis` (the summ slot already carries the int8
        copy — see _local_hier); with use_bsum_i8 the per-BLOCK stage-0
        scales follow (the bsum slot then carries the int8 block-summary
        copy); with factored_codec the codec factors (coarse, fine) ride
        replicated last."""
        n_scale = 1 if use_summ_i8 else 0
        n_bscale = 1 if use_bsum_i8 else 0
        n_fact = 2 if factored_codec else 0
        if n_scale:
            specs = specs + (P(axis),)
        if n_bscale:
            specs = specs + (P(axis),)
        if n_fact:
            specs = specs + (P(), P())
        if n_scale or n_bscale or n_fact:
            def fn(*a):
                base = len(a) - n_scale - n_bscale - n_fact
                kw = {}
                if n_scale:
                    kw["summ_scale"] = a[base]
                if n_bscale:
                    kw["bsum_scale"] = a[base + n_scale]
                if n_fact:
                    kw["codec_coarse"] = a[base + n_scale + n_bscale]
                    kw["codec_fine"] = a[base + n_scale + n_bscale + 1]
                return fn0(*a[:base], **kw)
        else:
            fn = fn0
        return jax.jit(shard_map(fn, mesh, in_specs=specs,
                                 out_specs=(P(), P())))

    if residual_nbits and hierarchical:
        return _hier_jit(_local_hier_res,
                         (P(), P(axis), P(axis), P(axis), P(axis),
                          P(), P()))
    if residual_nbits and two_stage:
        specs = (P(), P(axis), P(axis), P(axis), P(), P())
        if use_summ_t:
            specs += (P(None, axis),)
            if use_summ_t_scale:
                specs += (P(axis),)
        f0 = _local_two_stage_res
        if factored_codec:
            specs += (P(), P())
            f0 = lambda *a: _local_two_stage_res(
                *a[:-2], codec_coarse=a[-2], codec_fine=a[-1])
        f = shard_map(f0, mesh, in_specs=specs, out_specs=(P(), P()))
        return jax.jit(f)
    if hierarchical and quantized:
        return _hier_jit(_local_hier,
                         (P(), P(axis), P(axis), P(axis), P(axis),
                          P(axis)))
    if hierarchical:
        return _hier_jit(lambda q, t, m, s, b, **kw:
                         _local_hier(q, t, m, s, b, **kw),
                         (P(), P(axis), P(axis), P(axis), P(axis)))
    if two_stage and quantized:
        specs = (P(), P(axis), P(axis), P(axis), P(axis))
        if use_summ_t:
            specs += (P(None, axis),)
            if use_summ_t_scale:
                specs += (P(axis),)
        f = shard_map(_local_two_stage_int8, mesh,
                      in_specs=specs, out_specs=(P(), P()))
        return jax.jit(f)
    if two_stage:
        specs = (P(), P(axis), P(axis), P(axis))
        if use_summ_t:
            specs += (P(None, axis),)
            if use_summ_t_scale:
                specs += (P(axis),)
        f = shard_map(_local_two_stage, mesh,
                      in_specs=specs, out_specs=(P(), P()))
        return jax.jit(f)
    if quantized:
        f = shard_map(lambda q, t, m, s: _local(q, t, m, s), mesh,
                      in_specs=(P(), P(axis), P(axis), P(axis)),
                      out_specs=(P(), P()))
        return jax.jit(f)
    f = shard_map(lambda q, t, m: _local(q, t, m, None), mesh,
                  in_specs=(P(), P(axis), P(axis)),
                  out_specs=(P(), P()))
    return jax.jit(f)


class LateInteractionSearcher:
    """High-level searcher over a TokenIndex (reference Searcher, R18).

    Handles device dispatch (sharded collective search when a mesh is given,
    single-device otherwise), pid mapping, and padded-doc suppression.
    """

    def __init__(self, index: TokenIndex, mesh: Optional[Mesh] = None,
                 axis: str = "index", use_pallas: Optional[bool] = None,
                 tile_d: Optional[int] = None, mode: str = "exact",
                 n_candidates: Optional[int] = None,
                 n_blocks: Optional[int] = None,
                 coarse_query_len: Optional[int] = None,
                 group_size: int = 0,
                 approx_topk: Optional[bool] = None,
                 approx_recall: float = 0.95,
                 centroid_prune: Optional[int] = None,
                 coarse_int8: Optional[bool] = None,
                 stage1_kernel: Optional[bool] = None,
                 preset: str = "reference"):
        """mode: "exact" (exhaustive MaxSim), "two_stage" (coarse over
        index.summaries -> exact re-score of top n_candidates; requires
        index.build_summaries()), or "hierarchical" (block summaries ->
        doc summaries -> exact; requires build_block_summaries(); works
        single-device and sharded — each shard prunes to its local
        n_blocks/nshards blocks before the cross-shard merge).
        coarse_query_len: only the first L query rows drive the pruning
        stages; full Q scores the final exact stage (the reference's
        candidate-generation truncation, index_storage.py:68-77).
        n_candidates None -> k-dependent auto preset mirroring the
        reference's ndocs rule (searcher.py:91-118): 1024 for k <= 100,
        max(4k, 4096) above.
        approx_topk: cut pruning-stage candidates with lax.approx_max_k
        (TPU PartialReduce) instead of exact top_k — None = on for TPU
        backends (where the exact (B, N) top_k costs 27-100+ ms/batch at
        1M docs, dominating the whole search), off elsewhere. The final
        exact re-score top_k(k) is never approximated.
        preset: "reference" (default) keeps the reference's quality-first
        ndocs rule (searcher.py:91-118) and leaves every acceleration
        knob off unless set. "fast" applies the MEASURED rank-converged
        operating point from the on-chip sweeps (STATUS.md round-4;
        scripts/exp_1m_convergence.py, frontier_112k.py): candidates
        max(256, 4k), n_blocks covering the candidates (>=32), int8
        pruning-stage summaries, and the fused stage-1 kernel for
        hierarchical indexes — top-10 overlap vs the reference preset
        measured 1.0000 at 112k AND 1M docs on clustered corpora
        (2-6x the throughput). Explicitly-passed knobs always win."""
        if preset not in ("reference", "fast"):
            raise ValueError(f"unknown preset {preset!r} "
                             "(expected 'reference' or 'fast')")
        self.preset = preset
        self.index = index
        self.mesh = mesh
        self.axis = axis
        if use_pallas is None:
            use_pallas = jax.default_backend() == "tpu"
        self.use_pallas = use_pallas
        # preset-derived knob defaults (None = "preset decides"); only
        # turned on where they have an effect, so the fast preset never
        # trips the no-effect warnings below
        if preset == "fast":
            if coarse_int8 is None:
                coarse_int8 = index.summaries is not None and (
                    mode == "hierarchical"
                    or (mode == "two_stage" and self.use_pallas))
            if stage1_kernel is None:
                stage1_kernel = (mode == "hierarchical"
                                 and index.summaries is not None
                                 and index.block_summaries is not None)
                if stage1_kernel:
                    # the fused kernel needs shard boundaries aligned to
                    # blocks AND a per-shard block count meeting its
                    # lane requirement (128/gcd(bs,128), stage1_sweep_
                    # pallas); an implicit preset falls back to the XLA
                    # stage 1 instead of asserting on tiny indexes
                    import math
                    bs = index.block_size or 64
                    ns = (mesh_axis_size(mesh, axis)
                          if mesh is not None else 1)
                    req = 128 // math.gcd(bs, 128)
                    aligned = (index.n_pad % (ns * bs)) == 0
                    stage1_kernel = aligned and (
                        index.n_pad // ns // bs) >= req
        coarse_int8 = bool(coarse_int8)
        stage1_kernel = bool(stage1_kernel)
        if tile_d is None:
            # exact-kernel doc tile: 64 measured fastest on v5e at the
            # 112k x 128 x 128 shape (966 vs 926 QPS at 16; >64 fails to
            # compile); small/oddly-padded indexes take the largest divisor
            tile_d = next(d for d in (64, 32, 16, 8, 4, 2, 1)
                          if index.n_pad % d == 0)
        self.tile_d = tile_d
        self.mode = mode
        self.n_candidates = n_candidates
        self.n_blocks = n_blocks
        self.coarse_query_len = coarse_query_len
        # fine-stage query-group size (0 = auto; coarse._resolve_group)
        self.group_size = group_size
        if approx_topk is None:
            approx_topk = jax.default_backend() == "tpu"
        self.approx_topk = approx_topk
        # approx_max_k recall_target for the pruning cuts (higher =
        # stricter = slower); only meaningful when approx_topk
        self.approx_recall = approx_recall
        # residual fine stage: PLAID-style centroid-only intermediate cut
        # (coarse._fine_stage). None = auto (resolve_centroid_prune):
        # C//4 (>= 4k) when the index is residual-compressed — the
        # decompress+score stage dominates the residual search cost, and
        # ranking the cut by centroid-only scores needs no decompress.
        # 0 disables.
        self.centroid_prune = centroid_prune
        # ONE-TIME slot-major (S, N, dim) summary copy for the fast
        # chunked coarse-sweep kernel (ops.maxsim.coarse_sweep_pallas;
        # 4.5-6.5x over the XLA einsum at 1M docs). Costs one extra
        # summaries-sized HBM buffer; only built for the TPU two-stage
        # path that uses it (hierarchical needs doc-major for its block
        # gathers and keeps the original layout).
        # coarse_int8: int8-quantize the slot-major summary copies so the
        # coarse sweep rides the MXU int8 path (2x bf16 throughput,
        # half the HBM traffic; ops.maxsim.coarse_sweep_pallas int8
        # branch). Candidate generation only — the fine stages are
        # untouched — and gated by the same recall tests as the sweep.
        self.coarse_int8 = coarse_int8
        self._summ_t = None
        self._summ_t_scale = None
        if mode == "two_stage" and self.use_pallas \
                and index.summaries is not None:
            sts = None
            if coarse_int8:
                # quantize straight from the stored precision — a bf16
                # pre-cast would only add rounding and a full-size
                # transient (quantize upcasts to f32 internally anyway)
                from ..ops.quant import quantize_summaries_t_int8
                st, sts = quantize_summaries_t_int8(
                    jax.jit(lambda s: jnp.swapaxes(s, 0, 1))(
                        index.summaries))
            else:
                # bf16: coarse scores are approximate, and the kernel's
                # f32 VMEM footprint halves (f32 summaries force
                # tile_n=512)
                st = jax.jit(lambda s: jnp.swapaxes(s, 0, 1)
                             .astype(jnp.bfloat16))(index.summaries)
            if mesh is not None:
                st = jax.device_put(st, NamedSharding(mesh,
                                                      P(None, axis)))
                if sts is not None:
                    sts = jax.device_put(sts, NamedSharding(mesh,
                                                            P(axis)))
            self._summ_t = st
            self._summ_t_scale = sts
        # same trick for hierarchical stage 0 (block summaries), single-
        # device only: per-shard block counts tile poorly and stage 0 is
        # already a small fraction of the sharded program
        self._bsum_t = None
        self._bsum_t_scale = None
        if mode == "hierarchical" and self.use_pallas and mesh is None \
                and index.block_summaries is not None:
            from .coarse import block_summaries_t
            if coarse_int8:
                from ..ops.quant import quantize_summaries_t_int8
                bt = jax.jit(functools.partial(
                    block_summaries_t, pad_multiple=1024))(
                    index.block_summaries)
                bt, self._bsum_t_scale = quantize_summaries_t_int8(bt)
            else:
                bt = jax.jit(functools.partial(
                    block_summaries_t, pad_multiple=1024))(
                    index.block_summaries.astype(jnp.bfloat16))
            self._bsum_t = bt
        # hierarchical stage 1 gathers the selected blocks' DOC-MAJOR
        # summaries out of HBM every batch — the dominant pruning-cost
        # term at 1M docs. coarse_int8 also builds an int8 copy + per-doc
        # scales for that gather (half the bytes; order-exact rescale,
        # ops.quant.quantize_summaries_int8). Pure-XLA path: applies on
        # every backend and on the sharded searcher too.
        self._summ_i8 = None
        self._summ_i8_scale = None
        if mode == "hierarchical" and coarse_int8 \
                and index.summaries is not None:
            from ..ops.quant import quantize_summaries_int8
            si8, ss = quantize_summaries_int8(index.summaries)
            if mesh is not None:
                si8 = jax.device_put(si8, NamedSharding(mesh, P(axis)))
                ss = jax.device_put(ss, NamedSharding(mesh, P(axis)))
            self._summ_i8 = si8
            self._summ_i8_scale = ss
        # sharded stage-0 int8: the mesh program's block-summary sweep is
        # plain XLA (the slot-major kernel copy is single-device only);
        # an int8 copy + per-block scales halves its HBM read and rides
        # the MXU int8 path. Order-exact rescale (scale commutes with
        # max/sum — coarse.hierarchical_search int8 stage-0 branch).
        self._bsum_i8 = None
        self._bsum_i8_scale = None
        if mode == "hierarchical" and coarse_int8 and mesh is not None \
                and index.block_summaries is not None:
            from ..ops.quant import quantize_summaries_int8
            bi8, bs_ = quantize_summaries_int8(index.block_summaries)
            self._bsum_i8 = jax.device_put(
                bi8, NamedSharding(mesh, P(axis)))
            self._bsum_i8_scale = jax.device_put(
                bs_, NamedSharding(mesh, P(axis)))
        # opt-in fused stage-1 kernel (ops.maxsim.stage1_sweep_pallas):
        # streams each query's selected blocks HBM->VMEM via
        # scalar-prefetch DMA instead of the XLA gather+einsum. Measured
        # on-chip at 1M docs: int8 hierarchical 4962 -> 6030 QPS at
        # B128/C1024, 13334 -> 16160 at B32/C256 (STATUS.md round-4).
        # Works single-device and sharded (each shard's rows are its own
        # contiguous blocks, so the global stage1_rows layout sharded on
        # dim 0 IS the per-shard layout). Composes with coarse_int8: the
        # rows are then the int8 copy and its per-doc scales ride as the
        # kernel's dscale.
        self._summ_rows = None
        self._summ_rows_scale = None
        if stage1_kernel:
            if mode != "hierarchical" or index.summaries is None:
                import warnings
                warnings.warn(
                    "stage1_kernel=True had no effect (hierarchical "
                    "mode with summaries built only)",
                    stacklevel=2)
            else:
                from ..ops.maxsim import stage1_rows
                bs = index.block_size
                if mesh is not None:
                    assert (index.n_pad // mesh_axis_size(mesh, axis)) \
                        % bs == 0, "shard boundary must align to blocks"
                src = self._summ_i8 if self._summ_i8 is not None \
                    else index.summaries.astype(jnp.bfloat16)
                rows_fn = jax.jit(stage1_rows, static_argnums=1,
                                  **({} if mesh is None else
                                     {"out_shardings": NamedSharding(
                                         mesh, P(axis))}))
                self._summ_rows = rows_fn(src, bs)
                if self._summ_i8 is not None:
                    self._summ_rows_scale = self._summ_i8_scale
                    # the rows subsume the doc-major int8 copy
                    self._summ_i8 = None
                    self._summ_i8_scale = None
        if coarse_int8 and self._summ_t_scale is None \
                and self._bsum_t_scale is None and self._summ_i8 is None \
                and self._summ_rows_scale is None \
                and self._bsum_i8 is None:
            import warnings
            warnings.warn(
                "coarse_int8=True had no effect: the int8 paths only "
                "exist on the Pallas (TPU) two_stage coarse sweep and "
                "the hierarchical pruning stages with summaries built "
                f"(mode={mode!r}, use_pallas={self.use_pallas}, "
                f"mesh={'set' if mesh is not None else 'None'})",
                stacklevel=2)
        if mode == "two_stage":
            assert index.summaries is not None, \
                "call index.build_summaries() first"
        if mode == "hierarchical":
            assert index.summaries is not None \
                and index.block_summaries is not None, \
                "call index.build_summaries().build_block_summaries() first"
        if index.tokens is None:
            assert mode in ("two_stage", "hierarchical"), \
                ("a residual-compressed index has no full-precision tokens; "
                 "use a pruned search mode")
        self._sharded_fns: dict[int, callable] = {}

    def resolve_candidates(self, k: int) -> int:
        """k-dependent candidate-count preset (reference searcher.py:91-118:
        ndocs=1024 up to k=100, max(4k, 4096) beyond — too-small fixed
        defaults silently cost recall at large k)."""
        if self.n_candidates is not None:
            return self.n_candidates
        if self.preset == "fast":
            # measured rank-converged point: top-10 overlap 1.0000 vs
            # C=4096 presets at 112k and 1M docs (STATUS.md round-4).
            # The measurement is PER CHIP; the sharded program divides
            # the global count by nshards (make_sharded_search c_local),
            # so scale it back up so each shard runs the measured point.
            # The 256/chip floor is top-10-validated only — deeper cuts
            # (Recall@50/100 in FLMRExecutor.evaluate) scale 4k/chip so
            # the candidate pool never starves the metric depth.
            return max(256, 4 * k) * self._nshards()
        return 1024 if k <= 100 else max(4 * k, 4096)

    def resolve_blocks(self, k: int) -> Optional[int]:
        if self.n_blocks is not None:
            return self.n_blocks
        c = self.resolve_candidates(k)
        if self.preset == "fast":
            # stage-1 cost scales with n_blocks (it gathers
            # n_blocks*block_size docs' summaries per query); 32 measured
            # rank-converged at 1M (nb32/C256: 9,710 QPS/chip residual).
            # Per-chip numbers again: sharded search uses n_blocks/nshards
            # blocks per shard — and each SHARD's selected blocks must
            # cover k docs (per-shard candidates floor at k, so thinner
            # coverage would clamp the fine stage below its top_k width).
            bs = self.index.block_size or 64
            ns = self._nshards()
            k_local = min(k, self.index.n_pad // ns)
            return max(32, -(-c // (bs * ns)), -(-k_local // bs)) * ns
        return max(c // 2, 1)

    def _nshards(self) -> int:
        return mesh_axis_size(self.mesh, self.axis) \
            if self.mesh is not None else 1

    def resolve_centroid_prune(self, k: int, n_candidates: int) -> int:
        """Intermediate candidate count for the residual fine stage's
        centroid-only cut (0 = off; same staging as the reference's
        IndexScorer.score_pids approximate-then-exact cut,
        index_storage.py:141-171).

        Auto (None) is OFF: measured on the real chip at 1M docs the cut
        REGRESSES throughput 10-19% at every preset shape (C=256/1024,
        two-stage + hierarchical, 2026-08-18 — see STATUS.md round-4
        table): the (B, K, Lq) centroid-score table + per-token row
        gathers cost more than the decompress they avoid at C <= 1024.
        The knob stays for capacity-bound C >= 4k candidate sets where
        decompress dominates again.

        An explicit `centroid_prune` always wins (the caller owns the
        recall trade-off — with codebooks below ~4k centroids
        same-cluster docs share identical code sequences and the cut
        shuffles near-ties, the tight-cluster worst case of
        tests/test_recall_gate.py), zeroed only for non-residual
        indexes and when it would not actually cut."""
        if self.index.nbits == 0:
            return 0
        cp = self.centroid_prune
        if cp is None:
            return 0
        cp = min(cp, n_candidates)
        return 0 if cp >= n_candidates else cp

    def _search_fn(self, k: int):
        if self.mesh is None:
            return None
        if k not in self._sharded_fns:
            self._sharded_fns[k] = make_sharded_search(
                self.mesh, self.index.n_pad, k=k, axis=self.axis,
                use_pallas=self.use_pallas, tile_d=self.tile_d,
                quantized=self.index.scales is not None,
                two_stage=self.mode == "two_stage",
                n_candidates=self.resolve_candidates(k),
                hierarchical=self.mode == "hierarchical",
                n_blocks=self.resolve_blocks(k)
                if self.mode == "hierarchical" else self.n_blocks,
                block_size=self.index.block_size,
                coarse_query_len=self.coarse_query_len,
                residual_nbits=self.index.nbits,
                group_size=self.group_size,
                use_summ_t=self._summ_t is not None,
                use_summ_t_scale=self._summ_t_scale is not None,
                approx_topk=self.approx_topk,
                approx_recall=self.approx_recall,
                centroid_prune=self.resolve_centroid_prune(
                    k, self.resolve_candidates(k)),
                use_summ_i8=(self._summ_i8 is not None
                             or self._summ_rows_scale is not None),
                use_summ_rows=self._summ_rows is not None,
                factored_codec=self.index.codec_coarse is not None,
                use_bsum_i8=self._bsum_i8 is not None)
        return self._sharded_fns[k]

    def sharded_args(self, q: jax.Array) -> tuple:
        """The exact positional arg tuple the sharded program
        (_search_fn(k)) expects for this searcher's index layout —
        public so benches/serving can scan-chain the compiled fn without
        duplicating the assembly (which grows with codec features)."""
        idx = self.index
        # hierarchical + coarse_int8: the summaries slot carries the
        # int8 doc-major copy (or its stage1_rows layout when the
        # fused stage-1 kernel is on), with any per-doc scales
        # appended last
        summ = self._summ_rows if self._summ_rows is not None else \
            (idx.summaries if self._summ_i8 is None else
             self._summ_i8)
        tail_scale = self._summ_rows_scale \
            if self._summ_rows is not None else self._summ_i8_scale
        bsum = (self._bsum_i8 if self._bsum_i8 is not None
                else idx.block_summaries)
        if idx.tokens is None:                  # residual codec
            args = (q, idx.mask, summ)
            if self.mode == "hierarchical":
                args += (bsum,)
            args += (idx.records, idx.codec_centroids,
                     idx.codec_weights)
            if self._summ_t is not None:
                args += (self._summ_t,)
                if self._summ_t_scale is not None:
                    args += (self._summ_t_scale,)
            if tail_scale is not None:
                args += (tail_scale,)
            if self._bsum_i8 is not None:
                args += (self._bsum_i8_scale,)
            if idx.codec_coarse is not None:    # factored codec
                args += (idx.codec_coarse, idx.codec_fine)
            return args
        args = (q, idx.tokens, idx.mask)
        if self.mode in ("two_stage", "hierarchical"):
            args += (summ,)
        if self.mode == "hierarchical":
            args += (bsum,)
        if idx.scales is not None:
            args += (idx.scales,)
        if self._summ_t is not None:
            args += (self._summ_t,)
            if self._summ_t_scale is not None:
                args += (self._summ_t_scale,)
        if tail_scale is not None:
            args += (tail_scale,)
        if self._bsum_i8 is not None:
            args += (self._bsum_i8_scale,)
        return args

    def search_device(self, q: jax.Array, k: int):
        """(B, Lq, dim) -> (scores (B,k), padded-index rows (B,k)), on device."""
        idx = self.index
        if self.mesh is not None:
            return self._search_fn(k)(*self.sharded_args(q))
        if self.mode == "hierarchical":
            from .coarse import hierarchical_search
            nb = idx.block_summaries.shape[0]
            n_blocks = min(self.resolve_blocks(k), nb)
            summ_rows = self._summ_rows
            if summ_rows is not None:
                # the fused stage-1 kernel's output block is tb*bs lanes:
                # the selected-block count must be a multiple of
                # 128/gcd(bs, 128) (ops.maxsim.stage1_sweep_pallas).
                # Align up (clamped to nb); when no aligned count covers
                # the k docs, run the XLA stage 1 over the full-precision
                # summaries for this k instead of trace-failing on TPU.
                import math
                bs = idx.block_size
                req = 128 // math.gcd(bs, 128)
                b_need = -(-min(k, idx.n_pad) // bs)
                aligned = min(-(-n_blocks // req) * req,
                              (nb // req) * req)
                if nb >= req and aligned >= b_need:
                    n_blocks = aligned
                else:
                    summ_rows = None
            if summ_rows is None and self._summ_rows is not None:
                summaries, summ_int8, summ_scale = idx.summaries, None, None
            else:
                summaries = idx.summaries if (self._summ_i8 is None
                                              and summ_rows is None) else None
                summ_int8 = self._summ_i8
                summ_scale = (self._summ_rows_scale
                              if summ_rows is not None
                              else self._summ_i8_scale)
            return hierarchical_search(
                q, idx.tokens, idx.mask,
                summaries,
                idx.block_summaries, k=k,
                n_blocks=n_blocks,
                n_candidates=min(self.resolve_candidates(k), idx.n_pad),
                block_size=idx.block_size, scales=idx.scales,
                coarse_query_len=self.coarse_query_len,
                use_pallas_residual=self.use_pallas,
                records=idx.records,
                centroids=idx.codec_centroids,
                bucket_weights=idx.codec_weights, nbits=idx.nbits,
                group_size=self.group_size,
                approx_topk=self.approx_topk,
                approx_recall=self.approx_recall,
                block_summ_t=self._bsum_t,
                block_summ_t_scale=self._bsum_t_scale,
                centroid_prune=self.resolve_centroid_prune(
                    k, min(self.resolve_candidates(k), idx.n_pad)),
                summ_int8=summ_int8,
                summ_scale=summ_scale,
                summ_rows=summ_rows,
                codec_coarse=idx.codec_coarse,
                codec_fine=idx.codec_fine)
        if self.mode == "two_stage":
            from .coarse import two_stage_search
            return two_stage_search(
                q, idx.tokens, idx.mask, idx.summaries, k=k,
                n_candidates=min(self.resolve_candidates(k), idx.n_pad),
                scales=idx.scales,
                coarse_query_len=self.coarse_query_len,
                use_pallas_coarse=self.use_pallas,
                use_pallas_residual=self.use_pallas,
                records=idx.records,
                centroids=idx.codec_centroids,
                bucket_weights=idx.codec_weights, nbits=idx.nbits,
                group_size=self.group_size,
                summaries_t=self._summ_t,
                summaries_t_scale=self._summ_t_scale,
                approx_topk=self.approx_topk,
                approx_recall=self.approx_recall,
                centroid_prune=self.resolve_centroid_prune(
                    k, min(self.resolve_candidates(k), idx.n_pad)),
                codec_coarse=idx.codec_coarse,
                codec_fine=idx.codec_fine)
        return search_single_device(
            q, idx.tokens, idx.mask, idx.scales, k=k,
            use_pallas=self.use_pallas, tile_d=self.tile_d)

    def search(self, q, k: int):
        """Host-facing search: returns (scores (B,k) np, pids (B,k) np).

        Padded rows (pid -1) score ≈ -9999*Lq and only appear when
        k > num_docs.
        """
        scores, rows = self.search_device(jnp.asarray(q), k)
        scores = np.asarray(scores)
        rows = np.asarray(rows)
        return scores, self.index.pids[rows]
