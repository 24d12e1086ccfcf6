"""TPU-native late-interaction index.

Replaces the reference's ColBERT indexing stack (CollectionIndexer /
ResidualCodec / IVF / chunked .pt files — SURVEY.md §2.3 R10-R15) with an
HBM-resident padded token-embedding array sharded across the device mesh:

    tokens: (N_pad, Ld, dim)   bf16 (or int8 + scales, see codec)
    mask:   (N_pad, Ld)        int8   (0 on padded doc tokens / padded docs)

Indexing is a jitted sharded encode of the corpus; search is a collective
MaxSim + cross-shard top-k (search.py). For a 1M-passage corpus at Ld=256,
dim=128 the bf16 index is 64 GiB — sharded over a v5e-8 pod slice that is
8 GiB/chip; the int8 codec (ravqa_tpu.ops.quant) halves it again.

Save format: one .npz per index + a JSON sidecar (metadata), replacing the
reference's plan.json/centroids.pt/chunk files.
"""

from __future__ import annotations

import dataclasses
import json
import os
from typing import Callable, Iterable, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


@dataclasses.dataclass
class TokenIndex:
    """A (possibly sharded) late-interaction token index."""
    tokens: Optional[jax.Array]  # (N_pad, Ld, dim) bf16/f32/int8; None when
    #                              residual-compressed (`records` holds
    #                              the data)
    mask: jax.Array            # (N_pad, Ld) int8/float
    pids: np.ndarray           # (N_pad,) int64 global passage ids; -1 = pad
    num_docs: int              # real (unpadded) doc count
    scales: Optional[jax.Array] = None   # (N_pad, Ld): f32 dequant scales
    #   (int8 index) or bf16 reconstruction-norm scales (residual index)
    summaries: Optional[jax.Array] = None  # (N_pad, S, dim) coarse stage
    block_summaries: Optional[jax.Array] = None  # (N_pad/bs, Sb, dim)
    block_size: int = 64
    # residual codec (ops.residual; the reference's nbits index format).
    # Per-doc data lives in ONE packed uint8 record row per doc —
    # [codes uint16 | scales bf16 | residual bytes] (pack_records) — so
    # the fine stage gathers candidates with a single wide-row take
    # (measured 1.9-2.7x over separate codes/residuals/scales arrays,
    # scripts/exp_residual_stage2.py); unpack_residual() splits when the
    # separate arrays are needed (save, parity tests, gather_tokens).
    records: Optional[jax.Array] = None     # (N_pad, Ld*(4+dim*nbits/8))
    codec_centroids: Optional[jax.Array] = None   # (K, dim) f32
    codec_weights: Optional[jax.Array] = None     # (2^nbits,) f32
    # factored codec factors (ops.residual.train_codec_factored):
    # codec_centroids then holds the materialized coarse[h]+fine[l] table
    # and these carry the additive factors for the fused TPU kernel
    codec_coarse: Optional[jax.Array] = None      # (k_coarse, dim) f32
    codec_fine: Optional[jax.Array] = None        # (k_fine, dim) f32
    nbits: int = 0
    meta: dict = dataclasses.field(default_factory=dict)

    def build_summaries(self, n_summary: int = 8, iters: int = 4,
                        mesh=None, axis: str = "index") -> "TokenIndex":
        """Attach per-doc summary vectors for two-stage search."""
        from .coarse import summarize_docs
        summ = summarize_docs(self.tokens, self.mask,
                              n_summary=n_summary, iters=iters)
        summ = summ.astype(self.tokens.dtype
                           if self.tokens.dtype != jnp.int8
                           else jnp.bfloat16)
        if mesh is not None:
            summ = jax.device_put(summ, NamedSharding(mesh, P(axis)))
        self.summaries = summ
        return self

    def build_block_summaries(self, block_size: int = 64,
                              n_block_summary: int = 4,
                              iters: int = 4, mesh=None,
                              axis: str = "index") -> "TokenIndex":
        """Second summary level for hierarchical search. For best recall,
        build the index with cluster-ordered docs (coarse.cluster_order).
        With `mesh`, block summaries are sharded over `axis` (blocks are
        contiguous doc ranges, so doc-sharding and block-sharding align as
        long as block_size divides the per-shard doc count)."""
        from .coarse import block_summaries
        assert self.summaries is not None, "build_summaries() first"
        assert self.n_pad % block_size == 0
        if mesh is not None:
            from .search import mesh_axis_size
            n_local = self.n_pad // mesh_axis_size(mesh, axis)
            assert n_local % block_size == 0, \
                (f"block_size {block_size} must divide the per-shard doc "
                 f"count {n_local}")
        self.block_summaries = block_summaries(
            self.summaries, block_size=block_size,
            n_block_summary=n_block_summary, iters=iters).astype(
            self.summaries.dtype)
        if mesh is not None:
            self.block_summaries = jax.device_put(
                self.block_summaries, NamedSharding(mesh, P(axis)))
        self.block_size = block_size
        return self

    def quantize_int8(self) -> "TokenIndex":
        """Symmetric per-token int8 quantization of the token store
        (ops.quant): 2x memory vs bf16 at <1pt recall cost. All search
        modes keep working — the int8 kernels dequantize via `scales`.
        Sharding is preserved (jnp ops propagate the tokens' sharding)."""
        from ..ops.quant import quantize_index_int8
        assert self.tokens is not None, "residual index cannot re-quantize"
        assert self.tokens.dtype != jnp.int8, "already int8"
        q8, scales = quantize_index_int8(
            jnp.asarray(self.tokens, jnp.float32),
            jnp.asarray(self.mask, jnp.float32))
        self.tokens, self.scales = q8, scales
        return self

    def quantize_residual(self, n_centroids: int = 256, nbits: int = 2,
                          mesh=None, axis: str = "index",
                          seed: int = 0, sample: int = 2 ** 16,
                          heldout: int = 2 ** 14,
                          codec=None) -> "TokenIndex":
        """Compress the token store with the residual codec (ops.residual —
        the reference's nbits index format, residual.py:169-278): ~7x vs
        bf16 at nbits=2, ~3.8x at nbits=4. The full-precision `tokens` array
        is DROPPED; only pruned search modes (two_stage / hierarchical,
        which re-score decompressed candidates) remain available. Build
        summaries first — the coarse stage needs them.

        n_centroids: an int trains the flat codec; a (k_coarse, k_fine)
        TUPLE trains the FACTORED additive codec
        (ops.residual.train_codec_factored) — same index format and
        compression ratio with K = k_coarse*k_fine effective centroids,
        but the fused decompress+MaxSim TPU kernel then runs at any K
        (its in-VMEM centroid matmul costs k_coarse+k_fine columns, not
        K).
        codec: pass a pre-trained ops.residual.ResidualCodec to skip
        training and compress with EXTERNAL codec data (e.g. the exact
        centroids/buckets another engine's index uses, for cross-engine
        parity); n_centroids/nbits/seed/sample/heldout are ignored then."""
        from ..ops.residual import compress, train_codec, \
            train_codec_factored
        assert self.tokens is not None, "already compressed"
        assert self.summaries is not None, \
            "build_summaries() before quantize_residual()"
        toks = np.asarray(self.tokens, np.float32)
        msk = np.asarray(self.mask)
        if codec is None and isinstance(n_centroids, (tuple, list)):
            k1, k2 = n_centroids
            codec = train_codec_factored(toks, msk, k_coarse=k1,
                                         k_fine=k2, nbits=nbits,
                                         seed=seed, sample=sample,
                                         heldout=heldout)
        elif codec is None:
            codec = train_codec(toks, msk, n_centroids=n_centroids,
                                nbits=nbits, seed=seed, sample=sample,
                                heldout=heldout)
        else:
            n_centroids = int(codec.centroids.shape[0])
            nbits = codec.nbits
        assert codec.centroids.shape[0] <= 65536, \
            "records store uint16 centroid codes (max 65536 centroids)"
        from ..ops.residual import pack_records
        codes, packed, scales = compress(toks, msk, codec)
        # pack per doc: uint16 code (the reference stores int32,
        # residual_embeddings.py:23-24) + bf16 reconstruction-norm scale
        # (reference normalizes decompressed tokens before scoring,
        # residual.py:273-276) + residual bytes -> one record row
        records = pack_records(codes, scales.astype(jnp.bfloat16), packed)
        if mesh is not None:
            records = jax.device_put(records,
                                     NamedSharding(mesh, P(axis)))
        rep = (NamedSharding(mesh, P()) if mesh is not None else None)
        self.records = records
        self.scales = None
        self.codec_centroids = (jax.device_put(codec.centroids, rep)
                                if rep else codec.centroids)
        self.codec_weights = (jax.device_put(codec.bucket_weights, rep)
                              if rep else codec.bucket_weights)
        if codec.factored:
            self.codec_coarse = (jax.device_put(codec.coarse, rep)
                                 if rep else codec.coarse)
            self.codec_fine = (jax.device_put(codec.fine, rep)
                               if rep else codec.fine)
        self.nbits = nbits
        self.meta["dim"] = int(codec.centroids.shape[1])
        self.tokens = None
        return self

    def gather_tokens(self, rows: jax.Array) -> jax.Array:
        """Gather (decompressing if needed) doc token embeddings for the
        given padded-index rows. rows (...,) int -> (..., Ld, dim) f32."""
        if self.tokens is not None:
            return jnp.take(self.tokens, rows, axis=0).astype(jnp.float32)
        from ..ops.residual import decompress, split_records
        rg = jnp.take(self.records, rows, axis=0)
        cod, scl, pck = split_records(rg, self.doc_maxlen)
        rec = decompress(cod, pck, self.codec_centroids,
                         self.codec_weights, self.nbits)
        # reference-parity L2 normalization via reconstruction-norm scales
        return rec * scl[..., None]

    def unpack_residual(self):
        """Split the packed records into (codes int32, scales f32,
        residual bytes) full-index arrays (materializes copies — for
        save/parity/tooling, not the search hot path)."""
        from ..ops.residual import split_records
        return split_records(self.records, self.doc_maxlen)

    @property
    def n_pad(self) -> int:
        return (self.tokens if self.tokens is not None
                else self.records).shape[0]

    @property
    def doc_maxlen(self) -> int:
        if self.tokens is not None:
            return self.tokens.shape[1]
        return self.mask.shape[1]

    @property
    def dim(self) -> int:
        if self.tokens is not None:
            return self.tokens.shape[2]
        return self.codec_centroids.shape[1]


def pad_to(n: int, multiple: int) -> int:
    return ((n + multiple - 1) // multiple) * multiple


def build_index_from_embeddings(
    embs: Sequence[np.ndarray] | np.ndarray,
    masks: Sequence[np.ndarray] | np.ndarray,
    pids: Optional[Sequence[int]] = None,
    pad_multiple: int = 128,
    dtype=jnp.bfloat16,
    mesh: Optional[Mesh] = None,
    axis: str = "index",
) -> TokenIndex:
    """Assemble an index from per-doc token embeddings.

    Args:
      embs: (N, Ld, dim) array or list of (Ld_i, dim) arrays (padded to the
        max Ld). Embeddings must already be L2-normalized (model.doc does).
      masks: matching validity masks.
      pad_multiple: N is padded so every mesh shard divides evenly and the
        Pallas tile size divides the shard.
      mesh: if given, the index is device_put sharded over `axis` (dim 0).
    """
    if isinstance(embs, (list, tuple)):
        n = len(embs)
        ld = max(e.shape[0] for e in embs)
        dim = embs[0].shape[1]
        tok = np.zeros((n, ld, dim), np.float32)
        msk = np.zeros((n, ld), np.int8)
        for i, (e, m) in enumerate(zip(embs, masks)):
            tok[i, :e.shape[0]] = e
            msk[i, :m.shape[0]] = np.asarray(m, np.int8)
    else:
        tok = np.asarray(embs, np.float32)
        msk = np.asarray(masks, np.int8)
        n, ld, dim = tok.shape

    if pids is None:
        pids = np.arange(n, dtype=np.int64)
    else:
        pids = np.asarray(pids, np.int64)

    n_pad = pad_to(max(n, 1), pad_multiple)
    if mesh is not None:
        from .search import mesh_axis_size
        n_pad = pad_to(n_pad, pad_multiple * mesh_axis_size(mesh, axis))
    if n_pad != n:
        tok = np.concatenate(
            [tok, np.zeros((n_pad - n, ld, dim), np.float32)], axis=0)
        msk = np.concatenate(
            [msk, np.zeros((n_pad - n, ld), np.int8)], axis=0)
        pids = np.concatenate(
            [pids, np.full((n_pad - n,), -1, np.int64)], axis=0)

    tokens = jnp.asarray(tok, dtype)
    mask = jnp.asarray(msk)
    if mesh is not None:
        tokens = jax.device_put(tokens, NamedSharding(mesh, P(axis)))
        mask = jax.device_put(mask, NamedSharding(mesh, P(axis)))
    return TokenIndex(tokens=tokens, mask=mask, pids=pids, num_docs=n,
                      meta={"doc_maxlen": ld, "dim": dim})


def encode_corpus(
    doc_encode_fn: Callable,
    batches: Iterable[dict],
    pad_multiple: int = 128,
    dtype=jnp.bfloat16,
    mesh: Optional[Mesh] = None,
    axis: str = "index",
    pids: Optional[Sequence[int]] = None,
    resume_dir: Optional[str] = None,
) -> TokenIndex:
    """Encode a corpus into a TokenIndex.

    doc_encode_fn(batch) -> (D (B, Ld, dim), mask (B, Ld)); should be jitted
    (and may itself be pjit-sharded over the data axis). Replaces the
    reference's Launcher-spawned multi-process CollectionIndexer
    (collection_indexer.py:321-339) with a single-program loop.

    resume_dir: per-batch embedding chunks persist as chunk_{i}.npz there;
    a restarted build skips chunks already on disk (the reference's
    indexing `resume` mode, collection_indexer.py:62,325-327 — long
    multi-hour corpus encodes survive preemption).
    """
    embs, msks = [], []
    if resume_dir:
        os.makedirs(resume_dir, exist_ok=True)
    for i, batch in enumerate(batches):
        chunk_path = (os.path.join(resume_dir, f"chunk_{i}.npz")
                      if resume_dir else None)
        if chunk_path and os.path.exists(chunk_path):
            z = np.load(chunk_path)
            d, m = z["d"], z["m"]
        else:
            d, m = doc_encode_fn(batch)
            d = np.asarray(d, np.float32)
            m = np.asarray(m, np.int8)
            if chunk_path:
                # write-then-rename so a crash mid-write never leaves a
                # truncated chunk that a resume would trust
                tmp = chunk_path + ".tmp.npz"
                np.savez(tmp, d=d, m=m)
                os.replace(tmp, chunk_path)
        embs.append(np.asarray(d, np.float32))
        msks.append(np.asarray(m, np.int8))
    tok = np.concatenate(embs, axis=0)
    msk = np.concatenate(msks, axis=0)
    return build_index_from_embeddings(tok, msk, pids=pids,
                                       pad_multiple=pad_multiple, dtype=dtype,
                                       mesh=mesh, axis=axis)


# ---------------------------------------------------------------------------
# Persistence (replaces index chunk files + plan.json, index_saver.py:80-90)
# ---------------------------------------------------------------------------

def save_index(index: TokenIndex, path: str) -> None:
    os.makedirs(path, exist_ok=True)
    # scales keep their native dtype on disk: residual indexes store
    # reconstruction-norm scales as bf16 (2 B/token — half the footprint
    # the old f32 write cost), int8 indexes store f32 dequant scales.
    # npz has no bf16 dtype, so bf16 goes down as a uint16 bit-view with
    # the real dtype recorded in metadata.
    if index.scales is None:
        scales_np, scales_dtype = np.zeros((0,)), "float32"
    elif index.scales.dtype == jnp.bfloat16:
        scales_np = np.asarray(index.scales).view(np.uint16)
        scales_dtype = "bfloat16"
    else:
        scales_np, scales_dtype = np.asarray(index.scales,
                                             np.float32), "float32"
    arrays = dict(
        mask=np.asarray(index.mask, np.int8),
        pids=index.pids,
        scales=scales_np,
    )
    if index.tokens is not None:
        arrays["tokens"] = np.asarray(
            index.tokens,
            np.float32 if index.tokens.dtype != jnp.int8 else np.int8)
    else:                                   # residual-codec index
        arrays["records"] = np.asarray(index.records, np.uint8)
        arrays["codec_centroids"] = np.asarray(index.codec_centroids,
                                               np.float32)
        arrays["codec_weights"] = np.asarray(index.codec_weights,
                                             np.float32)
        arrays["summaries"] = np.asarray(index.summaries, np.float32)
        if index.codec_coarse is not None:        # factored codec
            arrays["codec_coarse"] = np.asarray(index.codec_coarse,
                                                np.float32)
            arrays["codec_fine"] = np.asarray(index.codec_fine,
                                              np.float32)
    np.savez(os.path.join(path, "index.npz"), **arrays)
    with open(os.path.join(path, "metadata.json"), "w") as f:
        extra = {}
        if index.tokens is None:
            # residual bit-pack layout version: "planar" = byte j holds
            # dims {j, j+D/p, ...} (ops/residual.py module docstring).
            # Older saves used interleaved packing and decode scrambled
            # under the planar unpack — load_index refuses them.
            extra["residual_layout"] = "planar"
        json.dump({"num_docs": index.num_docs,
                   "quantized": index.scales is not None
                   or index.records is not None,
                   "scales_dtype": scales_dtype,
                   "nbits": index.nbits,
                   **extra,
                   **index.meta}, f)


def load_index(path: str, dtype=jnp.bfloat16, mesh: Optional[Mesh] = None,
               axis: str = "index") -> TokenIndex:
    with open(os.path.join(path, "metadata.json")) as f:
        meta = json.load(f)
    z = np.load(os.path.join(path, "index.npz"))
    quantized = meta.pop("quantized", False)
    nbits = meta.pop("nbits", 0)
    mask = jnp.asarray(z["mask"])
    scales_dtype = meta.pop("scales_dtype", "float32")
    if not quantized:
        scales = None
    elif scales_dtype == "bfloat16":
        import ml_dtypes
        raw = z["scales"]
        if raw.dtype != np.uint16:   # npz collapses bf16 to a void view
            raw = raw.view(np.uint16)
        scales = jnp.asarray(raw.view(ml_dtypes.bfloat16))
    else:
        scales = jnp.asarray(z["scales"], jnp.float32)
    sh = NamedSharding(mesh, P(axis)) if mesh is not None else None
    if "records" in z.files or "codes" in z.files:  # residual-codec index
        layout = meta.pop("residual_layout", "interleaved")
        if layout != "planar":
            raise ValueError(
                f"residual index at {path} uses the '{layout}' bit-pack "
                "layout; this build decodes only 'planar' (residual bytes "
                "would unpack onto the wrong dims). Re-build the index "
                "with quantize_residual().")
        if "records" in z.files:
            records = jnp.asarray(z["records"])
        else:
            # legacy save with separate codes/residuals/scales arrays:
            # repack into record rows (scales default to 1.0 for indexes
            # predating reconstruction-norm storage)
            from ..ops.residual import pack_records
            codes_np = z["codes"]
            if codes_np.size and int(codes_np.max()) >= 65536:
                raise ValueError(
                    f"legacy residual index at {path} uses "
                    f"{int(codes_np.max()) + 1}+ centroids; record rows "
                    "store uint16 codes (max 65536) — re-build the index "
                    "with n_centroids <= 65536")
            if scales is None:
                scales = jnp.ones(codes_np.shape, jnp.bfloat16)
            records = pack_records(jnp.asarray(codes_np, jnp.int32),
                                   jnp.asarray(scales, jnp.bfloat16),
                                   jnp.asarray(z["residuals"]))
        idx = TokenIndex(
            tokens=None, mask=mask, pids=z["pids"],
            num_docs=meta.pop("num_docs"),
            records=records,
            codec_centroids=jnp.asarray(z["codec_centroids"]),
            codec_weights=jnp.asarray(z["codec_weights"]),
            codec_coarse=(jnp.asarray(z["codec_coarse"])
                          if "codec_coarse" in z.files else None),
            codec_fine=(jnp.asarray(z["codec_fine"])
                        if "codec_fine" in z.files else None),
            summaries=jnp.asarray(z["summaries"], dtype),
            nbits=nbits, meta=meta)
        if sh is not None:
            for f_ in ("mask", "records", "summaries"):
                setattr(idx, f_, jax.device_put(getattr(idx, f_), sh))
        return idx
    tokens = jnp.asarray(z["tokens"], jnp.int8 if quantized else dtype)
    if sh is not None:
        tokens = jax.device_put(tokens, sh)
        mask = jax.device_put(mask, sh)
        if scales is not None:
            scales = jax.device_put(scales, sh)
    return TokenIndex(tokens=tokens, mask=mask, pids=z["pids"],
                      num_docs=meta.pop("num_docs"), scales=scales, meta=meta)
