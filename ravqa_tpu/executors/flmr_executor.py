"""FLMR retrieval executor: training loop + validation-time index build +
search + Recall@K evaluation.

Mirrors the reference FLMRExecutor (/root/reference/src/executors/
FLMR_executor.py): training_step = nway + in-batch-negative loss (:368-427);
validation = embed queries -> build index over the candidate corpus ->
search -> pseudo-relevance / pos-id Recall@K (:429-973). The reference's
rank-0 mp-spawn temp-index dance (:515-719) collapses into an in-process
jitted sharded encode + collective search.
"""

from __future__ import annotations

import functools
from typing import Iterable, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ..metrics import positive_id_scores, pseudo_relevance_scores
from ..models.flmr import FLMRRetriever
from ..retrieval import (LateInteractionSearcher, TokenIndex,
                         build_index_from_embeddings)
from .base import BaseExecutor, TrainConfig


class FLMRExecutor(BaseExecutor):
    def __init__(self, model: FLMRRetriever, params, train_cfg: TrainConfig,
                 mesh=None, log_dir=None, seed: int = 0, quiet: bool = False,
                 skip_ids: Optional[Sequence[int]] = None, **kwargs):
        self.skip_ids = tuple(skip_ids or ())
        super().__init__(model, params, train_cfg, mesh, log_dir, seed,
                         quiet=quiet, **kwargs)
        self._encode_doc = jax.jit(self._encode_doc_impl)
        self._encode_query = jax.jit(self._encode_query_impl)

    # -- loss ----------------------------------------------------------------
    def loss_fn(self, params, batch, rng):
        out = self.model.apply({"params": params}, **batch,
                               deterministic=True)
        metrics = {"nway_loss": out["loss"] - out["ib_loss"],
                   "ib_loss": out["ib_loss"]}
        return out["loss"], metrics

    # -- encoding ------------------------------------------------------------
    def _encode_doc_impl(self, params, input_ids, attention_mask, skip_mask):
        return self.model.apply({"params": params}, input_ids,
                                attention_mask, skip_mask,
                                method=FLMRRetriever.doc)

    def _encode_query_impl(self, params, input_ids, attention_mask,
                           image_features, pixel_values=None,
                           image_patch_features=None):
        return self.model.apply({"params": params}, input_ids,
                                attention_mask, image_features,
                                pixel_values, image_patch_features,
                                method=FLMRRetriever.query)

    def encode_queries(self, batches: Iterable[dict]) -> np.ndarray:
        out = []
        for b in batches:
            q = self._encode_query(self.state.params,
                                   b.get("query_input_ids"),
                                   b.get("query_attention_mask"),
                                   b.get("image_features"),
                                   b.get("pixel_values"),
                                   b.get("image_patch_features"))
            out.append(np.asarray(q, np.float32))
        return np.concatenate(out, axis=0)

    def build_index(self, doc_batches: Iterable[dict],
                    pids: Optional[Sequence] = None,
                    dtype=jnp.float32, pad_multiple: int = 8,
                    resume_dir: Optional[str] = None) -> TokenIndex:
        """Encode a corpus and assemble the sharded TokenIndex (the
        reference's prepare_item_embeddings + Indexer.index).

        resume_dir: persist per-batch chunks there and skip already-encoded
        chunks on restart (the reference indexing `resume` mode)."""
        from ..models.flmr import skiplist_mask
        from ..retrieval.index import encode_corpus

        def encode_fn(b):
            ids = b["doc_input_ids"]
            am = b["doc_attention_mask"]
            sm = b.get("doc_skip_mask")
            if sm is None:
                sm = skiplist_mask(jnp.asarray(ids), self.skip_ids)
            return self._encode_doc(self.state.params, jnp.asarray(ids),
                                    jnp.asarray(am), jnp.asarray(sm))

        return encode_corpus(
            encode_fn, doc_batches, pad_multiple=pad_multiple, dtype=dtype,
            mesh=self.mesh, axis="data" if self.mesh is not None else "index",
            pids=pids, resume_dir=resume_dir)

    # -- evaluation ----------------------------------------------------------
    def evaluate_retrieval(
        self,
        query_batches: Iterable[dict],
        doc_batches: Iterable[dict],
        passage_ids: Sequence,
        passage_contents: Optional[Sequence[str]] = None,
        answers: Optional[Sequence[Sequence[str]]] = None,
        gold_answers: Optional[Sequence[str]] = None,
        pos_item_ids: Optional[Sequence[Sequence]] = None,
        ks: Sequence[int] = (5, 10),
        index: Optional[TokenIndex] = None,
        search_mode: str = "exact",
        n_candidates: "int | None" = None,
        add_null_document: bool = False,
        coarse_query_len: "int | None" = None,
        coarse_int8: "bool | None" = None,
        search_preset: str = "reference",
    ) -> dict:
        """Full reference eval loop (evaluate_outputs, FLMR_executor:722-973).

        Returns metrics dict; also returns the built index under key
        "_index" for reuse across validation sets (reference
        validation_indexing_source behavior).
        """
        if index is None:
            index = self.build_index(doc_batches, pids=np.arange(
                len(passage_ids)))
        if search_mode in ("two_stage", "hierarchical") \
                and index.summaries is None:
            index.build_summaries(mesh=self.mesh,
                                  axis="data" if self.mesh is not None
                                  else "index")
        if search_mode == "hierarchical" and index.block_summaries is None:
            n_local = index.n_pad // (self.mesh.shape["data"]
                                      if self.mesh is not None else 1)
            bs = max(b for b in (64, 32, 16, 8, 4, 2, 1)
                     if n_local % b == 0)
            index.build_block_summaries(
                block_size=bs, mesh=self.mesh,
                axis="data" if self.mesh is not None else "index")
        searcher = LateInteractionSearcher(
            index, mesh=self.mesh,
            axis="data" if self.mesh is not None else "index",
            use_pallas=jax.default_backend() == "tpu",
            mode=search_mode, n_candidates=n_candidates,
            coarse_query_len=coarse_query_len,
            coarse_int8=coarse_int8, preset=search_preset)
        q = self.encode_queries(query_batches)
        k = max(ks)
        _, rows = searcher.search(q, k=min(k, index.num_docs))
        metrics: dict = {}
        retrieved_pids = [[passage_ids[r] for r in row if r >= 0]
                          for row in rows]
        if answers is not None and passage_contents is not None:
            contents = [[passage_contents[r] for r in row if r >= 0]
                        for row in rows]
            metrics.update(pseudo_relevance_scores(
                contents, answers, ks, gold_answers,
                add_null_document=add_null_document))
        if pos_item_ids is not None:
            metrics.update(positive_id_scores(retrieved_pids, pos_item_ids,
                                              ks))
        metrics["_index"] = index
        metrics["_retrieved_pids"] = retrieved_pids
        return metrics
