"""RAVQA-v2 executor: retrieve-then-generate training + generation eval.

Mirrors the reference RagBlipExecutor + RagModelForBlip orchestration
(/root/reference/src/executors/RAG_BLIP_executor.py, src/models/rag/
rag_model_blip.py) redesigned for the host/device split:

- live retrieval (main_retrieve): query encoder -> sharded MaxSim search over
  the corpus index -> top n_docs; the retrieved docs' token embeddings are
  re-scored INSIDE the jitted loss so gradients flow to the query encoder
  (the reference re-scores per-doc on the query device, :339-502);
- static retrieval (static_retrieve): precomputed {question_id: [passage_id,
  score]} map (the FLMR test-mode prediction JSONs, FLMR_executor.py:1012);
- generator: T5 (flan-T5 for v2) with optional LoRA (only the LoRA tree
  trains, reference custom_peft);
- loss: rag_loss_components (NLL + RAG-sequence + Approach1-6/NoPR);
- generate: greedy/beam per (question, doc), answer picked by
  log g(z|x) + log p(y|x,z).
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ..models.flmr import FLMRRetriever
from ..models.generation import greedy_generate
from ..models.lora import init_lora, merge_lora
from ..models.rag import (GeneratorInputBuilder, get_retrieval_labels,
                          rag_loss_components, select_answers_by_joint_score)
from ..models.t5 import T5Config, T5Model, shift_right
from ..ops.maxsim import maxsim_pair_xla
from ..retrieval import LateInteractionSearcher, TokenIndex
from .base import BaseExecutor, TrainConfig


@dataclasses.dataclass(frozen=True)
class RagConfig:
    n_docs: int = 5
    loss_type: str = "Approach4"          # RAVQA_loss_type
    nll_weight: float = 1.0
    rag_weight: float = 1.0               # loss_ratio.rag_loss
    additional_weight: float = 1.0        # loss_ratio.additional_loss
    use_lora: bool = True
    lora_rank: int = 8
    lora_alpha: float = 32.0
    max_decode_len: int = 10
    gen_maxlen: int = 96
    label_maxlen: int = 8
    generator_type: str = "t5"            # "t5" | "blip2" (RAVQA-v2)
    num_beams: int = 1                    # reference RAVQA-v2 uses 2
    search_mode: str = "exact"            # | "two_stage" | "hierarchical"
    n_candidates: Optional[int] = None    # pruned-mode candidate count
    #   (None -> searcher's k-dependent auto preset)
    approx_topk: Optional[bool] = None    # approx_max_k pruning cuts
    #   (None -> on for TPU backends; see LateInteractionSearcher)
    approx_recall: float = 0.95           # approx_max_k recall_target
    centroid_prune: Optional[int] = None  # residual fine stage: PLAID-style
    #   centroid-only intermediate cut (None/0 = off — measured regression
    #   at the C<=1024 presets, STATUS.md round-4; set explicitly for
    #   capacity-bound C>=4k candidate sets)
    coarse_query_len: Optional[int] = None  # only the first L query rows
    #   drive the pruning stages (the reference's candidate-generation
    #   truncation, index_storage.py:68-77); the fine stage scores full Q
    search_preset: str = "reference"      # LateInteractionSearcher preset:
    #   "fast" = the measured rank-converged operating point (C>=256,
    #   nb>=32, int8 pruning summaries, fused stage-1 kernel; STATUS.md
    #   round-4 — 2-6x throughput at measured-lossless top-10)
    coarse_int8: Optional[bool] = None    # int8-quantize the pruning-stage
    #   summary copies (MXU int8 = 2x bf16 on the coarse sweep; in
    #   hierarchical mode the stage-1 doc-summary gather moves half the
    #   HBM bytes; candidate generation only — fine stages untouched)
    # published-config behaviors (reference rag_model_blip.py):
    n_docs_in_training: Optional[int] = None  # num_knowledge_passages_in_
    #   training (:552-557): randomly subsample this many of the top n_docs
    #   per TRAINING step (the reference's OOM mitigation); eval uses n_docs.
    use_gt_docs_for_training: bool = False    # :559-573 — train against
    #   randomly-sampled ground-truth positives instead of retrieved docs
    ignore_knowledge_passages: bool = False   # :617 — generator sees
    #   "Question: .. Answer:" without the passage
    force_existence: bool = False             # :678-690 — train labels are
    #   the per-doc selected answers (answer guaranteed in doc when any
    #   matches); default labels are the gold answer repeated per doc


def _make_searcher(index: TokenIndex, mesh, rag_cfg: "RagConfig"):
    """Searcher for live retrieval, honoring rag_cfg.search_mode (pruned
    modes auto-build the summary levels; hierarchical picks a block size
    that divides the padded per-shard doc count)."""
    axis = "data" if mesh is not None else "index"
    mode = rag_cfg.search_mode
    if mode in ("two_stage", "hierarchical") and index.summaries is None:
        index.build_summaries(mesh=mesh, axis=axis)
    if mode == "hierarchical" and index.block_summaries is None:
        from ..retrieval.search import mesh_axis_size
        n_local = index.n_pad // (mesh_axis_size(mesh, axis)
                                  if mesh is not None else 1)
        bs = max(b for b in (64, 32, 16, 8, 4, 2, 1) if n_local % b == 0)
        index.build_block_summaries(block_size=bs, mesh=mesh, axis=axis)
    return LateInteractionSearcher(
        index, mesh=mesh, axis=axis,
        use_pallas=jax.default_backend() == "tpu",
        mode=mode, n_candidates=rag_cfg.n_candidates,
        approx_topk=rag_cfg.approx_topk,
        approx_recall=rag_cfg.approx_recall,
        centroid_prune=rag_cfg.centroid_prune,
        coarse_query_len=rag_cfg.coarse_query_len,
        coarse_int8=rag_cfg.coarse_int8,
        preset=rag_cfg.search_preset)


class RagExecutor(BaseExecutor):
    """params pytree: {"retriever": flmr_params, "generator": gen_params or
    {"base": ..., "lora": ...}}."""

    def __init__(self, retriever: FLMRRetriever, retriever_params,
                 generator: T5Model, generator_params,
                 gen_tokenizer, rag_cfg: RagConfig, train_cfg: TrainConfig,
                 query_tokenizer=None,
                 index: Optional[TokenIndex] = None,
                 passage_contents: Optional[Sequence[str]] = None,
                 passage_ids: Optional[Sequence] = None,
                 static_retrieval: Optional[dict] = None,
                 input_builder: Optional[GeneratorInputBuilder] = None,
                 mesh=None, log_dir=None, seed: int = 0, quiet: bool = False,
                 copy_params: bool = True, inference_only: bool = False):
        self._lora_premerged = False
        self.retriever = retriever
        self.generator = generator
        self.gen_tokenizer = gen_tokenizer
        self.query_tokenizer = query_tokenizer
        self.rag_cfg = rag_cfg
        self.index = index
        self.passage_contents = passage_contents
        self.static_retrieval = static_retrieval
        self.input_builder = input_builder or GeneratorInputBuilder(
            ignore_knowledge=rag_cfg.ignore_knowledge_passages)
        self._rng = np.random.default_rng(seed)
        # corpus passage id -> index row (for use_gt_docs_for_training)
        self._pid2row = None
        if passage_ids is not None and index is not None:
            corpus2row = {int(c): r for r, c in enumerate(
                np.asarray(index.pids).tolist()) if c >= 0}
            self._pid2row = {str(pid): corpus2row[i]
                             for i, pid in enumerate(passage_ids)
                             if i in corpus2row}
        self.searcher = None
        if index is not None:
            self.searcher = _make_searcher(index, mesh, rag_cfg)

        gen_tree = generator_params
        if rag_cfg.use_lora:
            lora = init_lora(generator_params, rank=rag_cfg.lora_rank,
                             targets=("self_attn/q", "self_attn/v",
                                      "cross_attn/q", "cross_attn/v"),
                             rng=jax.random.PRNGKey(seed + 1))
            gen_tree = {"base": generator_params, "lora": lora}
        params = {"retriever": retriever_params, "generator": gen_tree}

        # freeze the generator base when using LoRA (only the LoRA tree and
        # the retriever train)
        if rag_cfg.use_lora:
            modules = tuple(train_cfg.modules) + ("freeze_generator_base",)
            train_cfg = dataclasses.replace(train_cfg, modules=modules)
        super().__init__(generator, params, train_cfg, mesh, log_dir, seed,
                         quiet=quiet, copy_params=copy_params,
                         inference_only=inference_only)
        self._encode_query = jax.jit(self._encode_query_impl)
        # one compiled program for the whole serve-time generate path —
        # eagerly dispatching the generator encoder costs ~22 s/batch for
        # the 2.8B flan-T5-XL shape over the axon tunnel (measured,
        # scripts/bench_serving_vqa.py round 5) vs one device call here
        self._generate_device = jax.jit(self._generate_device_impl)

    # -- param helpers --------------------------------------------------------
    def _gen_params(self, params):
        g = params["generator"]
        if self.rag_cfg.use_lora and not self._lora_premerged:
            return merge_lora(jax.lax.stop_gradient(g["base"]), g["lora"],
                              alpha=self.rag_cfg.lora_alpha,
                              rank=self.rag_cfg.lora_rank)
        return g

    def prepare_for_serving(self) -> None:
        """Shed training-only memory for an inference deployment.

        - **LoRA pre-merge**: `merge_lora` runs ONCE in a donated device
          program and `state.params["generator"]` becomes the merged
          tree, replacing the per-generate merge — which keeps a second
          full copy of the generator alive across the whole decode
          program (the merged tree can't alias the base: the base is a
          non-donatable program input). At the flan-T5-XL serving shape
          that copy is ~5.7 GiB of bf16 HBM (measured: VQA_BATCH=16
          OOMs a 16 GiB chip without this call, runs with it —
          scripts/bench_serving_vqa.py).
        - **Optimizer state dropped** (no-op if already inference_only).

        Counterpart of the reference's peft `merge_and_unload` deploy
        story (custom_peft.py); generate()/evaluate paths are unchanged
        bit-for-bit (parity-tested in tests/test_rag.py).
        After this call fit()/train_step raise."""
        params = self.state.params
        gen = params["generator"]
        if self.rag_cfg.use_lora and not self._lora_premerged:
            merge = jax.jit(
                lambda base, lora: merge_lora(
                    base, lora, alpha=self.rag_cfg.lora_alpha,
                    rank=self.rag_cfg.lora_rank),
                donate_argnums=(0,))
            gen = merge(gen["base"], gen["lora"])
            self._lora_premerged = True
        self.state = self.state.replace(
            params={"retriever": params["retriever"], "generator": gen})
        super().prepare_for_serving()

    @property
    def _gcfg(self):
        cfg = self.generator.cfg
        return cfg.t5 if self.rag_cfg.generator_type == "blip2" else cfg

    def _encode_query_impl(self, params, input_ids, attention_mask,
                           image_features):
        return self.retriever.apply(
            {"params": params["retriever"]}, input_ids, attention_mask,
            image_features, method=FLMRRetriever.query)

    # -- retrieval ------------------------------------------------------------
    def retrieve(self, batch, training: bool = False) -> dict:
        """Host-facing: returns rows (B, n) int (-1 = dummy), doc token
        embs+masks for in-graph rescoring, doc contents.

        training=True enables the reference's training-only behaviors:
        use_gt_docs_for_training (rag_model_blip.py:559-573) and the
        n_docs_in_training random subsample (:552-557).
        """
        cfg = self.rag_cfg
        n_docs = cfg.n_docs
        pos_ids = batch.get("pos_item_ids")
        if training and cfg.use_gt_docs_for_training and pos_ids is not None \
                and self._pid2row is not None:
            # each of the n_docs slots gets an independently-sampled positive
            rows = np.array(
                [[self._pid2row.get(
                    str(pos[self._rng.integers(len(pos))]), -1)
                  for _ in range(n_docs)] if pos else [-1] * n_docs
                 for pos in pos_ids], np.int32)
        elif self.static_retrieval is not None:
            qids = batch["question_ids"]
            rows = []
            for q in qids:
                ann = self.static_retrieval.get(str(q))
                if ann is None:
                    ann = self.static_retrieval.get(q)
                if not ann:
                    # missing question id -> dummy passages (reference
                    # substitutes empty docs, rag_model_blip.py:541-548)
                    rows.append([-1] * n_docs)
                else:
                    row = [p for p, _ in ann[:n_docs]]
                    row += [-1] * (n_docs - len(row))
                    rows.append(row)
            rows = np.asarray(rows, np.int32)
        else:
            q = self._encode_query(self.state.params,
                                   jnp.asarray(batch["query_input_ids"]),
                                   jnp.asarray(batch["query_attention_mask"]),
                                   jnp.asarray(batch["image_features"]))
            _, rows = self.searcher.search_device(q, k=n_docs)
            rows = np.asarray(rows)
        if training and cfg.n_docs_in_training \
                and cfg.n_docs_in_training < rows.shape[1]:
            # random n_docs_in_training of the top n_docs, per question
            cols = np.stack([self._rng.permutation(rows.shape[1])
                             [:cfg.n_docs_in_training]
                             for _ in range(rows.shape[0])])
            rows = np.take_along_axis(rows, cols, axis=1)
        # gather on device: fetching the whole index to host per step would
        # move the entire KB over PCIe/tunnel every retrieve
        # dummy = static-path -1 rows AND live-search rows that land on
        # index PADDING (pid -1; possible when n_docs > num_docs) — the
        # latter would otherwise serve passage_contents[-1], i.e. the LAST
        # real passage, to the generator
        pids_of = np.asarray(self.index.pids)[np.where(rows < 0, 0, rows)]
        dummy = (rows < 0) | (pids_of < 0)
        rows_dev = jnp.asarray(np.where(dummy, 0, rows))
        doc_tokens = np.array(self.index.gather_tokens(rows_dev), np.float32)
        doc_masks = np.array(
            jnp.take(self.index.mask, rows_dev, axis=0), np.float32)
        # dummy docs: all-zero tokens/mask, empty content (score -> pad fill)
        doc_tokens[dummy] = 0.0
        doc_masks[dummy] = 0.0
        contents = [[self.passage_contents[self.index.pids[r]]
                     if not d else ""
                     for r, d in zip(row, drow)]
                    for row, drow in zip(rows, dummy)]
        return {"rows": rows, "doc_tokens": doc_tokens,
                "doc_masks": doc_masks, "contents": contents}

    # -- training -------------------------------------------------------------
    def make_train_batch(self, batch) -> dict:
        """Host side: retrieval + strings -> device arrays."""
        cfg = self.rag_cfg
        ret = self.retrieve(batch, training=True)
        questions = batch["questions"]
        answers = batch["answers"]
        retrieval_labels, selected = get_retrieval_labels(answers,
                                                          ret["contents"])
        gen_texts = self.input_builder.build(questions, ret["contents"])
        gi, gm = self._tensorize(gen_texts, cfg.gen_maxlen)
        if cfg.force_existence:
            # per-doc selected answers (reference :678-690)
            label_texts = selected
        else:
            # gold answer repeated per retrieved doc (reference :691-692)
            from ..models.rag import most_frequent
            n = ret["rows"].shape[1]
            label_texts = [most_frequent([a for a in ans if a != ""])
                           for ans in answers for _ in range(n)]
        labels = self._labels(label_texts, cfg.label_maxlen)
        return {
            "query_input_ids": np.asarray(batch["query_input_ids"]),
            "query_attention_mask":
                np.asarray(batch["query_attention_mask"]),
            "image_features": np.asarray(batch["image_features"],
                                         np.float32),
            "doc_tokens": ret["doc_tokens"],
            "doc_masks": ret["doc_masks"],
            "gen_input_ids": gi, "gen_attention_mask": gm,
            "labels": labels,
            "retrieval_labels": retrieval_labels,
            **({"pixel_values": np.asarray(batch["pixel_values"],
                                           np.float32)}
               if self.rag_cfg.generator_type == "blip2" else {}),
        }

    def _tensorize(self, texts, maxlen):
        tk = self.gen_tokenizer
        b = len(texts)
        ids = np.full((b, maxlen), tk.pad_token_id, np.int32)
        mask = np.zeros((b, maxlen), np.int32)
        for i, t in enumerate(texts):
            row = tk.encode(t, add_special_tokens=False)[:maxlen]
            ids[i, :len(row)] = row
            mask[i, :len(row)] = 1
        return ids, mask

    def _labels(self, texts, maxlen):
        tk = self.gen_tokenizer
        eos = getattr(tk, "eos_token_id", None) or tk.sep_token_id
        b = len(texts)
        out = np.full((b, maxlen), -100, np.int32)
        for i, t in enumerate(texts):
            row = tk.encode(t, add_special_tokens=False)[:maxlen - 1] + [eos]
            out[i, :len(row)] = row
        return out

    def loss_fn(self, params, batch, rng):
        cfg = self.rag_cfg
        gcfg = self._gcfg
        q = self.retriever.apply(
            {"params": params["retriever"]}, batch["query_input_ids"],
            batch["query_attention_mask"], batch["image_features"],
            method=FLMRRetriever.query)
        b, n_docs = batch["doc_tokens"].shape[:2]
        q_rep = jnp.repeat(q, n_docs, axis=0)
        d = batch["doc_tokens"].reshape((b * n_docs,)
                                        + batch["doc_tokens"].shape[2:])
        m = batch["doc_masks"].reshape(b * n_docs, -1)
        doc_scores = maxsim_pair_xla(q_rep, d, m).reshape(b, n_docs)

        gp = self._gen_params(params)
        dec_in = shift_right(batch["labels"], gcfg.decoder_start_token_id,
                             gcfg.pad_token_id)
        if self.rag_cfg.generator_type == "blip2":
            # pixel_values repeated per doc (reference decoder_pixel_values
            # ⊗ n_docs, rag_model_blip.py:698-704)
            px = jnp.repeat(batch["pixel_values"], n_docs, axis=0)
            logits = self.generator.apply(
                {"params": gp}, px, batch["gen_input_ids"],
                batch["gen_attention_mask"], dec_in)
        else:
            logits = self.generator.apply(
                {"params": gp}, batch["gen_input_ids"],
                batch["gen_attention_mask"], dec_in)
        out = rag_loss_components(
            logits, doc_scores, batch["labels"],
            retrieval_labels=batch["retrieval_labels"],
            loss_type=cfg.loss_type, rag_loss_weight=cfg.rag_weight,
            additional_loss_weight=cfg.additional_weight,
            nll_loss_weight=cfg.nll_weight)
        metrics = {k: v for k, v in out.items() if k != "loss"}
        return out["loss"], metrics

    def train_step_rag(self, batch) -> dict:
        return super().train_step(self.make_train_batch(batch))

    # -- generation -----------------------------------------------------------
    def _generate_device_impl(self, params, qi, qm, feats, d, m, gi, gm_,
                              px):
        """Device side of generate() as ONE program: query encode -> doc
        MaxSim -> LoRA merge -> generator encode -> greedy/beam decode.
        Jitted in __init__ (self._generate_device); without this the
        generator encoder dispatches eagerly op-by-op, which costs ~22 s
        per batch at the flan-T5-XL serving shape through the axon tunnel
        (only the decode scan traced). num_beams/generator_type are
        closure-static: changing rag_cfg after construction will not
        retrace."""
        cfg = self.rag_cfg
        gcfg = self._gcfg
        b = qi.shape[0]
        n_docs = d.shape[0] // b
        q = self.retriever.apply({"params": params["retriever"]}, qi, qm,
                                 feats, method=FLMRRetriever.query)
        q_rep = jnp.repeat(q, n_docs, axis=0)
        doc_scores = maxsim_pair_xla(q_rep, d, m).reshape(b, n_docs)

        gp = self._gen_params(params)
        if cfg.generator_type == "blip2":
            from ..models.blip2 import Blip2T5
            px_rep = jnp.repeat(px, n_docs, axis=0)
            enc, enc_mask = self.generator.apply(
                {"params": gp}, px_rep, gi, gm_, method=Blip2T5.encode)
            step_method, cache_method = Blip2T5.decode_step, \
                Blip2T5.init_cache
        else:
            enc = self.generator.apply({"params": gp}, gi, gm_,
                                       method=T5Model.encode)
            enc_mask = gm_
            step_method, cache_method = T5Model.decode_step, \
                T5Model.init_cache

        if cfg.num_beams > 1:
            # beam search per (question, doc); beams ride the batch dim
            from ..models.generation import beam_generate
            nb = cfg.num_beams
            enc_b = jnp.repeat(enc, nb, axis=0)
            mask_b = jnp.repeat(enc_mask, nb, axis=0)

            def step_b(tok, cache):
                return self.generator.apply({"params": gp}, tok, enc_b,
                                            mask_b, cache,
                                            method=step_method)

            def cache_fn(n):
                return self.generator.apply({"params": gp}, n,
                                            cfg.max_decode_len,
                                            method=cache_method)
            seqs, scores = beam_generate(
                step_b, cache_fn, batch=b * n_docs, n_beams=nb,
                max_len=cfg.max_decode_len,
                start_id=gcfg.decoder_start_token_id,
                eos_id=gcfg.eos_token_id, pad_id=gcfg.pad_token_id)
            toks, seq_lp = seqs[:, 0], scores[:, 0]  # best beam
        else:
            def step(tok, cache):
                return self.generator.apply({"params": gp}, tok, enc,
                                            enc_mask, cache,
                                            method=step_method)
            cache = self.generator.apply({"params": gp}, b * n_docs,
                                         cfg.max_decode_len,
                                         method=cache_method)
            toks, seq_lp = greedy_generate(
                step, cache, batch=b * n_docs, max_len=cfg.max_decode_len,
                start_id=gcfg.decoder_start_token_id,
                eos_id=gcfg.eos_token_id, pad_id=gcfg.pad_token_id)
        return doc_scores, toks, seq_lp

    def generate(self, batch) -> dict:
        """Greedy/beam decode per (question, doc); answer by joint score."""
        cfg = self.rag_cfg
        gcfg = self._gcfg
        ret = self.retrieve(batch)
        gen_texts = self.input_builder.build(batch["questions"],
                                             ret["contents"])
        gi, gm = self._tensorize(gen_texts, cfg.gen_maxlen)
        b, n_docs = len(batch["questions"]), cfg.n_docs

        d = jnp.asarray(ret["doc_tokens"]).reshape(
            (b * n_docs,) + ret["doc_tokens"].shape[2:])
        m = jnp.asarray(ret["doc_masks"]).reshape(b * n_docs, -1)
        px = (jnp.asarray(batch["pixel_values"], jnp.float32)
              if cfg.generator_type == "blip2" else None)
        doc_scores, toks, seq_lp = self._generate_device(
            self.state.params, jnp.asarray(batch["query_input_ids"]),
            jnp.asarray(batch["query_attention_mask"]),
            jnp.asarray(batch["image_features"]), d, m,
            jnp.asarray(gi), jnp.asarray(gm), px)
        doc_scores = np.asarray(doc_scores)
        toks = np.asarray(toks).reshape(b, n_docs, -1)
        seq_lp = np.asarray(seq_lp).reshape(b, n_docs)
        sel = select_answers_by_joint_score(doc_scores, seq_lp)
        preds = []
        for i in range(b):
            ids = [int(t) for t in toks[i, sel[i]]
                   if t not in (gcfg.pad_token_id, gcfg.eos_token_id)]
            preds.append(self.gen_tokenizer.decode(ids))
        return {"predictions": preds, "doc_scores": doc_scores,
                "retrieved_contents": ret["contents"],
                "all_generations": toks, "selected_docs": sel}


def load_static_retrieval_from_predictions(json_path: str,
                                           corpus_ids: Sequence) -> dict:
    """Build a static-retrieval map from an FLMR test-mode prediction dump
    (ravqa_tpu.main run_eval output; schema mirrors the reference's
    *_test_*_predictions_rank_*.json handoff, FLMR_executor.py:1012-1018).

    Returns {question_id: [(corpus_row, score), ...]} for RagExecutor.
    """
    import json

    id2row = {str(pid): i for i, pid in enumerate(corpus_ids)}
    with open(json_path) as f:
        preds = json.load(f)
    out = {}
    for p in preds:
        rows = []
        for rank, passage in enumerate(p["top_ranking_passages"]):
            row = id2row.get(str(passage["passage_id"]))
            if row is not None:
                rows.append((row, float(passage.get("score",
                                                    -float(rank)))))
        out[str(p["question_id"])] = rows
    return out


# -- index refresh during joint training (the reference re-encodes the
#    corpus at validation time; live training makes the index stale) -------
def refresh_index(executor: "RagExecutor", flmr_executor,
                  doc_batches) -> None:
    """Re-encode the corpus with the CURRENT retriever params and swap the
    executor's index + searcher in place."""
    flmr_executor.state = dataclasses.replace(
        flmr_executor.state, params=executor.state.params["retriever"])
    new_index = flmr_executor.build_index(list(doc_batches))
    executor.index = new_index
    if executor.searcher is not None:
        executor.searcher = _make_searcher(new_index, executor.mesh,
                                           executor.rag_cfg)
