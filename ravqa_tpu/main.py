"""CLI entry point — config-driven experiment runner.

Equivalent of the reference's src/main.py (argparse; modes
prepare_data/train/test/eval; --opts dotted overrides) over the JSON config
system. Example:

    python -m ravqa_tpu.main --config configs/synthetic_flmr.json \
        --mode train --experiment_name dev --opts train.lr=1e-4

Config sections mirror the reference's five top-level groups:
data_pipeline, model_config, executor, train, metrics.
"""

from __future__ import annotations

import argparse
import json
import os
from typing import Optional

import numpy as np

from .config import Config, apply_overrides, load_config


def parse_args(argv=None):
    p = argparse.ArgumentParser("ravqa_tpu")
    p.add_argument("--config", required=True)
    p.add_argument("--mode", required=True,
                   choices=["prepare_data", "train", "test", "eval",
                            "serve"])
    p.add_argument("--host", default="0.0.0.0")
    p.add_argument("--port", type=int, default=8080)
    p.add_argument("--experiment_name", default="default")
    p.add_argument("--log_dir", default="experiments")
    p.add_argument("--opts", nargs="*", default=[])
    p.add_argument("--modules", nargs="*", default=[],
                   help="extra model_config.modules flags (reference "
                        "--modules)")
    p.add_argument("--use_dummy_data", action="store_true")
    p.add_argument("--num_devices", type=int, default=0,
                   help="force a CPU mesh of this size (testing)")
    return p.parse_args(argv)


def build_pipeline(cfg: Config, cache_dir: Optional[str]):
    from .data import DataPipeline
    return DataPipeline(cfg.data_pipeline.to_dict(), cache_dir=cache_dir,
                        global_config=cfg)


def _flmr_config_from(mc):
    """model_config dict -> FLMRModelConfig (shared by FLMR and RAG paths)."""
    from .models import BertConfig, FLMRModelConfig, ViTConfig
    bert = BertConfig(**mc.get("bert", {}))
    vit = None
    vit_spec = dict(mc.get("vit", {}))
    if vit_spec:
        vit = ViTConfig.tiny() if vit_spec.pop("tiny", False) \
            else ViTConfig(**vit_spec)
    in_graph = mc.get("in_graph_vision", False) \
        or "in_graph_vision" in mc.get("modules", [])
    return FLMRModelConfig(
        bert=bert,
        in_graph_vision=in_graph,
        vit=vit,
        dim=mc.get("dim", 128),
        vision_dim=mc.get("vision_embedding_size", 768),
        prefix_len=mc.get("mapping_network_prefix_length", 32),
        nway=mc.get("num_negative_samples", 1) + 1,
        use_ib_negatives=mc.get("use_ib_negatives", True),
        separate_question_encoder="separate_question_encoder"
        in mc.get("modules", []),
        query_mode=mc.get("query_mode", "text+vision"),
        interaction=mc.get("interaction", "colbert"),
        flipr_query_part_len=mc.get("flipr_query_part_len", 0),
        flipr_k1=mc.get("flipr_k1", 0),
        flipr_k2=mc.get("flipr_k2", 0),
        use_transformer_mapping=mc.get("use_transformer_mapping", False),
        transformer_mapping_num_layers=mc.get(
            "transformer_mapping_num_layers", 1),
        transformer_mapping_hidden=mc.get("transformer_mapping_hidden", 768),
        transformer_mapping_num_heads=mc.get(
            "transformer_mapping_num_heads", 12),
        vision_patch_dim=mc.get("vision_patch_dim"),
        # blocked/remat in-batch-negative loss (ops.losses): +12.6%
        # steps/s at the 9-ROI Lq=832 shape on v5e (scripts/bench_train
        # SCALE=roi, round-5), parity-tested vs the unblocked path
        ib_block_n=mc.get("ib_block_n", 0),
        ib_score_bf16=mc.get("ib_score_bf16", False),
    )


def build_executor(cfg: Config, data, mesh, log_dir: str, quiet=False):
    import jax
    import jax.numpy as jnp
    from .executors import (FLMRExecutor, TrainConfig)
    from .executors.pretraining_executor import FLMRVisionPretrainingExecutor
    from .models import FLMRRetriever

    mc = cfg.model_config
    model_cfg = _flmr_config_from(mc)
    model = FLMRRetriever(model_cfg)

    # init with a probe batch from the train loader
    train_ds = data["train"]
    probe = train_ds.collate(list(range(min(2, len(train_ds)))))
    init_kwargs = {k: jnp.asarray(v) for k, v in probe.items()}
    params = model.init(jax.random.PRNGKey(cfg.get("seed", 0)),
                        **init_kwargs)["params"]

    tc = cfg.get("train", Config())
    train_cfg = TrainConfig(
        lr=tc.get("lr", 1e-5),
        mapping_lr=tc.get("mapping_network_lr"),
        weight_decay=tc.get("weight_decay", 0.0),
        warmup_steps=tc.get("warmup_steps", 0),
        total_steps=tc.get("total_steps", 10000),
        schedule=tc.get("schedule", "constant"),
        grad_clip=tc.get("grad_clip", 0.0),
        modules=tuple(mc.get("modules", [])),
        accumulate_grad_batches=tc.get("accumulate_grad_batches", 1),
    )
    cls = FLMRVisionPretrainingExecutor \
        if cfg.executor.get("ExecutorClass") == \
        "FLMRVisionPretrainingExecutor" else FLMRExecutor
    return cls(model, params, train_cfg, mesh=mesh, log_dir=log_dir,
               seed=cfg.get("seed", 0), quiet=quiet,
               logger_backends=tuple(tc.get("logger_backends", ["jsonl"])))


def build_rag_executor(cfg: Config, data, mesh, log_dir: str, quiet=False):
    """RAVQA / RAVQA-v2 executor from config (executor.ExecutorClass ==
    'RagExecutor'): FLMR retriever + T5/BLIP-2 generator + corpus index."""
    import jax
    import jax.numpy as jnp
    from .data.datasets import corpus_doc_batches
    from .executors import FLMRExecutor, RagConfig, RagExecutor, TrainConfig
    from .models import (FLMRRetriever,
                         T5Config, T5Model)

    mc = cfg.model_config
    rcfg = _flmr_config_from(mc)
    retriever = FLMRRetriever(rcfg)
    train_ds = data["train"]
    probe = train_ds.collate([0, 1])
    rp = retriever.init(jax.random.PRNGKey(cfg.get("seed", 0)),
                        **{k: jnp.asarray(v) for k, v in probe.items()}
                        )["params"]
    gen_cfg_dict = dict(mc.get("generator", {}))
    gen_type = gen_cfg_dict.pop("type", "t5")
    tok = data["tokenizer"]
    gen_cfg_dict.setdefault("vocab_size", tok.vocab_size + 8)
    gen_cfg_dict.setdefault("eos_token_id", tok.sep_token_id)
    if gen_type == "blip2":
        from .models.blip2 import (Blip2Config, Blip2T5, Blip2VisionConfig,
                                   QFormerConfig)
        # pop num_query_tokens BEFORE the t5 fallback: when no "t5" key is
        # given the remaining flat keys become the T5Config kwargs
        nqt = gen_cfg_dict.pop("num_query_tokens", 32)
        bcfg = Blip2Config(
            vision=Blip2VisionConfig(**gen_cfg_dict.pop("vision", {})),
            qformer=QFormerConfig(**gen_cfg_dict.pop("qformer", {})),
            t5=T5Config(**gen_cfg_dict.pop("t5", gen_cfg_dict)),
            num_query_tokens=nqt)
        generator = Blip2T5(bcfg)
        v = bcfg.vision
        gp = generator.init(
            jax.random.PRNGKey(1),
            jnp.ones((1, v.image_size, v.image_size, 3), jnp.float32),
            jnp.ones((1, 8), jnp.int32), jnp.ones((1, 8), jnp.int32),
            jnp.ones((1, 3), jnp.int32))["params"]
    else:
        gcfg = T5Config(**gen_cfg_dict)
        generator = T5Model(gcfg)
        gp = generator.init(jax.random.PRNGKey(1),
                            jnp.ones((2, 8), jnp.int32),
                            jnp.ones((2, 8), jnp.int32),
                            jnp.ones((2, 3), jnp.int32))["params"]
    corpus = data["passages"]["full_passages"]
    # mesh-aware build: the index must pad n_pad to the shard count or the
    # RagExecutor's sharded search cannot split dim 0 over the mesh
    retr_exec = FLMRExecutor(retriever, rp, TrainConfig(lr=1e-4),
                             mesh=mesh, quiet=True)
    index = retr_exec.build_index(
        corpus_doc_batches(corpus, data["doc_tokenizer"], batch_size=64))
    rag_keys = {f.name for f in __import__("dataclasses").fields(RagConfig)}
    rag_kwargs = {k: v for k, v in mc.get("rag", {}).items()
                  if k in rag_keys}
    rag_kwargs["generator_type"] = gen_type
    # the reference's module-flag bus (model_config.modules strings)
    modules = mc.get("modules", [])
    for flag in ("use_gt_docs_for_training", "ignore_knowledge_passages",
                 "force_existence"):
        if flag in modules:
            rag_kwargs[flag] = True
    if mc.get("num_knowledge_passages_in_training"):
        rag_kwargs["n_docs_in_training"] = \
            mc["num_knowledge_passages_in_training"]
    if mc.get("num_knowledge_passages"):
        rag_kwargs.setdefault("n_docs", mc["num_knowledge_passages"])
    rag_cfg = RagConfig(**rag_kwargs)
    # the reference's static-retrieval recipe (--modules static_retrieval +
    # index_files.static_results JSONs, RAG_BLIP2_with_FLMR.jsonnet:
    # rag_model_blip.py:161-184): precomputed FLMR prediction dumps become
    # the retrieval map; no live search during RAG training
    static_map = None
    if "static_retrieval" in modules:
        from .executors.rag_executor import \
            load_static_retrieval_from_predictions
        paths = mc.get("index_files", {}).get("static_results", [])
        assert paths, ("--modules static_retrieval requires "
                       "model_config.index_files.static_results JSON paths")
        static_map = {}
        for p in paths:
            static_map.update(
                load_static_retrieval_from_predictions(p, corpus.ids))
    tc = cfg.get("train", Config())
    train_cfg = TrainConfig(lr=tc.get("lr", 1e-5),
                            retriever_lr=tc.get("retriever_lr"),
                            weight_decay=tc.get("weight_decay", 0.0),
                            schedule=tc.get("schedule", "constant"),
                            warmup_steps=tc.get("warmup_steps", 0),
                            total_steps=tc.get("total_steps", 1000),
                            modules=tuple(mc.get("modules", [])),
                            accumulate_grad_batches=tc.get(
                                "accumulate_grad_batches", 1))
    return RagExecutor(retriever, rp, generator, gp, gen_tokenizer=tok,
                       rag_cfg=rag_cfg, train_cfg=train_cfg, index=index,
                       passage_contents=corpus.contents,
                       passage_ids=corpus.ids, mesh=mesh,
                       static_retrieval=static_map,
                       log_dir=log_dir, quiet=quiet)



def _callbacks_from(cfg, log_dir: str):
    """Build CheckpointManager / EarlyStopping from the reference's config
    keys (train.model_checkpoint_callback_paras /
    train.early_stopping_callback_paras, e.g.
    FLMR_base_preload_vision_features.jsonnet:206-232)."""
    from .executors.callbacks import CheckpointManager, EarlyStopping
    tc = cfg.get("train", Config())

    def default_mode(monitor: str) -> str:
        # Lightning defaults mode="min"; a "max" default on a loss monitor
        # would keep the WORST checkpoints and early-stop on improvement.
        # Recall/accuracy-style monitors (the reference's recall_at_5)
        # default to "max".
        up = ("recall", "precision", "accuracy", "success", "mrr", "bleu")
        return "max" if any(t in monitor for t in up) else "min"

    ckpt_manager = None
    mp = tc.get("model_checkpoint_callback_paras")
    if mp:
        monitor = mp.get("monitor", "loss")
        ckpt_manager = CheckpointManager(
            dirpath=mp.get("dirpath", os.path.join(log_dir, "ckpts")),
            monitor=monitor,
            mode=mp.get("mode", default_mode(monitor)),
            save_top_k=mp.get("save_top_k", 1),
            save_last=mp.get("save_last", True))
    early = None
    ep = tc.get("early_stopping_callback_paras")
    if ep:
        monitor = ep.get("monitor", "loss")
        early = EarlyStopping(monitor=monitor,
                              mode=ep.get("mode", default_mode(monitor)),
                              patience=ep.get("patience", 3),
                              min_delta=ep.get("min_delta", 0.0))
    return ckpt_manager, early


def _maybe_prefetch(batches, tc, mesh):
    """Wrap a batch iterator with background-thread prefetch + early
    device dispatch (train.prefetch_batches, default 2; 0 disables) —
    the reference DataLoader num_workers equivalent (data/prefetch.py)."""
    depth = tc.get("prefetch_batches", 2)
    if not depth:
        return batches
    from .data import prefetch_to_device
    return prefetch_to_device(batches, size=depth, mesh=mesh)


def rag_batches(dataset, batch_size: int, seed: int = 0):
    """RAG train batches from a RetrievalDataset (questions + answers +
    image features + query tokens)."""
    rng = np.random.default_rng(seed)
    items = dataset.items
    while True:
        order = rng.permutation(len(items))
        for s in range(0, len(order) - batch_size + 1, batch_size):
            chunk = [items[i] for i in order[s:s + batch_size]]
            parsed = [dataset.parser.parse(it, dataset.input_modules)
                      for it in chunk]
            qi, qm = dataset.qt.tensorize(
                [p["text_sequence"] for p in parsed])
            batch = {
                "question_ids": [it["question_id"] for it in chunk],
                "questions": [it["question"] for it in chunk],
                "answers": [it["answers"] for it in chunk],
                "pos_item_ids": [it.get("pos_item_ids") for it in chunk],
                "query_input_ids": qi, "query_attention_mask": qm,
            }
            from .data.datasets import _attach_vision
            _attach_vision(batch, chunk, parsed)   # incl. raw pixels
            yield batch


def rag_eval_batches(dataset, batch_size: int):
    """Deterministic, dedup-safe eval batches: dataset order, final batch
    padded by repeating the last item; pads carry question_id None so the
    caller drops them (each question evaluated EXACTLY once — the reference
    evaluates each sample once per epoch)."""
    items = dataset.items
    n = len(items)
    for s in range(0, n, batch_size):
        chunk = [items[i] for i in range(s, min(s + batch_size, n))]
        qids = [it["question_id"] for it in chunk]
        while len(chunk) < batch_size:          # static-shape pad
            chunk.append(chunk[-1])
            qids.append(None)
        parsed = [dataset.parser.parse(it, dataset.input_modules)
                  for it in chunk]
        qi, qm = dataset.qt.tensorize([p["text_sequence"] for p in parsed])
        batch = {
            "question_ids": qids,
            "questions": [it["question"] for it in chunk],
            "answers": [it["answers"] for it in chunk],
            "pos_item_ids": [it.get("pos_item_ids") for it in chunk],
            "query_input_ids": qi, "query_attention_mask": qm,
        }
        from .data.datasets import _attach_vision
        _attach_vision(batch, chunk, parsed)       # incl. raw pixels
        yield batch


def run_rag_eval(cfg, ex, data, log_dir: str, split: str = "test"):
    from .metrics import exact_match, vqa_accuracy
    ds = data.get(split) or data["test"]
    preds, answers = [], []
    bs = cfg.get("train", Config()).get("batch_size", 8)
    for batch in rag_eval_batches(ds, min(bs, len(ds.items))):
        out = ex.generate(batch)
        for qid, p, a in zip(batch["question_ids"], out["predictions"],
                             batch["answers"]):
            if qid is None:                     # padded tail duplicate
                continue
            preds.append(p)
            answers.append(a)
    assert len(preds) == len(ds.items)
    metrics = {"exact_match": exact_match(preds, answers),
               "vqa_accuracy": vqa_accuracy(preds, answers)}
    ex.logger.log(metrics, int(ex.state.step), prefix=f"{split}/")
    with open(os.path.join(log_dir, f"{split}_rag_metrics.json"), "w") as f:
        json.dump(metrics, f, indent=2)
    return metrics


def run_eval(cfg, ex, data, log_dir: str, split: str = "valid"):
    from .data.datasets import corpus_doc_batches, query_eval_batches
    ds = data.get(split) or data["test"]
    corpus = data["passages"]["full_passages"]
    ks = cfg.get("metrics", Config()).get("Ks", [5, 10])
    # pruned-search mode from config; the reference's
    # exhaustive_search_in_testing module flag (FLMR_executor.py:561,
    # FLMR_vision_pretraining_executor.py:168) forces brute-force exact
    # MaxSim instead of the pruned index search
    search_mode = cfg.model_config.get("search_mode", "exact")
    if "exhaustive_search_in_testing" in cfg.model_config.get("modules", []):
        search_mode = "exact"
    m = ex.evaluate_retrieval(
        query_eval_batches(ds),
        corpus_doc_batches(corpus, ds.dt),
        passage_ids=corpus.ids,
        passage_contents=corpus.contents,
        answers=[it.get("answers", []) for it in ds.items],
        pos_item_ids=[it.get("pos_item_ids", []) for it in ds.items],
        ks=ks,
        search_mode=search_mode,
        search_preset=cfg.model_config.get("search_preset", "reference"),
        # NOTE exact reference parity (metrics_processors.py:225): the flag
        # DROPS position 0 before scoring. In the reference snapshot the
        # null-document INSERTER lives outside the shipped code (RAVQA-v1
        # static files carry a null doc at position 0); only set this flag
        # when your retrieval results genuinely have one there — with live
        # search results it would discard the top-1 real passage.
        add_null_document="add_null_document"
        in cfg.model_config.get("modules", []))
    metrics = {k: v for k, v in m.items() if not k.startswith("_")}
    ex.logger.log(metrics, int(ex.state.step), prefix=f"{split}/")
    with open(os.path.join(log_dir, f"{split}_metrics.json"), "w") as f:
        json.dump(metrics, f, indent=2)
    # prediction dump (reference *_predictions_rank_*.json equivalent)
    preds = [{"question_id": it.get("question_id"),
              "top_ranking_passages": [
                  {"passage_id": str(pid),
                   "content": corpus.content_of(pid)}
                  for pid in row]}
             for it, row in zip(ds.items, m["_retrieved_pids"])]
    with open(os.path.join(log_dir, f"{split}_predictions.json"), "w") as f:
        json.dump(preds, f)
    # prediction table (reference wandb.Table schema, FLMR_executor:897-973)
    from .utils.tables import (build_prediction_table, log_prediction_table,
                               save_prediction_table)
    contents = [[corpus.content_of(pid) for pid in row]
                for row in m["_retrieved_pids"]]
    cols, rows = build_prediction_table(ds.items, contents, max(ks))
    save_prediction_table(
        os.path.join(log_dir, f"{split}_prediction_table.jsonl"), cols, rows)
    log_prediction_table(ex.logger, f"{split}/predictions", cols, rows)
    return metrics


def build_server(cfg, data, mesh, log_dir: str):
    """Construct the deployment server from a config: VQAServer for RAG
    configs (retrieve-then-generate answering), RetrievalServer otherwise.
    Loads the experiment checkpoint when present; `serve.*` config keys set
    the micro-batching parameters."""
    from .data.datasets import corpus_doc_batches
    from .retrieval import LateInteractionSearcher
    from .serving import RetrievalServer, ServeConfig, VQAServer

    sv = cfg.get("serve", Config())
    bb = sv.get("batch_buckets")
    sc = ServeConfig(max_batch=sv.get("max_batch", 32),
                     max_wait_ms=sv.get("max_wait_ms", 2.0),
                     k=sv.get("k", 10),
                     max_queue=sv.get("max_queue", 0),
                     batch_buckets=tuple(bb) if bb else None)
    tc = cfg.get("train", Config())
    mc = cfg.model_config
    # same default as _flmr_config_from — a mismatched zero-feature shape
    # would crash every request
    vdim = mc.get("vision_embedding_size", 768)

    def load_ckpt(ex):
        explicit = tc.get("load_model_path")
        if explicit:
            ex.load_checkpoint(explicit)     # raises on a bad path
        elif os.path.exists(os.path.join(log_dir, "ckpt",
                                         "params.msgpack")):
            ex.load_checkpoint(os.path.join(log_dir, "ckpt"))
        else:
            print("serve: no checkpoint found (set train.load_model_path) "
                  "— serving randomly initialized weights", flush=True)

    if cfg.executor.get("ExecutorClass") == "RagExecutor":
        ex = build_rag_executor(cfg, data, mesh, log_dir, quiet=True)
        load_ckpt(ex)
        # deployment form: one-time LoRA merge + drop optimizer state
        # (after the checkpoint load — checkpoints are in training form).
        # At the flan-T5-XL generator shape this is the difference
        # between VQA_BATCH=8 and 16 fitting a 16 GiB chip (measured,
        # scripts/bench_serving_vqa.py).
        if sv.get("prepare_for_serving", True):
            ex.prepare_for_serving()
        # BLIP-2 generators take raw pixels per request
        pixel_shape = None
        if mc.get("generator", {}).get("type") == "blip2":
            img = mc.get("generator", {}).get("vision", {}) \
                .get("image_size", 224)
            pixel_shape = (img, img, 3)
        return VQAServer(ex, data["query_tokenizer"],
                         image_feature_dim=vdim, pixel_shape=pixel_shape,
                         config=sc)
    ex = build_executor(cfg, data, mesh, log_dir, quiet=True)
    load_ckpt(ex)
    # retrieval deployments never train either: drop the Adam moments
    if sv.get("prepare_for_serving", True):
        ex.prepare_for_serving()
    corpus = data["passages"]["full_passages"]
    index = ex.build_index(
        corpus_doc_batches(corpus, data["doc_tokenizer"], batch_size=64))
    mode = mc.get("search_mode", "exact")
    if mode in ("two_stage", "hierarchical"):
        index.build_summaries(n_summary=sv.get("n_summary", 8))
    if mode == "hierarchical":
        index.build_block_summaries(block_size=sv.get("block_size", 64))
    searcher = LateInteractionSearcher(
        index, mode=mode,
        n_candidates=sv.get("n_candidates"),
        approx_topk=sv.get("approx_topk"),        # None -> on for TPU
        approx_recall=sv.get("approx_recall", 0.95),
        coarse_int8=sv.get("coarse_int8"),
        centroid_prune=sv.get("centroid_prune"),  # None = off (measured)
        coarse_query_len=sv.get("coarse_query_len"),
        stage1_kernel=sv.get("stage1_kernel"),
        preset=sv.get("preset", "reference"))
    id2content = {i: c for i, c in enumerate(corpus.contents)}
    # in-graph-vision retrievers take raw pixels per request (a zeroed
    # image_features vector would silently bypass the trained ViT)
    pixel_shape = None
    if mc.get("in_graph_vision"):
        img = mc.get("vit", {}).get("image_size", 224)
        pixel_shape = (img, img, 3)
    return RetrievalServer(ex, searcher, data["query_tokenizer"],
                           image_feature_dim=0 if pixel_shape else vdim,
                           id2content=id2content, pixel_shape=pixel_shape,
                           config=sc)


def run_serve(cfg, args, data, mesh, log_dir: str) -> int:
    from .serving import make_http_server
    server = build_server(cfg, data, mesh, log_dir)
    httpd = make_http_server(server, args.host, args.port)
    kind = type(server).__name__
    print(f"{kind} listening on {args.host}:{httpd.server_address[1]} "
          f"(POST /{'answer' if kind == 'VQAServer' else 'search'}, "
          "GET /healthz)", flush=True)
    try:
        httpd.serve_forever()
    except KeyboardInterrupt:
        pass
    finally:
        server.stop()
    return 0


def main(argv=None):
    args = parse_args(argv)
    cfg = apply_overrides(load_config(args.config), args.opts)
    if args.modules:
        cfg.model_config.modules = list(cfg.model_config.get("modules", [])) \
            + list(args.modules)
    if args.use_dummy_data:
        for node in cfg.data_pipeline.values():
            if isinstance(node, dict) and "setup_kwargs" in node:
                node.setup_kwargs["use_dummy_data"] = True

    log_dir = os.path.join(args.log_dir, args.experiment_name)
    os.makedirs(log_dir, exist_ok=True)

    mesh = None
    if args.num_devices:
        import jax
        jax.config.update("jax_platforms", "cpu")
        jax.config.update("jax_num_cpu_devices", args.num_devices)
        from .parallel import make_mesh
        mesh = make_mesh({"data": args.num_devices})

    dp = build_pipeline(cfg, cache_dir=os.path.join(log_dir, "cache"))
    data = dp.get_data(cfg.data_pipeline_output_node, explode=True)
    if args.mode == "prepare_data":
        print("prepare_data done:", list(data))
        return 0

    if args.mode == "serve":
        return run_serve(cfg, args, data, mesh, log_dir)

    is_rag = cfg.executor.get("ExecutorClass") == "RagExecutor"
    tc = cfg.get("train", Config())
    if is_rag:
        ex = build_rag_executor(cfg, data, mesh, log_dir)
        if args.mode == "train":
            raw = rag_batches(data["train"], tc.get("batch_size", 8),
                              seed=cfg.get("seed", 0))
            # NO prefetch here: make_train_batch runs LIVE retrieval with
            # the current retriever params — prefetching it would (a) race a
            # background device dispatch against the donated train-step
            # buffers (observed deadlock on the CPU mesh) and (b) retrieve
            # with stale params batches ahead. Host-side prefetch applies to
            # the plain loader path below.
            batches = (ex.make_train_batch(b) for b in raw)
            ckpt_manager, early_stopping = _callbacks_from(cfg, log_dir)
            ex.fit(batches, steps=tc.get("total_steps", 100),
                   log_every=tc.get("log_every", 20),
                   val_every=tc.get("val_every"),
                   val_fn=(lambda: run_rag_eval(cfg, ex, data, log_dir,
                                                "valid"))
                   if tc.get("val_every") else None,
                   ckpt_manager=ckpt_manager,
                   early_stopping=early_stopping)
            ex.save_checkpoint(os.path.join(log_dir, "ckpt"))
            return 0
        metrics = run_rag_eval(cfg, ex, data, log_dir,
                               "test" if args.mode == "test" else "valid")
        print(json.dumps(metrics, indent=2))
        return 0

    ex = build_executor(cfg, data, mesh, log_dir)

    if args.mode == "train":
        ckpt = tc.get("load_model_path")
        auto = os.path.join(log_dir, "ckpt")
        steps = tc.get("total_steps", 100)
        if ckpt:
            ex.load_checkpoint(ckpt)
        elif tc.get("auto_resume") and os.path.exists(
                os.path.join(auto, "params.msgpack")):
            # Lightning resume_from_checkpoint semantics: checkpoints now
            # carry opt_state + rng, so a restarted job continues
            # bit-identically (schedule position included) and trains only
            # the REMAINING budget — an already-finished job restarts as a
            # no-op instead of over-training past the schedule horizon
            print(f"auto-resuming from {auto}", flush=True)
            ex.load_checkpoint(auto)
            steps = max(steps - int(ex.state.step), 0)
        batches = _maybe_prefetch(
            data["train"].loader(batch_size=tc.get("batch_size", 8),
                                 shuffle=True, seed=cfg.get("seed", 0)),
            tc, mesh)
        ckpt_manager, early_stopping = _callbacks_from(cfg, log_dir)
        ex.fit(batches, steps=steps,
               log_every=tc.get("log_every", 20),
               val_every=tc.get("val_every"),
               val_fn=lambda: run_eval(cfg, ex, data, log_dir, "valid"),
               ckpt_manager=ckpt_manager, early_stopping=early_stopping)
        ex.save_checkpoint(os.path.join(log_dir, "ckpt"))
        return 0

    # test / eval
    ckpt = tc.get("load_model_path") or os.path.join(log_dir, "ckpt")
    if os.path.exists(os.path.join(ckpt, "params.msgpack")):
        ex.load_checkpoint(ckpt)
    split = "test" if args.mode == "test" else "valid"
    metrics = run_eval(cfg, ex, data, log_dir, split)
    print(json.dumps(metrics, indent=2))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
