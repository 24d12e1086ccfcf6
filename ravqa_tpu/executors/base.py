"""Training executor core: optimizer factory, jitted SPMD train step,
checkpointing, metric logging.

Replaces the reference's runway_for_ml BaseExecutor + pytorch_lightning
Trainer (SURVEY.md C3/C4): one jitted train step over a device mesh (data
axis) instead of DDP; orbax checkpoints instead of Lightning .ckpt; a JSONL
metrics history instead of the MetricsHistoryLogger callback.
"""

from __future__ import annotations

import dataclasses
import json
import os
import time
from typing import Any, Callable, Iterable, Optional, Sequence

import flax
import jax
import jax.numpy as jnp
import numpy as np
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..parallel import trainable_mask


@dataclasses.dataclass(frozen=True)
class TrainConfig:
    lr: float = 1e-5
    mapping_lr: Optional[float] = None     # separate LR for mapping network
    retriever_lr: Optional[float] = None   # separate LR for the retriever
    #   subtree in joint RAG training (reference RAG_BLIP2_with_FLMR
    #   optimizer_config: lr=6e-4 generator, retriever_lr=1e-4)
    weight_decay: float = 0.0
    warmup_steps: int = 0
    total_steps: int = 10000
    schedule: str = "constant"             # constant | linear | cosine
    grad_clip: float = 0.0
    adam_b1: float = 0.9
    adam_b2: float = 0.999
    adam_eps: float = 1e-8
    modules: tuple = ()                    # feature-flag bus incl. freeze_*
    accumulate_grad_batches: int = 1       # reference accumulate_grad_batches
    #   (every published FLMR config uses 4; RAVQA-v2 is bs1 x accum16) —
    #   grads average over this many micro-steps before one optimizer update


@flax.struct.dataclass
class TrainState:
    step: jnp.ndarray
    params: Any
    opt_state: Any
    rng: jax.Array


def make_schedule(cfg: TrainConfig, lr: float):
    # cfg.total_steps / warmup_steps count MICRO-batches (what fit()
    # iterates), but with gradient accumulation the inner schedule only
    # advances once per optimizer UPDATE (every k micro-steps under
    # optax.MultiSteps) — rescale so warmup/decay land where configured
    # instead of stretching by the accumulation factor
    accum = max(cfg.accumulate_grad_batches, 1)
    # ceil so a total not divisible by accum doesn't truncate the decay
    # horizon; a nonzero warmup shorter than one accumulation window still
    # warms up for one update instead of being floored away
    total = max(-(-cfg.total_steps // accum), 1)
    warmup = max(cfg.warmup_steps // accum, 1) if cfg.warmup_steps > 0 else 0
    if cfg.schedule == "constant":
        if warmup > 0:
            return optax.linear_schedule(0.0, lr, warmup)
        return lr
    if cfg.schedule == "linear":
        # warmup then LINEAR DECAY to 0 over total_steps (HF
        # get_linear_schedule_with_warmup semantics, which the reference's
        # configs request)
        warm = max(warmup, 0)
        decay = optax.linear_schedule(lr, 0.0, max(total - warm, 1))
        if warm > 0:
            return optax.join_schedules(
                [optax.linear_schedule(0.0, lr, warm), decay], [warm])
        return decay
    if cfg.schedule == "cosine":
        return optax.warmup_cosine_decay_schedule(
            0.0, lr, max(warmup, 1), total)
    raise ValueError(cfg.schedule)


def make_optimizer(cfg: TrainConfig, params) -> optax.GradientTransformation:
    """AdamW with optional grad clip, separate mapping-network LR (reference
    FLMR_executor.py:290-365 param groups), and freeze-flag masking."""
    def adamw(lr):
        return optax.adamw(make_schedule(cfg, lr), b1=cfg.adam_b1,
                           b2=cfg.adam_b2, eps=cfg.adam_eps,
                           weight_decay=cfg.weight_decay)

    if cfg.mapping_lr is not None or cfg.retriever_lr is not None:
        def group(path):
            keys = [p.key if hasattr(p, "key") else str(p) for p in path]
            if cfg.mapping_lr is not None \
                    and "vision_projection" in keys[:2]:
                return "mapping"
            if cfg.retriever_lr is not None and keys[0] == "retriever":
                return "retriever"
            return "base"
        labels = jax.tree_util.tree_map_with_path(
            lambda path, _: group(path), params)
        groups = {"base": adamw(cfg.lr)}
        if cfg.mapping_lr is not None:
            groups["mapping"] = adamw(cfg.mapping_lr)
        if cfg.retriever_lr is not None:
            groups["retriever"] = adamw(cfg.retriever_lr)
        tx = optax.multi_transform(groups, labels)
    else:
        tx = adamw(cfg.lr)

    if cfg.grad_clip > 0:
        tx = optax.chain(optax.clip_by_global_norm(cfg.grad_clip), tx)

    if cfg.accumulate_grad_batches > 1:
        # reference accumulate_grad_batches: average grads over k micro-steps,
        # apply one optimizer update (params are bit-identical in between)
        tx = optax.MultiSteps(tx, every_k_schedule=
                              cfg.accumulate_grad_batches)

    mask = trainable_mask(params, list(cfg.modules))
    if not all(jax.tree.leaves(mask)):
        # frozen params: zero their updates AND keep the entire optimizer
        # state (Adam moments, MultiSteps accumulators) only for trainable
        # leaves — optax.masked replaces frozen leaves with stateless
        # MaskedNodes. At flan-T5-XL LoRA scale this is the difference
        # between ~33 GB of dead f32 moments+accumulators and a few MB
        # (what lets the published RAVQA-v2 recipe train on one v5e chip).
        tx = optax.chain(
            optax.masked(optax.set_to_zero(),
                         jax.tree.map(lambda t: not t, mask)),
            optax.masked(tx, mask))
    return tx


class MetricsLogger:
    """Metrics history with selectable backends (replaces the reference's
    wandb + TensorBoard Lightning loggers + MetricsHistoryLogger,
    SURVEY.md §5 observability).

    backends: any of "jsonl" (metrics.jsonl under log_dir — always cheap),
    "tensorboard" (tensorboardX SummaryWriter under log_dir/tb), "wandb"
    (requires the wandb package; skipped with a warning when absent —
    this image has no network). The in-memory `history` list is the
    MetricsHistoryLogger equivalent and is always kept.
    """

    def __init__(self, log_dir: Optional[str] = None, quiet: bool = False,
                 backends: Sequence[str] = ("jsonl",),
                 wandb_kwargs: Optional[dict] = None):
        self.log_dir = log_dir
        self.quiet = quiet
        self.history: list[dict] = []
        self._f = None
        self._tb = None
        self._wandb_run = None
        if log_dir and "jsonl" in backends:
            os.makedirs(log_dir, exist_ok=True)
            self._f = open(os.path.join(log_dir, "metrics.jsonl"), "a")
        if log_dir and "tensorboard" in backends:
            try:
                from tensorboardX import SummaryWriter
                self._tb = SummaryWriter(os.path.join(log_dir, "tb"))
            except Exception as e:  # pragma: no cover
                import logging
                logging.getLogger(__name__).warning(
                    "tensorboard backend unavailable: %s", e)
        if "wandb" in backends:  # pragma: no cover - wandb not in image
            try:
                import wandb
                self._wandb_run = wandb.init(
                    dir=log_dir, **(wandb_kwargs or {}))
            except Exception as e:
                import logging
                logging.getLogger(__name__).warning(
                    "wandb backend unavailable: %s", e)

    def log(self, metrics: dict, step: int, prefix: str = ""):
        rec = {("%s%s" % (prefix, k)): (float(v) if np.isscalar(v)
                                        or hasattr(v, "item") else v)
               for k, v in metrics.items()}
        rec["step"] = int(step)
        rec["time"] = time.time()
        self.history.append(rec)
        if self._f:
            self._f.write(json.dumps(rec) + "\n")
            self._f.flush()
        if self._tb is not None:
            for k, v in rec.items():
                if k in ("step", "time") or not isinstance(v, float):
                    continue
                self._tb.add_scalar(k, v, int(step))
            self._tb.flush()
        if self._wandb_run is not None:  # pragma: no cover
            self._wandb_run.log(
                {k: v for k, v in rec.items() if k != "time"}, step=step)
        if not self.quiet:
            short = {k: (round(v, 5) if isinstance(v, float) else v)
                     for k, v in rec.items() if k not in ("time",)}
            print(f"[metrics] {short}", flush=True)


class BaseExecutor:
    """Owns model, params, optimizer, and the jitted SPMD train step.

    Subclasses define loss_fn(params, batch, rng) -> (loss, metrics_dict).
    """

    def __init__(self, model, params, train_cfg: TrainConfig,
                 mesh: Optional[Mesh] = None, log_dir: Optional[str] = None,
                 seed: int = 0, quiet: bool = False,
                 param_sharding: str = "replicated",
                 fsdp_min_size: int = 2 ** 18,
                 logger_backends: Sequence[str] = ("jsonl",),
                 copy_params: bool = True,
                 inference_only: bool = False):
        """param_sharding: 'replicated' (DP) or 'fsdp' (shard each large
        param's biggest divisible dim over the data axis — ZeRO-3-style;
        XLA inserts the all-gathers).

        copy_params=False skips the defensive param copy (the train step
        DONATES state, so the caller's passed-in arrays become invalid
        after the first step) — use for multi-billion-param models where
        the transient 2x param memory of the copy would not fit HBM.

        inference_only=True skips the optimizer entirely (no Adam moments
        — 8 bytes/param of f32 state a serving deployment never uses; at
        the flan-T5-XL generator scale that init alone OOMs a 16 GiB
        chip) and never builds the train step. fit()/train_step raise."""
        self.model = model
        self.train_cfg = train_cfg
        self.mesh = mesh
        self.inference_only = inference_only
        if copy_params:
            # private copy: the train step donates its input state, which
            # would otherwise invalidate the caller's param buffers
            params = jax.tree.map(lambda x: jnp.array(x, copy=True), params)
        self.tx = None if inference_only else make_optimizer(train_cfg,
                                                             params)
        self.logger = MetricsLogger(log_dir, quiet=quiet,
                                    backends=logger_backends)
        rng = jax.random.PRNGKey(seed)
        opt_state = () if inference_only else self.tx.init(params)
        self.state = TrainState(step=jnp.zeros((), jnp.int32), params=params,
                                opt_state=opt_state, rng=rng)
        self._state_shardings = None
        if mesh is not None:
            rep = NamedSharding(mesh, P())
            if param_sharding == "fsdp":
                from ..parallel import fsdp_sharding
                pspec = fsdp_sharding(self.state.params, mesh,
                                      axis="data", min_size=fsdp_min_size)
                # optimizer moments/accumulators get the SAME shape-only
                # sharding rule as params: an f32 Adam moment shards the
                # same dim its parameter does (ZeRO-3 — replicating them
                # would forfeit most of FSDP's memory win since moments
                # are 2x params at f32), while scalar schedule counts and
                # MultiSteps step counters fall under min_size and stay
                # replicated
                ospec = fsdp_sharding(self.state.opt_state, mesh,
                                      axis="data", min_size=fsdp_min_size)
                self._state_shardings = TrainState(
                    step=rep, params=pspec, opt_state=ospec, rng=rep)
            else:
                self._state_shardings = jax.tree.map(lambda _: rep,
                                                     self.state)
            self.state = jax.tree.map(jax.device_put, self.state,
                                      self._state_shardings)
        self._train_step = None if inference_only \
            else self._build_train_step()

    # -- to be overridden ---------------------------------------------------
    def loss_fn(self, params, batch, rng):
        raise NotImplementedError

    # -- training -----------------------------------------------------------
    def _build_train_step(self):
        def step_fn(state: TrainState, batch):
            rng, sub = jax.random.split(state.rng)
            (loss, metrics), grads = jax.value_and_grad(
                self.loss_fn, has_aux=True)(state.params, batch, sub)
            updates, opt_state = self.tx.update(grads, state.opt_state,
                                                state.params)
            params = optax.apply_updates(state.params, updates)
            new_state = TrainState(step=state.step + 1, params=params,
                                   opt_state=opt_state, rng=rng)
            metrics = dict(metrics)
            metrics["loss"] = loss
            metrics["grad_norm"] = optax.global_norm(grads)
            return new_state, metrics

        return jax.jit(step_fn, donate_argnums=(0,))

    def prepare_for_serving(self) -> None:
        """Shed training-only memory for an inference deployment: drop
        the optimizer moments (8 bytes/param of f32 Adam state a server
        never reads) and the compiled train step. Call after the
        checkpoint load — checkpoints are in training form. After this,
        fit()/train_step raise; encode/search/generate are unchanged.
        Subclasses extend this with their own deploy-time folds
        (RagExecutor adds the one-time LoRA merge)."""
        self.state = self.state.replace(opt_state=())
        self.tx = None
        self._train_step = None
        self.inference_only = True

    def train_step(self, batch) -> dict:
        if self._train_step is None:
            raise RuntimeError(
                "executor is inference_only (or prepare_for_serving() was "
                "called): no optimizer state — rebuild without "
                "inference_only to train")
        if self.mesh is not None:
            from ..parallel import shard_batch
            batch = shard_batch(batch, self.mesh)
        self.state, metrics = self._train_step(self.state, batch)
        return metrics

    def fit(self, batches: Iterable, steps: Optional[int] = None,
            log_every: int = 50,
            val_every: Optional[int] = None,
            val_fn: Optional[Callable[[], dict]] = None,
            ckpt_manager=None, early_stopping=None) -> dict:
        """Training loop. ckpt_manager/early_stopping: see
        executors.callbacks (Lightning ModelCheckpoint/EarlyStopping
        parity)."""
        last_metrics: dict = {}
        try:
            last_metrics = self._fit_loop(batches, steps, log_every,
                                          val_every, val_fn, ckpt_manager,
                                          early_stopping)
        finally:
            # a prefetch iterator abandoned mid-stream (fit ending at
            # `steps`, early stop, or an exception) would otherwise leave
            # its daemon producer parked holding `size` device-resident
            # batches until GC; close() sets the producer's stop event
            # deterministically. ONLY prefetch-owned streams are closed —
            # a caller-owned generator must survive for a later fit()
            # continuation (chunked training).
            if getattr(batches, "_ravqa_prefetch_owned", False):
                batches.close()
        return last_metrics

    def _fit_loop(self, batches, steps, log_every, val_every, val_fn,
                  ckpt_manager, early_stopping) -> dict:
        last_metrics: dict = {}
        for i, batch in enumerate(batches):
            if steps is not None and i >= steps:
                break
            metrics = self.train_step(batch)
            if (i + 1) % log_every == 0 or (steps and i == steps - 1):
                last_metrics = {k: float(v) for k, v in metrics.items()}
                self.logger.log(last_metrics, int(self.state.step),
                                prefix="train/")
            if val_fn is not None and val_every and (i + 1) % val_every == 0:
                # val_fn owns its own metric logging (run_eval/run_rag_eval
                # log under "valid/"); logging vm again here wrote every
                # validation row twice at the same step
                vm = val_fn()
                if ckpt_manager is not None:
                    ckpt_manager.on_validation(self, vm,
                                               int(self.state.step))
                if early_stopping is not None and early_stopping.update(vm):
                    self.logger.log({"early_stop": 1},
                                    int(self.state.step))
                    break
        return last_metrics

    # -- checkpointing (replaces Lightning .ckpt + HF save, SURVEY §5) ------
    # A checkpoint carries the FULL training state — params, step, rng, AND
    # opt_state (Adam moments, MultiSteps accumulation counter, LR-schedule
    # counts) — matching Lightning-.ckpt semantics: a job resumed mid-run
    # continues bit-identically, with warmup/decay at the right schedule
    # position (the reference even hacks scheduler resume by hand,
    # src/executors/FLMR_executor.py:332; here the counts live inside
    # opt_state so they ride along for free).
    def save_checkpoint(self, path: str, backend: str = "msgpack"):
        """backend 'msgpack' (portable single file) or 'orbax' (sharded,
        TPU-production standard; preserves device shardings)."""
        if backend == "orbax":
            import orbax.checkpoint as ocp
            ckptr = ocp.StandardCheckpointer()
            ckptr.save(os.path.abspath(os.path.join(path, "orbax")),
                       {"params": self.state.params,
                        "opt_state": self.state.opt_state,
                        "rng": self.state.rng,
                        "step": jax.device_get(self.state.step)},
                       force=True)
            ckptr.wait_until_finished()
            return
        os.makedirs(path, exist_ok=True)
        with open(os.path.join(path, "params.msgpack"), "wb") as f:
            f.write(flax.serialization.to_bytes(
                jax.device_get(self.state.params)))
        with open(os.path.join(path, "opt_state.msgpack"), "wb") as f:
            f.write(flax.serialization.to_bytes(
                jax.device_get(self.state.opt_state)))
        with open(os.path.join(path, "rng.msgpack"), "wb") as f:
            f.write(flax.serialization.to_bytes(
                jax.device_get(self.state.rng)))
        with open(os.path.join(path, "step.json"), "w") as f:
            json.dump({"step": int(self.state.step)}, f)

    def _place_state(self, state: TrainState) -> TrainState:
        if self._state_shardings is None:
            return state
        return jax.tree.map(jax.device_put, state, self._state_shardings)

    def load_checkpoint_orbax(self, path: str):
        import orbax.checkpoint as ocp
        ckptr = ocp.StandardCheckpointer()
        p = os.path.abspath(os.path.join(path, "orbax"))
        target = {"params": jax.device_get(self.state.params),
                  "opt_state": jax.device_get(self.state.opt_state),
                  "rng": jax.device_get(self.state.rng),
                  "step": jax.device_get(self.state.step)}
        # decide the pre-round-3 (params+step only) fallback from what the
        # checkpoint actually CONTAINS — a failed restore of a full
        # checkpoint (fs error, shape mismatch) must raise, not silently
        # reset Adam moments/schedule/rng
        md = ckptr.metadata(p)
        tree = getattr(md, "item_metadata", None) or getattr(md, "tree", md)
        has_opt = "opt_state" in tree
        if has_opt:
            restored = ckptr.restore(p, target)
        else:
            restored = ckptr.restore(
                p, {"params": target["params"], "step": target["step"]})
            restored["opt_state"] = self.tx.init(restored["params"])
            restored["rng"] = self.state.rng
            self.logger.log({"ckpt_opt_state_missing": 1},
                            int(restored["step"]))
        self.state = self._place_state(TrainState(
            step=jnp.asarray(restored["step"], jnp.int32),
            params=restored["params"],
            opt_state=restored["opt_state"],
            rng=jnp.asarray(restored["rng"])))

    def load_checkpoint(self, path: str):
        with open(os.path.join(path, "params.msgpack"), "rb") as f:
            params = flax.serialization.from_bytes(
                jax.device_get(self.state.params), f.read())
        with open(os.path.join(path, "step.json")) as f:
            step = json.load(f)["step"]
        opt_path = os.path.join(path, "opt_state.msgpack")
        if os.path.exists(opt_path):
            with open(opt_path, "rb") as f:
                opt_state = flax.serialization.from_bytes(
                    jax.device_get(self.state.opt_state), f.read())
        else:  # pre-round-3 checkpoint without opt_state
            opt_state = self.tx.init(params)
            self.logger.log({"ckpt_opt_state_missing": 1}, step)
        rng_path = os.path.join(path, "rng.msgpack")
        rng = self.state.rng
        if os.path.exists(rng_path):
            with open(rng_path, "rb") as f:
                rng = jnp.asarray(flax.serialization.from_bytes(
                    jax.device_get(self.state.rng), f.read()))
        self.state = self._place_state(TrainState(
            step=jnp.asarray(step, jnp.int32), params=params,
            opt_state=opt_state, rng=rng))


def save_params(params, path: str):
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    with open(path, "wb") as f:
        f.write(flax.serialization.to_bytes(jax.device_get(params)))


def load_params(template, path: str):
    with open(path, "rb") as f:
        return flax.serialization.from_bytes(template, f.read())
