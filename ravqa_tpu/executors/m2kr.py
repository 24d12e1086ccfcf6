"""M2KR multi-task retrieval evaluation (PreFLMR).

The PreFLMR benchmark (reference README.md:94-104, BASELINE.md) evaluates
one checkpoint across WIT / IGLUE / KVQA / MSMARCO / OVEN / LLaVA / EVQA /
OKVQA / Infoseek, each with its own corpus, instruction prompt, and
Recall@K. This module runs the per-task index-build + search + metrics loop
over a task list (the TPU equivalent of the reference's multi-dataset
validation loaders, FLMR_executor.py:172-191 validation_indexing_source).
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Sequence

from ..data.datasets import (PassageCorpus, RetrievalDataset,
                             corpus_doc_batches, query_eval_batches)
from .flmr_executor import FLMRExecutor

# instruction prompts used by PreFLMR per task family (paper App. examples)
DEFAULT_INSTRUCTIONS = {
    "wit": "Identify the document that is associated with the image.",
    "iglue": "Identify the document that is associated with the image.",
    "kvqa": "Retrieve documents that provide an answer to the question "
            "alongside the image: ",
    "msmarco": "Find the document that answers the question: ",
    "oven": "Retrieve a fact providing answers for the given question "
            "and image: ",
    "llava": "Retrieve the document that is relevant to the question "
             "and image: ",
    "evqa": "Using the provided image, obtain documents that address "
            "the subsequent question: ",
    "okvqa": "Retrieve documents that provide an answer to the question "
             "alongside the image: ",
    "infoseek": "Using the provided image, obtain documents that address "
                "the subsequent question: ",
}


@dataclasses.dataclass
class M2KRTask:
    name: str
    dataset: RetrievalDataset       # eval split
    corpus: PassageCorpus
    ks: Sequence[int] = (1, 5, 10)
    use_answers: bool = True        # also compute pseudo-relevance scores
    train_dataset: Optional[RetrievalDataset] = None  # train split (falls
    #   back to `dataset` in the multi-task trainer when absent)


def evaluate_m2kr(executor: FLMRExecutor, tasks: Sequence[M2KRTask],
                  batch_size: int = 64) -> dict:
    """Run the full multi-task eval; returns {task: {metric: value}} plus a
    flat summary suitable for logging."""
    results: dict = {}
    for task in tasks:
        ds = task.dataset
        metrics = executor.evaluate_retrieval(
            query_eval_batches(ds, batch_size=batch_size),
            corpus_doc_batches(task.corpus, ds.dt, batch_size=batch_size),
            passage_ids=task.corpus.ids,
            passage_contents=task.corpus.contents if task.use_answers
            else None,
            answers=[it.get("answers") for it in ds.items]
            if task.use_answers and "answers" in ds.items[0] else None,
            pos_item_ids=[it.get("pos_item_ids", []) for it in ds.items],
            ks=task.ks)
        results[task.name] = {k: v for k, v in metrics.items()
                              if not k.startswith("_")}
    flat = {}
    for name, m in results.items():
        for k, v in m.items():
            flat[f"{name}/{k}"] = v
    results["_flat"] = flat
    return results


# ---------------------------------------------------------------------------
# Multi-task TRAINING (the PreFLMR pretraining recipe, SURVEY §7 step 8):
# one retriever checkpoint trained across M2KR datasets with per-task
# instruction prompts, mixture-sampled batches, and interleaved per-task
# eval. The reference assembles this with per-dataset torch DataLoaders
# (FLMR_executor.py:172-191 validation_indexing_source chooses the loader
# per dataset); here one jitted train step consumes batches drawn from a
# task-mixture sampler — same compiled program whenever tasks share
# tokenizer shapes, one executable per distinct shape otherwise.
# ---------------------------------------------------------------------------

import numpy as np


def instruction_input_modules(instruction: str,
                              question_too: bool = True) -> list[dict]:
    """Input modules prepending a per-task PreFLMR instruction to the
    query text (ModuleParser.InstructionInput): 'instruction question'."""
    mod = {"type": "InstructionInput", "option": "default",
           "separation_tokens": {"start": instruction, "end": ""},
           "prompts": [instruction]}
    return [mod] if question_too else [mod,
                                       {"type": "EmptyTextInput",
                                        "option": "default"}]


def apply_task_instructions(tasks: Sequence[M2KRTask]) -> None:
    """Set each task's datasets to use its instruction prompt (task.name
    looked up in DEFAULT_INSTRUCTIONS unless the dataset already carries
    explicit input_modules with an InstructionInput)."""
    for t in tasks:
        instr = DEFAULT_INSTRUCTIONS.get(t.name.lower())
        if instr is None:
            continue
        for ds in {id(d): d for d in (t.dataset, t.train_dataset)
                   if d is not None}.values():
            if any(m.get("type") == "InstructionInput"
                   for m in ds.input_modules):
                continue
            ds.input_modules = instruction_input_modules(instr)


def task_mixture_weights(tasks: Sequence[M2KRTask],
                         sampling: str = "temperature",
                         temperature: float = 4.0,
                         ratios: Optional[dict] = None) -> np.ndarray:
    """Sampling probabilities over tasks.

    'temperature': p_i ~ n_i^(1/T) — size-proportional flattened toward
    uniform as T grows (the multilingual-retrieval standard; T=1 is
    proportional, T=inf uniform). 'ratio': explicit weights from `ratios`
    (unlisted tasks get 1.0). 'uniform': equal.
    """
    if sampling == "ratio":
        w = np.array([float((ratios or {}).get(t.name, 1.0))
                      for t in tasks])
    elif sampling == "uniform":
        w = np.ones(len(tasks))
    elif sampling == "temperature":
        n = np.array([float(len(t.train_dataset or t.dataset))
                      for t in tasks])
        w = n ** (1.0 / max(temperature, 1e-6))
    else:
        raise ValueError(sampling)
    return w / w.sum()


def multitask_loader(tasks: Sequence[M2KRTask], batch_size: int,
                     sampling: str = "temperature",
                     temperature: float = 4.0,
                     ratios: Optional[dict] = None, seed: int = 0):
    """Infinite iterator of (task_name, batch): each batch is HOMOGENEOUS
    (drawn whole from one task) so its static shapes hit that task's
    compiled step; the mixture is over batches, per the sampled weights."""
    names_all = [t.name for t in tasks]
    assert len(set(names_all)) == len(names_all), \
        f"duplicate task names: {names_all} (iterators are keyed by name)"
    probs = task_mixture_weights(tasks, sampling, temperature, ratios)
    rng = np.random.default_rng(seed)
    for t in tasks:
        n = len(t.train_dataset or t.dataset)
        assert n >= batch_size, \
            (f"task '{t.name}' has {n} items < batch_size {batch_size} "
             "(the static-shape loader drops incomplete batches, so this "
             "task would never yield)")
    iters = {t.name: iter((t.train_dataset or t.dataset).loader(
        batch_size, shuffle=True, seed=seed + 31 * i))
        for i, t in enumerate(tasks)}
    names = [t.name for t in tasks]
    while True:
        name = names[int(rng.choice(len(names), p=probs))]
        yield name, next(iters[name])


def train_m2kr(executor: FLMRExecutor, tasks: Sequence[M2KRTask],
               steps: int, batch_size: int = 8,
               sampling: str = "temperature", temperature: float = 4.0,
               ratios: Optional[dict] = None, seed: int = 0,
               val_every: Optional[int] = None, eval_batch_size: int = 64,
               log_every: int = 50,
               apply_instructions: bool = True) -> dict:
    """Multi-task training loop: mixture-sampled homogeneous batches
    through the executor's jitted train step, per-task loss tracking, and
    interleaved full multi-task eval (evaluate_m2kr) every `val_every`
    steps, logged under eval/<task>/<metric>.

    Returns {"per_task_loss": {task: last}, "eval_history": [...]}.
    """
    if apply_instructions:
        apply_task_instructions(tasks)
    loader = multitask_loader(tasks, batch_size, sampling, temperature,
                              ratios, seed)
    task_loss: dict = {}
    task_count: dict = {}
    eval_history: list = []
    for step in range(steps):
        name, batch = next(loader)
        metrics = executor.train_step(batch)
        # keep the loss ON DEVICE between log points — float() here would
        # block host-device async dispatch every step (BaseExecutor floats
        # metrics only at log boundaries for the same reason)
        task_loss[name] = metrics["loss"]
        task_count[name] = task_count.get(name, 0) + 1
        if (step + 1) % log_every == 0 or step == steps - 1:
            task_loss = {n: float(v) for n, v in task_loss.items()}
            rec = {f"{n}/loss": v for n, v in task_loss.items()}
            rec.update({f"{n}/batches": c for n, c in task_count.items()})
            executor.logger.log(rec, int(executor.state.step),
                                prefix="train/")
        if val_every and (step + 1) % val_every == 0:
            res = evaluate_m2kr(executor, tasks,
                                batch_size=eval_batch_size)
            executor.logger.log(res["_flat"], int(executor.state.step),
                                prefix="eval/")
            eval_history.append(res)
    return {"per_task_loss": {n: float(v) for n, v in task_loss.items()},
            "per_task_batches": task_count,
            "eval_history": eval_history}
