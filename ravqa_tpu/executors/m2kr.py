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
    dataset: RetrievalDataset
    corpus: PassageCorpus
    ks: Sequence[int] = (1, 5, 10)
    use_answers: bool = True        # also compute pseudo-relevance scores


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
