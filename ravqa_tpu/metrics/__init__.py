from .retrieval_metrics import (exact_match, positive_id_scores,
                                pseudo_relevance_scores)
from .vqa import normalize_answer, vqa_accuracy, vqa_accuracy_single

__all__ = ["exact_match", "positive_id_scores", "pseudo_relevance_scores",
           "normalize_answer", "vqa_accuracy", "vqa_accuracy_single"]
