from .retrieval_metrics import (exact_match, positive_id_scores,
                                pseudo_relevance_scores)
from .vqa import normalize_answer, vqa_accuracy, vqa_accuracy_single

__all__ = ["exact_match", "positive_id_scores", "pseudo_relevance_scores",
           "normalize_answer", "vqa_accuracy", "vqa_accuracy_single"]

from .retrieval_metrics import (bleu_score,  # noqa: E402
                                exact_match_with_numeric_ranges)
__all__ += ["bleu_score", "exact_match_with_numeric_ranges"]

from .retrieval_metrics import mrr_at_k, save_ranking_tsv, success_at_k  # noqa: E402
from .vqa import TextCleaner  # noqa: E402
__all__ += ["mrr_at_k", "save_ranking_tsv", "success_at_k", "TextCleaner"]

from .bem import evqa_accuracy, initialize_bem_scoring_function  # noqa: E402
__all__ += ["evqa_accuracy", "initialize_bem_scoring_function"]
