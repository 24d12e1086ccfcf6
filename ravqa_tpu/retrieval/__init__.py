from .index import (TokenIndex, build_index_from_embeddings, encode_corpus,
                    load_index, save_index)
from .search import (LateInteractionSearcher, make_sharded_search,
                     search_single_device)
from .distill import (Scorer, kd_triples_from_scores,
                      load_distillation_scores)

__all__ = [
    "TokenIndex", "build_index_from_embeddings", "encode_corpus",
    "load_index", "save_index", "LateInteractionSearcher",
    "make_sharded_search", "search_single_device",
    "Scorer", "kd_triples_from_scores", "load_distillation_scores",
]
