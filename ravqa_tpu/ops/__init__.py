from .maxsim import (
    NEG_INF,
    flipr_reduce,
    maxsim_all_pairs_xla,
    maxsim_pair_xla,
    maxsim_reduce,
    maxsim_search,
    maxsim_search_pallas,
    maxsim_search_xla,
)
from .losses import (
    dpr_in_batch_loss,
    in_batch_negative_loss,
    nway_ce_loss,
)

__all__ = [
    "NEG_INF", "flipr_reduce", "maxsim_all_pairs_xla", "maxsim_pair_xla",
    "maxsim_reduce", "maxsim_search", "maxsim_search_pallas",
    "maxsim_search_xla", "dpr_in_batch_loss", "in_batch_negative_loss",
    "nway_ce_loss",
]
