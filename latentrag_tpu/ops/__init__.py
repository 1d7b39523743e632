from .distances import (
    METRICS,
    estimate_covariance,
    l2_normalize,
    pairwise_scores,
    prepare_for_metric,
    whiten,
    whitening_factor,
)
from .topk import exact_topk, maxsim_aggregate

__all__ = [
    "METRICS",
    "estimate_covariance",
    "l2_normalize",
    "pairwise_scores",
    "prepare_for_metric",
    "whiten",
    "whitening_factor",
    "exact_topk",
    "maxsim_aggregate",
]
