from .distances import (
    METRICS,
    estimate_covariance,
    l2_normalize,
    pairwise_scores,
    prepare_for_metric,
    whiten,
    whitening_factor,
)
from .ivf import IVFIndex, auto_nprobe, ivf_build, ivf_search
from .knn import knn_graph
from .pallas_topk import pallas_topk, pallas_topk_raw
from .topk import approx_topk, exact_topk, maxsim_aggregate

__all__ = [
    "METRICS",
    "estimate_covariance",
    "l2_normalize",
    "pairwise_scores",
    "prepare_for_metric",
    "whiten",
    "whitening_factor",
    "approx_topk",
    "exact_topk",
    "IVFIndex",
    "auto_nprobe",
    "ivf_build",
    "ivf_search",
    "knn_graph",
    "maxsim_aggregate",
    "pallas_topk",
    "pallas_topk_raw",
]
