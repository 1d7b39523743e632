from .autoencoder_metrics import (
    compression_ratio,
    reconstruction_mse,
    summarise_sizes,
)
from .generation_metrics import (
    bootstrap_ci,
    corpus_bleu,
    evaluate_generation_bootstrap,
    mean_rouge_l,
    meteor_score,
    meteor_scores,
    paired_bootstrap_test,
    rouge_l_scores,
)
from .benchmark import run_benchmark
from .visualization import (
    plot_positive_vs_negative_distances,
    positive_ranks,
    visualize_compressed_vs_original,
)
from .retrieval_metrics import evaluate_retrieval, hit_matrix, parse_metric

__all__ = [
    "run_benchmark",
    "plot_positive_vs_negative_distances",
    "positive_ranks",
    "visualize_compressed_vs_original",
    "compression_ratio",
    "reconstruction_mse",
    "summarise_sizes",
    "bootstrap_ci",
    "corpus_bleu",
    "evaluate_generation_bootstrap",
    "mean_rouge_l",
    "meteor_score",
    "meteor_scores",
    "paired_bootstrap_test",
    "rouge_l_scores",
    "evaluate_retrieval",
    "hit_matrix",
    "parse_metric",
]
