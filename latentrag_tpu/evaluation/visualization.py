"""Embedding-space diagnostics: original vs compressed latent visualization.

Parity with ``evaluation/embedding_visualization.py:160-288``: positive-pair
rank via the full cosine-similarity matrix, Recall@k before/after
compression, PCA or t-SNE projection (cosine metric, PCA init), paired
scatter with top-k most-dissimilar pair links, distance histogram + CDF
overlay, and positives-vs-sampled-negatives distance histograms. Returns the
``{recall_original, recall_compressed}`` dict and writes PNGs.

Rank/recall math runs as batched jnp ops; matplotlib/sklearn stay host-side.
"""

from __future__ import annotations

import logging
import os
from typing import Sequence

import numpy as np

import jax.numpy as jnp

from ..ops.distances import l2_normalize

log = logging.getLogger("latentrag.eval")


def positive_ranks(query_emb: np.ndarray, doc_emb: np.ndarray) -> np.ndarray:
    """1-based rank of the aligned (positive) doc for each query under
    cosine similarity against ALL docs (ref ``:34-37``)."""
    q = np.asarray(l2_normalize(jnp.asarray(query_emb)), dtype=np.float32)
    d = np.asarray(l2_normalize(jnp.asarray(doc_emb)), dtype=np.float32)
    sims = q @ d.T  # [N, N]
    pos = np.diag(sims)
    return 1 + (sims > pos[:, None]).sum(axis=1)


def recall_at_k(ranks: np.ndarray, k: int) -> float:
    return float((ranks <= k).mean())


def _project(emb: np.ndarray, method: str, perplexity: float = 30.0):
    if method == "pca":
        from sklearn.decomposition import PCA

        return PCA(n_components=2).fit_transform(emb)
    if method == "tsne":
        from sklearn.manifold import TSNE

        return TSNE(
            n_components=2,
            metric="cosine",
            init="pca",
            perplexity=min(perplexity, max(2.0, (len(emb) - 1) / 3.0)),
            random_state=0,
        ).fit_transform(emb)
    raise ValueError(f"unknown projection {method!r}")


def visualize_compressed_vs_original(
    query_emb: np.ndarray,
    doc_emb: np.ndarray,
    query_latent: np.ndarray,
    doc_latent: np.ndarray,
    out_dir: str = "fig",
    prefix: str = "latent",
    k: int = 10,
    projection: str = "pca",
    top_dissimilar: int = 10,
    make_plots: bool = True,
) -> dict:
    """Side-by-side diagnostics of the raw vs compressed embedding space."""
    ranks_orig = positive_ranks(query_emb, doc_emb)
    ranks_comp = positive_ranks(query_latent, doc_latent)
    result = {
        "recall_original": recall_at_k(ranks_orig, k),
        "recall_compressed": recall_at_k(ranks_comp, k),
        "mean_rank_original": float(ranks_orig.mean()),
        "mean_rank_compressed": float(ranks_comp.mean()),
    }
    if not make_plots:
        return result

    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    os.makedirs(out_dir, exist_ok=True)
    n = len(query_emb)

    # --- paired scatter with dissimilar-pair links ------------------------
    both = np.concatenate([query_latent, doc_latent], axis=0)
    proj = _project(both, projection)
    qp, dp = proj[:n], proj[n:]
    qn = np.asarray(l2_normalize(jnp.asarray(query_latent)))
    dn = np.asarray(l2_normalize(jnp.asarray(doc_latent)))
    pair_sims = (qn * dn).sum(axis=1)
    worst = np.argsort(pair_sims)[:top_dissimilar]

    fig, ax = plt.subplots(figsize=(8, 8))
    ax.scatter(qp[:, 0], qp[:, 1], s=12, c="tab:blue", label="queries")
    ax.scatter(dp[:, 0], dp[:, 1], s=12, c="tab:orange", label="documents")
    for i in worst:
        ax.plot(
            [qp[i, 0], dp[i, 0]], [qp[i, 1], dp[i, 1]],
            c="tab:red", lw=0.8, alpha=0.7,
        )
    ax.set_title(f"{prefix}: latent space ({projection})")
    ax.legend()
    scatter_path = os.path.join(out_dir, f"{prefix}_{projection}_pairs.png")
    fig.savefig(scatter_path, dpi=120)
    plt.close(fig)

    # --- pair-distance histogram + CDF ------------------------------------
    fig, ax = plt.subplots(figsize=(8, 5))
    dists = 1.0 - pair_sims
    ax.hist(dists, bins=40, alpha=0.7, label="pair cosine distance")
    ax2 = ax.twinx()
    xs = np.sort(dists)
    ax2.plot(xs, np.linspace(0, 1, len(xs)), c="tab:red", label="CDF")
    ax.set_title(f"{prefix}: positive-pair distances")
    hist_path = os.path.join(out_dir, f"{prefix}_pair_dist.png")
    fig.savefig(hist_path, dpi=120)
    plt.close(fig)

    result["figures"] = [scatter_path, hist_path]
    log.info("wrote %s, %s", scatter_path, hist_path)
    return result


def plot_positive_vs_negative_distances(
    query_latent: np.ndarray,
    doc_latent: np.ndarray,
    out_dir: str = "fig",
    prefix: str = "latent",
    n_negatives: int = 1000,
    seed: int = 0,
) -> str:
    """Histogram of positive-pair vs permutation-sampled negative-pair
    cosine distances (ref ``:246-288``)."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    qn = np.asarray(l2_normalize(jnp.asarray(query_latent)))
    dn = np.asarray(l2_normalize(jnp.asarray(doc_latent)))
    pos = 1.0 - (qn * dn).sum(axis=1)
    rng = np.random.default_rng(seed)
    n = len(qn)
    qi = rng.integers(0, n, n_negatives)
    di = rng.integers(0, n, n_negatives)
    keep = qi != di
    neg = 1.0 - (qn[qi[keep]] * dn[di[keep]]).sum(axis=1)

    os.makedirs(out_dir, exist_ok=True)
    fig, ax = plt.subplots(figsize=(8, 5))
    ax.hist(pos, bins=40, alpha=0.6, label="positives", density=True)
    ax.hist(neg, bins=40, alpha=0.6, label="negatives", density=True)
    ax.set_xlabel("cosine distance")
    ax.legend()
    ax.set_title(f"{prefix}: positives vs negatives")
    path = os.path.join(out_dir, f"{prefix}_pos_neg.png")
    fig.savefig(path, dpi=120)
    plt.close(fig)
    return path
