"""Autoencoder quality/compression accounting.

Parity with ``evaluation/autoencoder_metrics.py:11-36``: reconstruction MSE,
compression ratio, on-disk index size and estimated raw-embedding storage.
"""

from __future__ import annotations

import os

import jax.numpy as jnp
import numpy as np


def reconstruction_mse(model, params, x) -> float:
    """Mean squared reconstruction error over a batch (deterministic path)."""
    out = model.apply({"params": params}, jnp.asarray(x), train=False)
    recon = out[0] if isinstance(out, tuple) else out
    d = np.asarray(recon, dtype=np.float64) - np.asarray(x, dtype=np.float64)
    return float(np.mean(np.square(d)))


def compression_ratio(dim_in: int, dim_out: int) -> float:
    if dim_out <= 0:
        raise ValueError("dim_out must be positive")
    return dim_in / dim_out


def summarise_sizes(
    index_path: str | None, n_vectors: int, dim_in: int, dim_out: int
) -> dict:
    """Disk footprint of the index vs estimated fp32 embedding storage."""
    index_bytes = 0
    if index_path and os.path.exists(index_path):
        if os.path.isdir(index_path):
            for root, _, files in os.walk(index_path):
                index_bytes += sum(
                    os.path.getsize(os.path.join(root, f)) for f in files
                )
        else:
            index_bytes = os.path.getsize(index_path)
    return {
        "index_bytes": index_bytes,
        "raw_fp32_bytes": n_vectors * dim_in * 4,
        "latent_fp32_bytes": n_vectors * dim_out * 4,
        "compression_ratio": compression_ratio(dim_in, dim_out),
    }
