"""EmbeddingCompressor: sentence encoder + optional latent autoencoder.

Parity with ``retrieval/embedder.py:7-48``: encode text batches with the
sentence encoder (normalized), then optionally compress through an AE's
deterministic latent path (VAE → posterior mean, ``embedder.py:44-45``).
Returns float32 numpy [N, D]. Fixes the reference's missing ``input_dim``
(the bug behind its wrong CSV compression ratio, SURVEY §2.2).
"""

from __future__ import annotations

import logging
from typing import Sequence

import jax.numpy as jnp
import numpy as np

from ..models.autoencoders import encode_latents

log = logging.getLogger("latentrag.retrieval")


class EmbeddingCompressor:
    """Text -> (optionally compressed) embedding matrix.

    ``encoder`` must expose ``encode_batch(list[str]) -> np.ndarray [B, D]``
    and ``dim`` (see ``models.encoder``); ``autoencoder`` is a
    ``(flax_module, params)`` pair or ``None``.
    """

    def __init__(self, encoder, autoencoder=None, ae_type: str | None = None,
                 batch_size: int = 64):
        self.encoder = encoder
        self.autoencoder = autoencoder
        self.ae_type = ae_type
        self.batch_size = batch_size

    @property
    def input_dim(self) -> int:
        return int(self.encoder.dim)

    @property
    def output_dim(self) -> int:
        if self.autoencoder is None:
            return self.input_dim
        model, _ = self.autoencoder
        return int(model.latent_dim)

    def encode_text(self, texts: Sequence[str], device: bool = False):
        """Batched encode (+compress). Float32 [N, output_dim].

        Device batching lives in ``SentenceEncoder.encode_batch`` (it chunks
        to its config's measured-optimal batch size internally); stacking a
        second chunking layer here would silently defeat that batching when
        the two sizes disagree.

        ``device=True`` keeps the result ON DEVICE end to end (encoder
        output and AE latents never touch the host) — the corpus path for
        device-resident index builds.
        """
        texts = list(texts)
        if device:
            import inspect

            try:
                takes_device = "device" in inspect.signature(
                    self.encoder.encode_batch
                ).parameters
            except (TypeError, ValueError):
                takes_device = False
            if not takes_device:  # duck-typed encoder: host encode, upload
                emb = jnp.asarray(
                    np.asarray(self.encoder.encode_batch(texts),
                               dtype=np.float32)
                )
                if emb.size == 0:
                    emb = emb.reshape(0, self.input_dim)
                if self.autoencoder is not None:
                    model, params = self.autoencoder
                    emb = encode_latents(model, params, emb)
                return emb.astype(jnp.float32)
            if self.autoencoder is not None and texts:
                # compress PER CHUNK so peak HBM is one encoder chunk +
                # the [N, latent] matrix — never the full [N, hidden]
                # encoder output (13.5 GB at 8.8M x 384 fp32, which would
                # not fit a 16 GB chip even though the latents do)
                model, params = self.autoencoder
                bs = max(self.batch_size, 1)
                zs = [
                    encode_latents(
                        model, params,
                        self.encoder.encode_batch(
                            texts[i : i + bs], device=True
                        ),
                    )
                    for i in range(0, len(texts), bs)
                ]
                z = zs[0] if len(zs) == 1 else jnp.concatenate(zs)
                return z.astype(jnp.float32)
            emb = self.encoder.encode_batch(texts, device=True)
            if emb.size == 0:
                emb = emb.reshape(0, self.input_dim)
            if self.autoencoder is not None:
                model, params = self.autoencoder
                emb = encode_latents(model, params, emb)
            return emb.astype(jnp.float32)
        emb = np.asarray(self.encoder.encode_batch(texts), dtype=np.float32)
        if emb.size == 0:
            emb = emb.reshape(0, self.input_dim)
        if self.autoencoder is not None:
            model, params = self.autoencoder
            z = encode_latents(model, params, jnp.asarray(emb))
            emb = np.asarray(z, dtype=np.float32)
        return emb
