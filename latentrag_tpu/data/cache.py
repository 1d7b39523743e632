"""Content-addressed embedding cache (SHA1-fingerprinted npz files).

Parity with ``utils/data_utils.py:164-202`` (``ensure_sbert_cache``): the
cache key hashes the texts and the encoder identity, so stale caches can
never be silently served after data or model changes. Storage is npz instead
of torch ``.pt`` (framework-neutral, mmap-friendly).
"""

from __future__ import annotations

import hashlib
import logging
import os
from typing import Callable, Sequence

import numpy as np

log = logging.getLogger("latentrag.utils")


def texts_fingerprint(texts: Sequence[str], model_name: str = "") -> str:
    h = hashlib.sha1()
    h.update(model_name.encode())
    h.update(str(len(texts)).encode())
    for t in texts:
        h.update(t.encode("utf-8", "replace"))
        h.update(b"\x00")
    return h.hexdigest()


def ensure_embedding_cache(
    texts: Sequence[str],
    encode_fn: Callable[[Sequence[str]], np.ndarray],
    cache_dir: str,
    model_name: str = "",
    tag: str = "emb",
) -> np.ndarray:
    """Return embeddings for ``texts``, encoding only on cache miss."""
    os.makedirs(cache_dir, exist_ok=True)
    fp = texts_fingerprint(texts, model_name)
    path = os.path.join(cache_dir, f"{tag}_{fp[:16]}.npz")
    if os.path.exists(path):
        try:
            with np.load(path) as z:
                if z["fingerprint"].item() == fp:
                    log.info("embedding cache hit: %s", path)
                    return z["embeddings"]
        except Exception as e:
            log.warning("cache at %s unreadable (%s); re-encoding", path, e)
    emb = np.asarray(encode_fn(list(texts)), dtype=np.float32)
    np.savez(path, embeddings=emb, fingerprint=np.array(fp))
    log.info("embedding cache written: %s (%d vectors)", path, len(emb))
    return emb
