"""Dense latent-index retriever: the TPU-native FAISS replacement.

Capability parity with ``retrieval/FAISSEmbeddingRetriever.py:20-345`` and
``retrieval/bruteforce.py:17-95``, redesigned device-first:

* exact / quasi-exact search over cosine, euclidean and Mahalanobis metrics
  (Mahalanobis — advertised but unimplemented in the reference, SURVEY §2.2 —
  is realised by one-time whitening so the hot path stays a matmul);
* batch-first ``search(queries, k)`` (the reference pushes one query at a
  time through its batch API — SURVEY §3.1); single-query ``retrieve``
  wraps it;
* scoring backends: ``xla`` (tiled matmul + ``approx_max_k``, production),
  ``xla_exact`` (tiled matmul + exact ``top_k``, oracle), ``pallas`` /
  ``pallas_exact`` (the fused kernel); ``auto`` picks ``xla`` on TPU and
  ``xla_exact`` elsewhere;
* optional mesh sharding: corpus rows sharded over the ``data`` axis with
  all-gather merge (``parallel.make_sharded_topk``);
* persistence: directory with ``corpus.npy`` (mmap-loadable) + sidecar
  ``meta.json`` carrying texts/doc_ids and a config **fingerprint** with the
  same keys as the reference ({d, embedding_model, ae_type, latent_dim,
  chunking, metric, normalize, version}); incompatible or corrupted stores
  auto-rebuild (``FAISSEmbeddingRetriever.py:169-179, 223-251``);
* post-build self-search sanity check with rebuild-on-failure
  (``FAISSEmbeddingRetriever.py:259-292``);
* ``StatsTracker`` accounting with device-sync-correct timing.
"""

from __future__ import annotations

import json
import logging
import os
import time
from dataclasses import dataclass, field
from typing import Any, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.distances import (
    estimate_covariance,
    prepare_for_metric,
    whitening_factor,
)
from ..ops.pallas_topk import pallas_topk
from ..ops.topk import NEG_INF, approx_topk, exact_topk
from ..utils.timing import StatsTracker

log = logging.getLogger("latentrag.retrieval")

FINGERPRINT_VERSION = 1
BACKENDS = ("auto", "xla", "xla_exact", "pallas", "pallas_exact")


def _stored_digest(arr) -> str:
    """Sampled content digest of a PERSISTED array: shape + dtype + <=64
    evenly-spaced rows. O(64 pages) to verify off a mmap at load — binds
    each sidecar to its save generation the way the text store's tags do,
    closing the same-n crash window (new corpus.npy + old texts/meta all
    pass pure length checks)."""
    import hashlib

    a = arr if isinstance(arr, np.ndarray) else np.asarray(arr)
    h = hashlib.sha1()
    h.update(f"{tuple(a.shape)}:{a.dtype.str}:".encode())
    if a.ndim == 0 or a.size <= 4096:
        # scalars / small sidecars (scales, whiteners at low d) hash in
        # full — shape alone would let two different scales collide
        h.update(np.ascontiguousarray(a).tobytes())
        return h.hexdigest()
    n = int(a.shape[0])
    idxs = np.linspace(0, n - 1, num=min(n, 64), dtype=int)
    for row in a[idxs]:
        h.update(np.ascontiguousarray(row).tobytes())
    return h.hexdigest()


def verify_stored_digests(path: str, meta: dict) -> None:
    """Check every sidecar recorded in meta['stored_digests'] against the
    bytes on disk (sampled rows off the mmap — O(1) per file). Raises
    ValueError on any mixed-generation pairing; legacy metas (no digests)
    pass. Shared by the warm-boot load path and the doctor."""
    for fname, want in (meta.get("stored_digests") or {}).items():
        p = os.path.join(path, fname)
        if not os.path.exists(p):
            raise ValueError(
                f"{fname} recorded in meta.json but missing on disk; "
                "mixed-generation store"
            )
        got = _stored_digest(np.load(p, mmap_mode="r"))
        if got != want:
            raise ValueError(
                f"{fname} contradicts meta.json's stored digest; "
                "mixed-generation store"
            )


def _corpus_digest(emb, texts) -> str:
    """Cheap stable identity for (embeddings, texts): shape + 64 sampled
    rows + their text prefixes. Catches the accidental-swap case (a
    different corpus of identical size/config) without hashing gigabytes.

    Device arrays fetch ONLY the 64 sampled rows (one gather — never the
    corpus); the byte stream is identical to the host-array path, so
    digests agree across device- and host-built indexes of the same data.
    """
    import hashlib

    if not hasattr(emb, "shape"):  # plain sequences keep working
        emb = np.asarray(emb, dtype=np.float32)
    n = int(emb.shape[0])
    h = hashlib.sha1()
    h.update(f"{tuple(emb.shape)}:".encode())
    if n:
        idxs = np.linspace(0, n - 1, num=min(n, 64), dtype=int)
        if isinstance(emb, np.ndarray):
            sample = emb[idxs]
        else:  # device-resident: one gathered fetch of the sample rows
            sample = np.asarray(emb[jnp.asarray(idxs)])
        for i, row in zip(idxs, sample):
            h.update(np.ascontiguousarray(row, dtype=np.float32).tobytes())
            if i < len(texts):
                h.update(str(texts[i])[:256].encode("utf-8", "ignore"))
    return h.hexdigest()[:16]


def make_fingerprint(
    *,
    d: int,
    embedding_model: str | None = None,
    ae_type: str | None = None,
    latent_dim: int | None = None,
    chunking: dict | None = None,
    metric: str = "cosine",
    normalize: bool = True,
) -> dict:
    return {
        "d": d,
        "embedding_model": embedding_model,
        "ae_type": ae_type,
        "latent_dim": latent_dim,
        "chunking": chunking
        or {
            "enabled": False,
            "mode": "sliding",
            "max_tokens": None,
            "stride": None,
            "min_tokens": None,
        },
        "metric": metric,
        "normalize": normalize,
        "version": FINGERPRINT_VERSION,
    }


@dataclass
class DenseRetriever:
    """Exact/quasi-exact dense retriever over a latent corpus matrix."""

    metric: str = "cosine"
    backend: str = "auto"
    block_size: int = 1048576
    # approx_max_k per-block candidate recall (docs/ROOFLINE.md). "auto"
    # selects by regime: k >= RERANK_K applies rt=0.95 (the caller is
    # oversampling for a downstream re-rank, where candidate-set recall
    # 0.976 vs 0.997 is immaterial but the measured cost gap is up to
    # 5.3x at k=100/1M), smaller k keeps rt=0.99. A float pins it.
    recall_target: float | str = "auto"
    # device dtype of the prepared corpus: float32 | bfloat16 | int8
    # (SQ8 — halves HBM vs bf16; cosine/dot only; ~1e-2 score
    # quantization) | int4 (packed SQ4 — half SQ8 again; coarser
    # ~1e-1-class scores, rank-usable for candidate generation) |
    # binary (1-bit cascade)
    store_dtype: str = "bfloat16"
    index_path: str | None = None
    fingerprint: dict | None = None
    mesh: Any = None  # jax.sharding.Mesh -> shard corpus rows over "data"

    texts: list = field(default_factory=list)
    doc_ids: list = field(default_factory=list)
    # optional per-document metadata (list of dicts, row-aligned with
    # texts) backing filter={"where": {...}} predicate search
    metadata: list | None = None
    stats: StatsTracker = field(default_factory=StatsTracker)

    _corpus_dev: Any = None  # prepared, device-resident [N, D]
    _corpus_n: int = 0
    _corpus_scale: Any = None  # SQ8 scale (int8/binary stores)
    # binary store: _corpus_dev holds the PACKED sign bits (uint32
    # [N, D/32]) — the only device-resident piece — while the SQ8
    # rescore codes stay HOST-side so HBM = D/8 bytes/vector (the
    # whole point of the tier: corpora too big for an int8 store).
    # With a mesh the packed bits row-shard over "data" exactly like the
    # SQ8 tier (stage 1 per shard + all-gather; stage 2 stays host-side),
    # scaling the ~100M/chip capacity by the mesh size.
    _rescore_host: Any = None  # np.int8 [N, D] (binary/int4 cascades)
    _sq4_scale: Any = None  # int4 cascade stage-1 scale (packed nibbles)
    _dim: int = 0  # true vector dim (packed stores have D/32 words)
    binary_oversample: int = 8  # cascade stage-1 candidates per k
    _whitener: Any = None
    _loaded_fingerprint: Any = None
    _sharded_cache: dict = field(default_factory=dict)
    _make_sharded: Any = None
    # device IVF-Flat small-batch acceleration (ops/ivf.py): built
    # LAZILY on the first eligible search (and after any mutation) from
    # the prepared device corpus — a derived structure, deterministic
    # given the corpus, never persisted. 0 = disabled.
    ivf_nlist: int = 0
    ivf_cap: int = 512
    ivf_nprobe: int = 0  # 0 = auto (~2% of blocks, floor 32)
    ivf_query_limit: int = 64
    # rows sampled for the build-time candidate-recall probe (0 skips).
    # IVF pruning quality is a CORPUS property: on a weakly clustered
    # corpus no small probe budget finds the true neighbors, and
    # nothing else in the serving path would ever say so.
    ivf_selfcheck: int = 64
    _ivf_index: Any = None
    _ivf_recall_estimate: Any = None  # float | None, set by the probe
    _ivf_appended: int = 0  # rows appended since the last full IVF build
    # persisted (centroids, assignments) from a warm-boot load: turns
    # the next _ensure_ivf into one deterministic layout gather instead
    # of k-means + a full assignment sweep (~95% of the build cost)
    _ivf_sidecar: Any = None
    # compiled filter masks (device-resident, keyed by canonical spec);
    # dropped wholesale on any mutation — row order defines mask meaning
    _filter_cache: Any = None

    # ------------------------------------------------------------ lifecycle

    def _validate_binary_combo(self):
        if self.metric not in ("cosine", "dot"):
            raise ValueError(
                f"{self.store_dtype} store supports cosine/dot only"
            )

    def __post_init__(self):
        if self.backend not in BACKENDS:
            raise ValueError(f"backend {self.backend!r} not in {BACKENDS}")
        # quantized stores cannot serve the exact oracle; validate the
        # COMBINATION up front so a persisted index can't smuggle it in
        # through the load path either
        if self.store_dtype in ("int8", "int4", "binary") and self.backend in (
            "xla_exact", "pallas_exact",
        ):
            raise ValueError(
                f"backend={self.backend!r} requests the exact oracle, "
                f"but store_dtype={self.store_dtype!r} is quantized; "
                "use a float store for oracle comparisons"
            )
        if self.store_dtype in ("binary", "int4"):
            self._validate_binary_combo()
        if self.mesh is not None and self.mesh.size == 1:
            # a 1-device mesh adds shard_map plumbing for nothing; the
            # single-device kernels are strictly faster
            self.mesh = None
        if self.index_path and os.path.exists(
            os.path.join(self.index_path, "meta.json")
        ):
            # snapshot every field _load can touch so "starting clean"
            # truly is clean no matter how deep into the load it failed
            _load_fields = (
                "texts", "doc_ids", "metadata", "metric", "fingerprint",
                "_loaded_fingerprint", "_corpus_n", "_corpus_dev",
                "_corpus_scale", "_rescore_host", "_sq4_scale", "_dim",
                "_whitener", "_sharded_cache", "_make_sharded",
                "_ivf_sidecar", "_ivf_recall_estimate",
            )
            snap = {f: getattr(self, f) for f in _load_fields
                    if hasattr(self, f)}
            try:
                self._load(self.index_path)
            except Exception as e:  # corrupted store -> start clean
                for f, v in snap.items():
                    setattr(self, f, v)
                log.warning(
                    "index at %s unreadable (%r); starting clean",
                    self.index_path,
                    e,
                )

    @property
    def is_built(self) -> bool:
        return self._corpus_dev is not None

    @property
    def dim(self) -> int:
        if self._dim:
            return self._dim
        return int(self._corpus_dev.shape[1]) if self.is_built else 0

    def _resolve_backend(self) -> str:
        if self.backend != "auto":
            return self.backend
        return "xla" if jax.default_backend() == "tpu" else "xla_exact"

    # ---------------------------------------------------------------- build

    def build(
        self,
        embeddings: np.ndarray,
        texts: Sequence[str],
        doc_ids: Sequence | None = None,
        fingerprint: dict | None = None,
        sanity_check: bool = True,
        metadata: Sequence[dict] | None = None,
    ) -> None:
        """Prepare + load the corpus onto device; persist if index_path set.

        If a compatible index is already loaded (matching fingerprint and
        row count), this is a no-op; an incompatible one is rebuilt.
        ``metadata`` (optional, row-aligned list of dicts) enables
        ``search(..., filter={"where": ...})`` predicate filtering.
        """
        if metadata is not None and len(metadata) != len(texts):
            raise ValueError(
                f"{len(metadata)} metadata entries for {len(texts)} texts"
            )
        if fingerprint is not None:
            self.fingerprint = fingerprint
            # the caller's fingerprint is authoritative about the metric:
            # _load adopts the on-disk metric for load-only use, but a
            # rebuild must NOT inherit it over the requested one (a cosine
            # index on disk would silently turn a requested-euclidean
            # rebuild back into cosine)
            fp_metric = fingerprint.get("metric")
            if fp_metric and fp_metric != self.metric:
                log.warning(
                    "loaded index metric %r overridden by requested %r",
                    self.metric, fp_metric,
                )
                self.metric = fp_metric
        if self.fingerprint is None:
            self.fingerprint = make_fingerprint(
                d=int(embeddings.shape[1]), metric=self.metric
            )
        # corpus identity: shape/config fingerprints alone would let a
        # DIFFERENT same-size corpus be served from a stale persisted index
        self.fingerprint = dict(self.fingerprint)
        self.fingerprint["corpus_digest"] = _corpus_digest(embeddings, texts)
        if (
            self.is_built
            and self._corpus_n == len(texts)
            and self._loaded_fingerprint == self.fingerprint
        ):
            if metadata is not None:  # refresh filters for the same corpus
                self.metadata = list(metadata)
                if self._filter_cache is not None:
                    self._filter_cache.clear()
                if self.index_path:
                    # metadata-only write: a full _save would re-transfer
                    # the whole corpus over the (slow) host link just to
                    # rewrite bytes that didn't change
                    self._save_metadata_only(self.index_path)
            log.info("index compatible; skipping rebuild")
            return

        t0 = time.perf_counter()
        # device-resident inputs (the encode->index path) stay on device:
        # no host materialisation of the corpus matrix at any point
        if isinstance(embeddings, jax.Array) and not isinstance(
            embeddings, np.ndarray
        ):
            x = embeddings.astype(jnp.float32)
        else:
            x = jnp.asarray(
                np.ascontiguousarray(np.asarray(embeddings),
                                     dtype=np.float32)
            )
        self.texts = list(texts)
        self.doc_ids = (
            list(doc_ids) if doc_ids is not None else list(range(len(texts)))
        )
        self.metadata = list(metadata) if metadata is not None else None
        if self._filter_cache is not None:
            self._filter_cache.clear()
        self._ivf_index = None  # derived from the corpus being replaced
        self._ivf_recall_estimate = None
        self._ivf_sidecar = None  # assignments describe the OLD rows
        if len(self.texts) != x.shape[0]:
            raise ValueError("texts and embeddings row count mismatch")
        if self.metric == "mahalanobis":
            cov = estimate_covariance(x)
            self._whitener = whitening_factor(cov)
        prepared = prepare_for_metric(x, self.metric, self._whitener)
        self._dim = int(x.shape[1])
        if self.store_dtype == "binary":
            # 1-bit cascade tier: device holds ONLY packed sign bits;
            # SQ8 rescore codes stay host-side (ops/binary.py)
            self._validate_binary_combo()
            from ..ops.binary import binary_quantize
            from ..ops.quantization import sq8_quantize

            codes, self._corpus_scale = sq8_quantize(prepared)
            self._rescore_host = np.asarray(codes, dtype=np.int8)
            prepared = binary_quantize(prepared)
        elif self.store_dtype == "int8":
            # (the exact-oracle/backend combination is validated in
            # __post_init__ so persisted indexes can't bypass it)
            if self.metric not in ("cosine", "dot"):
                raise ValueError("int8 store supports cosine/dot only")
            from ..ops.quantization import sq8_quantize

            prepared, self._corpus_scale = sq8_quantize(prepared)
        elif self.store_dtype == "int4":
            # packed-nibble CASCADE: stage 1 scans two-codes-per-byte
            # int4 (half SQ8's HBM; 8x the sign-bit tier's resolution,
            # so far smaller oversamples recover exactness), stage 2
            # SQ8-rescores host-side like the binary tier — final
            # scores are exact, 4-bit rounding only shapes candidates
            if self.metric not in ("cosine", "dot"):
                raise ValueError("int4 store supports cosine/dot only")
            from ..ops.quantization import (
                sq4_quantize,
                sq8_quantize,
            )

            codes, self._corpus_scale = sq8_quantize(prepared)
            self._rescore_host = np.asarray(codes, dtype=np.int8)
            prepared, self._sq4_scale = sq4_quantize(prepared)
        else:
            dtype = (
                jnp.bfloat16 if self.store_dtype == "bfloat16" else jnp.float32
            )
            prepared = prepared.astype(dtype)
        self._corpus_n = int(x.shape[0])
        if self.mesh is not None:
            from ..parallel import make_sharded_topk, shard_rows

            self._corpus_dev = shard_rows(prepared, self.mesh)
            self._sharded_cache = {}
            self._make_sharded = make_sharded_topk
        else:
            self._corpus_dev = jax.device_put(prepared)
        self._loaded_fingerprint = dict(self.fingerprint)
        from ..utils.timing import force_completion

        force_completion(self._corpus_dev)
        self.stats.add_build(time.perf_counter() - t0)

        if self.index_path:
            self._save(self.index_path, eager_ivf=True)

        if sanity_check and self._corpus_n > 0:
            ok = self._self_check()
            if not ok:
                log.warning("post-build self-check failed; rebuilding once")
                self._corpus_dev = None
                self.build(
                    x, texts, doc_ids, self.fingerprint, sanity_check=False,
                    metadata=metadata,
                )

    def add(
        self,
        embeddings: np.ndarray,
        texts: Sequence[str],
        doc_ids: Sequence | None = None,
        metadata: Sequence[dict] | None = None,
    ) -> None:
        """Incrementally append documents to a built index.

        Beyond the reference (whose FAISS wrapper only rebuilds wholesale):
        new rows are prepared with the SAME transform as the base corpus
        (for Mahalanobis the original whitener is reused — the metric stays
        defined by the build-time covariance) and concatenated on device.
        Deletion is by rebuild; persistence picks up the grown corpus on the
        next ``_save``.
        """
        if not self.is_built:
            raise RuntimeError("build() the index before add()")
        emb = np.ascontiguousarray(np.asarray(embeddings), dtype=np.float32)
        if emb.shape[1] != self.dim:
            raise ValueError(
                f"dim mismatch: index {self.dim}, new rows {emb.shape[1]}"
            )
        start = self._corpus_n
        new_ids = (
            list(doc_ids)
            if doc_ids is not None
            else list(range(start, start + len(texts)))
        )
        if len(texts) != emb.shape[0] or len(new_ids) != emb.shape[0]:
            raise ValueError("texts/doc_ids/embeddings row count mismatch")
        if metadata is not None and len(metadata) != emb.shape[0]:
            raise ValueError("metadata/embeddings row count mismatch")

        if (
            self._ivf_index is None
            and self._ivf_sidecar is not None
            and self.mesh is None
            and self._ivf_append_budget(
                emb.shape[0], n_total=self._corpus_n + emb.shape[0]
            )
        ):
            # warm boot -> add() before any search: materialise the IVF
            # from the persisted sidecar NOW (one device gather, no
            # k-means) so the append below extends the layout instead of
            # _mark_mutated dropping the sidecar — which would delete the
            # persisted assignments at save time and hand the next search
            # the full rebuild (~86 s at 8.8M) persistence exists to
            # avoid. probe=False: an add() should not pay the recall
            # probe's two compiles; the estimate (if persisted) carries.
            self._ensure_ivf(probe=False)

        prepared = prepare_for_metric(
            jnp.asarray(emb), self.metric, self._whitener
        )
        if self._rescore_host is not None:  # cascade: dual concatenation
            self._rescore_host = np.concatenate(
                [self._rescore_host,
                 np.asarray(self._requantize(prepared))]
            )
            if self.store_dtype == "int4":
                from ..ops.quantization import sq4_quantize_with_scale

                prepared = sq4_quantize_with_scale(
                    prepared, self._sq4_scale
                )
            else:
                from ..ops.binary import binary_quantize

                prepared = binary_quantize(prepared)
        elif self._corpus_scale is not None:
            prepared = self._requantize(prepared)
        else:
            prepared = prepared.astype(self._corpus_dev.dtype)
        if self.mesh is not None:
            from ..parallel import shard_rows

            # concatenate on device (strip pad rows first) and re-shard;
            # gathering the corpus to host would round-trip the whole index
            # through the (slow) host link for every add()
            self._corpus_dev = shard_rows(
                jnp.concatenate(
                    [self._corpus_dev[: self._corpus_n], prepared], axis=0
                ),
                self.mesh,
            )
        else:
            self._corpus_dev = jnp.concatenate(
                [self._corpus_dev[: self._corpus_n], prepared], axis=0
            )
        self._corpus_n += emb.shape[0]
        if not isinstance(self.texts, list):  # lazy store: materialise
            self.texts = list(self.texts)
        self.texts.extend(texts)
        self.doc_ids.extend(new_ids)
        from .filtering import extend_aligned_metadata

        self.metadata = extend_aligned_metadata(
            self.metadata, start, metadata, len(texts)
        )
        ivf = self._ivf_index
        self._mark_mutated()
        # (mesh-sharded IVFs re-shard on add — rebuild lazily instead)
        if (
            ivf is not None
            and self.mesh is None
            and self._ivf_append_budget(emb.shape[0])
        ):
            # incremental append: new rows assign to the EXISTING
            # centroids and land in appended blocks, so the latency tier
            # survives live adds without the full k-means rebuild (~86 s
            # at 8.8M). add() appends rows, so prior ids stay valid —
            # remove() reindexes and must invalidate (it just did).
            from ..ops.ivf import ivf_append

            self._ivf_index = ivf_append(
                ivf, prepared, start,
                dim=self._dim if self._rescore_host is not None else 0,
            )
            self._ivf_appended += emb.shape[0]
        if self.index_path:
            self._save(self.index_path)

    def _mark_mutated(self) -> None:
        """After a live add/remove the build-time corpus_digest no longer
        describes the store — drop it so nothing (compatible_with, a
        build-skip path) can mistake the mutated index for the original
        corpus; a later build() with fresh embeddings recomputes it."""
        if self.fingerprint:
            fp = dict(self.fingerprint)
            fp.pop("corpus_digest", None)
            fp["live_mutations"] = int(fp.get("live_mutations", 0) or 0) + 1
            self.fingerprint = fp
            self._loaded_fingerprint = dict(fp)
        if self._filter_cache is not None:
            # row order/count changed: every compiled mask is stale
            self._filter_cache.clear()
        # the IVF layout indexes rows by position — any mutation stales it
        self._ivf_index = None
        self._ivf_recall_estimate = None
        self._ivf_sidecar = None

    def remove(self, doc_ids: Sequence) -> int:
        """Remove documents by doc_id; returns the number of rows dropped.

        Completes the live-maintenance story add() started (the reference
        FAISS wrapper can only rebuild wholesale). Survivors are filtered
        ON DEVICE with one gather, so the corpus never round-trips the
        host link; the whitener, SQ8 scale, and binary rescore codes are
        preserved — removal never changes a surviving row's score (a
        naive rebuild would re-derive scale/covariance from survivors).
        Unknown ids are ignored; every row carrying a listed id is
        dropped (duplicate ids drop together).
        """
        if not self.is_built:
            raise RuntimeError("build() the index before remove()")
        drop = set(doc_ids)
        keep = [i for i, d in enumerate(self.doc_ids) if d not in drop]
        removed = self._corpus_n - len(keep)
        if removed == 0:
            return 0
        if not keep:
            # an emptied store would persist and then fail every later
            # search (and warm-boot empty forever) — make the caller
            # rebuild explicitly instead
            raise ValueError(
                "remove() would drop every document; rebuild the index "
                "instead of emptying it live"
            )
        kept_rows = jnp.take(
            self._corpus_dev[: self._corpus_n],
            jnp.asarray(np.asarray(keep, dtype=np.int32)), axis=0,
        )
        if self._rescore_host is not None:  # binary: codes follow rows
            self._rescore_host = np.ascontiguousarray(
                self._rescore_host[np.asarray(keep, dtype=np.int64)]
            )
        if self.mesh is not None:
            from ..parallel import shard_rows

            self._corpus_dev = shard_rows(kept_rows, self.mesh)
        else:
            self._corpus_dev = kept_rows
        self._corpus_n = len(keep)
        if not isinstance(self.texts, list):  # lazy store: materialise
            self.texts = list(self.texts)
        self.texts = [self.texts[i] for i in keep]
        self.doc_ids = [self.doc_ids[i] for i in keep]
        if self.metadata is not None:
            self.metadata = [self.metadata[i] for i in keep]
        self._mark_mutated()
        if self.index_path:
            self._save(self.index_path)
        return removed

    def _requantize(self, prepared):
        """SQ8-quantize with the EXISTING scale so old and new codes stay
        comparable."""
        return jnp.clip(
            jnp.round(prepared.astype(jnp.float32) / self._corpus_scale),
            -127, 127,
        ).astype(jnp.int8)

    def _self_check(self) -> bool:
        """Search the first corpus vector; it must retrieve itself top-1
        (mirrors ``FAISSEmbeddingRetriever.py:259-292``)."""
        try:
            probe = np.asarray(self._corpus_row(0), dtype=np.float32)[None, :]
            _, idx = self._device_search_prepared(
                jnp.asarray(probe), min(4, self._corpus_n), allow_ivf=False
            )
            return int(np.asarray(idx)[0, 0]) == 0
        except Exception as e:
            log.warning("self-check raised: %s", e)
            return False

    def _corpus_row(self, i: int):
        if self._rescore_host is not None:  # binary: codes live host-side
            return self._rescore_host[i].astype(np.float32) * float(
                self._corpus_scale
            )
        row = np.asarray(self._corpus_dev[i], dtype=np.float32)
        if self._corpus_scale is not None:
            row = row * float(self._corpus_scale)
        return row

    # --------------------------------------------------------------- search

    # k at/above this is treated as re-rank oversampling (candidate_k =
    # 3*top_k style callers, serving configs that re-rank downstream)
    RERANK_K = 64

    def _effective_recall_target(self, k: int) -> float:
        """Resolve the recall_target knob for this search's k regime.

        Measured policy (docs/ROOFLINE.md k-scaling table, v5e 1M x 64):
        rt=0.95 runs at ~93% of the K=64 matmul roofline with candidate
        recall 0.976; rt=0.99 drops to ~71% (and 5.3x at k=100) for
        recall 0.997. When the caller asks for k >= RERANK_K they are
        oversampling for a downstream exact re-rank, so the cheaper
        candidate pass is the right default.
        """
        rt = self.recall_target
        if isinstance(rt, str):
            if rt == "auto":
                return 0.95 if k >= self.RERANK_K else 0.99
            return float(rt)  # config override arrived as a string
        return float(rt)

    # corpora below this skip the IVF route outright: one exhaustive
    # block is already a single fused matmul there (docs/ROOFLINE.md)
    IVF_MIN_ROWS = 8192

    def _ivf_eligible(
        self, nq: int, backend: str, *, binary: bool = False,
        pinned: bool = False,
    ) -> bool:
        """Route this search through the device IVF? Only the production
        approx path ('xla'), single-device stores, and SMALL query
        batches — large batches amortise the exhaustive sweep over the
        MXU, which pruning cannot beat (see ops/ivf.py). The last guard
        compares the batch's estimated gather traffic (nq*nprobe*cap
        rows) against a quarter of the exhaustive sweep (n rows): the
        measured break-even (8.8M int8, r4 IVF table) sits near half the
        sweep — gathers cost ~2x a streaming read per byte — so a
        quarter keeps every routed search a clear win. ``binary=True``
        is the 1-bit cascade's stage 1 (its own branch, inherently
        approximate — no backend condition)."""
        if not (
            self.ivf_nlist > 0
            and nq <= self.ivf_query_limit
            and self._corpus_n >= self.IVF_MIN_ROWS
        ):
            return False
        if not binary and not (
            backend == "xla" and self._rescore_host is None
        ):
            return False
        if pinned or self.ivf_nprobe:
            # a pinned budget (config field or per-request nprobe) is an
            # explicit user choice — skip the auto traffic guard
            return True
        from ..ops.ivf import auto_nprobe

        # per-DEVICE economics: with a mesh each shard sweeps n/P rows
        # and gathers nq*nprobe*cap rows; nblocks ~= rows/cap before the
        # index exists (per-list padding only adds partial blocks)
        rows = self._corpus_n // (self.mesh.size if self.mesh else 1)
        nprobe_est = auto_nprobe(max(1, rows // self.ivf_cap))
        return nq * nprobe_est * self.ivf_cap <= rows // 4

    def _ivf_append_budget(self, m: int, n_total: int | None = None) -> bool:
        """Allow an incremental IVF append? Each append accretes block
        padding (>= one cap-row block per touched list), so once the
        appended total passes a quarter of the corpus the next eligible
        search rebuilds the layout fresh instead. ``n_total`` overrides
        the corpus size for callers gating BEFORE the add lands, so the
        pre-add and post-add gates agree on the same denominator."""
        denom = self._corpus_n if n_total is None else n_total
        return (self._ivf_appended + m) * 4 <= denom

    def _ensure_ivf(self, probe: bool = True):
        if self._ivf_index is None:
            t0 = time.perf_counter()
            restored = False
            if self.mesh is None and self._ivf_sidecar is not None:
                # warm boot: persisted centroids + assignments skip
                # k-means and the assignment sweep; the layout gather is
                # deterministic, so candidates match the saved index
                from ..ops.ivf import ivf_build_from_assign

                cent, assign = self._ivf_sidecar
                self._ivf_index = ivf_build_from_assign(
                    self._corpus_dev[: self._corpus_n],
                    cent,
                    np.ascontiguousarray(assign),
                    self.ivf_cap,
                )
                restored = True
            elif self.mesh is not None:
                p = self.mesh.size
                rps = self._corpus_dev.shape[0] // p
                if self._ivf_sidecar is not None:
                    # mesh warm boot: persisted per-shard centroids
                    # [P, nls, d] + assignments [P, rows_per_shard] skip
                    # every shard's k-means + assignment sweep; the
                    # regrouping gather is deterministic per shard, so
                    # candidates match the saved index
                    cent, assign = self._ivf_sidecar
                    if (
                        cent.ndim == 3 and cent.shape[0] == p
                        and assign.shape == (p, rps)
                    ):
                        from ..parallel.ivf import (
                            build_sharded_ivf_from_assign,
                        )

                        self._ivf_index = build_sharded_ivf_from_assign(
                            self._corpus_dev, self.mesh, cent,
                            np.ascontiguousarray(assign), self.ivf_cap,
                        )
                        restored = True
                    else:
                        log.warning(
                            "mesh IVF sidecar geometry %s/%s does not "
                            "match the %d-device mesh (rows_per_shard="
                            "%d); rebuilding cold",
                            cent.shape, assign.shape, p, rps,
                        )
                if self._ivf_index is None:
                    # per-shard inverted files over the already-sharded
                    # corpus (parallel/ivf.py); pad rows are masked at
                    # the merge via n_valid like every sharded kernel
                    from ..parallel.ivf import build_sharded_ivf

                    self._ivf_index = build_sharded_ivf(
                        self._corpus_dev, self.mesh,
                        self.ivf_nlist, self.ivf_cap,
                        # packed sign-bit shards need the true vector dim
                        dim=(
                            self._dim
                            if self._rescore_host is not None else 0
                        ),
                    )
            elif self.store_dtype == "int4":  # packed nibble store
                from ..ops.ivf import ivf_build_sq4

                self._ivf_index = ivf_build_sq4(
                    self._corpus_dev[: self._corpus_n],
                    self._dim,
                    self.ivf_nlist,
                    self.ivf_cap,
                )
            elif self._rescore_host is not None:  # packed sign-bit store
                from ..ops.ivf import ivf_build_binary

                self._ivf_index = ivf_build_binary(
                    self._corpus_dev[: self._corpus_n],
                    self._dim,
                    self.ivf_nlist,
                    self.ivf_cap,
                )
            else:
                from ..ops.ivf import ivf_build

                self._ivf_index = ivf_build(
                    self._corpus_dev[: self._corpus_n],
                    self.ivf_nlist,
                    self.ivf_cap,
                )
            self._ivf_appended = 0
            from ..utils.timing import force_completion

            force_completion(self._ivf_index.blocks)
            log.info(
                "device IVF %s: nblocks=%d cap=%d in %.2fs%s",
                "restored from sidecar (no k-means)" if restored
                else "built",
                self._ivf_index.nblocks,
                self.ivf_cap,
                time.perf_counter() - t0,
                " (per shard)" if self.mesh is not None else "",
            )
            if (
                probe
                and self.ivf_selfcheck
                and not (restored and self._ivf_recall_estimate is not None)
            ):
                # mesh builds probe SHARD 0 only (shards share the
                # corpus geometry, so one shard's candidate recall
                # transfers — and the sharded merge program is
                # per-(k, nprobe), so a full-mesh probe would compile
                # an extra program per boot); a sidecar restore with a
                # persisted estimate reuses it (the corpus is
                # digest-verified identical)
                if self.mesh is not None:
                    self._ivf_recall_estimate = (
                        self._ivf_recall_probe_mesh(self._ivf_index)
                    )
                else:
                    self._ivf_recall_estimate = self._ivf_recall_probe(
                        self._ivf_index
                    )
                r_est = self._ivf_recall_estimate
                if r_est is not None:
                    (log.warning if r_est < 0.8 else log.info)(
                        "device IVF candidate recall ~%.3f@10 at the "
                        "configured probe budget (%d corpus-row probes)"
                        "%s",
                        r_est,
                        min(self.ivf_selfcheck, self._corpus_n),
                        "" if r_est >= 0.8 else
                        " — weakly clustered corpus for this budget: "
                        "raise retrieval.ivf_nprobe or disable "
                        "ivf_nlist (docs/ROOFLINE.md r4 IVF section)",
                    )
        return self._ivf_index

    def _ivf_scale(self):
        """Stage-1 score scale for ``ivf_search`` on this store."""
        if self.store_dtype == "int4":
            return self._sq4_scale
        if self._rescore_host is not None:
            return None  # sign bits score asymmetric, unscaled
        return self._corpus_scale

    def _ivf_probe_queries(self, rows: np.ndarray) -> jax.Array:
        """Reconstruct prepared-space float queries from stored rows
        (the probe must query in the same space the searcher does)."""
        if self.store_dtype == "int4":
            from ..ops.quantization import sq4_unpack

            pk = jnp.take(self._corpus_dev, jnp.asarray(rows), axis=0)
            q = (
                sq4_unpack(pk, self._dim).astype(jnp.float32)
                * self._sq4_scale
            )
        elif self._rescore_host is not None:  # binary: SQ8 codes host
            q = (
                jnp.asarray(self._rescore_host[rows], jnp.float32)
                * self._corpus_scale
            )
        else:
            q = jnp.take(
                self._corpus_dev, jnp.asarray(rows), axis=0
            ).astype(jnp.float32)
            if self._corpus_scale is not None:  # int8 codes
                q = q * self._corpus_scale
        if self.mesh is not None:
            # a gather from the sharded corpus commits q to the mesh;
            # the shard-0 probe then mixes it with shard-local arrays in
            # one program, which XLA refuses. The sample is tiny
            # (<= ivf_selfcheck rows), so round-trip it to an
            # uncommitted host-backed array.
            q = jnp.asarray(np.asarray(q))
        return q

    def _ivf_recall_probe(
        self, idx, *, corpus=None, n=None
    ) -> float | None:
        """Candidate recall@10 of the production probe budget, measured
        on a corpus-row sample against the exhaustive stage-1 kernel.
        ``corpus``/``n`` override the reference sweep's rows (the mesh
        probe passes one shard's local rows; defaults cover the whole
        single-device store).

        IVF pruning quality is a CORPUS property, not a code property:
        on a weakly clustered corpus no probe budget short of a full
        sweep finds the true neighbors (measured in-distribution recall
        0.1-0.5 at 0.5-1% probe on a spread-0.3 synthetic mixture vs
        1.000 on a spread-0.1 one — docs/ROOFLINE.md r4 IVF section).
        An operator turning on ``ivf_nlist`` needs that number for
        THEIR corpus, so the first build measures it: two extra
        compiles plus milliseconds of device time, logged and surfaced
        through the serve ``stats`` protocol. Corpus rows as probes
        flatter the estimate slightly (each probe's own row usually
        sits in a probed list) — read it as an upper bound. Packed
        cascade tiers measure stage-1 vs stage-1 (pruning loss only,
        the same definition as scripts/ivf_bench.py rows).
        """
        if self.metric not in ("cosine", "dot"):
            return None  # distance metrics: quantized IVF forbids them
        n = self._corpus_n if n is None else n
        s = max(2, min(self.ivf_selfcheck, n))
        rows = np.linspace(0, n - 1, s).astype(np.int32)
        q = self._ivf_probe_queries(rows)
        kk = min(10, n)
        rt = self._effective_recall_target(kk)
        if corpus is None:
            corpus = self._corpus_dev[: self._corpus_n]
        if self.store_dtype == "int4":
            from ..ops.quantization import sq4_topk

            _, ref = sq4_topk(
                q, corpus, self._sq4_scale, d=self._dim, k=kk,
                block_size=self.block_size, recall_target=rt,
            )
        elif self._rescore_host is not None:
            from ..ops.binary import binary_topk

            _, ref = binary_topk(
                q, corpus, d=self._dim, k=kk,
                block_size=self.block_size, recall_target=rt,
            )
        elif self._corpus_scale is not None:
            from ..ops.quantization import sq8_topk

            _, ref = sq8_topk(
                q, corpus, self._corpus_scale, k=kk,
                block_size=self.block_size, recall_target=rt,
            )
        else:
            _, ref = approx_topk(
                q.astype(corpus.dtype), corpus, k=kk,
                metric=self.metric, block_size=self.block_size,
                recall_target=rt,
            )
        from ..ops.ivf import auto_nprobe, ivf_search

        packed = self._rescore_host is not None
        _, est = ivf_search(
            q, idx, k=kk,
            nprobe=min(
                self.ivf_nprobe or auto_nprobe(idx.nblocks), idx.nblocks
            ),
            metric=self.metric,
            scale=self._ivf_scale(),
            dim=self._dim if packed else 0,
            recall_target=rt,
        )
        ref, est = np.asarray(ref), np.asarray(est)
        hits = sum(
            len(set(a.tolist()) & set(b.tolist()))
            for a, b in zip(est, ref)
        )
        return hits / ref.size

    def _ivf_recall_probe_mesh(self, sivf) -> float | None:
        """Shard-0 candidate recall@10 for a mesh-sharded IVF.

        Shard 0 holds global rows [0, rows_per_shard) with local ids ==
        global ids and never carries pad rows (padding lands on the
        last shard), so its local inverted file probes against its own
        exhaustive sweep with the single-device machinery unchanged.
        Shards share the corpus geometry (rows land round-robin-free,
        contiguous row ranges of one corpus), so one shard's pruning
        quality transfers — and the probe costs the same two compiles
        as the single-device one instead of a per-(k, nprobe) sharded
        merge program per boot."""
        from ..parallel.ivf import _ordered_shards, local_shard_index

        shards = _ordered_shards(self._corpus_dev)
        # slice(None) starts (single-device / replicated leading dim)
        # mean this process holds the whole array — that counts as
        # owning shard 0, so treat a None start as 0
        if not shards or (shards[0].index[0].start or 0) != 0:
            return None  # this process does not own shard 0
        idx0 = local_shard_index(sivf, 0)
        n0 = min(sivf.rows_per_shard, self._corpus_n)
        return self._ivf_recall_probe(
            idx0, corpus=shards[0].data[:n0], n=n0
        )

    def _ivf_search(
        self, q_prepared: jax.Array, k: int, mask: Any,
        nprobe_override: int | None = None,
    ):
        from ..ops.ivf import auto_nprobe, ivf_search

        idx = self._ensure_ivf()
        if nprobe_override:
            # per-request budgets are a COMPILE-CACHE key (every novel
            # value is a fresh ~30-60 s remote compile through the
            # relay, and gather shapes change with it): bucket to the
            # next power of two and clamp to the index, so a client
            # sweeping arbitrary values touches O(log nblocks) programs
            nprobe = min(
                1 << (int(nprobe_override) - 1).bit_length(),
                idx.nblocks,
            )
        else:
            nprobe = self.ivf_nprobe or auto_nprobe(idx.nblocks)
        packed = self._rescore_host is not None  # binary/int4 stage 1
        ivf_scale = self._ivf_scale()
        # the retriever's recall_target policy governs the IVF's
        # approximate SELECT stages too (candidate-set pruning via
        # nprobe is a separate, orthogonal approximation)
        rt = self._effective_recall_target(k)
        if self.mesh is not None:
            from ..parallel.ivf import make_sharded_ivf_topk

            k_eff = min(k, self._corpus_n)
            key = ("ivf", k_eff, nprobe, rt, mask is not None)
            fn = self._sharded_cache.get(key)
            if fn is None:
                fn = make_sharded_ivf_topk(
                    self.mesh, k=k_eff, nprobe=nprobe, metric=self.metric,
                    recall_target=rt, filtered=mask is not None,
                    dim=self._dim if packed else 0,
                )
                self._sharded_cache[key] = fn
            return fn(
                q_prepared, idx, self._corpus_n,
                scale=ivf_scale,
                mask_shard=mask,
            )
        # build-time max blocks-per-list sizes the wide-index probe
        # expansion exactly (ivf_search would otherwise cap a skewed
        # list at 4x the average); identity-cached on the block2list
        # array so every rebuild/append/restore recomputes it once
        cached = getattr(self, "_ivf_mlb", None)
        if cached is None or cached[0] is not idx.block2list:
            b2l_host = np.asarray(idx.block2list)
            real = b2l_host[b2l_host >= 0]
            mlb = int(np.bincount(real).max()) if real.size else 1
            self._ivf_mlb = (idx.block2list, mlb)
        return ivf_search(
            q_prepared,
            idx,
            max_list_blocks=self._ivf_mlb[1],
            k=min(k, self._corpus_n),
            nprobe=nprobe,
            metric=self.metric,
            scale=ivf_scale,
            mask=mask,
            dim=self._dim if packed else 0,
            recall_target=rt,
        )

    def _device_search_prepared(
        self, q_prepared: jax.Array, k: int, mask: Any = None,
        allow_ivf: bool = True, nprobe: int | None = None,
    ):
        """Top-k given queries ALREADY in the prepared (normalized/whitened)
        space. Returns (scores, indices) — device arrays, except the binary
        store's host-rescore path which returns host numpy. ``mask`` (bool
        [N] device array, row-sharded when a mesh is set) restricts
        eligibility; masked slots return NEG_INF scores. ``allow_ivf``
        lets the self-check pin the exhaustive kernels (its oracle)."""
        backend = self._resolve_backend()
        rt = self._effective_recall_target(k)
        if allow_ivf and self._ivf_eligible(
            q_prepared.shape[0], backend, pinned=nprobe is not None
        ):
            return self._ivf_search(q_prepared, k, mask, nprobe)
        if self._rescore_host is not None:  # binary/int4 cascade store
            ok = min(self.binary_oversample * k, self._corpus_n)
            if allow_ivf and self.store_dtype in ("binary", "int4") \
                    and self._ivf_eligible(
                q_prepared.shape[0], backend, binary=True,
                pinned=nprobe is not None,
            ):
                # stage 1 through the device IVF (single-device OR
                # per-shard over the mesh): gather only the top-nprobe
                # packed blocks instead of unpacking the whole corpus
                # (the exhaustive sweep is unpack-rate-bound for both
                # packed stores, so a single query pays the full-corpus
                # cost without this). Sentinels (-1) come back
                # pre-applied.
                _, cand = self._ivf_search(q_prepared, ok, mask, nprobe)
            elif self.mesh is not None:
                # stage 1 sharded: packed sign bits row-sharded over the
                # mesh ([N/P, d/32] — the same layout as the SQ8 tier),
                # per-shard asymmetric scoring with the P-1 over-candidate
                # discipline, one all-gather of [P, Q, ok] candidates.
                # rt is part of the key: ok can clamp at _corpus_n for
                # DIFFERENT requested k (hence different auto-policy rt),
                # so (ok,) alone would serve one regime's program to the
                # other
                stage1 = "sq4" if self.store_dtype == "int4" else "binary"
                key = (ok, stage1, rt, mask is not None)
                fn = self._sharded_cache.get(key)
                if fn is None:
                    fn = self._make_sharded(
                        self.mesh, k=ok, metric=self.metric,
                        backend=stage1, block_size=self.block_size,
                        recall_target=rt, d=self._dim,
                        filtered=mask is not None,
                    )
                    self._sharded_cache[key] = fn
                _, cand = fn(
                    q_prepared, self._corpus_dev, jnp.int32(self._corpus_n),
                    scale=self._sq4_scale, mask_shard=mask,
                )
            elif self.store_dtype == "int4":
                from ..ops.quantization import sq4_topk

                s1, cand = sq4_topk(
                    q_prepared, self._corpus_dev, self._sq4_scale,
                    d=self._dim, k=ok, block_size=self.block_size,
                    recall_target=rt, mask=mask,
                )
                if mask is not None:
                    # filtered-out slots hold arbitrary ids (see below)
                    cand = jnp.where(s1 > NEG_INF * 0.5, cand, -1)
            else:
                from ..ops.binary import binary_topk

                s1, cand = binary_topk(
                    q_prepared, self._corpus_dev, d=self._dim, k=ok,
                    block_size=self.block_size,
                    recall_target=rt, mask=mask,
                )
                if mask is not None:
                    # slots left NEG_INF by the filter carry arbitrary row
                    # ids — sentinel them so the rescore can't revive them
                    cand = jnp.where(s1 > NEG_INF * 0.5, cand, -1)
            # stage 2 on host: exact SQ8 rescore of the tiny candidate set
            # (Q x ok x D flops) — keeps HBM = packed bits. Shared with
            # the IVF-PQ refinement stage; -1 sentinels from the sharded
            # stage 1 are masked there.
            from .rescore import exact_rescore_topk

            return exact_rescore_topk(
                np.asarray(q_prepared, dtype=np.float32),
                lambda idx: self._rescore_host[idx],
                np.asarray(cand), k,
                metric="dot", scale=float(self._corpus_scale),
            )
        if self._corpus_scale is not None and self.mesh is None:  # int8 store
            from ..ops.quantization import sq8_topk

            return sq8_topk(
                q_prepared,
                self._corpus_dev,
                self._corpus_scale,
                k=k,
                block_size=self.block_size,
                recall_target=rt,
                mask=mask,
            )
        if self.mesh is not None:
            if self._corpus_scale is not None:
                shard_backend = "sq8"
            else:
                shard_backend = "approx" if backend == "xla" else "exact"
            key = (k, shard_backend, mask is not None)
            fn = self._sharded_cache.get(key)
            if fn is None:
                fn = self._make_sharded(
                    self.mesh,
                    k=k,
                    metric=self.metric,
                    backend=shard_backend,
                    block_size=self.block_size,
                    recall_target=rt,
                    filtered=mask is not None,
                )
                self._sharded_cache[key] = fn
            q_dev = (
                q_prepared
                if self._corpus_scale is not None
                else q_prepared.astype(self._corpus_dev.dtype)
            )
            return fn(
                q_dev,
                self._corpus_dev,
                jnp.int32(self._corpus_n),
                self._corpus_scale,
                mask_shard=mask,
            )
        q = q_prepared.astype(self._corpus_dev.dtype)
        if backend == "xla":
            return approx_topk(
                q, self._corpus_dev, k=k, metric=self.metric,
                block_size=self.block_size,
                recall_target=rt,
                mask=mask,
            )
        if backend == "xla_exact":
            return exact_topk(
                q, self._corpus_dev, k=k, metric=self.metric,
                block_size=min(self.block_size, 8192),
                mask=mask,
            )
        if mask is not None:
            raise ValueError(
                "pallas backends do not support filtered search; use "
                "backend='xla'/'xla_exact'"
            )
        if backend == "pallas":
            return pallas_topk(
                q, self._corpus_dev, k=k, metric=self.metric, mode="fold"
            )
        return pallas_topk(
            q, self._corpus_dev, k=k, metric=self.metric, mode="exact"
        )

    def _filter_device_mask(self, spec: dict):
        """Compile (or fetch cached) the device-resident row mask for a
        filter spec. The host mask ships PACKED (8x fewer bytes over the
        slow host->device tunnel) and unpacks once on the VPU; with a mesh
        it is then row-sharded exactly like the corpus so per-shard row
        offsets line up."""
        from .filtering import (
            FilterCache,
            canonical_filter_key,
            compile_filter_mask,
            pack_mask,
        )

        key = canonical_filter_key(spec)
        if self._filter_cache is None:
            self._filter_cache = FilterCache()
        m = self._filter_cache.get(key)
        if m is None:
            from ..ops.topk import unpack_row_mask

            host = compile_filter_mask(
                spec, self.doc_ids, self.metadata, self._corpus_n
            )
            m = unpack_row_mask(jnp.asarray(pack_mask(host)), self._corpus_n)
            if self.mesh is not None:
                from ..parallel import shard_rows

                m = shard_rows(m, self.mesh)  # pads False, like the corpus
            self._filter_cache.put(key, m)
        return m

    def search(
        self, queries: np.ndarray, k: int, filter: dict | None = None,
        nprobe: int | None = None,
    ) -> tuple[np.ndarray, np.ndarray]:
        """Batched top-k. queries: [Q, D] raw embedding space. Returns
        (scores [Q, k], indices [Q, k]) as numpy.

        ``filter`` (optional) restricts eligibility to matching documents —
        see ``retrieval.filtering`` for the spec format. Filtering happens
        IN the fused device kernels (scores masked to -inf before top-k),
        so results are exactly "search over the allowed subset".

        ``nprobe`` (optional, device-IVF stores only) pins THIS search's
        probe budget — the per-request latency/recall knob: like a
        pinned ``ivf_nprobe`` config it bypasses the auto traffic guard
        (the query-batch limit still applies), and it is ignored when no
        IVF is configured. The value is bucketed UP to the next power of
        two and clamped to the index's block count — every distinct
        budget is a distinct compiled program, so arbitrary client
        values must collapse onto O(log nblocks) buckets.

        Whenever fewer than k candidates exist — a filter matched fewer
        documents, or a device-IVF route with a pinned small ``nprobe``
        probed fewer rows — the tail slots come back as (-inf, -1);
        callers must skip ids < 0 before indexing texts/doc_ids (a raw
        ``texts[-1]`` would silently alias the last document)."""
        if not self.is_built:
            raise RuntimeError("index not built")
        t0 = time.perf_counter()
        mask = (
            self._filter_device_mask(filter) if filter is not None else None
        )
        if isinstance(queries, jax.Array) and not isinstance(
            queries, np.ndarray
        ):  # device-resident queries skip the host round trip
            q = queries.astype(jnp.float32)
        else:
            q = jnp.asarray(np.asarray(queries, dtype=np.float32))
        q = prepare_for_metric(q, self.metric, self._whitener)
        s_dev, i_dev = self._device_search_prepared(
            q, k, mask=mask, nprobe=nprobe
        )
        s = np.asarray(s_dev)
        i = np.asarray(i_dev)
        # NEG_INF slots hold arbitrary (or already -1) row ids on every
        # path that can under-fill — filters, IVF probe budgets —
        # normalise them all to the -1 sentinel
        i = np.where(s > NEG_INF * 0.5, i, -1)
        self.stats.add_search_batch(time.perf_counter() - t0, q.shape[0])
        return s, i

    def retrieve(
        self, query_emb: np.ndarray, top_k: int = 5,
        filter: dict | None = None,
    ):
        """Single query -> (texts, scores, doc_ids)."""
        q = np.asarray(query_emb, dtype=np.float32)
        if q.ndim == 1:
            q = q[None, :]
        scores, idx = self.search(q, top_k, filter=filter)
        sel = [int(j) for j in idx[0] if j >= 0]  # drop -1 pad sentinels
        return (
            [self.texts[j] for j in sel],
            scores[0][: len(sel)].tolist(),
            [self.doc_ids[j] for j in sel],
        )

    def get_stats(self, reset: bool = False) -> dict:
        return self.stats.get(reset)

    # ---------------------------------------------------------- persistence

    def _save(self, path: str, eager_ivf: bool = False) -> None:
        os.makedirs(path, exist_ok=True)
        stored_digests: dict[str, str] = {}
        from .textstore import atomic_save

        def _drop_stale(*names: str) -> None:
            # sidecars this save does NOT write must not survive from a
            # previous build of a different store type at the same path —
            # e.g. a stale binary_packed.npy would pair gen-1 sign bits
            # with a gen-2 corpus on a later binary load
            import shutil

            for nm in names:
                p = os.path.join(path, nm)
                if os.path.isdir(p):
                    shutil.rmtree(p)
                elif os.path.exists(p):
                    os.remove(p)

        if self._rescore_host is not None:  # binary/int4 cascade store
            # packed words persist VERBATIM: re-deriving them from the
            # dequantized corpus flips sign bits of near-zero negatives
            # (code 0 reloads as +0.0), so save/load would not be
            # rank-stable otherwise. Sharded stores gather through numpy —
            # packed rows are d/32 words (binary) or d/2 bytes (int4),
            # far smaller than the bf16 corpus, and this is a
            # single-controller path (each multi-process rank re-shards
            # on load instead).
            packed = np.asarray(self._corpus_dev)[: self._corpus_n]
            scale = np.asarray(self._corpus_scale, dtype=np.float32)
            corpus_arr = (
                self._rescore_host[: self._corpus_n].astype(np.float32)
                * float(self._corpus_scale)
            )
            pk_name = (
                "sq4_packed.npy" if self.store_dtype == "int4"
                else "binary_packed.npy"
            )
            atomic_save(os.path.join(path, pk_name), packed)
            atomic_save(os.path.join(path, "sq8_scale.npy"), scale)
            atomic_save(os.path.join(path, "corpus.npy"), corpus_arr)
            stored_digests.update({
                pk_name: _stored_digest(packed),
                "sq8_scale.npy": _stored_digest(scale),
                "corpus.npy": _stored_digest(corpus_arr),
            })
            if self.store_dtype == "int4":
                s4 = np.asarray(self._sq4_scale, dtype=np.float32)
                atomic_save(os.path.join(path, "sq4_scale.npy"), s4)
                stored_digests["sq4_scale.npy"] = _stored_digest(s4)
                _drop_stale("sharded", "binary_packed.npy")
            else:
                _drop_stale("sharded", "sq4_packed.npy", "sq4_scale.npy")
        elif self.mesh is not None:
            # sharded corpora write through Orbax: each process persists its
            # own shards — no host gather (crawls through slow links, and
            # multi-host arrays aren't fully addressable anyway)
            from ..parallel import save_sharded_index

            # a random generation tag stored in BOTH the sharded store's
            # meta and meta.json catches a same-n crash between the two
            # writes (the sharded analogue of the stored_digests below)
            import secrets

            sharded_generation = secrets.token_hex(8)
            save_sharded_index(
                os.path.join(path, "sharded"),
                self._corpus_dev,
                {"n": self._corpus_n, "store_dtype": self.store_dtype,
                 "generation": sharded_generation},
            )
            if self._corpus_scale is not None:
                scale = np.asarray(self._corpus_scale, dtype=np.float32)
                atomic_save(os.path.join(path, "sq8_scale.npy"), scale)
                stored_digests["sq8_scale.npy"] = _stored_digest(scale)
            else:
                _drop_stale("sq8_scale.npy")
            _drop_stale("binary_packed.npy", "corpus.npy",
                        "sq4_packed.npy", "sq4_scale.npy")
        else:
            nbytes = self._corpus_n * self.dim * 4
            if nbytes > 1 << 30:
                # persistence is the one step that must materialise the
                # corpus host-side (corpus.npy is the mmap-loadable warm
                # store); on a remote-TPU link this transfer dominates —
                # skip index_path when the index is rebuilt per run
                log.info(
                    "persisting %.1f GB corpus to %s (host transfer)",
                    nbytes / 1e9, path,
                )
            corpus = np.asarray(self._corpus_dev, dtype=np.float32)
            if self._corpus_scale is not None:  # persist dequantized fp32
                corpus = corpus * float(self._corpus_scale)
            corpus_arr = corpus[: self._corpus_n]
            atomic_save(os.path.join(path, "corpus.npy"), corpus_arr)
            stored_digests["corpus.npy"] = _stored_digest(corpus_arr)
            _drop_stale("binary_packed.npy", "sq8_scale.npy", "sharded",
                        "sq4_packed.npy", "sq4_scale.npy")
        if self._whitener is not None:
            wh = np.asarray(self._whitener, dtype=np.float32)
            atomic_save(os.path.join(path, "whitener.npy"), wh)
            stored_digests["whitener.npy"] = _stored_digest(wh)
        else:
            _drop_stale("whitener.npy")
        # device-IVF warm-boot sidecar: centroids + per-row assignments
        # (the expensive 95% of a build — k-means + the assignment
        # sweep); the block layout itself rebuilds from them in one
        # deterministic device gather on the next eligible search.
        # ``eager_ivf`` (build()'s save only) pays the k-means ONCE at
        # persist time instead of at the first search of every boot;
        # mutation saves never force it (a remove would otherwise pay
        # ~86 s inline at 8.8M) — they persist a live index's
        # assignments or drop the stale sidecar.
        ivf_saved = False
        # eager builds only pay off for stores whose searches can route
        # through the IVF (_ivf_eligible: backend 'xla' for fp/int8,
        # always for the packed cascade tiers) — backend='exact' with
        # ivf_nlist>0 would otherwise pay k-means + two probe compiles
        # at every build()-save for a tier no search ever uses. A LIVE
        # index still persists regardless (it exists, saving is cheap).
        eager_ok = eager_ivf and (
            self._rescore_host is not None
            or self._resolve_backend() == "xla"
        )
        if (
            self.ivf_nlist > 0
            and self._corpus_n >= self.IVF_MIN_ROWS
            and (self._ivf_index is not None or eager_ok)
            # mesh sidecars are single-controller (each process would
            # need its own shard slice; multi-process ranks boot cold)
            and (self.mesh is None or jax.process_count() == 1)
        ):
            if self._ivf_index is None:
                log.info(
                    "building device IVF at save time so warm boots "
                    "skip k-means (retrieval.ivf_nlist=%d)",
                    self.ivf_nlist,
                )
            idx = self._ensure_ivf()
            cent = np.asarray(idx.centroids, dtype=np.float32)
            if self.mesh is not None:
                # per-shard state: centroids [P, nlist_shard, d] +
                # LOCAL assignments [P, rows_per_shard] — the mesh
                # analogue of the single-device pair below
                from ..parallel.ivf import sharded_ivf_assignments

                assign = sharded_ivf_assignments(idx)
            else:
                from ..ops.ivf import ivf_assignments

                assign = np.asarray(
                    ivf_assignments(idx, self._corpus_n), dtype=np.int32
                )
            atomic_save(os.path.join(path, "ivf_centroids.npy"), cent)
            atomic_save(os.path.join(path, "ivf_assign.npy"), assign)
            stored_digests["ivf_centroids.npy"] = _stored_digest(cent)
            stored_digests["ivf_assign.npy"] = _stored_digest(assign)
            ivf_saved = True
        else:
            _drop_stale("ivf_centroids.npy", "ivf_assign.npy")
        # texts live in the LAZY store (utf-8 blob + offsets, mmap'd on
        # load) so a multi-M-doc warm boot neither parses gigabytes of
        # JSON nor holds N Python strings in RAM — serving touches only
        # the top-k texts per query. doc_ids ride as an int64 npy when
        # integral, else inline in the JSON.
        from .textstore import save_texts

        ids_as_npy = save_texts(
            os.path.join(path, "texts"), self.texts, self.doc_ids
        )
        # per-document metadata rides a JSONL sidecar; its byte digest in
        # meta.json binds it to this save generation (same discipline as
        # stored_digests — a crash between the two writes is detected)
        from .textstore import save_metadata_sidecar

        metadata_digest = save_metadata_sidecar(
            os.path.join(path, "metadata.jsonl"), self.metadata
        )
        meta = {
            "fingerprint": self.fingerprint,
            "metric": self.metric,
            "n": self._corpus_n,
            # sidecar<->meta generation binding: meta.json lands LAST, so
            # any crash before this point leaves old meta whose digests
            # contradict freshly-written sidecars (and vice versa) — the
            # same-n same-shape crash window a pure length check misses
            "stored_digests": stored_digests,
        }
        if metadata_digest is not None:
            meta["metadata_digest"] = metadata_digest
        if ivf_saved:
            # the restored layout must regroup with the SAME cap, and a
            # changed nlist budget means the user wants a re-cluster
            meta["ivf_cap"] = self.ivf_cap
            meta["ivf_nlist"] = self.ivf_nlist
            if self.mesh is not None:
                # per-shard assignments are keyed to the row->shard
                # mapping; a different mesh size re-shards, so the
                # sidecar only restores onto an equal-size mesh
                meta["ivf_mesh_p"] = int(self.mesh.size)
            if self._ivf_recall_estimate is not None:
                # the corpus a warm boot loads is digest-verified
                # identical, so the measured estimate transfers — reuse
                # it instead of paying the probe's compiles every boot
                meta["ivf_recall_estimate"] = float(
                    self._ivf_recall_estimate
                )
        if self.mesh is not None and self._rescore_host is None:
            meta["sharded_generation"] = sharded_generation
        if not ids_as_npy:
            meta["doc_ids"] = list(self.doc_ids)
        tmp = os.path.join(path, "meta.json.tmp")
        with open(tmp, "w") as f:
            json.dump(meta, f)
        os.replace(tmp, os.path.join(path, "meta.json"))
        log.info("index persisted to %s (n=%d)", path, self._corpus_n)

    def _save_metadata_only(self, path: str) -> None:
        """Refresh just the metadata sidecar + its digest in meta.json.

        Used when build() finds the index itself compatible and only the
        caller-supplied metadata changed — a full _save would round-trip
        the whole corpus through the (slow) host link to rewrite
        unchanged bytes. meta.json still lands LAST, preserving the
        crash-window ordering."""
        meta_path = os.path.join(path, "meta.json")
        if not os.path.exists(meta_path):  # store vanished: full save
            self._save(path)
            return
        with open(meta_path) as f:
            meta = json.load(f)
        from .textstore import save_metadata_sidecar

        digest = save_metadata_sidecar(
            os.path.join(path, "metadata.jsonl"), self.metadata
        )
        if digest is None:
            meta.pop("metadata_digest", None)
        else:
            meta["metadata_digest"] = digest
        tmp = meta_path + ".tmp"
        with open(tmp, "w") as f:
            json.dump(meta, f)
        os.replace(tmp, meta_path)

    def _load(self, path: str) -> None:
        # validate into locals before any self mutation: a refused store
        # must not leave its metric/fingerprint/texts on the clean-started
        # retriever (a later build() would then persist the stale
        # provenance into the fresh index)
        with open(os.path.join(path, "meta.json")) as f:
            meta = json.load(f)
        from .textstore import load_texts

        lazy_texts, lazy_ids = load_texts(os.path.join(path, "texts"))
        if lazy_texts is not None:  # modern lazy store: O(1) boot
            texts = lazy_texts
            doc_ids = lazy_ids if lazy_ids is not None else meta["doc_ids"]
        else:  # legacy store: texts inlined in meta.json
            texts = meta["texts"]
            doc_ids = meta["doc_ids"]
        n = int(meta["n"])
        if len(texts) != n or len(doc_ids) != len(texts):
            # e.g. a crash between the texts-store save and the meta.json
            # rename left mixed generations; serving would silently pair
            # wrong texts with scores — refuse and start clean instead
            raise ValueError(
                f"text store holds {len(texts)} texts / {len(doc_ids)} "
                f"doc_ids but the index records n={n}; mixed-generation "
                "store"
            )
        # sidecar<->meta generation binding (O(64 sampled rows) per file
        # off the mmap): catches the same-n crash window where a fresh
        # corpus.npy pairs with the previous generation's texts + meta
        verify_stored_digests(path, meta)
        # device-IVF warm-boot sidecar (digests verified above): honor
        # it only when the CURRENT config asks for the same structure —
        # a changed cap regroups differently and a changed nlist means
        # the user wants a re-cluster (both fall back to a fresh build)
        self._ivf_sidecar = None
        if (
            self.ivf_nlist > 0
            and "ivf_centroids.npy" in (meta.get("stored_digests") or {})
            and int(meta.get("ivf_cap", -1)) == self.ivf_cap
            and int(meta.get("ivf_nlist", -1)) == self.ivf_nlist
            # single-device <-> mesh saves are not interchangeable (a
            # mesh sidecar is per-shard state keyed to the row->shard
            # mapping), and a mesh restore needs the SAME device count
            and (
                int(meta.get("ivf_mesh_p", -1))
                == (-1 if self.mesh is None else self.mesh.size)
            )
        ):
            cent = np.load(os.path.join(path, "ivf_centroids.npy"))
            assign = np.load(
                os.path.join(path, "ivf_assign.npy"), mmap_mode="r"
            )
            ok = (
                assign.ndim == 2 and assign.shape[0] == self.mesh.size
                if self.mesh is not None
                else assign.shape[0] == n
            )
            if ok:
                # mesh: rows_per_shard consistency is checked at
                # _ensure_ivf time (the sharded corpus loads below)
                self._ivf_sidecar = (cent, assign)
                if meta.get("ivf_recall_estimate") is not None:
                    self._ivf_recall_estimate = float(
                        meta["ivf_recall_estimate"]
                    )
        from .textstore import load_metadata_sidecar

        mpath = os.path.join(path, "metadata.jsonl")
        want_md = meta.get("metadata_digest")
        metadata = load_metadata_sidecar(mpath, want_md, n)
        if want_md is None and os.path.exists(mpath):
            # a file this meta generation never recorded: a crash between
            # the metadata write and the meta.json rename — ignore it
            # rather than serve unverified filters
            log.warning(
                "ignoring unrecorded metadata.jsonl at %s (no digest in "
                "meta.json); rebuild with metadata= to restore filtering",
                path,
            )
        wpath = os.path.join(path, "whitener.npy")
        self._whitener = (
            jnp.asarray(np.load(wpath)) if os.path.exists(wpath) else None
        )
        self.texts = texts
        self.doc_ids = doc_ids
        self.metadata = metadata
        self.metric = meta.get("metric", self.metric)
        self.fingerprint = meta.get("fingerprint")
        self._loaded_fingerprint = self.fingerprint
        self._corpus_n = n

        sharded_path = os.path.join(path, "sharded")
        if self.mesh is not None and os.path.isdir(sharded_path):
            # Orbax restores each shard directly into the mesh layout
            from ..parallel import load_sharded_index, make_sharded_topk

            self._corpus_dev, smeta = load_sharded_index(
                sharded_path, self.mesh
            )
            sn = int(smeta.get("n", -1))
            want_gen = meta.get("sharded_generation")
            if sn != self._corpus_n or (
                want_gen is not None
                and smeta.get("generation") != want_gen
            ):
                # a crash between the sharded write and the meta.json
                # rename leaves mixed generations; a row-count skew would
                # let zero pad rows enter top-k silently
                raise ValueError(
                    f"sharded store (n={sn}, generation="
                    f"{smeta.get('generation')!r}) contradicts meta.json "
                    f"(n={self._corpus_n}, generation={want_gen!r}); "
                    "mixed-generation store"
                )
            spath = os.path.join(path, "sq8_scale.npy")
            if os.path.exists(spath):
                self._corpus_scale = jnp.asarray(np.load(spath))
            self._sharded_cache = {}
            self._make_sharded = make_sharded_topk
            log.info(
                "sharded index loaded from %s (n=%d)", path, self._corpus_n
            )
            return

        # corpus.npy holds PREPARED vectors — mmap for lazy host residency
        corpus = np.load(os.path.join(path, "corpus.npy"), mmap_mode="r")
        if corpus.shape[0] != meta["n"]:
            raise ValueError("meta/corpus row mismatch")
        if self.store_dtype in ("binary", "int4"):
            # everything host-side: shipping the fp corpus up the (slow)
            # tunnel just to quantize it on device would defeat the tier's
            # purpose at its target scale
            self._validate_binary_combo()
            host = np.ascontiguousarray(corpus, dtype=np.float32)
            spath = os.path.join(path, "sq8_scale.npy")
            if os.path.exists(spath):
                scale = float(np.load(spath))
            else:
                scale = max(float(np.abs(host).max()) / 127.0, 1e-12)
                log.warning(
                    "binary index at %s has no sq8_scale.npy — re-deriving "
                    "the scale from the stored corpus; SQ8 rescoring may "
                    "differ from the original build (save again to pin it)",
                    path,
                )
            self._corpus_scale = jnp.float32(scale)
            self._rescore_host = np.clip(
                np.round(host / scale), -127, 127
            ).astype(np.int8)
            self._dim = int(host.shape[1])
            if self.store_dtype == "int4":
                # packed nibbles + their own stage-1 scale; missing
                # sidecars re-derive deterministically from the fp store
                ppath = os.path.join(path, "sq4_packed.npy")
                spath4 = os.path.join(path, "sq4_scale.npy")
                if os.path.exists(ppath) and os.path.exists(spath4):
                    prepared = jnp.asarray(np.load(ppath))
                    self._sq4_scale = jnp.float32(
                        float(np.load(spath4))
                    )
                else:
                    # legacy/cross-tier store: pack HOST-side (shipping
                    # the fp corpus up the slow tunnel to quantize on
                    # device would defeat this branch's purpose) and
                    # note the scale re-derivation — it comes from the
                    # SQ8-dequantized corpus, not the original floats
                    log.warning(
                        "int4 index at %s lacks sq4 sidecars — packing "
                        "nibbles from the fp store with a re-derived "
                        "scale; stage-1 candidates may differ from the "
                        "original build (save again to pin them)",
                        path,
                    )
                    s4 = max(float(np.abs(host).max()) / 7.0, 1e-12)
                    codes4 = np.clip(
                        np.round(host / s4), -7, 7
                    ).astype(np.int8)
                    if codes4.shape[1] % 2:
                        codes4 = np.concatenate(
                            [codes4,
                             np.zeros((codes4.shape[0], 1), np.int8)],
                            axis=1,
                        )
                    packed4 = (
                        (codes4[:, 0::2].astype(np.uint8) & 0xF)
                        | ((codes4[:, 1::2].astype(np.uint8) & 0xF) << 4)
                    )
                    prepared = jnp.asarray(packed4)
                    self._sq4_scale = jnp.float32(s4)
                if self.mesh is not None:
                    from ..parallel import make_sharded_topk, shard_rows

                    self._corpus_dev = shard_rows(prepared, self.mesh)
                    self._sharded_cache = {}
                    self._make_sharded = make_sharded_topk
                else:
                    self._corpus_dev = jax.device_put(prepared)
                log.info(
                    "index loaded from %s (n=%d)", path, self._corpus_n
                )
                return
            ppath = os.path.join(path, "binary_packed.npy")
            if os.path.exists(ppath):  # bit-stable packed store
                prepared = jnp.asarray(np.load(ppath))
            else:  # legacy store: pack host-side, upload only the bits
                log.warning(
                    "binary index at %s predates binary_packed.npy — "
                    "repacking sign bits from the fp store; exact-zero "
                    "values may flip sign vs the original build (rankings "
                    "not bit-stable; save again to pin them)",
                    path,
                )
                d = host.shape[1]
                padded = np.concatenate(
                    [host >= 0,
                     np.zeros((host.shape[0], (-d) % 32), bool)], axis=1,
                )
                words = np.packbits(
                    padded.reshape(host.shape[0], -1, 32), axis=-1,
                    bitorder="little",
                ).view(np.uint32)[:, :, 0]
                prepared = jnp.asarray(words)
            if self.mesh is not None:
                from ..parallel import make_sharded_topk, shard_rows

                self._corpus_dev = shard_rows(prepared, self.mesh)
                self._sharded_cache = {}
                self._make_sharded = make_sharded_topk
            else:
                self._corpus_dev = jax.device_put(prepared)
            log.info("index loaded from %s (n=%d)", path, self._corpus_n)
            return

        prepared = jnp.asarray(np.ascontiguousarray(corpus))
        self._dim = int(prepared.shape[1])
        if self.store_dtype == "int8":
            from ..ops.quantization import sq8_quantize

            prepared, self._corpus_scale = sq8_quantize(prepared)
        else:
            prepared = prepared.astype(
                jnp.bfloat16 if self.store_dtype == "bfloat16"
                else jnp.float32
            )
        if self.mesh is not None:
            from ..parallel import make_sharded_topk, shard_rows

            self._corpus_dev = shard_rows(prepared, self.mesh)
            self._sharded_cache = {}
            self._make_sharded = make_sharded_topk
        else:
            self._corpus_dev = jax.device_put(prepared)
        log.info("index loaded from %s (n=%d)", path, self._corpus_n)

    def compatible_with(self, fingerprint: dict) -> bool:
        return self.fingerprint == fingerprint
