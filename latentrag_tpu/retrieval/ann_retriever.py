"""Retriever wrapper over the native ANN tiers (HNSW / IVF-PQ).

Gives the C++ indexes the same batch-first ``search``/``retrieve``/
``get_stats`` surface as ``DenseRetriever`` so the factory can dispatch on
``retrieval.backend`` exactly like the reference dispatches FAISS index
types (``retrieval/retriever.py:17-34`` + ``FAISSEmbeddingRetriever``
``index_type`` handling).
"""

from __future__ import annotations

import logging
import time
from typing import Sequence

import numpy as np

from ..utils.config import RetrievalConfig
from ..utils.timing import StatsTracker
from .ann import HNSWIndex, IVFPQIndex

log = logging.getLogger("latentrag.retrieval")


def _normalize_rows(x: np.ndarray) -> np.ndarray:
    n = np.linalg.norm(x, axis=1, keepdims=True)
    return x / np.maximum(n, 1e-12)


class ANNRetriever:
    """HNSW or IVF-PQ over (optionally normalized) embeddings."""

    # which metrics each native scorer can actually rank correctly:
    # HNSW scores inner products (cosine via normalization, raw dot);
    # IVF-PQ scores -L2 (euclidean natively; cosine via normalization,
    # where argmin L2 == argmax cosine on unit vectors). Anything else
    # would return plausible-looking WRONG rankings, so it is rejected —
    # the dense TPU tier supports every metric including mahalanobis.
    _SUPPORTED = {
        "hnsw": ("cosine", "dot"),
        "ivfpq": ("cosine", "euclidean"),
    }

    def __init__(self, cfg: RetrievalConfig, kind: str):
        if kind not in ("hnsw", "ivfpq"):
            raise ValueError(f"unknown ANN kind {kind!r}")
        if cfg.metric not in self._SUPPORTED[kind]:
            raise ValueError(
                f"{kind} backend cannot rank metric {cfg.metric!r} "
                f"(supports {self._SUPPORTED[kind]}); use backend='dense' "
                f"for euclidean/mahalanobis exact search"
            )
        self.cfg = cfg
        self.kind = kind
        self.texts: list = []
        self.doc_ids: list = []
        # optional per-document metadata backing filter={"where": ...}
        self.metadata: list | None = None
        self.stats = StatsTracker()
        self._filter_cache = None  # packed-bitset masks per filter spec
        self._index = None
        self._normalize = cfg.metric == "cosine"
        # fp32 corpus kept host-side for the IVF-PQ refinement stage
        # (mirrors FAISS IndexRefineFlat around IndexIVFPQ — the recall
        # recipe the reference's FAISSEmbeddingRetriever.py:100-102 tier
        # relies on FAISS for)
        self._refine = (
            max(0, int(cfg.ivfpq_refine)) if kind == "ivfpq" else 0
        )
        self._refine_emb: np.ndarray | None = None

    def build(
        self,
        embeddings: np.ndarray,
        texts: Sequence[str],
        doc_ids: Sequence | None = None,
        embedding_model: str | None = None,
        ae_type: str | None = None,
        metadata: Sequence[dict] | None = None,
        **_: object,
    ) -> None:
        if metadata is not None and len(metadata) != len(texts):
            raise ValueError(
                f"{len(metadata)} metadata entries for {len(texts)} texts"
            )
        emb = np.ascontiguousarray(embeddings, dtype=np.float32)
        if self._normalize:
            emb = _normalize_rows(emb)
        self.texts = list(texts)
        self.doc_ids = (
            list(doc_ids) if doc_ids is not None else list(range(len(texts)))
        )
        self.metadata = list(metadata) if metadata is not None else None
        if self._filter_cache is not None:
            self._filter_cache.clear()
        mode = self._resolved_build_mode()
        fp = self._fingerprint(emb, mode)
        # encoder/AE provenance rides the fingerprint (same discipline as
        # the dense tier): a warm boot under a different encoder or
        # autoencoder must refuse to serve this index
        fp["embedding_model"] = embedding_model
        fp["ae_type"] = ae_type
        t0 = time.perf_counter()
        if self._try_load(fp):
            if self.kind == "ivfpq" and self._refine > 1:
                self._refine_emb = emb
            self.stats.add_build(time.perf_counter() - t0)
            return
        if self.kind == "hnsw":
            if mode == "knn":
                # accelerator-assisted build: all-pairs k-NN on device
                # (blocked matmul + top-k), linear host assembly in C++;
                # with a multi-device runtime the kNN stage ring-rotates
                # corpus shards over the mesh (one ICI trip, same output)
                import jax

                knn_k = self.cfg.hnsw_knn_k or 2 * self.cfg.hnsw_m
                knn_metric = "cosine" if self._normalize else "dot"
                if jax.device_count() > 1:
                    from ..parallel import make_mesh, sharded_knn_graph

                    ids = sharded_knn_graph(
                        emb, knn_k, make_mesh(), metric=knn_metric
                    )
                else:
                    from ..ops.knn import knn_graph

                    ids = knn_graph(emb, knn_k, metric=knn_metric)
                ix = HNSWIndex.from_knn(
                    emb, ids,
                    M=self.cfg.hnsw_m,
                    ef_construction=self.cfg.hnsw_ef_construction,
                    ef_search=self.cfg.hnsw_ef_search,
                )
            else:
                ix = HNSWIndex(
                    emb.shape[1],
                    M=self.cfg.hnsw_m,
                    ef_construction=self.cfg.hnsw_ef_construction,
                    ef_search=self.cfg.hnsw_ef_search,
                )
                ix.add(emb)
        else:
            nlist = min(self.cfg.ivfpq_nlist, max(1, emb.shape[0] // 8))
            m = self.cfg.ivfpq_m
            while emb.shape[1] % m != 0:
                m //= 2
            ix = IVFPQIndex(
                emb.shape[1], nlist=nlist, m=m, nbits=self.cfg.ivfpq_nbits
            )
            iters = self.cfg.ivfpq_train_iters
            if mode == "device":
                # accelerator-assisted: coarse + PQ codebooks trained and
                # vectors encoded on device (blocked matmul kernels); the
                # C++ tier only assembles lists and serves
                from ..ops.kmeans import (
                    ivfpq_encode_device,
                    ivfpq_train_device,
                )

                coarse, books = ivfpq_train_device(
                    emb, nlist, m, ksub=1 << self.cfg.ivfpq_nbits,
                    iters=iters,
                )
                ix.set_trained(coarse, books)
                assigns, codes = ivfpq_encode_device(emb, coarse, books)
                ix.add_encoded(assigns, codes)
            else:
                # CPU trainers survive large corpora only by subsampling
                # (FAISS's max_points_per_centroid compromise): full-data
                # Lloyd's at 200k x nlist=4096 measured 416 s on one core
                # vs 0.2 s on device (docs/BACKENDS_200K.md). 64 points
                # per centroid keeps host training minutes-bounded.
                max_train = max(nlist * 64, 16384)
                if emb.shape[0] > max_train:
                    sel = np.random.default_rng(0).choice(
                        emb.shape[0], max_train, replace=False
                    )
                    ix.train(np.ascontiguousarray(emb[sel]), iters=iters)
                else:
                    ix.train(emb, iters=iters)
                ix.add(emb)
            if self._refine > 1:
                self._refine_emb = emb
        self._index = ix
        self.stats.add_build(time.perf_counter() - t0)
        self._save(fp)

    def add(
        self,
        embeddings: np.ndarray,
        texts: Sequence[str],
        doc_ids: Sequence | None = None,
        metadata: Sequence[dict] | None = None,
    ) -> None:
        """Incrementally append documents to a built index (same surface
        as ``DenseRetriever.add``). HNSW beam-inserts into the existing
        graph (including a kNN-assembled one); IVF-PQ encodes against the
        already-trained centroids/codebooks — neither retrains. The grown
        index persists under an ``incremental`` sidecar usable for manual
        ``load()``; the next factory build rebuilds cleanly (a grown
        index is not equivalent to a fresh full-corpus build).
        """
        if self._index is None:
            raise RuntimeError("add() before build()")
        emb = np.ascontiguousarray(embeddings, dtype=np.float32)
        if emb.ndim != 2 or emb.shape[1] != self._index.dim:
            raise ValueError(f"expected [n, {self._index.dim}] embeddings")
        if metadata is not None and len(metadata) != len(texts):
            raise ValueError("metadata/texts row count mismatch")
        if self._normalize:
            emb = _normalize_rows(emb)
        base = len(self.texts)
        if not isinstance(self.texts, list):  # lazy store: materialise
            self.texts = list(self.texts)
        self.texts.extend(texts)
        self.doc_ids.extend(
            doc_ids if doc_ids is not None
            else range(base, base + len(texts))
        )
        from .filtering import extend_aligned_metadata

        self.metadata = extend_aligned_metadata(
            self.metadata, base, metadata, len(texts)
        )
        if self._filter_cache is not None:
            self._filter_cache.clear()
        t0 = time.perf_counter()
        self._index.add(emb)
        if self.kind == "ivfpq" and self._refine_emb is not None:
            self._refine_emb = np.concatenate([self._refine_emb, emb])
        self.stats.add_build(time.perf_counter() - t0)
        if self.cfg.index_path:
            # a grown index is NOT equivalent to a fresh build over the
            # full corpus (HNSW: vectors live C++-side so the digest
            # cannot be recomputed; IVF-PQ: centroids/codebooks and the
            # effective nlist were trained on the BASE corpus only — a
            # fresh build over the grown corpus would retrain them).
            # Persist it for manual load()/crash recovery under a sidecar
            # that never matches a computed fingerprint, so the next
            # factory build rebuilds cleanly instead of silently serving
            # base-corpus quantizers.
            self._save({"incremental": True, "kind": self.kind,
                        "n": len(self.texts)})

    # -- persistence (mirrors the dense tier / the reference's FAISS file +
    #    .meta.json fingerprint discipline, FAISSEmbeddingRetriever.py:
    #    114-137, 299-304): the expensive artifact (graph / trained lists)
    #    reloads from disk when the fingerprint — build params AND a corpus
    #    content digest — matches; anything else rebuilds cleanly. --------

    def _index_file(self) -> str:
        return f"{self.cfg.index_path}.{self.kind}"

    def _resolved_build_mode(self) -> str:
        """'auto' resolved against the live backend. The fingerprint
        stores the resolved mode only for EXPLICIT beam/knn/host/device
        requests (pinning them); a configured 'auto' is stored as 'auto'
        so an index built on one backend keeps serving on another — see
        ``_fingerprint``."""
        mode = (self.cfg.hnsw_build if self.kind == "hnsw"
                else self.cfg.ivfpq_build)
        if mode == "auto":
            import jax

            on_acc = jax.default_backend() != "cpu"
            mode = (("knn" if on_acc else "beam") if self.kind == "hnsw"
                    else ("device" if on_acc else "host"))
        return mode

    def _fingerprint(self, emb: np.ndarray, mode: str) -> dict:
        from .dense import _corpus_digest

        cfg = self.cfg
        configured = (cfg.hnsw_build if self.kind == "hnsw"
                      else cfg.ivfpq_build)
        fp: dict = {
            "kind": self.kind,
            "metric": cfg.metric,
            "normalize": self._normalize,
            "dim": int(emb.shape[1]),
            "n": int(emb.shape[0]),
            # under 'auto' the user accepts whichever construction the
            # platform offers, so a graph built on one backend must keep
            # serving on another (a TPU-built knn graph is a perfectly
            # valid index on a CPU host — don't spend hours rebuilding
            # it); an EXPLICIT beam/knn/host/device request pins the mode
            "build": "auto" if configured == "auto" else mode,
            "corpus_digest": _corpus_digest(emb, self.texts),
        }
        if self.kind == "hnsw":
            fp.update(m=cfg.hnsw_m, ef_construction=cfg.hnsw_ef_construction)
            if mode == "knn" and configured != "auto":
                # effective value (0 sentinel means 2*M), and only where
                # the knn build actually reads it — so touching the knob
                # never invalidates a beam-built index
                fp["knn_k"] = cfg.hnsw_knn_k or 2 * cfg.hnsw_m
        else:
            fp.update(nlist=cfg.ivfpq_nlist, pq_m=cfg.ivfpq_m,
                      nbits=cfg.ivfpq_nbits, iters=cfg.ivfpq_train_iters)
        return fp

    def _try_load(self, fp: dict) -> bool:
        import json
        import os

        if not self.cfg.index_path:
            return False
        path = self._index_file()
        meta_path = path + ".meta.json"
        if not (os.path.exists(path) and os.path.exists(meta_path)):
            return False
        try:
            with open(meta_path) as f:
                meta = json.load(f)
            if meta.get("fingerprint") != fp:
                log.info("%s index at %s: fingerprint mismatch, rebuilding",
                         self.kind, path)
                return False
            if self.kind == "hnsw":
                self._index = HNSWIndex.load(
                    path, ef_search=self.cfg.hnsw_ef_search
                )
            else:
                self._index = IVFPQIndex.load(path)
            log.info("%s index loaded from %s (n=%d)", self.kind, path,
                     fp["n"])
            return True
        except (OSError, ValueError, json.JSONDecodeError) as e:
            log.warning("%s index at %s unreadable (%s); rebuilding",
                        self.kind, path, e)
            return False

    def _save(self, fp: dict) -> None:
        import json
        import os

        if not self.cfg.index_path:
            return
        path = self._index_file()
        try:
            parent = os.path.dirname(path)
            if parent:
                os.makedirs(parent, exist_ok=True)
            self._index.save(path)
            # texts/doc_ids ride the sidecar (the dense tier's meta.json
            # convention) so ``load_persisted`` can serve without the
            # original corpus; the refine corpus persists as its own npy
            # (mmap-loaded on warm boot — only candidate rows are read).
            # Both write tmp-then-rename so a crash mid-write can never
            # destroy the previously valid sidecar. Note add() persistence
            # is O(corpus) disk I/O per call (same convention as the dense
            # tier's corpus.npy rewrite) — batch adds where that matters.
            if self._refine_emb is not None:
                from .textstore import atomic_save

                atomic_save(path + ".refine.npy", self._refine_emb)
            elif os.path.exists(path + ".refine.npy"):
                # a stale refine sidecar from a previous refined build
                # must not pair gen-1 embeddings with this index
                os.remove(path + ".refine.npy")
            from .textstore import save_texts

            ids_as_npy = save_texts(path + ".texts", self.texts,
                                    self.doc_ids)
            meta = {"fingerprint": fp}
            if not ids_as_npy:
                meta["doc_ids"] = list(self.doc_ids)
            # per-document metadata sidecar, digest-bound to this meta
            # generation (the dense tier's metadata.jsonl discipline)
            from .textstore import save_metadata_sidecar

            digest = save_metadata_sidecar(
                path + ".metadata.jsonl", self.metadata
            )
            if digest is not None:
                meta["metadata_digest"] = digest
            tmp = path + ".meta.json.tmp"
            with open(tmp, "w") as f:
                json.dump(meta, f)
            os.replace(tmp, path + ".meta.json")
        except OSError as e:  # persistence is best-effort, search still works
            log.warning("could not persist %s index to %s: %s", self.kind,
                        path, e)

    def load_persisted(self, expect: dict | None = None) -> bool:
        """Warm boot: load index + texts/doc_ids straight from disk with NO
        embeddings in hand (so no digest verification — the caller trusts
        the store it pointed at). ``expect`` maps fingerprint keys
        (``embedding_model``, ``ae_type``, ...) to the values the caller
        serves with; a stored value of None (legacy store) is a wildcard,
        a stored contradiction refuses the warm boot. Returns False when
        the store is absent, unreadable, provenance-contradicted, or
        predates texts-in-meta persistence."""
        import json
        import os

        if not self.cfg.index_path:
            return False
        path = self._index_file()
        meta_path = path + ".meta.json"
        if not (os.path.exists(path) and os.path.exists(meta_path)):
            return False
        try:
            with open(meta_path) as f:
                meta = json.load(f)
            from .textstore import load_texts

            lazy_texts, lazy_ids = load_texts(path + ".texts")
            if lazy_texts is None and "texts" not in meta:
                log.info(
                    "%s store at %s predates texts persistence; cold "
                    "boot required", self.kind, path,
                )
                return False
            fp = meta.get("fingerprint") or {}
            for key, want in (expect or {}).items():
                have = fp.get(key)
                if have is not None and have != want:
                    log.warning(
                        "%s store %s=%r contradicts requested %r; warm "
                        "boot refused", path, key, have, want,
                    )
                    return False
            # validate into locals; self mutates only once EVERY check has
            # passed, so a refused store never leaves a half-loaded
            # retriever whose is_built reads True
            if self.kind == "hnsw":
                index = HNSWIndex.load(
                    path, ef_search=self.cfg.hnsw_ef_search
                )
            else:
                index = IVFPQIndex.load(path)
            if lazy_texts is not None:  # lazy store: O(1) boot
                texts = lazy_texts
                doc_ids = (
                    lazy_ids if lazy_ids is not None else meta["doc_ids"]
                )
            else:  # legacy store: texts inlined in meta.json
                texts = list(meta["texts"])
                doc_ids = list(meta["doc_ids"])
            if len(texts) != len(index) or len(doc_ids) != len(texts):
                # mixed-generation store (crash between texts-store and
                # index/meta writes): scores would pair with wrong texts
                log.warning(
                    "%s store at %s holds %d texts / %d doc_ids for %d "
                    "indexed vectors; cold boot required", self.kind, path,
                    len(texts), len(doc_ids), len(index),
                )
                return False
            # digest-verified metadata sidecar (shared protocol with the
            # dense tier); a ValueError here falls to the outer except ->
            # warm boot refused with the store named in the warning
            from .textstore import load_metadata_sidecar

            metadata = load_metadata_sidecar(
                path + ".metadata.jsonl", meta.get("metadata_digest"),
                len(index),
            )
            refine_emb = None
            if self._refine > 1:
                rpath = path + ".refine.npy"
                if os.path.exists(rpath):
                    refine_emb = np.load(rpath, mmap_mode="r")
                    if refine_emb.shape[0] != len(index):
                        log.warning(
                            "%s refine sidecar holds %d rows for %d "
                            "indexed vectors; cold boot required", path,
                            refine_emb.shape[0], len(index),
                        )
                        return False
                else:
                    log.warning(
                        "%s: ivfpq_refine=%d requested but %s is missing — "
                        "serving UNREFINED ADC scores (rebuild to restore "
                        "refinement)", path, self._refine, rpath,
                    )
            self._index, self.texts, self.doc_ids = index, texts, doc_ids
            self.metadata = metadata
            self._refine_emb = refine_emb
            if self._filter_cache is not None:
                self._filter_cache.clear()
            log.info("%s index warm-loaded from %s (n=%d)", self.kind, path,
                     len(self.texts))
            return True
        except (OSError, ValueError, KeyError, json.JSONDecodeError) as e:
            log.warning("%s index at %s unreadable (%r); warm boot failed",
                        self.kind, path, e)
            return False

    @property
    def dim(self) -> int:
        return int(self._index.dim) if self._index is not None else 0

    @property
    def is_built(self) -> bool:
        return self._index is not None

    @property
    def _nprobe(self) -> int:
        # effective nlist (the build caps cfg.ivfpq_nlist at n/8), NOT the
        # raw config value — probing 64 of 40 lists would be nonsense
        nlist = getattr(self._index, "nlist", self.cfg.ivfpq_nlist)
        if self.cfg.ivfpq_nprobe > 0:
            return min(self.cfg.ivfpq_nprobe, nlist)
        return max(1, nlist // 16)

    def _filter_bits(self, spec: dict):
        """Compile (or fetch cached) the packed bitset + selectivity for a
        filter spec. Host-side analogue of the dense tier's device-mask
        cache; the packed bytes feed the C++ tiers' ``bit_test`` directly."""
        from .filtering import (
            FilterCache,
            canonical_filter_key,
            compile_filter_mask,
            pack_mask,
        )

        key = canonical_filter_key(spec)
        if self._filter_cache is None:
            self._filter_cache = FilterCache()
        entry = self._filter_cache.get(key)
        if entry is None:
            n = len(self._index)
            mask = compile_filter_mask(spec, self.doc_ids, self.metadata, n)
            sel = float(mask.mean()) if n else 0.0
            entry = (pack_mask(mask), sel)
            self._filter_cache.put(key, entry)
        return entry

    def search(self, queries: np.ndarray, k: int,
               filter: dict | None = None):
        """Batched top-k; ``filter`` restricts eligibility (spec format:
        ``retrieval.filtering``). Filtering runs INSIDE the C++ tiers —
        HNSW still traverses disallowed nodes for navigation but never
        returns them (the beam width auto-inflates with 1/selectivity so
        sparse filters keep recall); IVF-PQ skips them during the list
        scan (probing more lists, same rule). For extremely selective
        filters the dense tier is the better tool — these graphs/lists
        degrade toward full traversal as selectivity -> 0."""
        if self._index is None:
            raise RuntimeError("index not built")
        q = np.ascontiguousarray(queries, dtype=np.float32)
        if self._normalize:
            q = _normalize_rows(q)
        t0 = time.perf_counter()
        bits, sel = (None, 1.0) if filter is None else self._filter_bits(
            filter
        )
        if bits is not None and sel == 0.0:
            # nothing eligible: all-sentinel result, no native call
            scores = np.full((q.shape[0], k), -np.inf, dtype=np.float32)
            ids = np.full((q.shape[0], k), -1, dtype=np.int32)
        elif self.kind == "hnsw":
            ef = self.cfg.hnsw_ef_search
            if bits is not None:
                # expected eligible nodes among ef visited ~ ef * sel;
                # keep >= the unfiltered ef's worth of ELIGIBLE results
                ef = min(len(self._index),
                         max(ef, int(np.ceil(max(ef, k) / sel))))
            scores, ids = self._index.search(
                q, k, ef_search=ef, allowed_bits=bits
            )
        elif self._refine_emb is not None and self._refine > 1:
            scores, ids = self._search_ivfpq_refined(q, k, bits=bits,
                                                     sel=sel)
        else:
            scores, ids = self._index.search(
                q, k, nprobe=self._filtered_nprobe(sel), allowed_bits=bits
            )
        self.stats.add_search_batch(time.perf_counter() - t0, q.shape[0])
        return scores, ids

    def _filtered_nprobe(self, sel: float) -> int:
        """Probe ~1/selectivity more lists under a filter so the expected
        ELIGIBLE candidate pool stays at the unfiltered operating point."""
        np_base = self._nprobe
        if sel >= 1.0:
            return np_base
        nlist = getattr(self._index, "nlist", self.cfg.ivfpq_nlist)
        return min(nlist, max(np_base, int(np.ceil(np_base / sel))))

    def _search_ivfpq_refined(self, q: np.ndarray, k: int, bits=None,
                              sel: float = 1.0):
        """Two-stage IVF-PQ: oversampled ADC candidates -> exact fp32
        rescore -> re-sort (``retrieval.rescore`` — shared with the binary
        tier's stage 2). Empty slots (id -1) are masked and can never
        displace real candidates; outputs keep the -inf/-1 sentinels when
        fewer than k candidates exist. A filter applies at stage 1, so
        every rescored candidate is already eligible."""
        from .rescore import exact_rescore_topk

        n = self._refine_emb.shape[0]
        k1 = min(self._refine * k, n)
        _, cand = self._index.search(
            q, k1, nprobe=self._filtered_nprobe(sel), allowed_bits=bits
        )
        return exact_rescore_topk(
            q, lambda idx: self._refine_emb[idx], cand, k,
            metric=self.cfg.metric if self.cfg.metric == "euclidean"
            else "dot",
        )

    def retrieve(self, query_emb: np.ndarray, top_k: int = 5,
                 filter: dict | None = None):
        q = np.asarray(query_emb, dtype=np.float32)
        if q.ndim == 1:
            q = q[None, :]
        scores, idx = self.search(q, top_k, filter=filter)
        sel = [j for j in idx[0] if j >= 0]
        return (
            [self.texts[j] for j in sel],
            scores[0][: len(sel)].tolist(),
            [self.doc_ids[j] for j in sel],
        )

    def get_stats(self, reset: bool = False) -> dict:
        return self.stats.get(reset)
