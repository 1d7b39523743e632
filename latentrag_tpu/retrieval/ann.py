"""ctypes bindings for the native ANN library (HNSW + IVF-PQ).

Host-side ANN tiers matching the reference's FAISS index types
(``FAISSEmbeddingRetriever.py:95-102``): HNSW (M, efConstruction, efSearch)
and IVF-PQ (nlist × m × nbits with residual encoding and ADC search). The
C++ source lives in ``native/latentrag_native.cpp``; the shared library is
built on demand with ``make`` (g++) on first use.

These tiers trade exactness for sublinear/compressed search on the host;
the TPU exact path (``DenseRetriever``) remains the quality reference.
"""

from __future__ import annotations

import ctypes
import logging
import os
import subprocess
from typing import Sequence

import numpy as np

log = logging.getLogger("latentrag.retrieval")

_NATIVE_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
    "native",
)
_LIB_PATH = os.path.join(_NATIVE_DIR, "liblatentrag_native.so")
_lib = None


ABI_VERSION = 7  # must match latentrag_abi_version() in the C++


def _load_library() -> ctypes.CDLL:
    global _lib
    if _lib is not None:
        return _lib
    # ALWAYS run make: its dependency tracking rebuilds a .so older than
    # the source, so a stale pre-existing build can't silently serve an
    # old ABI/algorithm (make is a no-op when fresh)
    try:
        subprocess.run(
            ["make", "-C", _NATIVE_DIR], check=True, capture_output=True
        )
    except (subprocess.CalledProcessError, FileNotFoundError) as e:
        if not os.path.exists(_LIB_PATH):
            raise RuntimeError(
                f"native library build failed in {_NATIVE_DIR}: {e}"
            ) from e
        log.warning("make failed (%s); using existing %s", e, _LIB_PATH)
    lib = ctypes.CDLL(_LIB_PATH)
    try:
        lib.latentrag_abi_version.restype = ctypes.c_int
        abi = int(lib.latentrag_abi_version())
    except AttributeError:
        abi = -1
    if abi != ABI_VERSION:
        raise RuntimeError(
            f"{_LIB_PATH} has ABI {abi}, expected {ABI_VERSION}; delete it "
            f"and rerun (a dlopen'd library cannot be hot-swapped in this "
            f"process)"
        )
    f32p = ctypes.POINTER(ctypes.c_float)
    i32p = ctypes.POINTER(ctypes.c_int)
    u8p = ctypes.POINTER(ctypes.c_uint8)

    lib.hnsw_new.restype = ctypes.c_void_p
    lib.hnsw_new.argtypes = [ctypes.c_int] * 3 + [ctypes.c_uint]
    lib.hnsw_free.argtypes = [ctypes.c_void_p]
    lib.hnsw_size.restype = ctypes.c_int
    lib.hnsw_size.argtypes = [ctypes.c_void_p]
    lib.hnsw_add_batch.argtypes = [
        ctypes.c_void_p, ctypes.c_int, f32p, ctypes.c_int
    ]
    lib.hnsw_search_batch.argtypes = [
        ctypes.c_void_p, ctypes.c_int, f32p, ctypes.c_int, ctypes.c_int,
        i32p, f32p, ctypes.c_int,
    ]
    lib.hnsw_search_batch_filtered.argtypes = [
        ctypes.c_void_p, ctypes.c_int, f32p, ctypes.c_int, ctypes.c_int,
        u8p, i32p, f32p, ctypes.c_int,
    ]
    lib.hnsw_build_knn.restype = ctypes.c_int
    lib.hnsw_build_knn.argtypes = [
        ctypes.c_void_p, ctypes.c_int, f32p, i32p, ctypes.c_int,
        ctypes.c_int,
    ]
    lib.hnsw_save.restype = ctypes.c_int
    lib.hnsw_save.argtypes = [ctypes.c_void_p, ctypes.c_char_p]
    lib.hnsw_load.restype = ctypes.c_void_p
    lib.hnsw_load.argtypes = [ctypes.c_char_p]

    lib.kmeans_train.argtypes = [
        f32p, ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int,
        ctypes.c_uint, f32p,
    ]

    lib.ivfpq_new.restype = ctypes.c_void_p
    lib.ivfpq_new.argtypes = [ctypes.c_int] * 4
    lib.ivfpq_free.argtypes = [ctypes.c_void_p]
    lib.ivfpq_train.argtypes = [
        ctypes.c_void_p, f32p, ctypes.c_int, ctypes.c_int, ctypes.c_uint,
    ]
    lib.ivfpq_add.argtypes = [ctypes.c_void_p, f32p, ctypes.c_int]
    lib.ivfpq_set_trained.argtypes = [ctypes.c_void_p, f32p, f32p]
    lib.ivfpq_add_encoded.restype = ctypes.c_int
    lib.ivfpq_add_encoded.argtypes = [
        ctypes.c_void_p, i32p, u8p, ctypes.c_int,
    ]
    lib.ivfpq_search.argtypes = [
        ctypes.c_void_p, f32p, ctypes.c_int, ctypes.c_int, ctypes.c_int,
        i32p, f32p,
    ]
    lib.ivfpq_search_filtered.argtypes = [
        ctypes.c_void_p, f32p, ctypes.c_int, ctypes.c_int, ctypes.c_int,
        u8p, i32p, f32p,
    ]
    lib.ivfpq_save.restype = ctypes.c_int
    lib.ivfpq_save.argtypes = [ctypes.c_void_p, ctypes.c_char_p]
    lib.ivfpq_load.restype = ctypes.c_void_p
    lib.ivfpq_load.argtypes = [ctypes.c_char_p]
    lib.ivfpq_params.argtypes = [ctypes.c_void_p, i32p]
    _lib = lib
    return lib


def _as_f32(x: np.ndarray) -> np.ndarray:
    return np.ascontiguousarray(x, dtype=np.float32)


def _f32p(x: np.ndarray):
    return x.ctypes.data_as(ctypes.POINTER(ctypes.c_float))


def _i32p(x: np.ndarray):
    return x.ctypes.data_as(ctypes.POINTER(ctypes.c_int))


def kmeans_train(
    data: np.ndarray, k: int, iters: int = 20, seed: int = 0
) -> np.ndarray:
    """Native k-means; returns [k, d] centroids."""
    lib = _load_library()
    data = _as_f32(data)
    n, d = data.shape
    out = np.zeros((k, d), dtype=np.float32)
    lib.kmeans_train(_f32p(data), n, d, k, iters, seed, _f32p(out))
    return out


class HNSWIndex:
    """Graph ANN over inner-product scores (pre-normalize for cosine)."""

    def __init__(
        self,
        dim: int,
        M: int = 32,
        ef_construction: int = 200,
        ef_search: int = 64,
        seed: int = 42,
        _handle=None,
    ):
        self._lib = _load_library()
        self.dim = dim
        self.ef_search = ef_search
        self._h = _handle or self._lib.hnsw_new(
            dim, M, ef_construction, seed
        )

    def __del__(self):
        if getattr(self, "_h", None):
            self._lib.hnsw_free(self._h)
            self._h = None

    def __len__(self) -> int:
        return self._lib.hnsw_size(self._h)

    def add(self, vectors: np.ndarray, nthreads: int = 0) -> None:
        """Append vectors. ``nthreads``: 0 = all hardware threads (level
        assignment stays deterministic; link sets may vary under
        concurrency), 1 = fully deterministic sequential build."""
        v = _as_f32(vectors)
        assert v.shape[1] == self.dim
        self._lib.hnsw_add_batch(self._h, v.shape[0], _f32p(v), nthreads)

    def search(
        self, queries: np.ndarray, k: int, ef_search: int | None = None,
        nthreads: int = 0, allowed_bits: np.ndarray | None = None,
    ) -> tuple[np.ndarray, np.ndarray]:
        """Batched beam search. ``allowed_bits`` (optional): packed
        little-endian bitset over vector ids (``filtering.pack_mask``
        layout) — disallowed nodes still steer the beam but never enter
        results; unreachable slots come back -1/-inf."""
        q = _as_f32(queries)
        nq = q.shape[0]
        ids = np.zeros((nq, k), dtype=np.int32)
        scores = np.zeros((nq, k), dtype=np.float32)
        ef = ef_search or self.ef_search
        if allowed_bits is None:
            self._lib.hnsw_search_batch(
                self._h, nq, _f32p(q), k, ef,
                _i32p(ids), _f32p(scores), nthreads,
            )
            return scores, ids
        bits = np.ascontiguousarray(allowed_bits, dtype=np.uint8)
        need = (len(self) + 7) // 8
        if bits.size < need:
            raise ValueError(
                f"allowed_bits holds {bits.size} bytes; index of "
                f"{len(self)} vectors needs >= {need}"
            )
        self._lib.hnsw_search_batch_filtered(
            self._h, nq, _f32p(q), k, ef,
            bits.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
            _i32p(ids), _f32p(scores), nthreads,
        )
        return scores, ids

    @classmethod
    def from_knn(
        cls,
        vectors: np.ndarray,
        knn_ids: np.ndarray,
        M: int = 32,
        ef_construction: int = 200,
        ef_search: int = 64,
        seed: int = 42,
        nthreads: int = 0,
    ) -> "HNSWIndex":
        """Assemble a fresh index from precomputed k-NN candidate lists
        (``ops.knn.knn_graph`` — the accelerator-assisted build). Level-0
        links come from diversity-pruning each row's candidates; the
        hierarchy is beam-built over the ~1/M level>=1 nodes only."""
        v = _as_f32(vectors)
        ids = np.ascontiguousarray(knn_ids, dtype=np.int32)
        if ids.shape[0] != v.shape[0]:
            raise ValueError("knn_ids rows must match vectors rows")
        ix = cls(v.shape[1], M=M, ef_construction=ef_construction,
                 ef_search=ef_search, seed=seed)
        rc = ix._lib.hnsw_build_knn(
            ix._h, v.shape[0], _f32p(v), _i32p(ids), ids.shape[1], nthreads
        )
        if rc != 0:
            raise RuntimeError("hnsw_build_knn failed (index not empty?)")
        return ix

    def save(self, path: str) -> None:
        rc = self._lib.hnsw_save(self._h, path.encode())
        if rc != 0:
            raise IOError(f"hnsw_save failed for {path}")

    @classmethod
    def load(cls, path: str, ef_search: int = 64) -> "HNSWIndex":
        lib = _load_library()
        h = lib.hnsw_load(path.encode())
        if not h:
            raise IOError(f"hnsw_load failed for {path}")
        probe = cls.__new__(cls)
        probe._lib = lib
        probe._h = h
        probe.ef_search = ef_search
        # dim is embedded in the file; re-derive via a header peek
        with open(path, "rb") as f:
            import struct

            probe.dim = struct.unpack("<i", f.read(4))[0]
        return probe


class IVFPQIndex:
    """Inverted-file product-quantization index (residual encoding + ADC)."""

    def __init__(self, dim: int, nlist: int = 64, m: int = 16, nbits: int = 8,
                 _handle=None):
        if dim % m != 0:
            raise ValueError(f"dim {dim} not divisible by m {m}")
        self._lib = _load_library()
        self.dim = dim
        self.nlist = nlist
        self.m = m
        self.ksub = 1 << nbits
        self.dsub = dim // m
        self._h = _handle or self._lib.ivfpq_new(dim, nlist, m, nbits)

    def __del__(self):
        if getattr(self, "_h", None):
            self._lib.ivfpq_free(self._h)
            self._h = None

    def train(self, data: np.ndarray, iters: int = 15, seed: int = 0) -> None:
        d = _as_f32(data)
        self._lib.ivfpq_train(self._h, _f32p(d), d.shape[0], iters, seed)

    def add(self, data: np.ndarray) -> None:
        d = _as_f32(data)
        self._lib.ivfpq_add(self._h, _f32p(d), d.shape[0])

    def set_trained(self, coarse: np.ndarray, codebooks: np.ndarray) -> None:
        """Load externally-trained parameters (the TPU-assisted build:
        ``ops.kmeans.ivfpq_train_device`` — same L2/residual semantics)."""
        c = _as_f32(coarse)
        cb = _as_f32(codebooks)
        if c.shape != (self.nlist, self.dim):
            raise ValueError(f"coarse shape {c.shape} != "
                             f"({self.nlist}, {self.dim})")
        if cb.shape != (self.m, self.ksub, self.dsub):
            raise ValueError(f"codebooks shape {cb.shape} != "
                             f"({self.m}, {self.ksub}, {self.dsub})")
        self._lib.ivfpq_set_trained(self._h, _f32p(c), _f32p(cb))

    def add_encoded(self, assigns: np.ndarray, codes: np.ndarray) -> None:
        """Append device-encoded vectors: list ids + PQ codes from
        ``ops.kmeans.ivfpq_encode_device`` — linear host work."""
        a = np.ascontiguousarray(assigns, dtype=np.int32)
        c = np.ascontiguousarray(codes, dtype=np.uint8)
        if c.shape != (a.shape[0], self.m):
            raise ValueError(f"codes shape {c.shape} != ({a.shape[0]}, "
                             f"{self.m})")
        rc = self._lib.ivfpq_add_encoded(
            self._h, _i32p(a),
            c.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), a.shape[0],
        )
        if rc != 0:
            raise ValueError("add_encoded: list id out of range")

    def save(self, path: str) -> None:
        """Binary persistence (FAISS ``write_index`` parity): params +
        coarse centroids + codebooks + inverted lists."""
        rc = self._lib.ivfpq_save(self._h, path.encode())
        if rc != 0:
            raise OSError(f"ivfpq_save failed for {path!r}")

    @classmethod
    def load(cls, path: str) -> "IVFPQIndex":
        """Reload a saved index; corrupt/truncated files raise (the header
        and payload sizes are validated before any allocation)."""
        lib = _load_library()
        h = lib.ivfpq_load(path.encode())
        if not h:
            raise OSError(f"ivfpq_load failed for {path!r} (missing or "
                          f"corrupt)")
        params = np.zeros(5, dtype=np.int32)
        lib.ivfpq_params(h, _i32p(params))
        dim, nlist, m, ksub = (int(v) for v in params[:4])
        return cls(dim, nlist=nlist, m=m, nbits=int(ksub).bit_length() - 1,
                   _handle=h)

    def __len__(self) -> int:
        params = np.zeros(5, dtype=np.int32)
        self._lib.ivfpq_params(self._h, _i32p(params))
        return int(params[4])

    def search(
        self, queries: np.ndarray, k: int, nprobe: int = 8,
        allowed_bits: np.ndarray | None = None,
    ) -> tuple[np.ndarray, np.ndarray]:
        """ADC search. ``allowed_bits`` (optional, packed bitset — see
        ``HNSWIndex.search``): disallowed ids are skipped during the
        inverted-list scan."""
        q = _as_f32(queries)
        nq = q.shape[0]
        ids = np.zeros((nq, k), dtype=np.int32)
        scores = np.zeros((nq, k), dtype=np.float32)
        if allowed_bits is None:
            self._lib.ivfpq_search(
                self._h, _f32p(q), nq, k, nprobe, _i32p(ids), _f32p(scores)
            )
            return scores, ids
        bits = np.ascontiguousarray(allowed_bits, dtype=np.uint8)
        need = (len(self) + 7) // 8
        if bits.size < need:
            raise ValueError(
                f"allowed_bits holds {bits.size} bytes; index of "
                f"{len(self)} vectors needs >= {need}"
            )
        self._lib.ivfpq_search_filtered(
            self._h, _f32p(q), nq, k, nprobe,
            bits.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
            _i32p(ids), _f32p(scores),
        )
        return scores, ids
