"""ctypes bindings for the C++ WordPiece fast path.

The hot ``encode_batch`` loop lives in ``native/latentrag_native.cpp``
(``wp_*`` exports) behind the same shared library / ABI gate as the ANN
tiers. Semantics: exact parity with the Python tokenizer for pure-ASCII
text (differentially tested); non-ASCII rows are flagged back to the
caller for the Python path. See ``data/tokenizer.py`` for the contract.
"""

from __future__ import annotations

import ctypes

import numpy as np

_configured = None


def get_lib():
    """The shared library with wp_* argtypes configured (once)."""
    global _configured
    if _configured is not None:
        return _configured
    from ..retrieval.ann import _load_library

    lib = _load_library()
    llp = ctypes.POINTER(ctypes.c_longlong)
    lib.wp_create.restype = ctypes.c_void_p
    lib.wp_create.argtypes = [
        ctypes.c_char_p, llp, ctypes.c_int,
        ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int,
        ctypes.c_int, ctypes.c_int,
    ]
    lib.wp_free.argtypes = [ctypes.c_void_p]
    lib.wp_encode_offsets.restype = ctypes.c_int
    lib.wp_encode_offsets.argtypes = [
        ctypes.c_void_p, ctypes.c_char_p, ctypes.c_longlong,
        ctypes.c_int, ctypes.c_int,
        ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int),
        ctypes.POINTER(ctypes.c_int), ctypes.c_int,
    ]
    lib.wp_encode_batch.restype = None
    lib.wp_encode_batch.argtypes = [
        ctypes.c_void_p, ctypes.c_char_p, llp, ctypes.c_int, ctypes.c_int,
        ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int),
        ctypes.POINTER(ctypes.c_uint8), ctypes.c_int,
    ]
    _configured = lib
    return lib


def create_handle(tok) -> int:
    """Build a C++ vocab handle from a ``WordPieceTokenizer``.

    Requires an id-dense vocab (ids 0..n-1 — true for all factory paths);
    raises otherwise so the caller falls back to Python.
    """
    lib = get_lib()
    n = len(tok.vocab)
    tokens_by_id: list[str | None] = [None] * n
    for t, i in tok.vocab.items():
        if not 0 <= i < n or tokens_by_id[i] is not None:
            raise ValueError("vocab ids not dense; native path disabled")
        tokens_by_id[i] = t
    # n unique in-range ids over n slots => every slot filled (pigeonhole)
    data = [t.encode("utf-8") for t in tokens_by_id]  # type: ignore[union-attr]
    offs = np.zeros(n + 1, dtype=np.int64)
    np.cumsum([len(d) for d in data], out=offs[1:])
    blob = b"".join(data)
    h = lib.wp_create(
        blob, offs.ctypes.data_as(ctypes.POINTER(ctypes.c_longlong)), n,
        tok.pad_id, tok.unk_id, tok.cls_id, tok.sep_id,
        1 if tok.lowercase else 0, tok.max_word_chars,
    )
    if not h:
        raise RuntimeError("wp_create returned NULL")
    return h


def free_handle(h) -> None:
    get_lib().wp_free(h)


def encode_offsets(h, text: str, add_specials: bool, max_length):
    """(ids, starts, ends) via C++, or None when the text has non-ASCII
    bytes (caller uses the Python path). Raises only on binding errors."""
    lib = get_lib()
    data = text.encode("utf-8")
    cap = (max_length if max_length else len(data) + 2) + 2
    ip = ctypes.POINTER(ctypes.c_int)
    while True:
        ids = np.empty(cap, dtype=np.int32)
        starts = np.empty(cap, dtype=np.int32)
        ends = np.empty(cap, dtype=np.int32)
        n = lib.wp_encode_offsets(
            h, data, len(data), 1 if add_specials else 0,
            max_length or 0,
            ids.ctypes.data_as(ip), starts.ctypes.data_as(ip),
            ends.ctypes.data_as(ip), cap,
        )
        if n == -1:
            return None
        if n == -2:  # cap too small (cannot normally happen: tokens<=chars)
            cap *= 2
            continue
        return ids[:n], starts[:n], ends[:n]
