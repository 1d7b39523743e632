"""Wall-clock instrumentation: stopwatch spans, percentiles, StatsTracker.

Parity surface with the reference's homemade tracing (``utils/timing.py:8-26``
and ``retrieval/common.py:37-65``), adapted for async dispatch: jitted calls
return before the TPU finishes, so every timed device span must call
``jax.block_until_ready`` on its outputs — ``device_stopwatch`` does that.
"""

from __future__ import annotations

import time
from collections import defaultdict
from contextlib import contextmanager
from dataclasses import dataclass, field

import jax
import numpy as np


def force_completion(x) -> None:
    """Guarantee a device computation has finished.

    ``jax.block_until_ready`` is not reliable on every backend (the axon
    relay used in dev acknowledges dispatch, not completion — CLAUDE.md);
    fetching one element to host is. Cost: one tiny transfer.
    """
    try:
        for leaf in jax.tree_util.tree_leaves(x):
            data = (
                leaf.addressable_shards[0].data
                if hasattr(leaf, "addressable_shards")
                else leaf
            )
            # fetch ONE element (execution is in program order, so this
            # waits for everything enqueued before it)
            np.asarray(data[(0,) * getattr(data, "ndim", 0)])
    except Exception:
        jax.block_until_ready(x)


class Stopwatch:
    """Accumulates seconds per named key across ``span`` context entries."""

    def __init__(self) -> None:
        self.totals: dict[str, float] = defaultdict(float)
        self.counts: dict[str, int] = defaultdict(int)

    @contextmanager
    def span(self, key: str):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            self.totals[key] += time.perf_counter() - t0
            self.counts[key] += 1


@contextmanager
def stopwatch(store: dict, key: str):
    """Reference-compatible free function: accumulate seconds into store[key]."""
    t0 = time.perf_counter()
    try:
        yield
    finally:
        store[key] = store.get(key, 0.0) + (time.perf_counter() - t0)


@contextmanager
def device_stopwatch(store: dict, key: str, outputs: list):
    """Time a device computation correctly: block on everything appended to
    ``outputs`` before stopping the clock."""
    t0 = time.perf_counter()
    try:
        yield
    finally:
        if outputs:
            force_completion(outputs)
        store[key] = store.get(key, 0.0) + (time.perf_counter() - t0)


def percentiles(values, qs=(50, 95)) -> dict[str, float]:
    """Empirical percentiles of a sample; {} for empty input."""
    arr = np.asarray(list(values), dtype=np.float64)
    if arr.size == 0:
        return {}
    return {f"p{q}": float(np.percentile(arr, q)) for q in qs}


@dataclass
class StatsTracker:
    """Build/search accounting with reset semantics (per-retriever).

    Mirrors the reference ``StatsTracker`` (``retrieval/common.py:37-65``):
    cumulative build seconds, cumulative search seconds, number of search
    calls, and a per-query latency sample in milliseconds.
    """

    build_time_s: float = 0.0
    search_time_s: float = 0.0
    search_calls: int = 0
    per_query_ms: list = field(default_factory=list)

    def add_build(self, seconds: float) -> None:
        self.build_time_s += seconds

    def add_search_batch(self, seconds: float, n_queries: int) -> None:
        self.search_time_s += seconds
        self.search_calls += 1
        if n_queries > 0:
            self.per_query_ms.extend([seconds * 1000.0 / n_queries] * n_queries)

    def get(self, reset: bool = False) -> dict:
        out = {
            "build_time_s": self.build_time_s,
            "search_time_s": self.search_time_s,
            "search_calls": self.search_calls,
            "per_query_ms": list(self.per_query_ms),
        }
        out.update(percentiles(self.per_query_ms))
        if reset:
            self.reset()
        return out

    def reset(self) -> None:
        self.build_time_s = 0.0
        self.search_time_s = 0.0
        self.search_calls = 0
        self.per_query_ms = []
