"""Dynamic micro-batching for concurrent serving (latentrag_tpu.serving).

Unit tests for MicroBatcher coalescing/grouping/splitting/error fan-out,
plus an end-to-end HTTP test proving concurrent requests share device
calls while every caller still gets its own correct slice.
"""

import threading
import time

import numpy as np
import pytest

from latentrag_tpu.serving import MicroBatcher


def _fire(n, fn):
    """Run fn(i) on n threads; returns results list (exceptions re-raise)."""
    out = [None] * n
    errs = []

    def run(i):
        try:
            out[i] = fn(i)
        except Exception as e:  # noqa: BLE001
            errs.append(e)

    threads = [threading.Thread(target=run, args=(i,)) for i in range(n)]
    for t in threads:
        t.start()
    for t in threads:
        t.join(timeout=30)
    if errs:
        raise errs[0]
    return out


def test_microbatcher_coalesces_and_routes():
    calls = []

    def run_batch(queries, k, flt):
        calls.append(len(queries))
        time.sleep(0.01)  # give later submits time to pile up
        return [f"hit:{q}:{k}" for q in queries]

    b = MicroBatcher(run_batch, window_ms=50, max_batch=64)
    try:
        results = _fire(
            8, lambda i: b.submit([f"q{i}"], 5, None, None)
        )
        # every caller got exactly its own query back
        for i, r in enumerate(results):
            assert list(r) == [f"hit:q{i}:5"]
        # coalescing happened: strictly fewer device calls than requests
        assert len(calls) < 8
        # dispatched sizes are power-of-two buckets (compile-shape
        # discipline), so pads may raise the total
        assert sum(calls) >= 8
        assert all(c & (c - 1) == 0 for c in calls), calls
    finally:
        b.close()


def test_microbatcher_groups_by_k_and_filter_key():
    seen = []

    def run_batch(queries, k, flt):
        seen.append((k, tuple(queries), flt))
        return [(q, k, flt and flt.get("x")) for q in queries]

    b = MicroBatcher(run_batch, window_ms=40, max_batch=64)
    try:
        def call(i):
            if i % 2:
                return b.submit([f"a{i}"], 3, {"x": 1}, "fk1")
            return b.submit([f"b{i}"], 7, None, None)

        results = _fire(6, call)
        for i, r in enumerate(results):
            if i % 2:
                assert list(r) == [(f"a{i}", 3, 1)]
            else:
                assert list(r) == [(f"b{i}", 7, None)]
        # no batch ever mixed the two groups
        for k, qs, flt in seen:
            assert all(q.startswith("a" if k == 3 else "b") for q in qs)
    finally:
        b.close()


def test_microbatcher_groups_by_nprobe_and_passes_it_through():
    seen = []

    def run_batch(queries, k, flt, nprobe=None):
        seen.append((nprobe, tuple(queries)))
        return [(q, nprobe) for q in queries]

    b = MicroBatcher(run_batch, window_ms=40, max_batch=64)
    try:
        def call(i):
            if i % 2:
                return b.submit([f"p{i}"], 3, None, None, nprobe=16)
            return b.submit([f"d{i}"], 3, None, None)

        results = _fire(6, call)
        for i, r in enumerate(results):
            assert list(r) == [(f"{'p' if i % 2 else 'd'}{i}",
                                16 if i % 2 else None)]
        # nprobe requests never coalesced with default ones
        for nprobe, qs in seen:
            assert all(
                q.startswith("p" if nprobe == 16 else "d") for q in qs
            )
    finally:
        b.close()


def test_microbatcher_three_arg_callback_still_works():
    # callbacks written before the nprobe knob take (queries, k, flt);
    # the batcher only passes nprobe as a kwarg when one was submitted
    def run_batch(queries, k, flt):
        return list(queries)

    b = MicroBatcher(run_batch, window_ms=5, max_batch=8)
    try:
        assert b.submit(["x"], 2, None, None) == ["x"]
    finally:
        b.close()


def test_microbatcher_max_batch_flushes_early():
    calls = []

    def run_batch(queries, k, flt):
        calls.append(len(queries))
        return list(queries)

    b = MicroBatcher(run_batch, window_ms=3_000, max_batch=4)
    try:
        t0 = time.monotonic()
        _fire(8, lambda i: b.submit([f"q{i}"], 1, None, None))
        # the FUNCTIONAL property is the cap: no dispatched batch may
        # exceed max_batch even though 8 submits race in. Wall time is
        # only a hang guard — thread-scheduling skew can legitimately
        # strand a sub-max remainder group for one window (3 s), and a
        # loaded 1-core CI box (full suite + concurrent chip benchmarks)
        # adds seconds more, so the bound is deliberately loose.
        assert all(c <= 4 for c in calls)
        assert time.monotonic() - t0 < 30
    finally:
        b.close()


def test_microbatcher_propagates_errors_to_all_members():
    def run_batch(queries, k, flt):
        raise RuntimeError("kaboom")

    b = MicroBatcher(run_batch, window_ms=30, max_batch=64)
    try:
        with pytest.raises(RuntimeError, match="kaboom"):
            _fire(3, lambda i: b.submit([f"q{i}"], 2, None, None))
    finally:
        b.close()


def test_microbatcher_close_rejects_new_and_drains():
    def run_batch(queries, k, flt):
        return list(queries)

    b = MicroBatcher(run_batch, window_ms=5, max_batch=8)
    assert list(b.submit(["x"], 1, None, None)) == ["x"]
    b.close()
    with pytest.raises(RuntimeError):
        b.submit(["y"], 1, None, None)


def test_http_micro_batching_end_to_end(tmp_path):
    """Concurrent HTTP searches coalesce into fewer retriever.search calls
    while each response carries its own query's hits."""
    import json
    import sys
    import urllib.request
    from types import SimpleNamespace

    import serve
    from latentrag_tpu.utils import (
        apply_overrides,
        init_logger,
        load_config,
    )

    overrides = [
        "data.dataset=synthetic", "data.max_samples=24",
        "encoder.vocab_size=600", "encoder.dtype=float32",
        "encoder.hidden_dim=32", "encoder.num_layers=1",
        "encoder.num_heads=4", "encoder.mlp_dim=64",
        "retrieval.kernel=xla_exact", "retrieval.index_path=",
        f"paths.data_dir={tmp_path}/data",
        f"paths.checkpoints_dir={tmp_path}/ckpt",
        f"paths.logs_dir={tmp_path}/logs",
        f"logging.log_file={tmp_path}/logs/run.log",
    ]
    cfg = apply_overrides(load_config(None), overrides)
    loggers = init_logger(cfg.logging, stream=sys.stderr)
    args = SimpleNamespace(
        ae_type="none", generate=False, cold_boot=False,
        batch_window_ms=40.0, max_batch=64, http=0,
    )
    runner, compressor, retriever, mode = serve.boot(cfg, args, loggers)

    search_calls = []
    orig_search = retriever.search

    def spy(q_emb, k, **kw):
        search_calls.append(np.asarray(q_emb).shape[0])
        return orig_search(q_emb, k, **kw)

    retriever.search = spy
    handle = serve.make_handle(cfg, args, runner, compressor, retriever,
                               mode)
    server = serve.serve_http(handle, retriever, mode, "127.0.0.1", 0,
                              loggers)
    port = server.server_address[1]
    thread = threading.Thread(target=server.serve_forever, daemon=True)
    thread.start()

    def post(i):
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/search",
            data=json.dumps({"query": f"experiment {i}", "k": 2}).encode(),
            headers={"Content-Type": "application/json"}, method="POST",
        )
        with urllib.request.urlopen(req, timeout=30) as r:
            return json.loads(r.read())

    try:
        post(99)  # warm the jit so timing can't split the real burst
        search_calls.clear()
        results = _fire(6, post)
        for i, out in enumerate(results):
            assert out["results"][0]["query"] == f"experiment {i}"
            assert len(out["results"][0]["hits"]) == 2
        assert len(search_calls) < 6  # coalescing actually happened
        # coalesced bursts pad to power-of-two buckets so arbitrary burst
        # sizes reuse a handful of compiled programs (not one per size)
        assert all(c in (8, 16, 32, 64) for c in search_calls), search_calls
    finally:
        server.shutdown()
        server.server_close()
        handle.close()
        thread.join(timeout=10)


def test_microbatcher_oversized_single_submit_dispatches_alone():
    calls = []

    def run_batch(queries, k, flt):
        calls.append(len(queries))
        return list(queries)

    b = MicroBatcher(run_batch, window_ms=5, max_batch=4)
    try:
        out = b.submit([f"q{i}" for i in range(6)], 1, None, None)
        assert list(out) == [f"q{i}" for i in range(6)]
        assert calls == [6]  # an indivisible member may exceed the cap
    finally:
        b.close()


def test_microbatcher_cap_splits_but_serves_everyone():
    calls = []

    def run_batch(queries, k, flt):
        calls.append(len(queries))
        time.sleep(0.02)
        return list(queries)

    b = MicroBatcher(run_batch, window_ms=200, max_batch=3)
    try:
        results = _fire(10, lambda i: b.submit([f"q{i}"], 1, None, None))
        for i, r in enumerate(results):
            assert list(r) == [f"q{i}"]
        assert sum(calls) == 10
        assert all(c <= 3 for c in calls)  # the cap is a hard cap
    finally:
        b.close()


def test_microbatcher_pads_to_power_of_two_buckets():
    """Every dispatched batch is a power-of-two size (<= the pow2 ceil
    of max_batch): novel coalesced counts must not mint novel compiled
    shapes (r5 load test: a first-time size cost a 76 s remote
    compile mid-traffic)."""
    calls = []

    def run_batch(queries, k, flt):
        calls.append(len(queries))
        time.sleep(0.02)
        return [f"h:{q}" for q in queries]

    b = MicroBatcher(run_batch, window_ms=40, max_batch=64)
    try:
        results = _fire(
            3, lambda i: b.submit([f"q{i}"], 5, None, None)
        )
        for i, r in enumerate(results):
            assert list(r) == [f"h:q{i}"]
        assert all(c & (c - 1) == 0 for c in calls), calls
    finally:
        b.close()
