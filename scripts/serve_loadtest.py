"""Concurrent-client load test against the real serve.py HTTP server.

VERDICT r4 weak-5: DEPLOYMENT.md had per-batch device numbers but no
measured latency DISTRIBUTION under concurrent load, and the
``--batch-window-ms`` knob shipped with no operating curve. This script
produces that curve: for each batch-window setting it boots serve.py as
a real subprocess (own process, own compile cache, HTTP through the
loopback — everything a client sees), then drives closed-loop client
threads at several concurrency levels and reports p50/p95/p99 latency +
sustained QPS per cell.

Each client loops single-query ``POST /search`` (k=10) for ``--duration``
seconds — the worst case for the microbatcher (every request is its own
device call unless the window coalesces it). Optional variant rounds
measure ``filter`` and batched multi-query requests at one concurrency.

  python scripts/serve_loadtest.py                       # chip, default cfg
  JAX_PLATFORMS=cpu python scripts/serve_loadtest.py \
      --windows 0 10 --concurrency 1 8 --duration 5      # CPU smoke

Writes JSON to --json-out and a markdown table to stdout (paste into
docs/DEPLOYMENT.md). The server is cold-booted once per window over
``data.dataset=synthetic`` docs (or any --set override you pass through).
"""

from __future__ import annotations

import argparse
import json
import os
import signal
import socket
import subprocess
import sys
import threading
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

WORDS = ("galaxy telescope protein enzyme river treaty engine harvest "
         "voltage orbit census drought fossil pigment glacier sonnet "
         "circuit tundra mineral lattice").split()


def _free_port() -> int:
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def _post(port: int, path: str, obj: dict, timeout: float = 120.0) -> dict:
    req = urllib.request.Request(
        f"http://127.0.0.1:{port}{path}",
        data=json.dumps(obj).encode(),
        headers={"Content-Type": "application/json"},
    )
    with urllib.request.urlopen(req, timeout=timeout) as r:
        return json.loads(r.read())


def _wait_healthy(port: int, proc, budget_s: float) -> None:
    deadline = time.time() + budget_s
    while time.time() < deadline:
        if proc.poll() is not None:
            raise RuntimeError(
                f"server exited rc={proc.returncode} before healthy"
            )
        try:
            with urllib.request.urlopen(
                f"http://127.0.0.1:{port}/healthz", timeout=5
            ) as r:
                if r.status == 200:
                    return
        except Exception:
            time.sleep(2.0)
    raise TimeoutError(f"server not healthy within {budget_s}s")


def _query(i: int) -> str:
    w = WORDS
    return (f"what does document {i % 997} say about "
            f"{w[i % len(w)]} and {w[(i * 7 + 3) % len(w)]}")


def _pct(lat: list[float], q: float) -> float:
    lat = sorted(lat)
    if not lat:
        return float("nan")
    idx = min(len(lat) - 1, int(round(q * (len(lat) - 1))))
    return lat[idx]


def run_cell(port: int, conc: int, duration: float, payload_fn):
    """Closed-loop: ``conc`` threads each re-request for ``duration`` s.
    Returns (latencies_ms, completed, errors, wall_s)."""
    lat: list[float] = []
    errs = [0]
    lock = threading.Lock()
    stop = time.time() + duration

    def worker(tid: int):
        i = tid * 10_000
        while time.time() < stop:
            i += 1
            t0 = time.perf_counter()
            try:
                _post(port, "/search", payload_fn(i))
                dt = (time.perf_counter() - t0) * 1e3
                with lock:
                    lat.append(dt)
            except Exception:
                with lock:
                    errs[0] += 1

    t_start = time.time()
    threads = [threading.Thread(target=worker, args=(t,), daemon=True)
               for t in range(conc)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    return lat, len(lat), errs[0], time.time() - t_start


def main(argv=None) -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--windows", type=float, nargs="+",
                   default=[0.0, 2.0, 5.0, 10.0])
    p.add_argument("--concurrency", type=int, nargs="+",
                   default=[1, 4, 16, 64])
    p.add_argument("--duration", type=float, default=20.0)
    p.add_argument("--docs", type=int, default=2000)
    p.add_argument("--k", type=int, default=10)
    p.add_argument("--ae_type", default="none")
    p.add_argument("--boot-budget", type=float, default=900.0)
    p.add_argument("--json-out", default="logs/serve_loadtest.json")
    p.add_argument("--workdir", default="/tmp/latentrag_loadtest")
    p.add_argument("--variants", action="store_true",
                   help="add filtered + batched-request rounds at one "
                        "concurrency per window")
    p.add_argument("--set", nargs="*", default=[], metavar="a.b=v",
                   help="extra config overrides passed through to serve.py")
    args = p.parse_args(argv)

    os.makedirs(args.workdir, exist_ok=True)
    base_set = [
        "data.dataset=synthetic", f"data.max_samples={args.docs}",
        "encoder.vocab_size=4000", "encoder.hidden_dim=128",
        "encoder.num_layers=2", "encoder.num_heads=4",
        "encoder.mlp_dim=256", "encoder.max_length=64",
        f"retrieval.index_path={args.workdir}/index",
        f"retrieval.top_k={args.k}",
        f"paths.data_dir={args.workdir}/data",
        f"paths.checkpoints_dir={args.workdir}/ckpt",
        f"paths.logs_dir={args.workdir}/logs",
        f"logging.log_file={args.workdir}/logs/serve.log",
    ] + args.set

    out = {"docs": args.docs, "k": args.k, "duration_s": args.duration,
           "ae_type": args.ae_type, "overrides": args.set, "cells": []}
    env = dict(os.environ)

    for window in args.windows:
        port = _free_port()
        cmd = [sys.executable, os.path.join(ROOT, "serve.py"),
               "--ae_type", args.ae_type, "--http", str(port),
               "--batch-window-ms", str(window), "--set"] + base_set
        print(f"[load] boot window={window}ms port={port}", file=sys.stderr)
        proc = subprocess.Popen(
            cmd, cwd=ROOT, env=env,
            stdout=subprocess.DEVNULL, stderr=subprocess.DEVNULL,
            start_new_session=True,
        )
        try:
            t0 = time.time()
            _wait_healthy(port, proc, args.boot_budget)
            boot_s = time.time() - t0
            print(f"[load] healthy in {boot_s:.1f}s", file=sys.stderr)
            # warm every program this test will hit (single + filtered)
            for i in range(8):
                _post(port, "/search", {"query": _query(i), "k": args.k})
            backend = _post(port, "/stats", {"stats": True})

            for conc in args.concurrency:
                lat, done, errors, wall = run_cell(
                    port, conc, args.duration,
                    lambda i: {"query": _query(i), "k": args.k},
                )
                cell = {
                    "window_ms": window, "concurrency": conc,
                    "requests": done, "errors": errors,
                    "qps": round(done / wall, 1),
                    "p50_ms": round(_pct(lat, 0.50), 1),
                    "p95_ms": round(_pct(lat, 0.95), 1),
                    "p99_ms": round(_pct(lat, 0.99), 1),
                }
                out["cells"].append(cell)
                print(f"[load] w={window}ms c={conc}: {cell['qps']} QPS "
                      f"p50={cell['p50_ms']} p95={cell['p95_ms']} "
                      f"p99={cell['p99_ms']} err={errors}",
                      file=sys.stderr)

            if args.variants:
                conc = max(args.concurrency)
                for name, fn in (
                    ("filtered", lambda i: {
                        "query": _query(i), "k": args.k,
                        "filter": {"exclude_doc_ids": [i % args.docs]},
                    }),
                    ("batch8", lambda i: {
                        "queries": [_query(i * 8 + j) for j in range(8)],
                        "k": args.k,
                    }),
                ):
                    for i in range(4):  # warm the variant's program
                        _post(port, "/search", fn(i))
                    lat, done, errors, wall = run_cell(
                        port, conc, args.duration, fn)
                    mult = 8 if name == "batch8" else 1
                    cell = {
                        "window_ms": window, "concurrency": conc,
                        "variant": name, "requests": done,
                        "errors": errors,
                        "qps": round(done * mult / wall, 1),
                        "p50_ms": round(_pct(lat, 0.50), 1),
                        "p95_ms": round(_pct(lat, 0.95), 1),
                        "p99_ms": round(_pct(lat, 0.99), 1),
                    }
                    out["cells"].append(cell)
                    print(f"[load] w={window}ms c={conc} {name}: "
                          f"{cell['qps']} QPS p50={cell['p50_ms']} "
                          f"p95={cell['p95_ms']}", file=sys.stderr)
            out.setdefault("boots", []).append(
                {"window_ms": window, "boot_s": round(boot_s, 1),
                 "stats": backend.get("index", backend)})
        finally:
            try:
                os.killpg(proc.pid, signal.SIGTERM)
            except ProcessLookupError:
                pass
            proc.wait(timeout=30)

    # markdown operating curve
    lines = ["| window (ms) | clients | QPS | p50 (ms) | p95 | p99 |",
             "|---|---|---|---|---|---|"]
    for c in out["cells"]:
        tag = f"{c['concurrency']}" + (
            f" ({c['variant']})" if "variant" in c else "")
        lines.append(
            f"| {c['window_ms']:g} | {tag} | {c['qps']} | {c['p50_ms']} "
            f"| {c['p95_ms']} | {c['p99_ms']} |")
    print("\n".join(lines))
    if args.json_out:
        os.makedirs(os.path.dirname(args.json_out) or ".", exist_ok=True)
        with open(args.json_out, "w") as f:
            json.dump(out, f, indent=1)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
