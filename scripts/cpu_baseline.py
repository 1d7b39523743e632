"""Measured CPU brute-force baseline on THIS host (VERDICT r1 item 3).

Reimplements the reference's exact search semantics
(``/root/reference/retrieval/bruteforce.py:58-83``: L2-normalize, cosine =
Q @ E.T, ``torch.topk``) with torch on CPU, at the reference CSV config
(315 x 64, 2000 queries) and at 1M x 64, in BOTH calling patterns:

  * per-query loop — how the reference pipeline actually drives search
    (one query per ``search`` call, ``main.py:270``);
  * fully batched — the strongest CPU showing.

This grounds bench.py's ``vs_cpu`` ratio in an apples-to-apples local
measurement instead of the inherited RTX-4060 CSV timings.

  python scripts/cpu_baseline.py --out logs/cpu_baseline.json
"""

from __future__ import annotations

import argparse
import json
import os
import platform
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main(argv=None) -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--out", default=None)
    p.add_argument("--reps", type=int, default=3)
    p.add_argument("--skip-1m", action="store_true")
    args = p.parse_args(argv)

    import torch

    torch.manual_seed(0)
    results = {"host": platform.processor() or platform.machine(),
               "cpu_count": os.cpu_count(),
               "torch_threads": torch.get_num_threads()}

    def normalize(x):
        return torch.nn.functional.normalize(x, dim=-1)

    def run(n, d, nq, k, reps, per_query_queries=None):
        corpus = normalize(torch.randn(n, d))
        queries = normalize(torch.randn(nq, d))
        # batched: one matmul + one topk
        with torch.no_grad():
            _ = torch.topk(queries[:8] @ corpus.T, k, dim=1)  # warm
            t0 = time.perf_counter()
            for _ in range(reps):
                scores = queries @ corpus.T
                torch.topk(scores, k, dim=1)
            batched_s = (time.perf_counter() - t0) / reps
        out = {
            "n": n, "d": d, "queries": nq, "k": k,
            "batched_ms": batched_s * 1e3,
            "batched_qps": nq / batched_s,
        }
        # per-query loop (the reference's actual pattern)
        if per_query_queries:
            m = per_query_queries
            with torch.no_grad():
                t0 = time.perf_counter()
                for i in range(m):
                    q = queries[i : i + 1]
                    torch.topk(q @ corpus.T, k, dim=1)
                loop_s = time.perf_counter() - t0
            out["per_query_ms"] = loop_s / m * 1e3
            out["per_query_qps"] = m / loop_s
        return out

    results["ref_config_315"] = run(315, 64, 2000, 10, max(args.reps, 5),
                                    per_query_queries=2000)
    print("[cpu] 315x64:", results["ref_config_315"], file=sys.stderr)
    if not args.skip_1m:
        results["corpus_1m"] = run(1_048_576, 64, 1024, 10, args.reps,
                                   per_query_queries=32)
        print("[cpu] 1Mx64:", results["corpus_1m"], file=sys.stderr)

    print(json.dumps(results, indent=2))
    if args.out:
        os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
        with open(args.out, "w") as f:
            json.dump(results, f, indent=2)
    return 0


if __name__ == "__main__":
    sys.exit(main())
