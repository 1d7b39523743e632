"""Filtered-search overhead on the real chip (round-4 filtering feature).

Measures the production 1M-corpus operating point (1024q x 1M x 64 bf16,
k=10, rt=0.99 — the shipped auto policy) with and without in-kernel row
masks at several selectivities. The mask is a [N] bool the kernels fold
into the score matrix as a select; XLA fuses it into the matmul consumer,
so the expected cost is ~one extra HBM read of N bytes (~1.6% of the
corpus bytes at d=64 bf16) — this script pins that number.

Also verifies on-chip correctness: every returned id must satisfy the
mask (subset discipline), with sentinel rows allowed when k exceeds the
eligible count.

  python scripts/filter_bench.py            # real chip
  JAX_PLATFORMS=cpu python scripts/filter_bench.py --n 100000  # smoke
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

import jax

if os.environ.get("JAX_PLATFORMS", "").startswith("cpu"):
    jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np

from bench import bench_call, bench_device, sync
from latentrag_tpu.ops import approx_topk


def _normed(seed: int, n: int, d: int, dtype):
    x = jax.random.normal(jax.random.PRNGKey(seed), (n, d), jnp.float32)
    x = x / jnp.linalg.norm(x, axis=1, keepdims=True)
    return x.astype(dtype)


def main(argv=None) -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--n", type=int, default=1_048_576)
    p.add_argument("--queries", type=int, default=1024)
    p.add_argument("--d", type=int, default=64)
    p.add_argument("--k", type=int, default=10)
    p.add_argument("--rt", type=float, default=0.99)
    args = p.parse_args(argv)

    on_tpu = jax.default_backend() != "cpu"
    dtype = jnp.bfloat16
    corpus = _normed(2, args.n, args.d, dtype)
    queries = _normed(1, args.queries, args.d, dtype)
    key = jax.random.PRNGKey(7)

    rows = {}
    for label, sel in (("unfiltered", None), ("sel50", 0.5),
                       ("sel10", 0.1), ("sel1", 0.01)):
        mask = (
            None if sel is None
            else jax.random.bernoulli(jax.random.fold_in(key, int(sel * 100)),
                                      sel, (args.n,))
        )

        def search(q, c, _m=mask):
            return approx_topk(q, c, k=args.k, metric="cosine",
                               recall_target=args.rt, mask=_m)

        # correctness: subset discipline on the real kernel output
        s_chk, i_chk = search(queries[:32], corpus)
        if mask is not None:
            ids = np.asarray(i_chk)
            ok_rows = np.asarray(s_chk) > -1e38
            allowed = np.asarray(mask)[np.clip(ids, 0, args.n - 1)]
            assert bool(np.all(allowed[ok_rows])), f"{label}: filter leak"
        sync(s_chk)

        if on_tpu:
            dt, _, _ = bench_device(search, queries, corpus,
                                 r_small=8, r_big=220)
        else:
            dt = bench_call(lambda: search(queries, corpus), reps=3, warm=1)
        rows[label] = dt
        base = rows.get("unfiltered", dt)
        print(
            f"[filter-bench] {label:>10}: {dt * 1e3:.3f} ms/batch "
            f"({args.queries / dt:,.0f} QPS, "
            f"{(dt / base - 1) * 100:+.1f}% vs unfiltered)",
            file=sys.stderr,
        )

    print(json.dumps({
        "n": args.n, "queries": args.queries, "k": args.k, "rt": args.rt,
        "backend": jax.default_backend(),
        "ms_per_batch": {k: v * 1e3 for k, v in rows.items()},
        "overhead_pct": {
            k: (v / rows["unfiltered"] - 1) * 100
            for k, v in rows.items() if k != "unfiltered"
        },
    }))
    return 0


if __name__ == "__main__":
    sys.exit(main())
