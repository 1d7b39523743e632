"""Backend comparison sweep: every dense scoring backend on one corpus.

Measures latency and recall-vs-exact-oracle for: xla (approx_max_k),
xla_exact (top_k, the oracle), pallas fold, int8 (SQ8) — plus the native
HNSW tier on the host side. Writes a markdown table to stdout/--out.

  python scripts/backend_sweep.py --n 1048576 --queries 1024 --out docs/BACKENDS.md
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax
import jax.numpy as jnp

from latentrag_tpu.ops import approx_topk, exact_topk, l2_normalize, pallas_topk
from latentrag_tpu.ops.quantization import sq8_quantize, sq8_topk
from latentrag_tpu.utils.timing import force_completion as sync


def bench(fn, reps):
    sync(fn()[0])
    t0 = time.perf_counter()
    outs = [fn() for _ in range(reps)]
    sync(outs[-1][0])
    return (time.perf_counter() - t0) / reps


def recall_vs(i_ref, i_got, k):
    i_ref, i_got = np.asarray(i_ref), np.asarray(i_got)
    return float(
        np.mean(
            [
                len(set(i_ref[r]) & set(i_got[r])) / k
                for r in range(i_ref.shape[0])
            ]
        )
    )


def main(argv=None) -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--n", type=int, default=1_048_576)
    p.add_argument("--d", type=int, default=64)
    p.add_argument("--queries", type=int, default=1024)
    p.add_argument("--k", type=int, default=10)
    p.add_argument("--reps", type=int, default=10)
    p.add_argument("--out", default=None)
    p.add_argument("--skip", nargs="*", default=[],
                   help="backends to skip (e.g. pallas_fold hnsw)")
    args = p.parse_args(argv)

    on_tpu = jax.default_backend() == "tpu"
    dtype = jnp.bfloat16 if on_tpu else jnp.float32

    @jax.jit
    def gen_c(key):
        return l2_normalize(
            jax.random.normal(key, (args.n, args.d), jnp.float32)
        ).astype(dtype)

    c = gen_c(jax.random.PRNGKey(0))
    sync(c)
    q = l2_normalize(
        jax.random.normal(jax.random.PRNGKey(1), (args.queries, args.d),
                          jnp.float32)
    ).astype(dtype)
    sync(q)

    # oracle (exact) — also a timed backend
    t_exact = bench(
        lambda: exact_topk(q, c, k=args.k, metric="cosine",
                           block_size=65536),
        max(args.reps // 2, 3),
    )
    _, i_ref = exact_topk(q, c, k=args.k, metric="cosine", block_size=65536)
    i_ref_np = np.asarray(i_ref)

    rows = [("xla_exact (oracle)", t_exact, 1.0)]

    if "xla" not in args.skip:
        dt = bench(lambda: approx_topk(q, c, k=args.k, metric="cosine"),
                   args.reps)
        _, i1 = approx_topk(q, c, k=args.k, metric="cosine")
        rows.append(("xla approx_max_k", dt, recall_vs(i_ref_np, i1, args.k)))

    if "int8" not in args.skip:
        codes, scale = sq8_quantize(c)
        sync(codes)
        dt = bench(lambda: sq8_topk(q, codes, scale, k=args.k), args.reps)
        _, i1 = sq8_topk(q, codes, scale, k=args.k)
        rows.append(("int8 SQ8", dt, recall_vs(i_ref_np, i1, args.k)))

    if "pallas_fold" not in args.skip:
        try:
            dt = bench(
                lambda: pallas_topk(q, c, k=args.k, metric="cosine",
                                    mode="fold"),
                max(args.reps // 2, 3),
            )
            _, i1 = pallas_topk(q, c, k=args.k, metric="cosine", mode="fold")
            rows.append(("pallas fold", dt, recall_vs(i_ref_np, i1, args.k)))
        except Exception as e:
            print(f"[sweep] pallas fold failed: {e}", file=sys.stderr)

    if "hnsw" not in args.skip and args.n <= 200_000:
        from latentrag_tpu.retrieval.ann import HNSWIndex

        c_host = np.asarray(c, dtype=np.float32)
        q_host = np.asarray(q, dtype=np.float32)
        ix = HNSWIndex(args.d, M=32, ef_construction=200, ef_search=64)
        t0 = time.perf_counter()
        ix.add(c_host)
        build_s = time.perf_counter() - t0
        t0 = time.perf_counter()
        _, i1 = ix.search(q_host, args.k)
        dt = time.perf_counter() - t0
        rows.append(
            (f"hnsw C++ (build {build_s:.0f}s)", dt,
             recall_vs(i_ref_np, i1, args.k))
        )

    lines = [
        f"# Dense backend sweep — {args.n:,} x {args.d}, "
        f"{args.queries} queries, k={args.k}, backend `"
        f"{jax.default_backend()}`",
        "",
        "| backend | ms/batch | QPS | recall vs exact |",
        "|---|---|---|---|",
    ]
    for name, dt, rec in rows:
        lines.append(
            f"| {name} | {dt * 1e3:.2f} | {args.queries / dt:,.0f} "
            f"| {rec:.4f} |"
        )
    report = "\n".join(lines)
    print(report)
    if args.out:
        os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
        with open(args.out, "w") as f:
            f.write(report + "\n")
    return 0


if __name__ == "__main__":
    sys.exit(main())
