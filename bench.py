"""Headline benchmark: latent top-k retrieval throughput on TPU.

Reproduces the reference's measured configuration (BASELINE.md: SQuAD-scale
315-vector 64-d latent corpus, k=10, 2000 queries, cosine/IP — FAISS-GPU on
an RTX 4060 reached ~248.6k QPS by looping single-query calls) with the
TPU-native batched path, and prints ONE JSON line:

    {"metric": "latent_topk_qps", "value": ..., "unit": "qps",
     "vs_baseline": ...}

vs_baseline = measured QPS / 248,649 (mean of the reference's two runs,
``logs/benchmarks/experiments.csv:2-3`` — 1000/p50_ms). Secondary numbers
(1M-corpus throughput, index build) go to stderr.

Timing notes: through the axon relay ``block_until_ready`` does not wait, so
completion is forced by fetching a scalar; per-call dispatch overhead is
amortised over many enqueued batches.
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np

import jax
import jax.numpy as jnp

from latentrag_tpu.ops import approx_topk, exact_topk, l2_normalize

REF_QPS = 248_649.0  # reference baseline (BASELINE.md)

_fetch = jax.jit(lambda v: v.ravel()[0].astype(jnp.float32))


def sync(x) -> None:
    np.asarray(_fetch(x))


def bench_call(fn, reps: int = 20) -> float:
    sync(fn()[0])  # warmup / compile
    t0 = time.perf_counter()
    outs = [fn() for _ in range(reps)]
    sync(outs[-1][0])
    return (time.perf_counter() - t0) / reps


def _make_data(key, n, d, dtype):
    """Generate normalized vectors ON DEVICE (host->device transfers crawl
    through the relay tunnel; device RNG is effectively free)."""
    x = jax.random.normal(jax.random.PRNGKey(key), (n, d), jnp.float32)
    return l2_normalize(x).astype(dtype)


def main() -> int:
    on_tpu = jax.default_backend() == "tpu"
    backend = approx_topk if on_tpu else exact_topk
    dtype = jnp.bfloat16 if on_tpu else jnp.float32

    # --- headline: the reference's own configuration, batched -------------
    n, d, nq, k = 315, 64, 2000, 10
    corpus = _make_data(0, n, d, dtype)
    queries = _make_data(1, nq, d, dtype)

    dt = bench_call(lambda: backend(queries, corpus, k=k, metric="cosine"))
    qps = nq / dt
    print(
        f"[bench] ref-config ({nq}q x {n}x{d}, k={k}): "
        f"{dt * 1e3:.3f} ms/batch -> {qps:,.0f} QPS",
        file=sys.stderr,
    )

    # --- secondary: 1M-vector latent corpus ------------------------------
    try:
        n2 = 1_048_576
        corpus2 = _make_data(2, n2, d, dtype)
        q2 = queries[:1024]
        dt2 = bench_call(
            lambda: backend(q2, corpus2, k=k, metric="cosine"), reps=10
        )
        print(
            f"[bench] 1M-corpus (1024q x {n2}x{d}): "
            f"{dt2 * 1e3:.3f} ms/batch -> {1024 / dt2:,.0f} QPS",
            file=sys.stderr,
        )
    except Exception as e:  # secondary only — never break the headline
        print(f"[bench] 1M-corpus benchmark skipped: {e}", file=sys.stderr)

    print(
        json.dumps(
            {
                "metric": "latent_topk_qps",
                "value": round(qps, 1),
                "unit": "qps",
                "vs_baseline": round(qps / REF_QPS, 3),
            }
        )
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())
