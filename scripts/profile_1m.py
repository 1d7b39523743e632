"""1M-corpus roofline experiment on the real chip (VERDICT r1 item 3).

Compares block sizes for approx_topk at 1024q x 1M x 64, plus a
matmul+row-max floor (the compute lower bound: same FLOPs, trivial
reduction, no top-k), to find where the single-block path loses 2x vs the
8.8M blocked path. Keeps the program count low: each distinct shape is a
~30-60s remote compile (CLAUDE.md).

  python scripts/profile_1m.py [--n 1048576 --queries 1024]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax

if os.environ.get("JAX_PLATFORMS", "").startswith("cpu"):
    jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp

from latentrag_tpu.ops import approx_topk, l2_normalize
from latentrag_tpu.utils.timing import force_completion as sync


def bench(fn, reps=10):
    sync(fn())
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn()
    sync(out)
    return (time.perf_counter() - t0) / reps


def main(argv=None) -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--n", type=int, default=1_048_576)
    p.add_argument("--queries", type=int, default=1024)
    p.add_argument("--d", type=int, default=64)
    p.add_argument("--k", type=int, default=10)
    p.add_argument("--reps", type=int, default=10)
    p.add_argument("--blocks", type=int, nargs="*",
                   default=[131072, 262144, 524288, 1048576])
    args = p.parse_args(argv)

    on_tpu = jax.default_backend() != "cpu"
    dtype = jnp.bfloat16 if on_tpu else jnp.float32

    @jax.jit
    def gen(key):
        c = l2_normalize(
            jax.random.normal(key, (args.n, args.d), jnp.float32)
        ).astype(dtype)
        q = l2_normalize(
            jax.random.normal(
                jax.random.fold_in(key, 1), (args.queries, args.d),
                jnp.float32,
            )
        ).astype(dtype)
        return c, q

    c, q = gen(jax.random.PRNGKey(0))
    sync(c)

    flops = 2.0 * args.queries * args.n * args.d

    # floor: same matmul, trivial fused reduction, no top-k machinery
    @jax.jit
    def mm_max(q, c):
        dots = jax.lax.dot_general(
            q, c, dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        return jnp.max(dots, axis=1)

    dt = bench(lambda: mm_max(q, c), args.reps)
    print(f"matmul+rowmax floor: {dt * 1e3:7.3f} ms  "
          f"{flops / dt / 1e12:6.1f} TFLOP/s")

    for bs in args.blocks:
        f = lambda: approx_topk(q, c, k=args.k, block_size=bs)
        dt = bench(f, args.reps)
        nb = (args.n + bs - 1) // bs
        print(f"approx_topk bs={bs:>8} ({nb:>2} blocks): {dt * 1e3:7.3f} ms "
              f" {flops / dt / 1e12:6.1f} TFLOP/s "
              f" {args.queries / dt:>9,.0f} QPS")
    return 0


if __name__ == "__main__":
    sys.exit(main())
