"""Packed sign-bit stage-1 shootout: XLA row-major vs XLA transposed vs
the fused Pallas kernel.

VERDICT r4 weak-3: the exhaustive packed sweep is unpack-rate-bound
(dense.py packed tiers; docs/ROOFLINE.md), and Mosaic was never tried
on it.  This script measures the three candidates with the in-program
methodology (bench_device — dispatch/ramp cancel exactly):

  binary_topk      [N, W] row-major store, ``binary_unpack`` (status quo)
  binary_topk_t    [W, N] transposed store, lane-major unpack, same XLA path
  pallas_binary    [W, N] transposed store, unpack fused tile-wise in VMEM

All three share the estimator dot(bf16(q), sign(c)) — recall vs the
row-major path is asserted, not measured.  Effective TOP/s counts the
2*Q*N*d sign-dot ops.

  python scripts/packed_bench.py --n 8798086 --queries 1024
  JAX_PLATFORMS=cpu python scripts/packed_bench.py --n 200000 --queries 64
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

if os.environ.get("JAX_PLATFORMS", "").startswith("cpu"):
    jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np

from bench import bench_device
from latentrag_tpu.ops.binary import binary_topk, binary_topk_t
from latentrag_tpu.ops.pallas_topk import pallas_binary_topk


def main(argv=None) -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--n", type=int, default=8_798_086)
    p.add_argument("--d", type=int, default=64)
    p.add_argument("--k", type=int, default=10)
    p.add_argument("--queries", type=int, nargs="+", default=[256, 1024])
    p.add_argument("--block-n", type=int, default=4096,
                   help="pallas corpus tile (lanes)")
    p.add_argument("--block-q", type=int, default=128)
    p.add_argument("--r", type=int, nargs=2, default=[8, 40],
                   metavar=("R_SMALL", "R_BIG"))
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--skip", nargs="*", default=[],
                   help="paths to skip (rowmajor / transposed / pallas)")
    args = p.parse_args(argv)

    backend = jax.default_backend()
    if backend != "cpu":
        from bench import _relay_alive

        if not _relay_alive(300.0):
            print("[packed] relay dark — aborting", file=sys.stderr)
            return 2

    key = jax.random.PRNGKey(args.seed)
    kc, kq = jax.random.split(key)
    # generate ON device (CLAUDE.md: host->device crawls), pack, drop fp
    w = -(-args.d // 32)
    n_pad = -(-args.n // 4096) * 4096

    @jax.jit
    def gen_packed(k1):
        from latentrag_tpu.ops.binary import binary_quantize

        x = jax.random.normal(k1, (n_pad, args.d), jnp.float32)
        return binary_quantize(x[: args.n])

    pk = gen_packed(kc)
    pk.block_until_ready()
    pk_t = jnp.asarray(pk).T.copy() if backend == "cpu" else jnp.transpose(pk)
    pk_t = jax.jit(lambda a: a)(pk_t)  # materialize the transposed layout
    pk_t.block_until_ready()
    print(f"[packed] backend={backend} n={args.n} d={args.d} "
          f"store={pk.nbytes / 2**20:.1f} MiB (both layouts resident)",
          file=sys.stderr)

    paths = {}
    if "rowmajor" not in args.skip:
        paths["rowmajor"] = (
            lambda q, c: binary_topk(q, c, d=args.d, k=args.k), pk)
    if "transposed" not in args.skip:
        paths["transposed"] = (
            lambda q, c: binary_topk_t(q, c, d=args.d, k=args.k), pk_t)
    if "pallas" not in args.skip:
        # Mosaic compiles only for TPU; CPU runs fall back to interpret
        # mode (orders of magnitude slower — smoke with tiny --n or
        # --skip pallas there)
        interp = backend == "cpu"
        paths["pallas"] = (
            lambda q, c: pallas_binary_topk(
                q, c, d=args.d, k=args.k,
                block_q=args.block_q, block_n=args.block_n,
                interpret=interp),
            pk_t)

    out = {"n": args.n, "d": args.d, "k": args.k, "backend": backend,
           "block_n": args.block_n, "rows": []}
    r_small, r_big = args.r
    for nq in args.queries:
        q = jax.random.normal(kq, (nq, args.d), jnp.float32)
        row = {"queries": nq}
        ref_ids = None
        for name, (fn, store) in paths.items():
            s, i = fn(q, store)
            ids = np.asarray(i)
            if ref_ids is None:
                ref_ids = ids
                agree = 1.0
            else:
                agree = float(np.mean([
                    len(set(ref_ids[r]) & set(ids[r])) / ids.shape[1]
                    for r in range(nq)
                ]))
            dt, _, info = bench_device(fn, q, store, r_small, r_big)
            tops = 2 * nq * args.n * args.d / dt / 1e12
            entry = {"ms": round(dt * 1e3, 3), "tops": round(tops, 1),
                     "qps": round(nq / dt, 1), "agree": round(agree, 4)}
            if info["fallback"]:
                entry["fallback"] = True
            if info.get("spread") is not None:
                entry["spread"] = round(info["spread"], 4)
            row[name] = entry
            print(f"[packed] Q={nq} {name:>10}: {entry['ms']}ms "
                  f"{entry['tops']} TOP/s agree={agree:.3f}"
                  + (" FALLBACK" if info["fallback"] else ""),
                  file=sys.stderr)
        out["rows"].append(row)

    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
