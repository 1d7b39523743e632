"""Device IVF-Flat vs exhaustive scan: the small-batch latency story.

The exhaustive tiers read the whole corpus per search, so a SINGLE query
at 1M-8.8M pays the same HBM sweep as 1024. The device IVF
(``ops/ivf.py``) prunes to the top ``nprobe`` blocks per query; this
script pins the crossover on the real chip: per-batch latency
(in-program two-point methodology, ``bench.py::bench_device``) and
candidate recall vs the exact oracle, across query-batch sizes and probe
budgets, on a clustered synthetic corpus (mixture of Gaussians — text
embedding corpora cluster; a uniform sphere would understate IVF recall
at every budget, so the cluster spread is a flag).

RECALL IS A CORPUS PROPERTY — ``--spread`` decides which regime you
measure (r4 forensics, docs/ROOFLINE.md): at 0.08 the mixture is
clustered (same-component cosine ~0.71) and small probe budgets read
r~1.0; at the DEFAULT 0.3 noise dominates (only ~3% of true top-10
share the query's component) and no probe budget short of a full sweep
recalls well — r=0.26-0.49 at 0.5-1%. The published clustered tables
used --spread 0.08; timing columns are difficulty-independent. The
JSON records spread/centers so a recall number can't lose its geometry
again.

  python scripts/ivf_bench.py                        # real chip, 1M
  python scripts/ivf_bench.py --n 8800000 --store int8
  JAX_PLATFORMS=cpu python scripts/ivf_bench.py --n 100000  # smoke
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

from bench import bench_device, sync
from latentrag_tpu.ops import approx_topk
from latentrag_tpu.ops.binary import binary_quantize, binary_topk
from latentrag_tpu.ops.ivf import (
    auto_nprobe,
    ivf_build,
    ivf_build_binary,
    ivf_build_sq4,
    ivf_search,
)
from latentrag_tpu.ops.quantization import (
    sq4_quantize,
    sq4_quantize_with_scale,
    sq4_topk,
    sq8_quantize,
    sq8_topk,
)


from functools import partial


@partial(
    jax.jit, static_argnames=("n", "d", "n_centers", "spread")
)
def _mixture(seed, n, d, n_centers, spread, chunk=None):
    # ``chunk`` is TRACED (None still specializes by pytree structure):
    # a static chunk would compile one program PER CHUNK — 239 remote
    # compiles for a 1B streamed build through the relay
    """Mixture-of-Gaussians rows, unit-normalized, generated ON DEVICE.

    One jitted program: run eagerly, the take/add/normalize chain keeps
    ~3 full [n, d] fp32 buffers live at once (with the 64->128 lane
    padding that is ~26 GB at 16.7M — the measured r4 staging OOM);
    fused, only the output buffer materialises.

    ``chunk`` keys an independent draw from the SAME mixture (identical
    centers; which/noise folded by chunk) — corpus chunks and
    in-distribution queries share one generator, so the "queries live
    on the corpus manifold" invariant cannot silently desynchronize.
    ``chunk=None`` reproduces the original single-shot stream exactly.
    """
    kc, kw, kn = jax.random.split(jax.random.PRNGKey(seed), 3)
    centers = jax.random.normal(kc, (n_centers, d), jnp.float32)
    centers = centers / jnp.linalg.norm(centers, axis=1, keepdims=True)
    if chunk is not None:
        kw = jax.random.fold_in(kw, chunk)
        kn = jax.random.fold_in(kn, chunk)
    which = jax.random.randint(kw, (n,), 0, n_centers)
    x = jnp.take(centers, which, axis=0) + spread * jax.random.normal(
        kn, (n, d), jnp.float32
    )
    return x / jnp.linalg.norm(x, axis=1, keepdims=True)


def _clustered(seed, n, d, n_centers, spread):
    return _mixture(seed, n, d, n_centers, spread)


def _clustered_chunk(seed, chunk, rows, d, n_centers, spread):
    return _mixture(seed, rows, d, n_centers, spread, chunk=chunk)


def _staged_quantized(seed, n, d, n_centers, spread, store, chunks=4):
    """int8/int4/binary corpus staged in ``chunks`` pieces so no full
    fp32 copy ever exists (the single-shot fp32 output is 17 GB
    lane-padded at 32M — past HBM even fused). Two passes for int8/int4
    (global abs-max scale first, exactly the quantizers' semantics),
    one for binary. Returns (store_array, scale|None).
    """
    rows = -(-n // chunks)
    sizes = [min(rows, n - i * rows) for i in range(chunks)]
    if store == "int4":
        m = 0.0
        for i, sz in enumerate(sizes):
            x = _clustered_chunk(seed, i, rows, d, n_centers, spread)
            m = max(m, float(jnp.max(jnp.abs(x[:sz]))))
            x.delete()
        scale = jnp.float32(max(m / 7.0, 1e-12))  # SQ4_LEVELS
        out = jnp.zeros((n, -(-d // 2)), jnp.uint8)
        for i, sz in enumerate(sizes):
            x = _clustered_chunk(seed, i, rows, d, n_centers, spread)
            pk = sq4_quantize_with_scale(x[:sz], scale)
            out = jax.lax.dynamic_update_slice_in_dim(
                out, pk, i * rows, axis=0
            )
            x.delete()
        return out, scale
    if store == "int8":
        m = 0.0
        for i, sz in enumerate(sizes):
            x = _clustered_chunk(seed, i, rows, d, n_centers, spread)
            m = max(m, float(jnp.max(jnp.abs(x[:sz]))))
            x.delete()
        scale = jnp.float32(max(m / 127.0, 1e-12))
        out = jnp.zeros((n, d), jnp.int8)
        for i, sz in enumerate(sizes):
            x = _clustered_chunk(seed, i, rows, d, n_centers, spread)
            codes = jnp.clip(
                jnp.round(x[:sz] / scale), -127, 127
            ).astype(jnp.int8)
            out = jax.lax.dynamic_update_slice_in_dim(
                out, codes, i * rows, axis=0
            )
            x.delete()
        return out, scale
    out = None
    for i, sz in enumerate(sizes):
        x = _clustered_chunk(seed, i, rows, d, n_centers, spread)
        pk = binary_quantize(x[:sz])
        x.delete()
        if out is None:
            out = jnp.zeros((n, pk.shape[1]), jnp.uint32)
        out = jax.lax.dynamic_update_slice_in_dim(out, pk, i * rows, axis=0)
    return out, None


def _recall(ids, ref_ids):
    ids, ref_ids = np.asarray(ids), np.asarray(ref_ids)
    hits = sum(
        len(set(map(int, a)) & set(map(int, b)))
        for a, b in zip(ids, ref_ids)
    )
    return hits / ref_ids.size


def main(argv=None) -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--n", type=int, default=1_048_576)
    p.add_argument("--d", type=int, default=64)
    p.add_argument("--k", type=int, default=10)
    p.add_argument("--queries", type=int, nargs="+", default=[1, 16, 64])
    p.add_argument("--nlist", type=int, default=4096)
    p.add_argument("--cap", type=int, default=512)
    p.add_argument("--fractions", type=float, nargs="+",
                   default=[0.01, 0.02, 0.05, 0.1])
    p.add_argument("--centers", type=int, default=0,
                   help="mixture components (0 = 4*nlist)")
    p.add_argument("--spread", type=float, default=0.3)
    p.add_argument("--store", choices=["bf16", "int8", "int4", "binary"],
                   default="bf16")
    p.add_argument("--random-bits", action="store_true",
                   help="binary only: stage random packed words directly "
                        "(no fp32 corpus — unlocks 100M-scale TIMING; "
                        "recall on structureless bits is not meaningful)")
    p.add_argument("--cascade", action="store_true",
                   help="binary only: measure END-TO-END cascade quality "
                        "(stage-1 oversample + exact SQ8 rescore, scored "
                        "against the fp32 exact oracle) for the "
                        "exhaustive and IVF stage-1 variants")
    p.add_argument("--oversample", type=int, default=8)
    p.add_argument("--r", type=int, nargs=2, default=[8, 40],
                   metavar=("R_SMALL", "R_BIG"))
    args = p.parse_args(argv)

    backend = jax.default_backend()
    print(f"[ivf_bench] backend={backend} n={args.n} d={args.d} "
          f"store={args.store} spread={args.spread} "
          f"centers={args.centers or 4 * args.nlist}", file=sys.stderr)
    if backend != "cpu":
        # probe-then-run (CLAUDE.md relay discipline): the relay can go
        # dark for 10-60+ min and a hang inside the runtime is not
        # interruptible — ask a killable subprocess first
        from bench import _relay_alive

        if not _relay_alive(300.0):
            print("[ivf_bench] relay dark — aborting before dispatch",
                  file=sys.stderr)
            return 2

    if args.cascade and (args.store != "binary" or args.random_bits):
        p.error("--cascade requires --store binary without --random-bits")
    if args.cascade and args.n > 20_000_000:
        # the fp32 oracle corpus cannot be staged past ~20M (17 GB
        # lane-padded at 32M — see the chunked-staging branch below)
        p.error("--cascade needs the fp32 oracle resident; use n <= 20M")

    centers = args.centers or 4 * args.nlist
    scale = None
    rescore_codes = None
    if args.store == "binary" and args.random_bits:
        store = jax.random.bits(
            jax.random.PRNGKey(2), (args.n, args.d // 32), jnp.uint32
        )
        sync(store)
    elif args.n > 20_000_000 and args.store in ("int8", "int4", "binary") \
            and not args.cascade:
        # 32M+: stage the quantized corpus in chunks — a single fp32
        # staging buffer is 17+ GB lane-padded (past HBM even fused)
        store, scale = _staged_quantized(
            2, args.n, args.d, centers, args.spread, args.store
        )
        sync(store)
    else:
        corpus32 = _clustered(2, args.n, args.d, centers, args.spread)
        if args.store == "int8":
            store, scale = sq8_quantize(corpus32)
        elif args.store == "int4":
            store, scale = sq4_quantize(corpus32)
        elif args.store == "binary":
            store = binary_quantize(corpus32)
            if args.cascade:
                # device-resident SQ8 rescore codes + the fp32 oracle
                # (production keeps codes host-side; the arithmetic is
                # identical and a 0.5 GB host fetch would crawl through
                # the relay tunnel)
                rescore_codes, scale = sq8_quantize(corpus32)
        else:
            store = corpus32.astype(jnp.bfloat16)
        sync(store)
        if args.cascade:
            oracle32 = corpus32  # kept alive for exact end-to-end recall
        else:
            corpus32.delete()  # free fp32 staging (8.2 GB at 32M x 64)

    print(f"[ivf_bench] building IVF nlist={args.nlist} cap={args.cap}",
          file=sys.stderr)
    import time as _t

    t0 = _t.perf_counter()
    if args.store == "binary":
        idx = ivf_build_binary(store, args.d, args.nlist, args.cap)
    elif args.store == "int4":
        idx = ivf_build_sq4(store, args.d, args.nlist, args.cap)
    else:
        idx = ivf_build(store, args.nlist, args.cap)
    sync(idx.blocks)
    build_s = _t.perf_counter() - t0
    nblocks = idx.nblocks
    print(f"[ivf_bench] built: nblocks={nblocks} in {build_s:.1f}s",
          file=sys.stderr)

    out = {
        "n": args.n, "d": args.d, "k": args.k, "store": args.store,
        "nlist": args.nlist, "cap": args.cap, "nblocks": nblocks,
        "build_s": round(build_s, 2), "backend": backend,
        # full corpus/query provenance — a recall number without its
        # mixture geometry is unreproducible (learned the hard way)
        "centers": centers, "spread": args.spread,
        "queries_draw": "in-distribution", "rows": [],
    }
    r_small, r_big = args.r
    for nq in args.queries:
        # queries draw from the SAME mixture as the corpus (same
        # centers, fresh noise) — like real queries, which live on the
        # corpus manifold. (Earlier revisions drew them from a
        # different-seed mixture = out-of-distribution queries, which
        # understates candidate recall at every probe budget.)
        q = _clustered_chunk(
            2, 10_000 + nq, nq, args.d, centers, args.spread
        )

        # exhaustive baseline at this batch size — also the recall
        # reference (same store, so recall isolates the PRUNING loss
        # from quantization loss)
        if args.store == "int8":
            def ex_search(qq, st):
                return sq8_topk(qq, st, scale, k=args.k)
        elif args.store == "int4":
            def ex_search(qq, st):
                return sq4_topk(qq, st, scale, d=args.d, k=args.k)
        elif args.store == "binary":
            def ex_search(qq, st):  # stage-1 only, like the IVF side
                return binary_topk(qq, st, d=args.d, k=args.k)
        else:
            def ex_search(qq, st):
                return approx_topk(qq, st, k=args.k, recall_target=0.99)
        dt, _, ex_info = bench_device(ex_search, q, store, r_small, r_big)
        _, ref_i = ex_search(q, store)
        ref_i = np.asarray(ref_i)
        row = {
            "queries": nq,
            "exhaustive_ms": round(dt * 1e3, 3),
            "ivf": [],
        }
        if ex_info["fallback"]:
            row["exhaustive_fallback"] = True
        for frac in args.fractions:
            nprobe = auto_nprobe(nblocks, frac)

            dim = args.d if args.store in ("binary", "int4") else 0

            def iv_search(qq, ix, _np=nprobe):
                return ivf_search(
                    qq, ix, k=args.k, nprobe=_np, scale=scale, dim=dim
                )

            dt_i, _, iv_info = bench_device(iv_search, q, idx,
                                            r_small, r_big)
            _, iv_i = iv_search(q, idx)
            row["ivf"].append({
                "fraction": frac,
                "nprobe": nprobe,
                "ms": round(dt_i * 1e3, 3),
                "recall": round(_recall(iv_i, ref_i), 4),
                "speedup": round(dt / dt_i, 2),
            })
            if iv_info["fallback"] or ex_info["fallback"]:
                # a dispatch-inclusive upper bound on either side makes
                # the speedup column unreliable — mark the row
                row["ivf"][-1]["fallback"] = True
            print(f"[ivf_bench] Q={nq} exhaustive={dt*1e3:.3f}ms | "
                  f"nprobe={nprobe} ({frac:.0%}): {dt_i*1e3:.3f}ms "
                  f"recall={row['ivf'][-1]['recall']:.3f} "
                  f"({row['ivf'][-1]['speedup']}x)", file=sys.stderr)

        if args.cascade:
            # end-to-end cascade quality: stage-1 oversample (exhaustive
            # vs IVF) -> exact SQ8 rescore -> final k, recall vs the
            # fp32 exact oracle. Ties in stage-1 sign-dots are irrelevant
            # here — the rescore re-ranks the candidate set exactly.
            from latentrag_tpu.ops.topk import exact_topk

            ok = min(args.oversample * args.k, args.n)
            _, oracle_i = exact_topk(q, oracle32, k=args.k)
            oracle_i = np.asarray(oracle_i)
            qf = q.astype(jnp.float32)
            scale_f = jnp.float32(scale)

            def rescore(cand):
                # fp32 queries x dequantized codes — the SAME estimator
                # as the production cascade (retrieval/rescore.py uses
                # fp32 queries against codes*scale; an int8-quantized
                # query here measured a visibly different top-k)
                rows = jnp.take(
                    rescore_codes, jnp.maximum(cand, 0), axis=0
                ).astype(jnp.float32) * scale_f  # [Q, ok, d]
                dots = jax.lax.dot_general(
                    qf, rows,
                    dimension_numbers=(((1,), (2,)), ((0,), (0,))),
                    preferred_element_type=jnp.float32,
                )
                s = jnp.where(cand >= 0, dots, jnp.float32(-3.4e38))
                _, loc = jax.lax.top_k(s, args.k)
                return np.asarray(jnp.take_along_axis(cand, loc, axis=1))

            _, cand_ex = binary_topk(q, store, d=args.d, k=ok)
            casc = {
                "oversample": args.oversample,
                "end_recall_exhaustive": round(
                    _recall(rescore(cand_ex), oracle_i), 4
                ),
                "ivf": [],
            }
            for frac in args.fractions:
                nprobe = auto_nprobe(nblocks, frac)
                _, cand_iv = ivf_search(
                    q, idx, k=ok, nprobe=nprobe, dim=args.d
                )
                r = round(_recall(rescore(cand_iv), oracle_i), 4)
                casc["ivf"].append(
                    {"fraction": frac, "nprobe": nprobe, "end_recall": r}
                )
                print(f"[ivf_bench] Q={nq} cascade end recall@{args.k}: "
                      f"exhaustive={casc['end_recall_exhaustive']:.3f} "
                      f"ivf@{frac:.1%}={r:.3f}", file=sys.stderr)
            row["cascade"] = casc
        out["rows"].append(row)

    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
