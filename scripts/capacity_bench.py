"""Capacity flagship: build, persist, warm-boot and search a ~1B-vector
binary IVF index on ONE chip.

The repo's "~100M/chip, ~1B packed" capacity claim was extrapolated
until this script measured it. The packed corpus NEVER exists as one
array: ``ivf_build_binary_streaming`` (ops/ivf.py) consumes
deterministic device-generated chunks (``chunk_fn`` re-derives chunk
``i`` from the mixture PRNG — same recipe as scripts/ivf_bench.py), so
the only full-size HBM residents are the OUTPUT blocks + ids
(~12.4 GB at 1B x 64 vs the 16 GB v5e). Ground truth is a streamed
exhaustive packed sweep over the same chunks.

Persistence at this scale is centroids-only (MBs): re-deriving
assignments on device (~an assignment sweep) beats fetching an [N]
sidecar through the relay tunnel by orders of magnitude. Warm boot =
load centroids -> count+place sweeps; layout identity vs the cold
build is asserted by device-side checksums (sum + xor over blocks,
sum over ids) because two full indexes cannot be resident at once.

Stage-1 recall is reported two ways: id recall@k (pessimistic — at
d=64 the sign-dot takes <=65 integer values, so the top-k boundary at
1B rows is a huge tie set that any two exact scans break differently)
and score-multiset match (tie-insensitive: the sorted top-k score
vectors agree). Mixture spread picks the geometry regime
(docs/ROOFLINE.md r4 forensics): published clustered tables use 0.08.

  python scripts/capacity_bench.py --n 1000000000          # real chip
  JAX_PLATFORMS=cpu python scripts/capacity_bench.py --n 2000003 \
      --nlist 256 --chunk-rows 262144 --queries 8          # smoke

Capacity role of the reference's IVF-PQ tier
(reference retrieval/FAISSEmbeddingRetriever.py:100-102), redesigned
for a single TPU's HBM instead of host RAM.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

import jax

if os.environ.get("JAX_PLATFORMS", "").startswith("cpu"):
    jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np

from bench import bench_device, sync
from latentrag_tpu.ops.binary import binary_quantize, binary_topk
from latentrag_tpu.ops.ivf import (
    auto_nprobe,
    ivf_build_binary_streaming,
    ivf_search,
)
from scripts.ivf_bench import _mixture, _recall


@jax.jit
def _digest(blocks, ids):
    """Three device scalars that pin the full layout: wrap-around sum
    and xor-reduce over the packed words, wrap-around sum over ids.
    Collision odds for an accidental layout difference are ~2^-96."""
    s = jnp.sum(blocks, dtype=jnp.uint32)
    x = jax.lax.reduce(
        blocks, jnp.uint32(0), jax.lax.bitwise_xor, (0, 1, 2)
    )
    i = jnp.sum(ids, dtype=jnp.int32)
    return s, x, i


def _score_match(scores, ref_scores):
    """Tie-insensitive stage-1 agreement: per-query MULTISET intersection
    of the top-k score values (fraction of the exhaustive sweep's k
    scores the IVF also returned, counting multiplicity). Positional
    equality of sorted vectors collapses to ~0 as soon as one member
    differs (every later position shifts); the multiset form degrades
    smoothly and upper-bounds recall_ids by exactly the tie mass."""
    a = np.asarray(scores)
    b = np.asarray(ref_scores)
    k = b.shape[1]
    out = []
    for r in range(b.shape[0]):
        av, ac = np.unique(a[r], return_counts=True)
        bv, bc = np.unique(b[r], return_counts=True)
        common = np.intersect1d(av, bv)
        ai = {v: c for v, c in zip(av, ac)}
        bi = {v: c for v, c in zip(bv, bc)}
        out.append(sum(min(ai[v], bi[v]) for v in common) / k)
    return float(np.mean(out))


def main(argv=None) -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--n", type=int, default=1_000_000_000)
    p.add_argument("--d", type=int, default=64)
    p.add_argument("--k", type=int, default=10)
    p.add_argument("--nlist", type=int, default=16384)
    p.add_argument("--cap", type=int, default=1024)
    p.add_argument("--chunk-rows", type=int, default=4_194_304)
    p.add_argument("--assign-block", type=int, default=16384,
                   help="rows per assignment tile — the [block, nlist] "
                        "fp32 score transient must fit HBM headroom")
    p.add_argument("--queries", type=int, nargs="+", default=[1, 256])
    p.add_argument("--fractions", type=float, nargs="+",
                   default=[0.001, 0.002, 0.005])
    p.add_argument("--oversample", type=int, default=8,
                   help="cascade stage-1 fetch = oversample*k; "
                        "recall_cascade measures GT top-k coverage in "
                        "that candidate set (the deployed semantics — "
                        "dense.py rescores exactly these rows)")
    p.add_argument("--centers", type=int, default=0,
                   help="mixture components (0 = 4*nlist)")
    p.add_argument("--spread", type=float, default=0.08)
    p.add_argument("--seed", type=int, default=2)
    p.add_argument("--train-rows", type=int, default=2_000_000)
    p.add_argument("--kmeans-iters", type=int, default=10)
    p.add_argument("--r", type=int, nargs=2, default=[8, 40],
                   metavar=("R_SMALL", "R_BIG"))
    p.add_argument("--sidecar", default="/tmp/capacity_centroids.npy")
    p.add_argument("--skip-warm", action="store_true")
    p.add_argument("--skip-gt", action="store_true",
                   help="timing-only run (no streamed ground truth)")
    args = p.parse_args(argv)

    backend = jax.default_backend()
    centers = args.centers or 4 * args.nlist
    print(f"[capacity] backend={backend} n={args.n} d={args.d} "
          f"nlist={args.nlist} cap={args.cap} spread={args.spread} "
          f"centers={centers} chunk_rows={args.chunk_rows}",
          file=sys.stderr)
    if backend != "cpu":
        from bench import _relay_alive

        if not _relay_alive(300.0):
            print("[capacity] relay dark — aborting before dispatch",
                  file=sys.stderr)
            return 2

    w = -(-args.d // 32)

    @jax.jit
    def _gen_chunk(ci):
        # one compiled program for EVERY chunk (ci traced): the fused
        # take/add/normalize/sign chain materialises only the packed
        # output, and chunk regeneration costs one dispatch, not ~8
        # eager ops x 3 sweeps x nchunks through the relay
        return binary_quantize(
            _mixture(args.seed, args.chunk_rows, args.d, centers,
                     args.spread, chunk=ci)
        )

    def chunk_fn(i: int):
        # deterministic per-chunk regeneration — the corpus IS the
        # program + seed; trimming to the last chunk's true size is the
        # builder's job
        return _gen_chunk(jnp.int32(i))

    timings: dict = {}
    t0 = time.perf_counter()
    idx = ivf_build_binary_streaming(
        chunk_fn, args.n, args.d, args.nlist, args.cap,
        chunk_rows=args.chunk_rows, seed=args.seed,
        kmeans_iters=args.kmeans_iters, train_rows=args.train_rows,
        assign_block=args.assign_block, timings=timings,
    )
    sync(idx.blocks)
    build_s = time.perf_counter() - t0
    nblocks = idx.nblocks
    hbm_gb = (idx.blocks.nbytes + idx.block_ids.nbytes
              + idx.centroids.nbytes) / 2**30
    print(f"[capacity] built: nblocks={nblocks} in {build_s:.1f}s "
          f"(train {timings.get('train_s', 0):.1f} / count "
          f"{timings.get('count_s', 0):.1f} / place "
          f"{timings.get('place_s', 0):.1f}) resident {hbm_gb:.2f} GiB",
          file=sys.stderr)

    cold_digest = tuple(int(v) for v in _digest(idx.blocks, idx.block_ids))
    print(f"[capacity] cold digest {cold_digest}", file=sys.stderr)

    b2l_host = np.asarray(idx.block2list)
    mlb = int(np.bincount(b2l_host[b2l_host >= 0]).max())
    out_mlb = mlb
    print(f"[capacity] max blocks/list {mlb} (avg "
          f"{nblocks / args.nlist:.1f})", file=sys.stderr)

    # persist: centroids are the whole sidecar at this scale
    t0 = time.perf_counter()
    cent_host = np.asarray(idx.centroids)
    np.save(args.sidecar, cent_host)
    persist_s = time.perf_counter() - t0
    print(f"[capacity] persisted {cent_host.nbytes / 2**20:.1f} MiB "
          f"centroids in {persist_s:.1f}s -> {args.sidecar}",
          file=sys.stderr)

    out = {
        "max_list_blocks": out_mlb,
        "n": args.n, "d": args.d, "k": args.k, "nlist": args.nlist,
        "cap": args.cap, "nblocks": nblocks, "backend": backend,
        "centers": centers, "spread": args.spread,
        "queries_draw": "in-distribution",
        "chunk_rows": args.chunk_rows,
        "build_s": round(build_s, 2),
        "build_phases_s": {k: round(v, 2) for k, v in timings.items()},
        "resident_gib": round(hbm_gb, 3),
        "persist_mib": round(cent_host.nbytes / 2**20, 2),
        "persist_s": round(persist_s, 2),
        "rows": [],
    }

    nchunks = -(-args.n // args.chunk_rows)
    r_small, r_big = args.r
    for nq in args.queries:
        q = _mixture(args.seed, nq, args.d, centers, args.spread,
                     chunk=10_000 + nq)

        row = {"queries": nq, "ivf": []}
        gt_i = gt_s = None
        if not args.skip_gt:
            # streamed exhaustive packed sweep — same estimator the IVF
            # stage 1 uses, so recall isolates the PRUNING loss. The
            # running top-k merge lives ON DEVICE (one dispatch per
            # chunk, ONE host fetch at the end): a host-side merge costs
            # a relay round trip per chunk (239 at 1B — minutes of pure
            # fetch latency per query batch)
            @jax.jit
            def gt_step(bs, bi, qq, ci):
                pk = _gen_chunk(ci)
                valid = jnp.arange(args.chunk_rows) < (
                    jnp.int32(args.n) - ci * jnp.int32(args.chunk_rows)
                )
                # recall_target=1.0: the GT oracle must be exact —
                # at the default 0.95 the per-block approx_max_k could
                # drop true top-k members and corrupt the recall columns
                s, i = binary_topk(qq, pk, d=args.d, k=args.k,
                                   mask=valid, recall_target=1.0)
                cs = jnp.concatenate([bs, s], axis=1)
                cidx = jnp.concatenate(
                    [bi, i + ci * jnp.int32(args.chunk_rows)], axis=1
                )
                sel_s, sel = jax.lax.top_k(cs, args.k)
                return sel_s, jnp.take_along_axis(cidx, sel, axis=1)

            t0 = time.perf_counter()
            bs = jnp.full((nq, args.k), -jnp.inf, jnp.float32)
            bi = jnp.full((nq, args.k), -1, jnp.int32)
            for ci in range(nchunks):
                bs, bi = gt_step(bs, bi, q, jnp.int32(ci))
            gt_s, gt_i = np.asarray(bs), np.asarray(bi)
            gt_wall = time.perf_counter() - t0
            row["exhaustive_streamed_wall_s"] = round(gt_wall, 2)
            print(f"[capacity] Q={nq} streamed exhaustive sweep "
                  f"{gt_wall:.1f}s wall ({nchunks} chunks, "
                  "dispatch-inclusive)", file=sys.stderr)

        for frac in args.fractions:
            nprobe = auto_nprobe(nblocks, frac)

            def iv_search(qq, ix, _np=nprobe):
                return ivf_search(qq, ix, k=args.k, nprobe=_np,
                                  dim=args.d, max_list_blocks=mlb)

            dt, _, info = bench_device(iv_search, q, idx, r_small, r_big)
            entry = {
                "fraction": frac, "nprobe": nprobe,
                "ms": round(dt * 1e3, 3),
                "qps": round(nq / dt, 1),
            }
            if info["fallback"]:
                entry["fallback"] = True
            if gt_i is not None:
                s_iv, i_iv = iv_search(q, idx)
                entry["recall_ids"] = round(_recall(i_iv, gt_i), 4)
                entry["score_match"] = round(_score_match(s_iv, gt_s), 4)
                # deployed-cascade semantics: stage 1 fetches
                # oversample*k candidates and the SQ8 rescore reranks
                # them — coverage of the true top-k inside that set is
                # the recall the pipeline actually sees
                ok = min(args.oversample * args.k, args.n)
                _, i_wide = ivf_search(q, idx, k=ok, nprobe=nprobe,
                                       dim=args.d, max_list_blocks=mlb)
                entry["recall_cascade"] = round(_recall(i_wide, gt_i), 4)
            print(f"[capacity] Q={nq} nprobe={nprobe} ({frac:.2%}): "
                  f"{entry['ms']}ms"
                  + (f" recall_ids={entry['recall_ids']}"
                     f" cascade@{args.oversample}x="
                     f"{entry['recall_cascade']}"
                     f" score_match={entry['score_match']}"
                     if gt_i is not None else ""),
                  file=sys.stderr)
            row["ivf"].append(entry)
        out["rows"].append(row)

    if not args.skip_warm:
        # warm boot: free the cold index, reload centroids, re-derive
        # the layout — digests must match the cold build exactly
        idx.blocks.delete()
        idx.block_ids.delete()
        cent_dev = jnp.asarray(np.load(args.sidecar))
        warm_t: dict = {}
        t0 = time.perf_counter()
        idx2 = ivf_build_binary_streaming(
            chunk_fn, args.n, args.d, args.nlist, args.cap,
            chunk_rows=args.chunk_rows, centroids=cent_dev,
            assign_block=args.assign_block, timings=warm_t,
        )
        sync(idx2.blocks)
        warm_s = time.perf_counter() - t0
        warm_digest = tuple(
            int(v) for v in _digest(idx2.blocks, idx2.block_ids)
        )
        out["warm_boot_s"] = round(warm_s, 2)
        out["warm_layout_identical"] = warm_digest == cold_digest
        print(f"[capacity] warm boot {warm_s:.1f}s, layout identical: "
              f"{out['warm_layout_identical']}", file=sys.stderr)
        if not out["warm_layout_identical"]:
            print(f"[capacity] WARM DIGEST MISMATCH {warm_digest} vs "
                  f"{cold_digest}", file=sys.stderr)

    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
