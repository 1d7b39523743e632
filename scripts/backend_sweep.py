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

# honor JAX_PLATFORMS=cpu: the axon sitecustomize force-selects the TPU via
# jax.config AFTER import, so the env var alone is ignored (CLAUDE.md)
if os.environ.get("JAX_PLATFORMS", "").startswith("cpu"):
    jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp

from latentrag_tpu.ops import approx_topk, exact_topk, l2_normalize, pallas_topk
from latentrag_tpu.ops.quantization import sq8_quantize, sq8_topk
from latentrag_tpu.utils.timing import force_completion as sync


def bench(fn, reps, warm=8):
    # the first dispatches after idle run ~5x slower than steady state
    # (docs/ROOFLINE.md) — warm with executed calls before timing
    out = fn()  # always at least one executed call (compile)
    for _ in range(max(warm - 1, 0)):
        out = fn()
    sync(out[0])
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn()
    sync(out[0])
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
    p.add_argument("--data", choices=["gaussian", "lowrank"],
                   default="gaussian",
                   help="gaussian = adversarial full-rank; lowrank = "
                        "embedding-like manifold (intrinsic dim d/4)")
    args = p.parse_args(argv)

    on_tpu = jax.default_backend() == "tpu"
    dtype = jnp.bfloat16 if on_tpu else jnp.float32

    if args.data == "lowrank":
        # embedding-like geometry: intrinsic dim ~= rank << d (AE latents of
        # SBERT vectors cluster on a low-dimensional manifold). Full-rank
        # Gaussian is the adversarial worst case for graph ANN and does not
        # represent the production distribution.
        rank = max(args.d // 4, 8)

        @jax.jit
        def gen_c(key):
            kg, kp, kn = jax.random.split(key, 3)
            proj = jax.random.normal(kp, (rank, args.d), jnp.float32)
            g = jax.random.normal(kg, (args.n, rank), jnp.float32)
            noise = 0.05 * jax.random.normal(
                kn, (args.n, args.d), jnp.float32
            )
            return l2_normalize(g @ proj + noise).astype(dtype)

        c = gen_c(jax.random.PRNGKey(0))
        sync(c)
        # queries from the SAME manifold (re-derive the projection)
        _, kp, _ = jax.random.split(jax.random.PRNGKey(0), 3)
        proj = jax.random.normal(kp, (rank, args.d), jnp.float32)
        gq = jax.random.normal(jax.random.PRNGKey(1), (args.queries, rank),
                               jnp.float32)
        q = l2_normalize(gq @ proj).astype(dtype)
        sync(q)
    else:

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

    if "int4" not in args.skip:
        # packed-nibble stage 1 (half SQ8's HBM) at the cascade's
        # oversample, with the host-free part benched in isolation; the
        # recall row rescores the oversampled candidates exactly — the
        # tier's production contract (DenseRetriever store_dtype=int4)
        from latentrag_tpu.ops.quantization import sq4_quantize, sq4_topk

        packed4, scale4 = sq4_quantize(c)
        sync(packed4)
        ok = min(8 * args.k, args.n)
        dt = bench(
            lambda: sq4_topk(q, packed4, scale4, d=args.d, k=ok),
            args.reps,
        )
        _, cand = sq4_topk(q, packed4, scale4, d=args.d, k=ok)
        codes8, scale8 = sq8_quantize(c)
        # gather ONLY the Q*ok candidate rows on device (fetching the
        # whole SQ8 corpus to host crawls through the relay — 537 MB at
        # 8.8M; the candidates are ~80 KB)
        rows8 = np.asarray(
            jnp.take(codes8, cand, axis=0), dtype=np.float32
        ) * float(scale8)  # [Q, ok, d]
        qn = np.asarray(q, dtype=np.float32)
        cand_np = np.asarray(cand)
        i1 = np.empty((qn.shape[0], args.k), np.int64)
        for r in range(qn.shape[0]):
            sc = rows8[r] @ qn[r]
            i1[r] = cand_np[r][np.argsort(-sc)[: args.k]]
        rows.append(
            (f"int4 cascade (stage1 ok={ok} + SQ8 rescore)", dt,
             recall_vs(i_ref_np, i1, args.k))
        )

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
        for efs in (64, 128, 256):
            t0 = time.perf_counter()
            _, i1 = ix.search(q_host, args.k, ef_search=efs)
            dt = time.perf_counter() - t0
            rows.append(
                (f"hnsw C++ efS={efs} (build {build_s:.0f}s)", dt,
                 recall_vs(i_ref_np, i1, args.k))
            )

    if "ivfpq" not in args.skip and args.n <= 200_000:
        from latentrag_tpu.retrieval.ann import IVFPQIndex

        c_host = np.asarray(c, dtype=np.float32)
        q_host = np.asarray(q, dtype=np.float32)
        nlist = max(int(np.sqrt(args.n)), 64)
        ix = IVFPQIndex(args.d, nlist=nlist, m=16, nbits=8)
        t0 = time.perf_counter()
        train_n = min(args.n, 65536)
        ix.train(c_host[:train_n])
        ix.add(c_host)
        build_s = time.perf_counter() - t0
        for nprobe in (8, 32, 64):
            t0 = time.perf_counter()
            _, i1 = ix.search(q_host, args.k, nprobe=nprobe)
            dt = time.perf_counter() - t0
            rows.append(
                (f"ivfpq C++ nprobe={nprobe} (build {build_s:.0f}s)", dt,
                 recall_vs(i_ref_np, i1, args.k))
            )
        # refined tier (factory path): oversample + exact fp32 rescore
        from latentrag_tpu.retrieval.ann_retriever import ANNRetriever
        from latentrag_tpu.utils.config import RetrievalConfig

        for nprobe, refine in ((32, 8), (64, 8), (64, 16)):
            r = ANNRetriever(
                RetrievalConfig(
                    backend="ivfpq", ivfpq_nlist=nlist, ivfpq_m=16,
                    ivfpq_nprobe=nprobe, ivfpq_refine=refine,
                ),
                "ivfpq",
            )
            r._index = ix  # reuse the trained index; attach fp32 corpus
            r._refine_emb = (
                c_host / np.linalg.norm(c_host, axis=1, keepdims=True)
            )
            t0 = time.perf_counter()
            _, i1 = r.search(q_host, args.k)
            dt = time.perf_counter() - t0
            rows.append(
                (f"ivfpq+refine nprobe={nprobe} rf={refine}", dt,
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
