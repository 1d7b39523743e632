"""Worker process for the multi-process distributed correctness check.

Launched N times (once per process) by ``tests/test_multiprocess.py`` and by
``__graft_entry__.dryrun_multichip``'s tail. Each process owns
``--local_devices`` virtual CPU devices; together they form one global mesh
spanning a REAL process boundary (collectives ride Gloo instead of ICI, but
the program — ``jax.distributed.initialize`` + ``global_mesh`` + shard_map +
``all_gather`` merge — is exactly the multi-host deployment path of
``docs/DEPLOYMENT.md``; on a TPU pod only the transport changes).

Checks, each against a host-side numpy oracle:
  1. sharded EXACT top-k over the global mesh == brute-force top-k
     (exact set equality of indices + scores);
  2. sharded SQ8 (int8) top-k: indices valid, top-1 true score within
     quantization tolerance of the exact best;
  3. a cross-process psum (the collective the training data-parallel path
     relies on) == host sum.

Exit code 0 + a final ``MULTIPROC_OK`` line mean every check passed in this
process. The reference has no distributed story at all (SURVEY §2.3); this
is the executed evidence for the framework's own distributed backend.
"""

import argparse
import os
import sys


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--process_id", type=int, required=True)
    ap.add_argument("--num_processes", type=int, required=True)
    ap.add_argument("--coordinator", required=True)
    ap.add_argument("--local_devices", type=int, default=4)
    ap.add_argument("--checkpoint_dir", default="",
                    help="run the sharded-checkpoint round-trip check here")
    ap.add_argument("--n", type=int, default=1001)
    ap.add_argument("--d", type=int, default=32)
    ap.add_argument("--queries", type=int, default=16)
    ap.add_argument("--k", type=int, default=10)
    args = ap.parse_args()

    # platform forcing must happen before jax initialises a backend; the
    # axon sitecustomize re-pins jax_platforms via jax.config, so pin it
    # back (CLAUDE.md quirk)
    os.environ["JAX_PLATFORMS"] = "cpu"
    os.environ["XLA_FLAGS"] = (
        f"--xla_force_host_platform_device_count={args.local_devices}"
    )
    import jax

    jax.config.update("jax_platforms", "cpu")

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from latentrag_tpu.parallel.distributed import (
        global_mesh,
        initialize_distributed,
    )

    # MUST run before any backend-initialising jax call — this is why the
    # package keeps import-time device-constant hygiene (ops/topk.py NEG_INF)
    multi = initialize_distributed(
        coordinator_address=args.coordinator,
        num_processes=args.num_processes,
        process_id=args.process_id,
    )
    if not multi:
        print("FATAL: multi-process runtime did not come up", flush=True)
        return 2
    assert jax.process_count() == args.num_processes
    assert jax.device_count() == args.num_processes * args.local_devices

    import jax.numpy as jnp
    import numpy as np

    from latentrag_tpu.ops.quantization import sq8_quantize
    from latentrag_tpu.parallel import make_sharded_topk, shard_rows

    gmesh = global_mesh()
    assert gmesh.devices.size == jax.device_count()

    # identical data in every process: same seed, host-side
    rng = np.random.default_rng(7)
    corpus = rng.standard_normal((args.n, args.d)).astype(np.float32)
    corpus /= np.linalg.norm(corpus, axis=1, keepdims=True)
    queries = rng.standard_normal((args.queries, args.d)).astype(np.float32)
    queries /= np.linalg.norm(queries, axis=1, keepdims=True)
    sims = queries @ corpus.T
    oracle_i = np.argsort(-sims, axis=1)[:, : args.k]
    oracle_s = np.take_along_axis(sims, oracle_i, axis=1)

    # ---- 1. exact sharded top-k across the process boundary --------------
    c_sh = shard_rows(jnp.asarray(corpus), gmesh)
    search = make_sharded_topk(gmesh, k=args.k, metric="cosine",
                               backend="exact")
    s, i = search(queries, c_sh, jnp.int32(args.n))
    s, i = np.asarray(s), np.asarray(i)
    assert np.allclose(np.sort(s, axis=1), np.sort(oracle_s, axis=1),
                       atol=1e-5), "exact: score set mismatch"
    for q in range(args.queries):
        assert set(i[q]) == set(oracle_i[q]), (
            f"exact: index set mismatch q={q}: {i[q]} vs {oracle_i[q]}"
        )
    print(f"proc {args.process_id}: exact sharded top-k == oracle", flush=True)

    # ---- 2. SQ8 sharded top-k across the process boundary ----------------
    codes, scale = sq8_quantize(jnp.asarray(corpus))
    search8 = make_sharded_topk(gmesh, k=args.k, backend="sq8")
    s8, i8 = search8(queries, shard_rows(codes, gmesh), jnp.int32(args.n),
                     scale)
    s8, i8 = np.asarray(s8), np.asarray(i8)
    assert i8.min() >= 0 and i8.max() < args.n, "sq8: invalid indices"
    true_of_top1 = sims[np.arange(args.queries), i8[:, 0]]
    assert (oracle_s[:, 0] - true_of_top1 < 0.05).all(), (
        "sq8: top-1 outside quantization tolerance"
    )
    print(f"proc {args.process_id}: SQ8 sharded top-k within tolerance",
          flush=True)

    # ---- 3. cross-process psum (the DP gradient collective) --------------
    from jax.sharding import NamedSharding, PartitionSpec as P

    x = np.arange(jax.device_count() * 3, dtype=np.float32).reshape(-1, 3)
    arr = shard_rows(jnp.asarray(x), gmesh)
    total = jax.jit(
        lambda a: jnp.sum(a), out_shardings=NamedSharding(gmesh, P())
    )(arr)
    assert float(np.asarray(total)) == float(x.sum()), "psum mismatch"
    print(f"proc {args.process_id}: cross-process reduction == host sum",
          flush=True)

    # ---- 4. sharded index checkpoint across the process boundary ---------
    # each process writes only its own shards (Orbax), process 0 owns the
    # filesystem mutations, sync_global_devices orders them; the restore
    # lands directly in the mesh sharding and search results are unchanged
    if args.checkpoint_dir:
        from latentrag_tpu.parallel import (
            load_sharded_index,
            save_sharded_index,
        )

        save_sharded_index(args.checkpoint_dir, c_sh, {"n": args.n})
        restored, meta = load_sharded_index(args.checkpoint_dir, gmesh)
        assert meta["n"] == args.n
        s2, i2 = search(queries, restored, jnp.int32(args.n))
        assert (np.asarray(i2) == i).all() and np.allclose(
            np.asarray(s2), s
        ), "post-restore search drifted"
        print(f"proc {args.process_id}: sharded checkpoint round-trip ok",
              flush=True)

    print(f"MULTIPROC_OK process={args.process_id}/{args.num_processes} "
          f"devices={jax.device_count()}", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
