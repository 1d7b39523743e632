"""Scale-out benchmark: MS-MARCO-class sharded latent index on a mesh.

BASELINE.json config 5: ~8.8M passages' 64-d latents sharded over a v5e-8
mesh, batched queries, local top-k per device, all-gather merge. Latents are
synthesized ON DEVICE (host->device transfer through the dev tunnel crawls;
real deployments stream real latents into the same sharded layout).

On a single chip or CPU the mesh is virtual:
  JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
      python scripts/scale_bench.py --n 1048576 --devices 8

Prints one JSON line with the measured sharded-search QPS.
"""

from __future__ import annotations

import argparse
import json
import sys
import os
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax

# honor JAX_PLATFORMS=cpu: the axon sitecustomize force-selects the TPU
# via jax.config AFTER import, so the env var alone is ignored (CLAUDE.md)
if os.environ.get("JAX_PLATFORMS", "").startswith("cpu"):
    jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from latentrag_tpu.ops import l2_normalize
from latentrag_tpu.parallel import make_mesh, make_sharded_topk, row_sharded

_fetch = jax.jit(lambda v: v.ravel()[0].astype(jnp.float32))


def sync(x):
    np.asarray(_fetch(x))


def main(argv=None) -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--n", type=int, default=8_841_823 // 4,
                   help="corpus rows (default: quarter MS-MARCO)")
    p.add_argument("--d", type=int, default=64)
    p.add_argument("--queries", type=int, default=1024)
    p.add_argument("--k", type=int, default=10)
    p.add_argument("--devices", type=int, default=None)
    p.add_argument("--reps", type=int, default=10)
    args = p.parse_args(argv)

    mesh = make_mesh(args.devices)
    n_dev = mesh.shape["data"]
    on_tpu = jax.default_backend() == "tpu"
    dtype = jnp.bfloat16 if on_tpu else jnp.float32

    # pad rows to the mesh, then generate each shard's latents in place
    n_pad = args.n + ((-args.n) % n_dev)
    sharding = row_sharded(mesh)

    @jax.jit
    def gen_corpus(key):
        x = jax.random.normal(key, (n_pad, args.d), jnp.float32)
        return jax.lax.with_sharding_constraint(
            l2_normalize(x).astype(dtype), sharding
        )

    t0 = time.perf_counter()
    corpus = gen_corpus(jax.random.PRNGKey(0))
    sync(corpus)
    build_s = time.perf_counter() - t0
    queries = l2_normalize(
        jax.random.normal(jax.random.PRNGKey(1), (args.queries, args.d),
                          jnp.float32)
    ).astype(dtype)
    queries = jax.device_put(queries, NamedSharding(mesh, P()))

    search = make_sharded_topk(
        mesh, k=args.k, metric="cosine",
        backend="approx" if on_tpu else "exact",
    )
    n_valid = jnp.int32(args.n)
    sync(search(queries, corpus, n_valid)[0])  # compile
    t0 = time.perf_counter()
    outs = [search(queries, corpus, n_valid) for _ in range(args.reps)]
    sync(outs[-1][0])
    dt = (time.perf_counter() - t0) / args.reps

    qps = args.queries / dt
    print(
        f"[scale] {args.n:,} x {args.d} over {n_dev} devices: "
        f"gen+layout {build_s:.1f}s, search {dt * 1e3:.2f} ms/batch",
        file=sys.stderr,
    )
    print(
        json.dumps(
            {
                "metric": "sharded_topk_qps",
                "value": round(qps, 1),
                "unit": "qps",
                "n_corpus": args.n,
                "devices": n_dev,
                "ms_per_batch": round(dt * 1e3, 3),
            }
        )
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())
