"""Sharded-array index checkpointing via Orbax.

The host-side ``DenseRetriever`` persistence (numpy + meta.json) gathers the
corpus to host — fine single-chip, wrong at v5e-8 scale where the corpus
lives sharded across the mesh. Orbax writes each shard from its owning
device/host and restores directly into a target sharding (the SURVEY §5
"sharded latent-index arrays" deliverable).
"""

from __future__ import annotations

import os
from typing import Any

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def save_sharded_index(path: str, corpus: jax.Array, meta: dict) -> None:
    """Persist a (possibly sharded) corpus array + JSON metadata."""
    import json

    import orbax.checkpoint as ocp

    path = os.path.abspath(path)
    if os.path.exists(path):
        import shutil

        shutil.rmtree(path)
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(os.path.join(path, "corpus"), {"corpus": corpus})
    ckptr.wait_until_finished()
    with open(os.path.join(path, "meta.json"), "w") as f:
        json.dump(meta, f)


def load_sharded_index(
    path: str, mesh: Mesh | None = None, axis: str = "data"
) -> tuple[jax.Array, dict]:
    """Restore the corpus directly into a row-sharded layout on ``mesh``
    (replicated single-device layout when mesh is None)."""
    import json

    import orbax.checkpoint as ocp

    path = os.path.abspath(path)
    with open(os.path.join(path, "meta.json")) as f:
        meta = json.load(f)
    ckptr = ocp.StandardCheckpointer()
    item = ckptr.metadata(os.path.join(path, "corpus")).item_metadata.tree[
        "corpus"
    ]
    shape, dtype = item.shape, item.dtype
    if mesh is not None:
        sharding = NamedSharding(mesh, P(axis))
    else:
        sharding = NamedSharding(
            Mesh(np.array(jax.devices()[:1]), (axis,)), P()
        )
    target = jax.ShapeDtypeStruct(shape, dtype, sharding=sharding)
    restored = ckptr.restore(
        os.path.join(path, "corpus"), {"corpus": target}
    )
    return restored["corpus"], meta
