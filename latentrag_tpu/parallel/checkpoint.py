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
    # host-side filesystem mutations happen on process 0 only; every other
    # process would otherwise race the rmtree/meta write on shared storage
    if jax.process_index() == 0:
        if os.path.exists(path):
            import shutil

            shutil.rmtree(path)
        os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    if jax.process_count() > 1:
        from jax.experimental import multihost_utils

        # no process may enter the collective save before the old
        # checkpoint directory is gone
        multihost_utils.sync_global_devices("latentrag_sharded_index_save")
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(os.path.join(path, "corpus"), {"corpus": corpus})
    ckptr.wait_until_finished()
    if jax.process_index() == 0:
        with open(os.path.join(path, "meta.json"), "w") as f:
            json.dump(meta, f)
    if jax.process_count() > 1:
        from jax.experimental import multihost_utils

        # non-zero processes must not return (and possibly reload) before
        # process 0 has written meta.json — caught by the 2-process test:
        # a racing loader hit FileNotFoundError and its partner then hung
        # in the restore collective
        multihost_utils.sync_global_devices("latentrag_sharded_index_done")


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
