"""Device-mesh construction helpers.

The reference is strictly single-device (SURVEY §2.3: no torch.distributed,
no collectives anywhere); the scaling axis that matters for this workload is
the corpus-row dimension, so the canonical mesh here is 1-D with a ``"data"``
axis used both for corpus sharding (retrieval) and batch sharding (AE
training). Collectives ride ICI via ``shard_map`` + ``jax.lax`` primitives.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"


def make_mesh(n_devices: int | None = None, axis: str = DATA_AXIS) -> Mesh:
    """1-D mesh over the first ``n_devices`` local devices (default: all)."""
    devices = jax.devices()
    if n_devices is not None:
        if n_devices > len(devices):
            raise ValueError(
                f"requested {n_devices} devices, have {len(devices)}"
            )
        devices = devices[:n_devices]
    return Mesh(np.array(devices), axis_names=(axis,))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def row_sharded(mesh: Mesh, axis: str = DATA_AXIS) -> NamedSharding:
    """Shard the leading (row) dimension across the mesh axis."""
    return NamedSharding(mesh, P(axis))


def shard_rows(x: jax.Array, mesh: Mesh, axis: str = DATA_AXIS) -> jax.Array:
    """Pad rows to a multiple of the mesh size and lay them out sharded.

    Returns the padded, device-sharded array; callers track the original row
    count for masking (padded rows must never win a top-k).
    """
    import jax.numpy as jnp

    p = mesh.shape[axis]
    pad = (-x.shape[0]) % p
    if pad:
        x = jnp.concatenate([x, jnp.zeros((pad,) + x.shape[1:], x.dtype)])
    return jax.device_put(x, row_sharded(mesh, axis))
