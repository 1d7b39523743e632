"""Multi-host / multi-slice runtime initialisation.

For deployments larger than one host (v5e-8 pods and beyond):
``initialize_distributed`` wires ``jax.distributed`` (coordinator discovery
via env or explicit args) and ``global_mesh`` builds a mesh over ALL
processes' devices with the corpus/data axis laid out so collectives ride
ICI within a slice before crossing DCN (axis order: slice-internal first).

Single-process calls are no-ops returning local equivalents, so the same
entry points work from a laptop CPU to a pod.
"""

from __future__ import annotations

import logging
import os

import jax
import numpy as np
from jax.sharding import Mesh

log = logging.getLogger("latentrag.utils")


def initialize_distributed(
    coordinator_address: str | None = None,
    num_processes: int | None = None,
    process_id: int | None = None,
) -> bool:
    """Initialise jax.distributed when running multi-process; returns True
    when a multi-process runtime is active.

    Falls back to env discovery (``JAX_COORDINATOR_ADDRESS`` etc. or the
    TPU-pod auto-detection inside jax.distributed.initialize).
    """
    explicit = coordinator_address or os.environ.get(
        "JAX_COORDINATOR_ADDRESS"
    )
    want_multi = explicit is not None or os.environ.get("TPU_WORKER_ID")
    if not want_multi:
        return False
    try:
        jax.distributed.initialize(
            coordinator_address=explicit,
            num_processes=num_processes,
            process_id=process_id,
        )
        log.info(
            "distributed runtime: process %d/%d",
            jax.process_index(),
            jax.process_count(),
        )
        return jax.process_count() > 1
    except Exception as e:
        log.warning("jax.distributed.initialize failed: %s", e)
        return False


def global_mesh(axis: str = "data") -> Mesh:
    """1-D mesh over every device of every process, ordered so neighbouring
    mesh positions are ICI neighbours where possible (jax.devices() orders
    by (process, local device), which matches slice-major layout)."""
    return Mesh(np.array(jax.devices()), (axis,))
