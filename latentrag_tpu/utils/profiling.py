"""Device profiling: jax.profiler trace spans + wall-clock integration.

The reference's only tracing is wall-clock accumulation (SURVEY §5); on TPU
that misses the async-dispatch gap, so this adds:

* ``trace(dir)`` — context manager around ``jax.profiler`` writing a
  TensorBoard-loadable trace;
* ``annotate(name)`` — TraceAnnotation span visible in the trace timeline;
* ``timed_blocked(store, key)`` — wall-clock span that blocks on device work
  before stopping the clock (correct jitted-kernel timing).
"""

from __future__ import annotations

import logging
from contextlib import contextmanager

import jax

log = logging.getLogger("latentrag.utils")


@contextmanager
def trace(log_dir: str):
    """Capture a device trace into ``log_dir`` (view with TensorBoard)."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
        log.info("profiler trace written to %s", log_dir)


def annotate(name: str):
    """Named span that shows up on the trace timeline."""
    return jax.profiler.TraceAnnotation(name)


@contextmanager
def timed_blocked(store: dict, key: str, *outputs):
    """Wall-clock span; forces completion of ``outputs`` (device arrays) at
    exit via a scalar fetch — ``jax.block_until_ready`` does not actually
    block through the axon relay (CLAUDE.md), which would stop the clock at
    dispatch-ack and report wildly short device times."""
    import time

    from .timing import force_completion

    t0 = time.perf_counter()
    collected = list(outputs)
    try:
        yield collected
    finally:
        for out in collected:
            force_completion(out)
        store[key] = store.get(key, 0.0) + (time.perf_counter() - t0)
