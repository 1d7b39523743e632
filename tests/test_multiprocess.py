"""Multi-process jax.distributed execution test.

The one distributed claim that (through round 2) had zero executed evidence:
``parallel/distributed.py``'s real ``jax.distributed.initialize`` branch and
collectives across an actual process boundary. Here two OS processes with 4
virtual CPU devices each form one 8-device global mesh (coordinator on a
free localhost port, Gloo transport) and run the framework's sharded exact +
SQ8 top-k and a cross-process reduction, each asserted against a host oracle
inside the workers (``scripts/multiproc_worker.py``).
"""

import os
import socket
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
WORKER = os.path.join(REPO, "scripts", "multiproc_worker.py")


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


def launch_workers(num_processes: int = 2, local_devices: int = 4,
                   timeout: int = 300, checkpoint_dir: str = ""):
    """Spawn the worker fleet; returns the per-process CompletedProcess list."""
    port = _free_port()
    env = os.environ.copy()
    # the workers force their own platform/device-count before importing
    # jax, but scrub the test session's 8-device XLA_FLAGS anyway so a
    # worker bug can't silently inherit the wrong world size
    env.pop("XLA_FLAGS", None)
    extra = (["--checkpoint_dir", checkpoint_dir] if checkpoint_dir else [])
    procs = [
        subprocess.Popen(
            [sys.executable, WORKER,
             "--process_id", str(i),
             "--num_processes", str(num_processes),
             "--coordinator", f"localhost:{port}",
             "--local_devices", str(local_devices)] + extra,
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
            env=env, cwd=REPO,
        )
        for i in range(num_processes)
    ]
    outs = []
    try:
        for p in procs:
            out, _ = p.communicate(timeout=timeout)
            outs.append((p.returncode, out))
    finally:
        for p in procs:
            if p.poll() is None:
                p.kill()
    return outs


def test_two_process_global_mesh_sharded_topk():
    outs = launch_workers(num_processes=2, local_devices=4)
    for rank, (rc, out) in enumerate(outs):
        assert rc == 0, f"worker {rank} failed (rc={rc}):\n{out}"
        assert f"MULTIPROC_OK process={rank}/2 devices=8" in out, out
        assert "exact sharded top-k == oracle" in out
        assert "SQ8 sharded top-k within tolerance" in out
        assert "cross-process reduction == host sum" in out


def test_two_process_sharded_checkpoint_roundtrip(tmp_path):
    """Orbax sharded-index save/restore across a real process boundary:
    each process writes its own shards, process 0 owns the filesystem
    mutations, and the restored (still-sharded) corpus searches
    identically."""
    outs = launch_workers(num_processes=2, local_devices=4,
                          checkpoint_dir=str(tmp_path / "shidx"))
    for rank, (rc, out) in enumerate(outs):
        assert rc == 0, f"worker {rank} failed (rc={rc}):\n{out}"
        assert "sharded checkpoint round-trip ok" in out, out
        assert f"MULTIPROC_OK process={rank}/2" in out


def test_initialize_distributed_noop_single_process():
    """Without a coordinator the entry point is a clean no-op (the laptop /
    single-host path); the worker script is the multi-process proof."""
    from latentrag_tpu.parallel.distributed import initialize_distributed

    assert initialize_distributed() is False
