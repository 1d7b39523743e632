"""Driver-contract tests for __graft_entry__.py.

The driver imports the module in a fresh process (no JAX_PLATFORMS /
XLA_FLAGS set, the axon sitecustomize active) and calls
``dryrun_multichip(8)``. Reproduce those exact conditions in a subprocess so
a regression in the internal platform forcing is caught before the driver's
MULTICHIP check fails (VERDICT r1 item 1).
"""

import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_dryrun_multichip_clean_env():
    env = {
        k: v for k, v in os.environ.items()
        if k not in ("JAX_PLATFORMS", "XLA_FLAGS")
    }
    proc = subprocess.run(
        [sys.executable, "-c",
         "import __graft_entry__; __graft_entry__.dryrun_multichip(8); "
         "print('DRYRUN_OK')"],
        cwd=REPO, env=env, capture_output=True, text=True, timeout=600,
    )
    assert proc.returncode == 0, proc.stderr[-4000:]
    assert "DRYRUN_OK" in proc.stdout
    # the driver artifact should list every sharded workload
    for w in ("workload 1", "workload 2", "workload 3", "workload 4"):
        assert w in proc.stdout, proc.stdout


def test_entry_compiles_on_cpu():
    # entry() itself must stay importable and jittable; run it on the test
    # session's CPU platform (conftest pins it) rather than a subprocess so
    # it shares the compile cache.
    import jax

    import __graft_entry__

    fn, args = __graft_entry__.entry()
    out = jax.jit(fn)(*args)
    assert out.shape == (8, 64)
