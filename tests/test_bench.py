"""bench.py relay-dark guard: the driver must always get its JSON line.

The axon relay can go fully dark for 10-60+ min (docs/ROOFLINE.md); a
bench run that blocks in an un-interruptible host fetch at round end
would lose the round's BENCH artifact entirely.  These tests exercise
the probe-then-run logic without touching any relay.
"""

import subprocess

import bench


class _Done(Exception):
    pass


def test_relay_alive_success(monkeypatch):
    calls = []

    def fake_run(cmd, timeout, capture_output):
        calls.append(timeout)
        return subprocess.CompletedProcess(cmd, 0, b"0.1\n", b"")

    monkeypatch.setattr(bench.subprocess, "run", fake_run)
    assert bench._relay_alive(120.0) is True
    assert len(calls) == 1 and calls[0] <= 120.0


def test_relay_alive_gives_up_within_budget(monkeypatch):
    """Timeouts + nonzero exits retry, then fail once the budget is spent
    (no sleep between attempts here: time is advanced via the fake)."""
    t = [0.0]

    def fake_time():
        return t[0]

    def fake_sleep(s):
        t[0] += s

    attempts = []

    def fake_run(cmd, timeout, capture_output):
        attempts.append(timeout)
        t[0] += 50.0  # each probe burns 50 "seconds"
        if len(attempts) == 1:
            raise subprocess.TimeoutExpired(cmd, timeout)
        return subprocess.CompletedProcess(cmd, 1, b"", b"boom")

    monkeypatch.setattr(bench.subprocess, "run", fake_run)
    monkeypatch.setattr(bench.time, "time", fake_time)
    monkeypatch.setattr(bench.time, "sleep", fake_sleep)
    assert bench._relay_alive(140.0) is False
    assert len(attempts) >= 2  # it retried before giving up


def test_relay_alive_recovers_after_outage(monkeypatch):
    """A dark window shorter than the budget ends with a live relay."""
    t = [0.0]
    monkeypatch.setattr(bench.time, "time", lambda: t[0])
    monkeypatch.setattr(
        bench.time, "sleep", lambda s: t.__setitem__(0, t[0] + s)
    )
    n = [0]

    def fake_run(cmd, timeout, capture_output):
        n[0] += 1
        t[0] += 10.0
        if n[0] < 3:
            raise subprocess.TimeoutExpired(cmd, timeout)
        return subprocess.CompletedProcess(cmd, 0, b"0.1\n", b"")

    monkeypatch.setattr(bench.subprocess, "run", fake_run)
    assert bench._relay_alive(600.0) is True
    assert n[0] == 3


def test_relay_alive_tiny_budget_still_probes_once(monkeypatch):
    """A small positive budget means 'probe once, briefly' — never 'skip
    straight to the CPU fallback without asking the relay'."""
    runs = []

    def fake_run(cmd, timeout, capture_output):
        runs.append(timeout)
        return subprocess.CompletedProcess(cmd, 0, b"0.1\n", b"")

    monkeypatch.setattr(bench.subprocess, "run", fake_run)
    assert bench._relay_alive(1.0) is True
    assert len(runs) == 1 and runs[0] >= 60.0  # floor timeout applied


def test_guarded_child_failure_labeled_not_relay_dark(monkeypatch):
    """A nonzero child exit under a live relay is a CODE failure: the
    fallback JSON must carry bench_child_rc, not relay_dark."""
    monkeypatch.setattr(bench, "_relay_alive", lambda b: True)
    monkeypatch.setattr(
        bench.subprocess, "run",
        lambda cmd, env, timeout, stdout: subprocess.CompletedProcess(
            cmd, 3, b"", b""
        ),
    )
    switched = []
    monkeypatch.setattr(
        bench.jax.config, "update", lambda k, v: switched.append((k, v))
    )
    seen = {}
    monkeypatch.setattr(
        bench, "main",
        lambda relay_dark=False, child_rc=None: seen.update(
            relay_dark=relay_dark, child_rc=child_rc
        ) or 0,
    )
    assert bench._run_guarded() == 0
    assert seen == {"relay_dark": False, "child_rc": 3}
    assert switched == [("jax_platforms", "cpu")]


def test_probe_skipped_on_cpu_platform():
    """Under the test conftest the platform is cpu — __main__'s gate
    ('axon' in jax_platforms) must be False so bench runs unguarded."""
    import jax

    assert "axon" not in str(jax.config.jax_platforms or "")


def _patch_cpu_switch(monkeypatch):
    switched = []
    monkeypatch.setattr(
        bench.jax.config, "update",
        lambda k, v: switched.append((k, v)),
    )
    return switched


def test_guarded_forwards_child_json(monkeypatch, capsys):
    """Healthy relay + healthy child: the child's stdout JSON is forwarded
    verbatim and no CPU fallback runs."""
    monkeypatch.setattr(bench, "_relay_alive", lambda b: True)
    monkeypatch.setattr(
        bench.subprocess, "run",
        lambda cmd, env, timeout, stdout: subprocess.CompletedProcess(
            cmd, 0, b'{"metric": "latent_topk_qps", "value": 1.0}\n', b""
        ),
    )
    monkeypatch.setattr(
        bench, "main",
        lambda relay_dark=False: (_ for _ in ()).throw(_Done()),
    )
    assert bench._run_guarded() == 0
    assert '"latent_topk_qps"' in capsys.readouterr().out


def test_guarded_falls_back_when_child_hangs(monkeypatch):
    """A mid-run dark relay (child timeout) must switch the parent to CPU
    and re-run main with relay_dark marked."""
    monkeypatch.setattr(bench, "_relay_alive", lambda b: True)

    def fake_run(cmd, env, timeout, stdout):
        raise subprocess.TimeoutExpired(cmd, timeout)

    monkeypatch.setattr(bench.subprocess, "run", fake_run)
    switched = _patch_cpu_switch(monkeypatch)
    seen = []

    def fake_main(relay_dark=False):
        seen.append(relay_dark)
        return 0

    monkeypatch.setattr(bench, "main", fake_main)
    assert bench._run_guarded() == 0
    assert switched == [("jax_platforms", "cpu")] and seen == [True]


def test_guarded_falls_back_when_probe_dark(monkeypatch):
    """Probe exhausting its budget skips the child entirely."""
    monkeypatch.setattr(bench, "_relay_alive", lambda b: False)
    monkeypatch.setattr(
        bench.subprocess, "run",
        lambda *a, **k: (_ for _ in ()).throw(AssertionError("no child")),
    )
    switched = _patch_cpu_switch(monkeypatch)
    seen = []
    monkeypatch.setattr(
        bench, "main", lambda relay_dark=False: seen.append(relay_dark) or 0
    )
    assert bench._run_guarded() == 0
    assert switched == [("jax_platforms", "cpu")] and seen == [True]


def _scripted_timer(seq):
    it = iter(seq)
    return lambda: next(it)


def test_bench_device_two_point_quotient():
    import jax.numpy as jnp

    q = jnp.ones((2, 4), jnp.float32)
    c = jnp.ones((8, 4), jnp.float32)
    search = lambda qq, cc: (qq @ cc.T, None)  # noqa: E731
    # r_small=2 measured 1s, r_big=4 measured 3s -> 1 s/call
    dt, ovh, info = bench.bench_device(
        search, q, c, r_small=2, r_big=4, reps=1,
        timer=_scripted_timer([0.0, 1.0, 0.0, 3.0]),
    )
    assert abs(dt - 1.0) < 1e-9
    assert info["fallback"] is False and ovh is not None
    # reps=1 -> a single paired quotient -> no spread estimate
    assert info["spread"] is None and info["reps"] == 1


def test_bench_device_negative_quotient_falls_back_to_upper_bound():
    """Relay jitter can make the big trip count finish 'faster' than the
    small one; the old clamp to 1e-9 turned that into a million-x
    speedup downstream.  After one retry the quotient must fall back to
    the dispatch-inclusive upper bound times[r_big]/r_big."""
    import jax.numpy as jnp

    q = jnp.ones((2, 4), jnp.float32)
    c = jnp.ones((8, 4), jnp.float32)
    search = lambda qq, cc: (qq @ cc.T, None)  # noqa: E731
    # both attempts: small=10s, big=5s -> quotient negative twice
    seq = [0.0, 10.0, 10.0, 15.0] * 2
    dt, ovh, info = bench.bench_device(
        search, q, c, r_small=2, r_big=4, reps=1,
        timer=_scripted_timer(seq),
    )
    assert abs(dt - 5.0 / 4.0) < 1e-9
    # the fallback is flagged and the (meaningless) overhead nulled, so
    # JSON rows can never pass a dispatch-inclusive bound off as an
    # in-program quotient (ADVICE r4)
    assert info["fallback"] is True and ovh is None


def test_bench_device_spread_reported_across_reps():
    import jax.numpy as jnp

    q = jnp.ones((2, 4), jnp.float32)
    c = jnp.ones((8, 4), jnp.float32)
    search = lambda qq, cc: (qq @ cc.T, None)  # noqa: E731
    # reps=2: small samples 1s,1s; big samples 3s,5s ->
    # paired quotients (3-1)/2=1.0 and (5-1)/2=2.0; median 1.5
    dt, _, info = bench.bench_device(
        search, q, c, r_small=2, r_big=4, reps=2,
        timer=_scripted_timer([0.0, 1.0, 0.0, 1.0, 0.0, 3.0, 0.0, 5.0]),
    )
    assert abs(dt - (4.0 - 1.0) / 2.0) < 1e-9  # medians: 1s and 4s
    assert abs(info["spread"] - (2.0 - 1.0) / 1.5) < 1e-9
