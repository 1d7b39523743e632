"""Headline benchmark: latent top-k retrieval throughput on TPU.

Reproduces the reference's measured configuration (BASELINE.md: SQuAD-scale
315-vector 64-d latent corpus, k=10, 2000 queries, cosine/IP — FAISS-GPU on
an RTX 4060 reached ~248.6k QPS by looping single-query calls) with the
TPU-native batched path, and prints ONE JSON line:

    {"metric": "latent_topk_qps", "value": ..., "unit": "qps",
     "vs_baseline": ...}

vs_baseline = measured QPS / 248,649 (mean of the reference's two runs,
``logs/benchmarks/experiments.csv:2-3`` — 1000/p50_ms). Secondary numbers
(1M-corpus throughput, MiniLM encode throughput, measured local-CPU ratios
from ``logs/cpu_baseline.json``) go to stderr.

Timing notes: through the axon relay ``block_until_ready`` does not wait, so
completion is forced by fetching a scalar. The first dispatches after idle
run ~5x slower than steady state (measured r2), so every timed section warms
up with several executed calls before the clock starts.

Headline methodology (round 3): the relay's per-dispatch overhead is not
stable across sessions — measured 330 us/dispatch in round 2 but ~8 ms
amortized (and ~390 ms per host sync) during a round-3 degradation window
(docs/ROOFLINE.md "relay degradation"). A host-dispatched loop therefore
measures the tunnel, not the chip: the r2 toy headline (0.84 ms/batch) was
already ~40% dispatch overhead, and under the degraded relay the identical
code measures ~10x slower with zero change in device compute. The headline
is now DEVICE throughput: the search runs R times inside one compiled
``lax.fori_loop`` (queries rolled per iteration so no work is
loop-invariant; scores accumulated so every iteration is live), timed at
two trip counts, and the difference quotient (t(R_big)-t(R_small)) /
(R_big-R_small) cancels every fixed cost (dispatch, fetch round trip) by
construction. The host-dispatched number is still printed to stderr and
carried in the JSON as ``host_path_qps`` for continuity with BENCH_r01/r02.

Relay-dark armor (round 4): the relay can go fully dark for 10-60+ min,
and a blocked host fetch is not interruptible from Python.  When the axon
platform is active, ``__main__`` routes through ``_run_guarded``: probe the
relay from a killable subprocess, run the measurement itself in a child
with a hard timeout, and fall back to a CPU measurement if either fails —
labeled ``"relay_dark": true`` (probe exhausted / child hang) or
``"bench_child_rc"`` (child exited nonzero under a live relay: a code
failure, not an outage) — so the driver's BENCH artifact always
materializes.  ``LATENTRAG_BENCH_PROBE_S`` / ``_TIMEOUT_S`` tune
the budgets (probe 0 = skip straight to the child).
"""

from __future__ import annotations

import glob
import json
import os
import subprocess
import sys
import time

import numpy as np

import jax
import jax.numpy as jnp

from latentrag_tpu.ops import approx_topk, exact_topk, l2_normalize

REF_QPS = 248_649.0  # reference baseline (BASELINE.md)

_PROBE_CODE = (
    "import jax, numpy as np\n"
    "x = jax.jit(lambda k: jax.random.normal(k, (4, 4)))"
    "(jax.random.PRNGKey(0))\n"
    "print(float(np.asarray(x)[0, 0]))\n"
)


def _relay_alive(budget_s: float) -> bool:
    """Probe the axon relay from a killable subprocess before committing
    this process to it.

    The relay can go fully dark for 10-60+ min (docs/ROOFLINE.md r3/r4
    forensics): compiles and dispatches queue but the first host fetch
    never returns, and that hang is NOT interruptible from Python once
    this process blocks in the runtime.  A tiny jit+fetch in a subprocess
    with a timeout is the only safe liveness check.  Retries inside
    ``budget_s`` ride out short outages; a healthy relay answers in
    ~30-140 s (first remote compile) and far less when warm.
    """
    deadline = time.time() + budget_s
    attempt = 0
    while True:
        attempt += 1
        left = deadline - time.time()
        if attempt > 1 and left <= 0:
            return False
        try:
            # at least one probe always runs, with a floor timeout —
            # a small budget means "probe once, briefly", not "skip to
            # the CPU fallback without asking the relay at all"
            r = subprocess.run(
                [sys.executable, "-c", _PROBE_CODE],
                timeout=min(300.0, max(left, 60.0)), capture_output=True,
            )
            if r.returncode == 0:
                return True
            print(
                f"[bench] relay probe {attempt} failed (rc={r.returncode}): "
                f"{r.stderr.decode(errors='replace')[-200:]}",
                file=sys.stderr,
            )
        except subprocess.TimeoutExpired:
            print(
                f"[bench] relay probe {attempt} timed out "
                f"({min(300.0, max(left, 60.0)):.0f}s) — relay dark, "
                "retrying",
                file=sys.stderr,
            )
        time.sleep(min(30.0, max(deadline - time.time(), 0.0)))


_fetch = jax.jit(lambda v: v.ravel()[0].astype(jnp.float32))


def sync(x) -> None:
    np.asarray(_fetch(x))


def bench_call(fn, reps: int = 30, warm: int = 8) -> float:
    """Steady-state seconds/call: compile + warm dispatches excluded."""
    out = fn()  # always at least one executed call before the sync
    for _ in range(max(warm - 1, 0)):
        out = fn()
    sync(out[0] if isinstance(out, tuple) else out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn()
    sync(out[0] if isinstance(out, tuple) else out)
    return (time.perf_counter() - t0) / reps


def bench_device(search, queries, corpus, r_small: int, r_big: int,
                 reps: int = 3, timer=time.perf_counter):
    """Seconds per search via in-program iteration (dispatch-free).

    One compiled program with a *traced* trip count runs the search ``r``
    times in a ``fori_loop``; each iteration rolls the query batch by ``i``
    rows (cheap, defeats loop-invariant code motion) and folds one score
    into the carry (keeps every iteration live).  The per-call time is the
    two-point difference quotient, which cancels dispatch + sync overhead
    exactly; ``reps`` medians guard against relay jitter.

    Returns ``(dt_s, overhead_s, info)``. ``info`` carries measurement
    provenance so JSON rows can distinguish session variance from a real
    regression (VERDICT r4 weak 7): ``fallback`` — True when relay jitter
    defeated the quotient twice and ``dt`` is the dispatch-INCLUSIVE
    upper bound ``times[r_big]/r_big`` (pessimistic, not in-program);
    ``spread`` — (max-min)/median over the per-rep paired quotients
    (None when <2 positive pairs); ``reps`` — the sample count. When
    ``fallback`` fires, ``overhead`` is None (the fit that defines it
    did not hold).
    """

    # rolling a 1-row batch along axis 0 is the identity — the loop body
    # would be loop-invariant and XLA hoists it (measures ~0); roll the
    # feature axis instead so every iteration is a distinct live query
    roll_axis = 0 if int(queries.shape[0]) > 1 else 1

    @jax.jit
    def run(q, c, r):
        def body(i, acc):
            s = search(jnp.roll(q, i, axis=roll_axis), c)[0]
            return acc + s.ravel()[0].astype(jnp.float32)

        return jax.lax.fori_loop(0, r, body, jnp.float32(0.0))

    sync(run(queries, corpus, 2))  # compile + warm

    def measure():
        raw = {}
        for r in (r_small, r_big):
            samples = []
            for _ in range(reps):
                t0 = timer()
                sync(run(queries, corpus, r))
                samples.append(timer() - t0)
            raw[r] = samples
        return raw

    def quotient(raw):
        med = {r: float(np.median(v)) for r, v in raw.items()}
        return (med[r_big] - med[r_small]) / (r_big - r_small), med

    raw = measure()
    dt, med = quotient(raw)
    fallback = False
    if dt <= 0:
        # relay jitter can make the big trip count finish "faster" than
        # the small one; a clamped near-zero quotient reads as a
        # million-x speedup downstream (seen once on a Q=1 IVF row).
        # Retry once, then fall back to the dispatch-INCLUSIVE upper
        # bound — pessimistic but honest, and FLAGGED so JSON rows never
        # pass it off as an in-program number.
        raw = measure()
        dt, med = quotient(raw)
        if dt <= 0:
            dt = med[r_big] / r_big
            fallback = True
            print(
                "[bench_device] non-positive difference quotient twice — "
                f"reporting dispatch-inclusive upper bound {dt * 1e3:.3f} "
                "ms (fallback=True)", file=sys.stderr,
            )
    pairs = [
        (b - s) / (r_big - r_small)
        for s, b in zip(raw[r_small], raw[r_big])
    ]
    pos = [p for p in pairs if p > 0]
    spread = (
        float((max(pos) - min(pos)) / np.median(pos))
        if len(pos) >= 2 else None
    )
    overhead = None if fallback else med[r_small] - r_small * dt
    info = {"fallback": fallback, "reps": reps, "spread": spread}
    return max(dt, 1e-9), overhead, info


def _make_data(key, n, d, dtype):
    """Generate normalized vectors ON DEVICE (host->device transfers crawl
    through the relay tunnel; device RNG is effectively free)."""
    x = jax.random.normal(jax.random.PRNGKey(key), (n, d), jnp.float32)
    return l2_normalize(x).astype(dtype)


def _cpu_ratios(tpu_toy_qps, tpu_1m_qps):
    """Measured TPU/CPU ratios from scripts/cpu_baseline.py output."""
    path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "logs", "cpu_baseline.json")
    if not os.path.exists(path):
        return
    try:
        with open(path) as f:
            cpu = json.load(f)
        toy = cpu["ref_config_315"]["batched_qps"]
        print(
            f"[bench] vs local CPU (batched torch, {cpu['cpu_count']} core): "
            f"toy {tpu_toy_qps / toy:.1f}x",
            file=sys.stderr, end="",
        )
        if tpu_1m_qps and "corpus_1m" in cpu:
            big = cpu["corpus_1m"]["batched_qps"]
            print(f", 1M-corpus {tpu_1m_qps / big:,.0f}x", file=sys.stderr)
        else:
            print(file=sys.stderr)
    except Exception as e:
        print(f"[bench] cpu ratio skipped: {e}", file=sys.stderr)


def _bench_encoder(on_tpu: bool):
    """MiniLM forward throughput: 6-layer 384-d, 256-token batch on chip.

    The reference's dominant cost is SBERT encoding (SURVEY §3.1); this
    measures the device-side forward (tokenization is a host stage)."""
    from latentrag_tpu.models.encoder.minilm import MiniLMEncoder

    if not on_tpu:
        return None
    enc = MiniLMEncoder(
        vocab_size=30522, hidden_dim=384, num_layers=6, num_heads=12,
        mlp_dim=1536, dtype=jnp.bfloat16,
    )
    b, length = 128, 256
    ids = jnp.ones((b, length), jnp.int32)
    mask = jnp.ones((b, length), jnp.int32)
    params = jax.jit(enc.init)(jax.random.PRNGKey(0), ids, mask)["params"]
    apply = jax.jit(lambda p, i, m: enc.apply({"params": p}, i, m))
    # in-program, dispatch-immune (same methodology as the search rows):
    # mix the rolled dummy into the ids so iterations stay live
    qvec = jnp.arange(64, dtype=jnp.float32).reshape(8, 8)
    dt, _, _ = bench_device(
        lambda q, c: (apply(
            params, (ids + q[0, 0].astype(jnp.int32)) % 30522, mask
        )[0],),
        qvec, jnp.zeros((2, 2), jnp.float32), r_small=8, r_big=120,
    )
    print(
        f"[bench] MiniLM encode (6L 384d, batch {b} x {length} tok, "
        f"in-program): {dt * 1e3:.2f} ms/batch -> {b / dt:,.0f} "
        f"sentences/s", file=sys.stderr,
    )
    return b / dt


def _run_guarded() -> int:
    """Relay-dark armor around the measurement (CLAUDE.md discipline).

    The whole measurement runs in a KILLABLE child process: a relay that
    goes dark mid-run (r4 forensics: one host fetch took 726 s, a later
    window hung >40 min) blocks in native code this process could never
    interrupt, and the driver would lose the round's BENCH artifact.  The
    parent (this function) probes first, spawns the child with a hard
    timeout, and on any failure re-runs the measurement itself on CPU with
    ``relay_dark`` marked — one honest JSON line lands on stdout no matter
    what the tunnel does.  Child stderr passes through live.
    """
    probe_s = float(os.environ.get("LATENTRAG_BENCH_PROBE_S", "1500"))
    if probe_s <= 0 or _relay_alive(probe_s):
        budget = float(os.environ.get("LATENTRAG_BENCH_TIMEOUT_S", "2400"))
        env = dict(os.environ, LATENTRAG_BENCH_CHILD="1")
        try:
            r = subprocess.run(
                [sys.executable, os.path.abspath(__file__)],
                env=env, timeout=budget, stdout=subprocess.PIPE,
            )
            out = r.stdout.decode()
            if r.returncode == 0 and out.strip():
                sys.stdout.write(out)
                return 0
            # nonzero exit with a LIVE relay is a code failure, not an
            # outage — label it bench_child_rc so a regression is never
            # misread as relay flakiness
            print(
                f"[bench] measurement child failed (rc={r.returncode}) — "
                "CPU fallback", file=sys.stderr,
            )
            jax.config.update("jax_platforms", "cpu")
            return main(child_rc=r.returncode)
        except subprocess.TimeoutExpired:
            print(
                f"[bench] measurement exceeded {budget:.0f}s (relay went "
                "dark mid-run?) — CPU fallback", file=sys.stderr,
            )
    else:
        print(
            "[bench] axon relay dark after probe budget — CPU fallback "
            "(headline will NOT be a chip number)", file=sys.stderr,
        )
    jax.config.update("jax_platforms", "cpu")
    return main(relay_dark=True)


def main(relay_dark: bool = False, child_rc: int | None = None) -> int:
    on_tpu = jax.default_backend() == "tpu"
    backend = approx_topk if on_tpu else exact_topk
    dtype = jnp.bfloat16 if on_tpu else jnp.float32

    # --- headline: the reference's own configuration, batched -------------
    n, d, nq, k = 315, 64, 2000, 10
    corpus = _make_data(0, n, d, dtype)
    queries = _make_data(1, nq, d, dtype)

    dt_host = bench_call(
        lambda: backend(queries, corpus, k=k, metric="cosine"), reps=50
    )
    qps_host = nq / dt_host
    print(
        f"[bench] ref-config host-dispatched ({nq}q x {n}x{d}, k={k}): "
        f"{dt_host * 1e3:.3f} ms/batch -> {qps_host:,.0f} QPS",
        file=sys.stderr,
    )
    search = lambda q, c: backend(q, c, k=k, metric="cosine")  # noqa: E731
    prov: dict = {}
    if on_tpu:
        dt, ovh, info = bench_device(search, queries, corpus,
                                     r_small=64, r_big=2048)
        qps = nq / dt
        prov["headline"] = info
        ovh_s = "n/a" if ovh is None else "%.1f ms" % (ovh * 1e3)
        spr_s = ("n/a" if info["spread"] is None
                 else "%.2f" % info["spread"])
        print(
            f"[bench] ref-config device throughput: {dt * 1e3:.3f} ms/batch"
            f" -> {qps:,.0f} QPS (fixed dispatch+sync overhead {ovh_s} "
            f"excluded by two-point fit; spread {spr_s})",
            file=sys.stderr,
        )
    else:
        # XLA:CPU serializes while-loop bodies (no intra-op parallelism
        # inside lax loops), so in-program iteration underreports CPU by
        # >10x; host dispatch is honest off-TPU where there is no relay
        dt, qps = dt_host, qps_host

    # --- secondary: 1M-vector latent corpus at BOTH operating points ------
    # qps_1m_auto is what the shipped default delivers (the production
    # recall_target='auto' policy picks rt=0.99 at k=10 —
    # retrieval/dense.py RERANK_K); qps_1m_rt95 is the cheaper
    # candidate-generation point (rt=0.95, the k>=64 re-rank regime).
    # VERDICT r3 weak 1: both ride the JSON so every README claim maps to
    # a driver-reproducible number.
    qps_1m = {}
    try:
        n2 = 1_048_576
        corpus2 = _make_data(2, n2, d, dtype)
        q2 = queries[:1024]
        for label, rt in (("auto", 0.99), ("rt95", 0.95)):
            if on_tpu:
                def s_rt(q, c, _rt=rt):
                    return backend(q, c, k=k, metric="cosine",
                                   recall_target=_rt)

                dt2, _, info2 = bench_device(
                    s_rt, q2, corpus2, r_small=8, r_big=220,
                )
                prov[f"1m_{label}"] = info2
            else:
                dt2 = bench_call(
                    lambda: backend(q2, corpus2, k=k, metric="cosine"),
                    reps=3, warm=1,
                )
            qps_1m[label] = 1024 / dt2
            flops = 2.0 * 1024 * n2 * d
            print(
                f"[bench] 1M-corpus (1024q x {n2}x{d}, {label}"
                f"{'' if not on_tpu else f'=rt{rt}'}): "
                f"{dt2 * 1e3:.3f} ms/batch -> {qps_1m[label]:,.0f} QPS "
                f"({flops / dt2 / 1e12:.1f} TFLOP/s)",
                file=sys.stderr,
            )
            if not on_tpu:  # exact kernel has no recall_target knob
                qps_1m["rt95"] = qps_1m["auto"]
                break
        if on_tpu:
            # r4 filtered search: an in-kernel 50%-selectivity row mask at
            # the default operating point — measured FREE (ROOFLINE r4
            # filter table); the JSON carries it so the claim stays
            # driver-reproduced every round
            mask50 = jax.random.bernoulli(
                jax.random.PRNGKey(9), 0.5, (n2,)
            )

            def s_f(q, c):
                return backend(q, c, k=k, metric="cosine",
                               recall_target=0.99, mask=mask50)

            dt3, _, _ = bench_device(s_f, q2, corpus2, r_small=8, r_big=220)
            qps_1m["filtered"] = 1024 / dt3
            print(
                f"[bench] 1M-corpus filtered (sel=0.5, rt0.99): "
                f"{dt3 * 1e3:.3f} ms/batch -> {qps_1m['filtered']:,.0f} "
                f"QPS ({(dt3 / (1024 / qps_1m['auto']) - 1) * 100:+.1f}% "
                f"vs unfiltered)",
                file=sys.stderr,
            )
    except Exception as e:  # secondary only — never break the headline
        print(f"[bench] 1M-corpus benchmark skipped: {e}", file=sys.stderr)

    enc_rate = None
    try:
        enc_rate = _bench_encoder(on_tpu)
    except Exception as e:
        print(f"[bench] encoder benchmark skipped: {e}", file=sys.stderr)

    _cpu_ratios(qps, qps_1m.get("auto"))

    payload = {
        "metric": "latent_topk_qps",
        "value": round(qps, 1),
        "unit": "qps",
        "vs_baseline": round(qps / REF_QPS, 3),
        "host_path_qps": round(qps_host, 1),
    }
    if relay_dark:
        payload["relay_dark"] = True
    if child_rc is not None:
        payload["bench_child_rc"] = child_rc
    if "auto" in qps_1m:
        payload["qps_1m_auto"] = round(qps_1m["auto"], 1)
    if "rt95" in qps_1m:
        payload["qps_1m_rt95"] = round(qps_1m["rt95"], 1)
    if "filtered" in qps_1m:
        payload["qps_1m_filtered"] = round(qps_1m["filtered"], 1)
    if enc_rate:
        payload["encoder_sentences_per_s"] = round(enc_rate, 1)
    # measurement provenance (VERDICT r4 weak 7): per-point quotient
    # spread + whether the dispatch-inclusive fallback fired, so a future
    # reader can tell relay/session variance from a real regression
    for name, info in prov.items():
        if info.get("spread") is not None:
            payload[f"{name}_spread"] = round(info["spread"], 3)
        if info.get("fallback"):
            payload[f"{name}_fallback"] = True
    _vs_prev_round(payload, on_tpu)
    print(json.dumps(payload))
    return 0


def _vs_prev_round(payload: dict, on_tpu: bool) -> None:
    """Tolerance band vs the previous round's chip headline: records the
    ratio and warns when outside +-15% (beyond the documented relay
    session variance) — a drift guard, never a hard failure (the driver
    must always get its JSON line)."""
    if not on_tpu:
        return
    here = os.path.dirname(os.path.abspath(__file__))
    prev = sorted(
        glob.glob(os.path.join(here, "BENCH_r*.json")),
        key=lambda p: int(
            "".join(c for c in os.path.basename(p) if c.isdigit()) or 0
        ),
    )
    if not prev:
        return
    try:
        with open(prev[-1]) as f:
            last = json.load(f)
        if "value" not in last and "tail" in last:
            # the round driver wraps bench stdout: the JSON line is the
            # last {...} line inside "tail"
            for line in reversed(str(last["tail"]).splitlines()):
                line = line.strip()
                if line.startswith("{") and '"value"' in line:
                    last = json.loads(line)
                    break
        if last.get("relay_dark") or "value" not in last:
            return
        ratio = payload["value"] / float(last["value"])
        payload["vs_prev_round"] = round(ratio, 3)
        if not (0.85 <= ratio <= 1.15):
            print(
                f"[bench] headline {payload['value']:,.0f} QPS is "
                f"{ratio:.2f}x the previous round's {last['value']:,.0f} "
                f"({os.path.basename(prev[-1])}) — outside the +-15% "
                "band; check spread fields before reading this as a "
                "regression/speedup", file=sys.stderr,
            )
    except Exception as e:
        print(f"[bench] prev-round comparison skipped: {e}",
              file=sys.stderr)


if __name__ == "__main__":
    # The guard only matters when the axon relay would be used; direct CPU
    # runs (tests, dev) and the guarded child measure in-process.
    if (
        os.environ.get("LATENTRAG_BENCH_CHILD")
        or "axon" not in str(jax.config.jax_platforms or "")
    ):
        sys.exit(main())
    sys.exit(_run_guarded())
