"""Deployment readiness diagnostics: ``python -m latentrag_tpu.doctor``.

One command that answers "will this box serve?" before anything is
deployed on it: import/version surface, JAX platform (optionally probing
a real TPU relay from a killable subprocess — the axon tunnel can go
dark for 10-60+ min and a blocked in-process fetch cannot be
interrupted), the native C++ library (build + ABI), the tokenizer fast
path, persisted index stores (meta/texts/sidecar cross-checks, including
the r4 generation tags), and training checkpoints.

Output follows the serve.py convention: the human-readable report goes
to stderr, stdout carries exactly ONE JSON summary line (machines parse
stdout, humans read stderr). Exit code 0 = no failures, 1 = at least one
FAIL. Warnings (absent optional pieces) never fail the run.

The reference ships no equivalent; this tool exists because the TPU
deployment story (remote chips, native ANN tier, mmap'd stores) has more
moving parts than the reference's single-process FAISS world.
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys

PASS, WARN, FAIL = "pass", "warn", "fail"

_PROBE_CODE = (
    "import jax, numpy as np\n"
    "x = jax.jit(lambda k: jax.random.normal(k, (4, 4)))"
    "(jax.random.PRNGKey(0))\n"
    "print(float(np.asarray(x)[0, 0]))\n"
)


def _versions() -> tuple[str, str, list[str]]:
    import flax
    import jax
    import numpy as np
    import optax

    try:
        import orbax.checkpoint as ocp

        orbax_v = getattr(ocp, "__version__", "present")
    except Exception:
        orbax_v = None
    detail = (
        f"jax {jax.__version__}, flax {flax.__version__}, "
        f"optax {optax.__version__}, orbax {orbax_v or 'MISSING'}, "
        f"numpy {np.__version__}"
    )
    if orbax_v is None:
        # sharded (mesh) persistence and training resume hard-require it
        return WARN, detail + " — checkpointing/sharded stores unusable", []
    return PASS, detail, []


def _platform(probe_chip: bool, probe_timeout: float):
    import jax

    platforms = str(jax.config.jax_platforms or "(default)")
    if not probe_chip:
        return PASS, f"configured platforms: {platforms} (chip not probed; " \
                     "use --chip)", []
    try:
        r = subprocess.run(
            [sys.executable, "-c", _PROBE_CODE],
            timeout=probe_timeout, capture_output=True,
        )
        if r.returncode == 0:
            return PASS, f"platforms {platforms}; device probe answered", []
        return FAIL, (
            f"device probe exited rc={r.returncode}: "
            f"{r.stderr.decode(errors='replace')[-160:]}"
        ), []
    except subprocess.TimeoutExpired:
        return FAIL, (
            f"device probe hung >{probe_timeout:.0f}s — relay dark or no "
            "device; retry later"
        ), []


def _native():
    try:
        from .retrieval.ann import ABI_VERSION, _load_library

        _load_library()
        return PASS, f"liblatentrag_native loaded (ABI {ABI_VERSION})", []
    except Exception as e:
        return FAIL, f"native library unusable: {e}", []


def _tokenizer_native():
    try:
        from .data.tokenizer import CLS, PAD, SEP, UNK, WordPieceTokenizer

        vocab = {PAD: 0, UNK: 1, CLS: 2, SEP: 3, "hello": 4, "world": 5}
        tok = WordPieceTokenizer(vocab)
        if tok._native_handle() is not None:
            ids, mask = tok.encode_batch(["hello world"])
            return PASS, "C++ WordPiece fast path active " \
                         f"(batch shape {ids.shape})", []
        return WARN, "C++ WordPiece unavailable — Python fallback " \
                     "(~140x slower host tokenization)", []
    except Exception as e:
        return FAIL, f"tokenizer self-test failed: {e}", []


def _dense_store(path: str):
    """Cross-check a dense index directory the way a warm boot would,
    plus sidecar-consistency checks a boot defers."""
    import numpy as np

    from .retrieval.textstore import load_texts

    notes: list[str] = []
    meta_p = os.path.join(path, "meta.json")
    try:
        with open(meta_p) as f:
            meta = json.load(f)
    except Exception as e:
        return FAIL, f"meta.json unreadable: {e}", notes
    n = int(meta.get("n", -1))
    texts, doc_ids = load_texts(os.path.join(path, "texts"))
    if texts is None:
        if "texts" in meta:
            texts = meta["texts"]
            notes.append("legacy store: texts inlined in meta.json")
        else:
            return FAIL, "no usable text store (lazy store invalid and " \
                         "meta.json has no texts)", notes
    if doc_ids is None:
        doc_ids = meta.get("doc_ids")
    if doc_ids is None:
        return FAIL, "no doc_ids (sidecar missing and none in meta)", notes
    if len(texts) != n or len(doc_ids) != n:
        return FAIL, (
            f"mixed-generation store: {len(texts)} texts / "
            f"{len(doc_ids)} doc_ids vs n={n}"
        ), notes

    def rows(name):
        p = os.path.join(path, name)
        if not os.path.exists(p):
            return None
        return int(np.load(p, mmap_mode="r").shape[0])

    corpus_rows = rows("corpus.npy")
    sharded = os.path.isdir(os.path.join(path, "sharded"))
    if corpus_rows is None and not sharded:
        return FAIL, "corpus.npy missing (and no sharded/ store)", notes
    if corpus_rows is not None and corpus_rows != n:
        return FAIL, f"corpus.npy holds {corpus_rows} rows vs n={n}", notes
    packed_rows = rows("binary_packed.npy")
    if packed_rows is not None and packed_rows != n:
        return FAIL, (
            f"binary_packed.npy holds {packed_rows} rows vs n={n} "
            "(stale sidecar?)"
        ), notes
    sq4_rows = rows("sq4_packed.npy")
    if sq4_rows is not None and sq4_rows != n:
        return FAIL, (
            f"sq4_packed.npy holds {sq4_rows} rows vs n={n} "
            "(stale sidecar?)"
        ), notes
    # same-n mixed generations: verify each sidecar's sampled digest
    # against meta.json (exactly what warm boot does, O(1) per file)
    from .retrieval.dense import verify_stored_digests

    try:
        verify_stored_digests(path, meta)
    except ValueError as e:
        return FAIL, str(e), notes
    if sharded:
        smeta_p = os.path.join(path, "sharded", "meta.json")
        try:
            with open(smeta_p) as f:
                smeta = json.load(f)
        except Exception as e:
            return FAIL, f"sharded/meta.json unreadable: {e}", notes
        want_gen = meta.get("sharded_generation")
        if int(smeta.get("n", -1)) != n or (
            want_gen is not None and smeta.get("generation") != want_gen
        ):
            return FAIL, (
                f"sharded store (n={smeta.get('n')}, generation="
                f"{smeta.get('generation')!r}) contradicts meta.json "
                f"(n={n}, generation={want_gen!r})"
            ), notes
        notes.append("sharded/ store present and generation-consistent")
    if packed_rows is not None:
        notes.append("binary tier sidecars present")
    if sq4_rows is not None:
        notes.append("int4 tier sidecars present")
    if os.path.exists(os.path.join(path, "whitener.npy")):
        notes.append("whitener present (mahalanobis/whitened metric)")
    fp = meta.get("fingerprint") or {}
    detail = (
        f"n={n}, metric={meta.get('metric')}, "
        f"fingerprint keys={sorted(fp)}" if fp else f"n={n}, no fingerprint"
    )
    return PASS, detail, notes


def _ann_store(stem: str, kind: str):
    """Consistency-check one ANN tier's sidecars without loading the C++
    index (doctor must stay cheap at multi-GB index scale)."""
    from .retrieval.textstore import load_texts

    notes: list[str] = []
    meta_p = stem + ".meta.json"
    try:
        with open(meta_p) as f:
            meta = json.load(f)
    except Exception as e:
        return FAIL, f"{kind} meta unreadable: {e}", notes
    texts, doc_ids = load_texts(stem + ".texts")
    if texts is None and "texts" not in meta:
        return FAIL, f"{kind} store has no usable texts", notes
    n = len(texts) if texts is not None else len(meta["texts"])
    ids = doc_ids if doc_ids is not None else meta.get("doc_ids")
    if ids is None:
        # warm boot hits KeyError on meta['doc_ids'] and refuses
        return FAIL, f"{kind}: no doc_ids sidecar and none in meta " \
                     "(warm boot would cold-start)", notes
    if len(ids) != n:
        return FAIL, f"{kind}: {n} texts vs {len(ids)} doc_ids", notes
    rpath = stem + ".refine.npy"
    if os.path.exists(rpath):
        import numpy as np

        rrows = int(np.load(rpath, mmap_mode="r").shape[0])
        if rrows != n:
            return FAIL, (
                f"{kind}: refine sidecar holds {rrows} rows for {n} "
                "texts (stale sidecar — warm boot would cold-start)"
            ), notes
        notes.append(f"refine sidecar present ({rrows} rows)")
    fp = meta.get("fingerprint") or {}
    return PASS, f"{kind}: {n} texts, fingerprint keys={sorted(fp)}", notes


def _stores(index_path: str):
    """Yield (name, status, detail, notes) for every store at the path.

    Each store check runs under its own crash guard: a corrupted sidecar
    (truncated npy, non-integer meta field — exactly what this tool
    exists to diagnose) must become a FAIL row, never an exception that
    robs stdout of its one JSON line."""

    def guarded(fn, *a):
        try:
            return fn(*a)
        except Exception as e:
            return FAIL, f"check crashed: {e!r}", []

    found = False
    if os.path.exists(os.path.join(index_path, "meta.json")):
        found = True
        status, detail, notes = guarded(_dense_store, index_path)
        yield "store:dense", status, detail, notes
    for kind in ("hnsw", "ivfpq"):
        stem = f"{index_path}.{kind}"
        if os.path.exists(stem + ".meta.json"):
            found = True
            status, detail, notes = guarded(_ann_store, stem, kind)
            yield f"store:{kind}", status, detail, notes
    if not found:
        yield "store", WARN, (
            f"no persisted store at {index_path} (first boot will be cold)"
        ), []


def _checkpoints(ckpt_dir: str):
    notes = []
    if not os.path.isdir(ckpt_dir):
        return WARN, f"{ckpt_dir} absent — encoder self-initialises, AE " \
                     "pipelines need training first", notes
    names = sorted(os.listdir(ckpt_dir))
    enc = [n for n in names if n.endswith(".msgpack")]
    aes = [n for n in names if n in ("vae", "dae", "cae")]
    detail = f"{len(enc)} msgpack checkpoint(s), AE dirs: {aes or 'none'}"
    return PASS, detail, notes


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(
        description="latentrag-tpu deployment readiness checks"
    )
    ap.add_argument("--index", default=None,
                    help="index_path to health-check (default: config's)")
    ap.add_argument("--checkpoints", default=None,
                    help="checkpoints dir (default: config's)")
    ap.add_argument("--chip", action="store_true",
                    help="probe the real device from a subprocess "
                         "(skipped by default: the relay may be slow)")
    ap.add_argument("--probe-timeout", type=float, default=300.0)
    args = ap.parse_args(argv)

    if args.index is None or args.checkpoints is None:
        from .utils.config import load_config

        cfg = load_config()
        if args.index is None:
            args.index = cfg.retrieval.index_path
        if args.checkpoints is None:
            args.checkpoints = cfg.paths.checkpoints_dir

    checks: list[tuple[str, str, str, list[str]]] = []

    def run(name, fn, *a):
        try:
            status, detail, notes = fn(*a)
        except Exception as e:  # a crashing check is itself a failure
            status, detail, notes = FAIL, f"check crashed: {e!r}", []
        checks.append((name, status, detail, notes))

    run("imports", _versions)
    run("platform", _platform, args.chip, args.probe_timeout)
    run("native", _native)
    run("tokenizer", _tokenizer_native)
    for item in _stores(args.index):
        checks.append(item)
    run("checkpoints", _checkpoints, args.checkpoints)

    counts = {PASS: 0, WARN: 0, FAIL: 0}
    mark = {PASS: "ok  ", WARN: "WARN", FAIL: "FAIL"}
    for name, status, detail, notes in checks:
        counts[status] += 1
        print(f"[doctor] {mark[status]} {name}: {detail}", file=sys.stderr)
        for note in notes:
            print(f"[doctor]      - {note}", file=sys.stderr)
    print(
        f"[doctor] {counts[PASS]} ok, {counts[WARN]} warnings, "
        f"{counts[FAIL]} failures", file=sys.stderr,
    )
    print(json.dumps({
        "doctor": {
            "ok": counts[FAIL] == 0,
            "pass": counts[PASS], "warn": counts[WARN],
            "fail": counts[FAIL],
            "checks": {
                name: {"status": status, "detail": detail}
                for name, status, detail, _ in checks
            },
        }
    }))
    return 0 if counts[FAIL] == 0 else 1


if __name__ == "__main__":
    sys.exit(main())
