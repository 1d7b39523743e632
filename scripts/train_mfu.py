"""Training-step MFU on chip: encoder InfoNCE step + AE train steps.

VERDICT r4 weak-6: inference MFU was measured (103.8 TFLOP/s encoder)
but no ROOFLINE row existed for TRAINING step time. This measures the
jitted train steps with the in-program methodology (traced-trip-count
``fori_loop`` whose carry is the full (params, opt_state) optimizer
state — every iteration is live by construction, dispatch/ramp cancel
in the two-point quotient; bench.py::bench_device's recipe applied to
training).

Encoder: the 6-layer MiniLM geometry (384h/12heads/1536mlp — the
production tower ``models/encoder/minilm.py`` serves), InfoNCE over
B (query, positive) pairs = 2B sequence forwards + backward per step.
TFLOP/s uses the standard fwd+bwd = 3x forward matmul count.

AE: the VAE train step (384 -> 512 -> 64 geometry the reference
trains) at production batch — tiny matmuls; the row documents step
LATENCY (these are dispatch/bandwidth-bound, not MXU-bound).

  python scripts/train_mfu.py                          # chip
  JAX_PLATFORMS=cpu python scripts/train_mfu.py \
      --batch 8 --length 32 --r 2 4 --skip-ae          # smoke
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

if os.environ.get("JAX_PLATFORMS", "").startswith("cpu"):
    jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np
import optax

from bench import sync


def fwd_flops(b, l, h, nh, mlp, nl):
    """Matmul FLOPs of one MiniLM forward over b sequences of length l."""
    dh = h // nh
    per_layer = (
        2 * b * l * h * 3 * h           # qkv projections
        + 2 * b * nh * l * l * dh * 2   # scores + context
        + 2 * b * l * h * h             # attention output
        + 2 * b * l * h * mlp * 2       # mlp in + out
    )
    return nl * per_layer


def bench_step(step, state, r_small, r_big, reps=3):
    """In-program per-step seconds for ``step(carry) -> carry``.

    The carry (params + optimizer state) flows through every iteration,
    so no iteration can be hoisted or elided; the difference quotient
    between the two trip counts cancels dispatch + fetch + clock ramp.
    """

    @jax.jit
    def run(carry, r):
        carry = jax.lax.fori_loop(0, r, lambda i, c: step(c), carry)
        return jax.tree_util.tree_leaves(carry)[0].ravel()[0]

    sync(run(state, 2))  # compile + warm

    def measure():
        raw = {}
        for r in (r_small, r_big):
            samples = []
            for _ in range(reps):
                t0 = time.perf_counter()
                sync(run(state, r))
                samples.append(time.perf_counter() - t0)
            raw[r] = samples
        return raw

    raw = measure()
    med = {r: float(np.median(v)) for r, v in raw.items()}
    dt = (med[r_big] - med[r_small]) / (r_big - r_small)
    fallback = False
    if dt <= 0:
        raw = measure()
        med = {r: float(np.median(v)) for r, v in raw.items()}
        dt = (med[r_big] - med[r_small]) / (r_big - r_small)
        if dt <= 0:
            dt, fallback = med[r_big] / r_big, True
    pairs = [(b - s) / (r_big - r_small)
             for s, b in zip(raw[r_small], raw[r_big])]
    pos = [p for p in pairs if p > 0]
    spread = (float((max(pos) - min(pos)) / np.median(pos))
              if len(pos) >= 2 else None)
    return max(dt, 1e-9), {"fallback": fallback, "spread": spread,
                           "reps": reps}


def main(argv=None) -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=256,
                   help="(query, positive) pairs per encoder step")
    p.add_argument("--length", type=int, default=64)
    p.add_argument("--layers", type=int, default=6)
    p.add_argument("--hidden", type=int, default=384)
    p.add_argument("--heads", type=int, default=12)
    p.add_argument("--mlp", type=int, default=1536)
    p.add_argument("--vocab", type=int, default=30522)
    p.add_argument("--dtype", choices=["bfloat16", "float32"],
                   default="bfloat16")
    p.add_argument("--ae-batch", type=int, default=4096)
    p.add_argument("--r", type=int, nargs=2, default=[4, 16],
                   metavar=("R_SMALL", "R_BIG"))
    p.add_argument("--skip-ae", action="store_true")
    p.add_argument("--skip-encoder", action="store_true")
    p.add_argument("--json-out", default="logs/train_mfu.json")
    args = p.parse_args(argv)

    backend = jax.default_backend()
    if backend != "cpu":
        from bench import _relay_alive

        if not _relay_alive(300.0):
            print("[mfu] relay dark — aborting", file=sys.stderr)
            return 2

    out = {"backend": backend, "rows": []}
    r_small, r_big = args.r
    key = jax.random.PRNGKey(0)

    if not args.skip_encoder:
        from latentrag_tpu.models.encoder.minilm import MiniLMEncoder
        from latentrag_tpu.training.train_encoder import info_nce_loss

        module = MiniLMEncoder(
            vocab_size=args.vocab, hidden_dim=args.hidden,
            num_layers=args.layers, num_heads=args.heads,
            mlp_dim=args.mlp,
            dtype=jnp.bfloat16 if args.dtype == "bfloat16"
            else jnp.float32,
        )
        b, l = args.batch, args.length
        kq, kp, ki = jax.random.split(key, 3)
        q_ids = jax.random.randint(kq, (b, l), 0, args.vocab, jnp.int32)
        p_ids = jax.random.randint(kp, (b, l), 0, args.vocab, jnp.int32)
        mask = jnp.ones((b, l), jnp.int32)
        params = module.init(ki, q_ids, mask)["params"]
        tx = optax.adamw(2e-5, weight_decay=1e-4)
        opt_state = tx.init(params)
        n_params = sum(x.size for x in jax.tree_util.tree_leaves(params))

        def loss_fn(params):
            ids = jnp.concatenate([q_ids, p_ids])
            m = jnp.concatenate([mask, mask])
            z = module.apply({"params": params}, ids, m)
            return info_nce_loss(z[:b], z[b:], 0.05)

        def step(carry):
            params, opt_state = carry
            _, grads = jax.value_and_grad(loss_fn)(params)
            updates, opt_state = tx.update(grads, opt_state, params)
            return optax.apply_updates(params, updates), opt_state

        dt, info = bench_step(step, (params, opt_state), r_small, r_big)
        fl = 3 * fwd_flops(2 * b, l, args.hidden, args.heads,
                           args.mlp, args.layers)
        row = {
            "what": f"encoder train step ({args.layers}L {args.hidden}h "
                    f"{args.dtype})",
            "batch_pairs": b, "length": l,
            "params_m": round(n_params / 1e6, 1),
            "ms_per_step": round(dt * 1e3, 3),
            "pairs_per_s": round(b / dt, 1),
            "tflops": round(fl / dt / 1e12, 1),
            **info,
        }
        out["rows"].append(row)
        print(f"[mfu] {row['what']}: {row['ms_per_step']}ms/step "
              f"({row['pairs_per_s']} pairs/s, {row['tflops']} TFLOP/s, "
              f"{row['params_m']}M params)"
              + (" FALLBACK" if info["fallback"] else ""), file=sys.stderr)

    if not args.skip_ae:
        from latentrag_tpu.models.autoencoders import (
            build_autoencoder,
            init_autoencoder,
        )
        from latentrag_tpu.training.trainer import _loss_fn, _make_optimizer
        from latentrag_tpu.utils.config import (
            AutoencoderConfig,
            TrainingConfig,
        )

        for ae in ("vae", "dae"):
            model = build_autoencoder(ae, AutoencoderConfig(
                input_dim=384, hidden_dim=512, latent_dim=64))
            params = init_autoencoder(model, jax.random.PRNGKey(0), 384)
            cfg = TrainingConfig(batch_size=args.ae_batch)
            tx = _make_optimizer(cfg)
            opt_state = tx.init(params)
            loss = _loss_fn(model, ae, cfg)
            kx, kr = jax.random.split(jax.random.PRNGKey(1))
            x = jax.random.normal(kx, (args.ae_batch, 384), jnp.float32)
            batch = {"x": x, "y": x}

            def step(carry, _loss=loss, _tx=tx):
                params, opt_state, rng = carry
                rng, sub = jax.random.split(rng)
                _, grads = jax.value_and_grad(_loss)(params, batch, sub)
                updates, opt_state = _tx.update(grads, opt_state, params)
                return optax.apply_updates(params, updates), opt_state, rng

            dt, info = bench_step(step, (params, opt_state, kr),
                                  r_small, r_big)
            # enc 384->512->64(x2 heads for vae) + dec 64->512->384, x3
            fl = 3 * 2 * args.ae_batch * (384 * 512 + 512 * 64 * 2
                                          + 64 * 512 + 512 * 384)
            row = {
                "what": f"{ae} train step (384-512-64)",
                "batch": args.ae_batch,
                "ms_per_step": round(dt * 1e3, 3),
                "rows_per_s": round(args.ae_batch / dt, 1),
                "tflops": round(fl / dt / 1e12, 2),
                **info,
            }
            out["rows"].append(row)
            print(f"[mfu] {row['what']}: {row['ms_per_step']}ms/step "
                  f"({row['rows_per_s']} rows/s)"
                  + (" FALLBACK" if info["fallback"] else ""),
                  file=sys.stderr)

    print(json.dumps(out))
    if args.json_out:
        os.makedirs(os.path.dirname(args.json_out) or ".", exist_ok=True)
        with open(args.json_out, "w") as f:
            json.dump(out, f, indent=1)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
