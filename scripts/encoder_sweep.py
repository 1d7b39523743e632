"""Encoder kernel sweep: measure QKV fusion / softmax dtype / layout
variants of the MiniLM forward on the real chip (VERDICT r3 item 2).

The production encoder sustains ~39 TFLOP/s vs the 91 TFLOP/s K=64 matmul
ceiling (docs/ROOFLINE.md). This sweep isolates the cheap levers:

  base        the production MiniLMEncoder.apply (3 separate QKV matmuls)
  fuse        one [H, 3H] QKV matmul (kernels concatenated at apply time)
  layout      no-transpose attention: heads stay in [B, L, NH, dh] and
              dot_general picks the contraction (no explicit transposes)
  fuse+layout both
  +bf16sm     softmax computed in bf16 after an fp32 max-subtract

Each variant consumes the SAME params pytree (production layout — q/k/v
Dense kernels), asserts allclose vs base, then times with the in-program
difference-quotient method (bench.py::bench_device) which cancels
dispatch/fetch/ramp. Run WITHOUT JAX_PLATFORMS=cpu to hit the chip:

    python scripts/encoder_sweep.py [--buckets]
"""

from __future__ import annotations

import argparse
import math
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax
import jax.numpy as jnp

from bench import bench_device, sync  # noqa: E402

H, NH, MLP, NL, VOCAB = 384, 12, 1536, 6, 30522
DH = H // NH


def init_params(key=0):
    from latentrag_tpu.models.encoder.minilm import MiniLMEncoder

    enc = MiniLMEncoder(
        vocab_size=VOCAB, hidden_dim=H, num_layers=NL, num_heads=NH,
        mlp_dim=MLP, dtype=jnp.bfloat16,
    )
    ids = jnp.ones((8, 64), jnp.int32)
    params = jax.jit(enc.init)(
        jax.random.PRNGKey(key), ids, jnp.ones((8, 64), jnp.int32)
    )["params"]
    return enc, params


def embed(params, ids, mask):
    """Shared embedding + LN stage (identical across variants)."""
    word = params["word_embeddings"]["embedding"][ids]
    l = ids.shape[1]
    pos = params["position_embeddings"]["embedding"][:l][None, :, :]
    x = word + pos + params["token_type_embedding"][None, None, :]
    mu = x.mean(-1, keepdims=True)
    var = ((x - mu) ** 2).mean(-1, keepdims=True)
    ln = params["embed_ln"]
    x = (x - mu) / jnp.sqrt(var + 1e-6) * ln["scale"] + ln["bias"]
    return x.astype(jnp.bfloat16)


def layer_norm(x, p):
    x = x.astype(jnp.float32)
    mu = x.mean(-1, keepdims=True)
    var = ((x - mu) ** 2).mean(-1, keepdims=True)
    return (x - mu) / jnp.sqrt(var + 1e-6) * p["scale"] + p["bias"]


def pool(params, x, mask):
    m = mask[:, :, None].astype(jnp.float32)
    summed = jnp.sum(x.astype(jnp.float32) * m, axis=1)
    pooled = summed / jnp.maximum(jnp.sum(m, axis=1), 1e-9)
    n = jnp.linalg.norm(pooled, axis=-1, keepdims=True)
    return pooled / jnp.maximum(n, 1e-12)


def quantize_dense_params(p):
    """Per-output-channel symmetric int8 for one Dense layer's params."""
    k = np.asarray(p["kernel"], np.float32)
    ws = np.maximum(np.abs(k).max(axis=0), 1e-12) / 127.0
    codes = np.clip(np.round(k / ws), -127, 127).astype(np.int8)
    return {"codes": jnp.asarray(codes), "wscale": jnp.asarray(ws),
            "bias": jnp.asarray(np.asarray(p["bias"], np.float32))}


def build_qtree(params, names):
    """Copy of the params tree with the named per-layer Dense params
    replaced by pre-quantized int8 codes + scales (A8W8: activations are
    quantized dynamically per token inside the forward)."""
    out = dict(params)
    for i in range(NL):
        lp = dict(params[f"layer_{i}"])
        for name in names:
            lp[name] = quantize_dense_params(lp[name])
        out[f"layer_{i}"] = lp
    return out


def make_forward(fuse: bool, layout: bool, bf16_softmax: bool,
                 tanh_gelu: bool = False, scale_q: bool = False):
    dt = jnp.bfloat16

    def qdense(p, x):
        # A8W8: per-token symmetric int8 activations (dynamic), int8
        # weights pre-quantized per output channel -> one int8xint8->int32
        # MXU matmul (2x the bf16 rate on v5e), dequant fused into the
        # epilogue by XLA.
        xf = x.astype(jnp.float32)
        s = jnp.maximum(
            jnp.max(jnp.abs(xf), axis=-1, keepdims=True), 1e-6
        ) / 127.0
        xq = jnp.clip(jnp.round(xf / s), -127, 127).astype(jnp.int8)
        acc = jax.lax.dot_general(
            xq, p["codes"],
            dimension_numbers=(((xq.ndim - 1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32,
        )
        out = acc.astype(jnp.float32) * s * p["wscale"] + p["bias"]
        return out.astype(dt)

    def dense(p, x):
        if "codes" in p:
            return qdense(p, x)
        return x @ p["kernel"].astype(dt) + p["bias"].astype(dt)

    def one_layer(p, x, additive):
        b, l, _ = x.shape
        if fuse:
            wk = jnp.concatenate(
                [p["q"]["kernel"], p["k"]["kernel"], p["v"]["kernel"]],
                axis=1,
            ).astype(dt)
            wb = jnp.concatenate(
                [p["q"]["bias"], p["k"]["bias"], p["v"]["bias"]]
            ).astype(dt)
            qkv = x @ wk + wb  # one [B,L,H]x[H,3H] matmul
            q, k, v = jnp.split(qkv, 3, axis=-1)
        else:
            q, k, v = dense(p["q"], x), dense(p["k"], x), dense(p["v"], x)
        if scale_q:
            q = q * (1.0 / math.sqrt(DH))  # fold scale into q pre-matmul
        if layout:
            qh = q.reshape(b, l, NH, DH)
            kh = k.reshape(b, l, NH, DH)
            vh = v.reshape(b, l, NH, DH)
            scores = jnp.einsum(
                "bqhd,bkhd->bhqk", qh, kh,
                preferred_element_type=jnp.float32,
            )
        else:
            qh = q.reshape(b, l, NH, DH).transpose(0, 2, 1, 3)
            kh = k.reshape(b, l, NH, DH).transpose(0, 2, 1, 3)
            vh = v.reshape(b, l, NH, DH).transpose(0, 2, 1, 3)
            scores = jnp.einsum(
                "bhqd,bhkd->bhqk", qh, kh,
                preferred_element_type=jnp.float32,
            )
        if not scale_q:
            scores = scores / math.sqrt(DH)
        scores = scores + additive
        if bf16_softmax:
            # fp32 max-subtract for stability, exp/normalize in bf16
            mx = scores.max(-1, keepdims=True)
            e = jnp.exp((scores - mx).astype(dt))
            probs = e / e.sum(-1, keepdims=True).astype(dt)
        else:
            probs = jax.nn.softmax(scores, axis=-1).astype(dt)
        if layout:
            ctx = jnp.einsum("bhqk,bkhd->bqhd", probs, vh).reshape(b, l, H)
        else:
            ctx = jnp.einsum("bhqk,bhkd->bhqd", probs, vh)
            ctx = ctx.transpose(0, 2, 1, 3).reshape(b, l, H)
        x = layer_norm(x + dense(p["attn_out"], ctx), p["attn_ln"])
        x = x.astype(dt)
        mlp = dense(p["mlp_in"], x)
        mlp = jax.nn.gelu(mlp, approximate=tanh_gelu)
        x2 = layer_norm(x + dense(p["mlp_out"], mlp), p["mlp_ln"])
        return x2.astype(dt)

    def forward(params, ids, mask):
        x = embed(params, ids, mask)
        additive = jnp.where(
            mask[:, None, None, :] > 0, 0.0, -1e9
        ).astype(jnp.float32)
        for i in range(NL):
            x = one_layer(params[f"layer_{i}"], x, additive)
        return pool(params, x, mask)

    return forward


def flops(b, l):
    per_layer = (
        2 * b * l * H * 3 * H          # qkv
        + 2 * b * NH * l * l * DH * 2  # scores + ctx
        + 2 * b * l * H * H            # attn out
        + 2 * b * l * H * MLP * 2      # mlp in+out
    )
    return NL * per_layer


def bench_forward(fn, params, b, l, label):
    ids = jnp.ones((b, l), jnp.int32)
    mask = jnp.ones((b, l), jnp.int32)
    # bench_device rolls its first arg per iteration; mixing q[0,0] into
    # the token ids makes every iteration's input distinct, so the forward
    # cannot be hoisted out of the timing loop as loop-invariant
    qvec = jnp.arange(64, dtype=jnp.float32).reshape(8, 8)

    dt, _, _ = bench_device(
        lambda q, c: (fn(params, (ids + q[0, 0].astype(jnp.int32)) % VOCAB,
                         mask)[0],),
        qvec, jnp.zeros((2, 2), jnp.float32),
        r_small=8, r_big=120,
    )
    tf = flops(b, l) / dt / 1e12
    print(
        f"[sweep] {label:22s} {b}x{l}: {dt * 1e3:7.2f} ms  "
        f"{b / dt:9,.0f} sent/s  {tf:5.1f} TFLOP/s",
        file=sys.stderr,
    )
    return dt, tf


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--buckets", action="store_true",
                    help="also sweep batch x length buckets on the winner")
    ap.add_argument("--b", type=int, default=128)
    ap.add_argument("--l", type=int, default=256)
    ap.add_argument("--only", type=str, default="",
                    help="comma-separated variant-name substrings to run "
                         "(saves remote compiles; base always runs)")
    args = ap.parse_args()
    only = [s for s in args.only.split(",") if s]
    keep = lambda n: not only or any(s in n for s in only)  # noqa: E731

    print(f"[sweep] backend={jax.default_backend()}", file=sys.stderr)
    enc, params = init_params()

    # --- correctness gate: every variant vs the production module --------
    ids = jnp.ones((4, 32), jnp.int32).at[1, 20:].set(0)
    mask = (ids > 0).astype(jnp.int32)
    ref = np.asarray(
        jax.jit(lambda p, i, m: enc.apply({"params": p}, i, m))(
            params, ids, mask
        )
    )
    variants = {
        "base(prod)": None,
        "fuse": make_forward(True, False, False),
        "layout": make_forward(False, True, False),
        "fuse+layout": make_forward(True, True, False),
        "fuse+layout+bf16sm": make_forward(True, True, True),
        "bf16sm": make_forward(False, False, True),
        "bf16sm+layout": make_forward(False, True, True),
        "bf16sm+tanhgelu": make_forward(False, False, True, tanh_gelu=True),
        "bf16sm+scaleq": make_forward(False, False, True, scale_q=True),
        "bf16sm+lo+tg+sq": make_forward(False, True, True, tanh_gelu=True,
                                        scale_q=True),
    }
    for name, fn in variants.items():
        if fn is None or not keep(name):
            continue
        got = np.asarray(jax.jit(fn)(params, ids, mask))
        err = np.abs(got - ref).max()
        tol = 0.02 if "bf16sm" in name else 5e-3
        status = "ok" if err < tol else "FAIL"
        print(f"[sweep] parity {name}: max|d|={err:.2e} {status}",
              file=sys.stderr)

    # --- int8 (A8W8) variants: quantized weights ride the same forward ---
    int8_fwd = make_forward(False, False, True, tanh_gelu=True)
    # qtrees build only AFTER the --only filter: each build pushes MBs of
    # int8 codes host->device, dead tunnel traffic when filtered out
    int8_specs = {
        "int8mlp": ("mlp_in", "mlp_out"),
        "int8dense": ("q", "k", "v", "attn_out", "mlp_in", "mlp_out"),
    }
    int8_variants = {
        name: build_qtree(params, layers)
        for name, layers in int8_specs.items() if keep(name)
    }
    for name, qtree in int8_variants.items():
        got = np.asarray(jax.jit(int8_fwd)(qtree, ids, mask))
        cos = float(np.mean(np.sum(got * ref, -1)
                            / (np.linalg.norm(got, axis=-1)
                               * np.linalg.norm(ref, axis=-1))))
        status = "ok" if cos > 0.995 else "FAIL"
        print(f"[sweep] parity {name}: mean cos={cos:.5f} {status}",
              file=sys.stderr)

    # --- timing ----------------------------------------------------------
    prod = jax.jit(lambda p, i, m: enc.apply({"params": p}, i, m))
    results = {}
    results["base(prod)"] = bench_forward(
        lambda p, i, m: prod(p, i, m), params, args.b, args.l, "base(prod)"
    )
    for name, fn in variants.items():
        if fn is None or not keep(name):
            continue
        results[name] = bench_forward(jax.jit(fn), params, args.b, args.l,
                                      name)
    jint8 = jax.jit(int8_fwd)
    for name, qtree in int8_variants.items():
        results[name] = bench_forward(jint8, qtree, args.b, args.l, name)

    best = min(results, key=lambda n: results[n][0])
    print(f"[sweep] winner at {args.b}x{args.l}: {best} "
          f"({results[best][1]:.1f} TFLOP/s)", file=sys.stderr)

    if args.buckets:
        if best in int8_variants:
            jfn, bparams = jint8, int8_variants[best]
        elif variants.get(best):
            jfn, bparams = jax.jit(variants[best]), params
        else:
            jfn, bparams = (lambda p, i, m: prod(p, i, m)), params
        for b, l in ((64, 512), (128, 256), (256, 128), (512, 64),
                     (256, 256), (512, 128)):
            bench_forward(jfn, bparams, b, l, f"{best}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
