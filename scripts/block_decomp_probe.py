"""Decompose one 21k-768 level_2 transformer block on-chip.

PROFILE_CLS.json: level_2 = 337.6 ms / 12 blocks = 28.1 ms per block at
b16. The flash attention call is ~9.4 ms and the four matmuls should be
~6 ms at 90 TF/s — so ~12 ms/block is elsewhere (f32 residual stream, LN,
casts, head split/pad). This probe times the full block standalone and its
pieces separately to aim further kernel work.

Writes BLOCK_DECOMP_PROBE.json. Usage: python scripts/block_decomp_probe.py
"""
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import jax
import jax.numpy as jnp
import numpy as np


def bench(fn, args, iters=20, windows=4):
    f = jax.jit(fn)
    s = jnp.zeros((), jnp.float32)
    t0 = time.time()
    s2 = f(s, *args)
    float(s2)
    c = time.time() - t0
    ts = []
    for _ in range(windows):
        t0 = time.perf_counter()
        for _ in range(iters):
            s = f(s, *args)
        float(s)
        ts.append((time.perf_counter() - t0) / iters)
    return float(np.median(sorted(ts[1:]))), c


def main():
    from fastervit_tpu.ops.pallas_hat_block import hat_block_reference
    from fastervit_tpu.ops.pallas_flash_attention import flash_window_mhsa

    b, s, c, h = 16, 2304, 784, 16
    hd = c // h
    hidden = 4 * c
    scale = hd ** -0.5
    rs = np.random.RandomState(0)
    x = jnp.asarray(rs.randn(b, s, c), jnp.bfloat16)
    bias = jnp.asarray(rs.randn(h, s, s), jnp.float32)
    params = {
        "ln1_scale": jnp.ones((c,), jnp.float32),
        "ln1_bias": jnp.zeros((c,), jnp.float32),
        "qkv_w": jnp.asarray(rs.randn(c, 3 * c) * 0.02, jnp.bfloat16),
        "qkv_b": jnp.zeros((3 * c,), jnp.float32),
        "proj_w": jnp.asarray(rs.randn(c, c) * 0.02, jnp.bfloat16),
        "proj_b": jnp.zeros((c,), jnp.float32),
        "gamma3": jnp.ones((c,), jnp.float32),
        "ln2_scale": jnp.ones((c,), jnp.float32),
        "ln2_bias": jnp.zeros((c,), jnp.float32),
        "fc1_w": jnp.asarray(rs.randn(c, hidden) * 0.02, jnp.bfloat16),
        "fc1_b": jnp.zeros((hidden,), jnp.float32),
        "fc2_w": jnp.asarray(rs.randn(hidden, c) * 0.02, jnp.bfloat16),
        "fc2_b": jnp.zeros((c,), jnp.float32),
        "gamma4": jnp.ones((c,), jnp.float32),
    }
    rows = {}

    def rec(name, fn, args):
        t, comp = bench(fn, args)
        rows[name] = {"ms": round(t * 1e3, 2), "compile_s": round(comp, 1)}
        print(f"{name:26s} {t * 1e3:8.2f} ms (compile {comp:.0f}s)",
              flush=True)

    rec("full_block_pallas",
        lambda st, x, p, bi: st + hat_block_reference(
            x, p, bi, h, scale, attn_impl="pallas").astype(
                jnp.float32).mean(), (x, params, bias))

    qkv3 = jnp.asarray(rs.randn(b, s, 3 * c), jnp.bfloat16)
    rec("attn_flash",
        lambda st, q, bi: st + flash_window_mhsa(q, bi, h, scale).astype(
            jnp.float32).mean(), (qkv3, bias))

    def matmuls(st, x, p):
        y = x @ p["qkv_w"]
        z = y[..., :c] @ p["proj_w"]
        h1 = z @ p["fc1_w"]
        h2 = h1 @ p["fc2_w"]
        return st + h2.astype(jnp.float32).mean()
    rec("matmuls_bf16", matmuls, (x, params))

    def lns(st, x, p):
        x32 = x.astype(jnp.float32)
        mu = x32.mean(-1, keepdims=True)
        v = ((x32 - mu) ** 2).mean(-1, keepdims=True)
        y1 = (x32 - mu) * jax.lax.rsqrt(v + 1e-5) * p["ln1_scale"] + p["ln1_bias"]
        y2 = (x32 - mu) * jax.lax.rsqrt(v + 1e-5) * p["ln2_scale"] + p["ln2_bias"]
        return st + (y1 + y2).astype(jnp.float32).mean()
    rec("two_lns_f32", lns, (x, params))

    # the head split + pad + merge around the kernel, isolated
    def pad_split(st, q3):
        from fastervit_tpu.ops.pallas_flash_attention import (_merge_heads,
                                                              _pad_hd,
                                                              _split_heads)
        q, k, v = _split_heads(q3, h)
        q, k, v = _pad_hd(q), _pad_hd(k), _pad_hd(v)
        return st + _merge_heads(q + k + v)[..., :c].astype(
            jnp.float32).mean()
    rec("split_pad_merge", pad_split, (qkv3,))

    out = os.path.join(REPO, "BLOCK_DECOMP_PROBE.json")
    rows["geometry"] = {"b": b, "s": s, "c": c, "heads": h,
                        "note": "21k-768 level_2 single block"}
    with open(out, "w") as f:
        json.dump(rows, f, indent=1)
    print("wrote", out)


if __name__ == "__main__":
    main()
