"""Can an online-softmax restructure hide the f32 exp behind the MXU?
(docs/ATTN_S2304.md §3: the only lever left — 8.2 ms kernel vs the 6.0 ms
matmul floor, gap ≈ the 2.7 ms standalone exp.)

The candidate kernel splits S into C chunks inside each q-tile and keeps
flash-style running (max, sum, context) state, so chunk i's exp (VPU) has
no data dependence on chunk i+1's logits matmul (MXU) and Mosaic may
interleave them. Cost: per-chunk rescale bookkeeping (alpha on (TQ,1) and
the (TQ, hd) context). Measures the shipped kernel vs C in {2, 4} at the
21k-768 level_2 geometry, with a parity check. Writes
ATTN_ONLINE_PROBE.json. Run on the real chip.
"""
from __future__ import annotations

import functools
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "scripts"))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from fastervit_tpu.ops import pallas_flash_attention as F

B, S, H, HD = 16, 2304, 16, 49
ITERS, WINDOWS = 10, 4


def _time(fn, *args):
    """Milliseconds wrapper over the shared chained-fetch protocol."""
    from _bench_protocol import bench_chained

    def step(s, *a):
        out = fn(*a)
        return s + jnp.asarray(out, jnp.float32).ravel()[0]

    sec, compile_s = bench_chained(step, args, iters=ITERS, windows=WINDOWS)
    return sec * 1e3, compile_s


def _online_kernel(q_ref, k_ref, v_ref, bias_ref, out_ref, *, scale, chunks):
    tq = q_ref.shape[2]
    s = k_ref.shape[2]
    cs = s // chunks
    q = q_ref[0, 0].astype(jnp.float32)
    m = jnp.full((tq, 1), -jnp.inf, jnp.float32)
    den = jnp.zeros((tq, 1), jnp.float32)
    ctx = jnp.zeros((tq, q_ref.shape[3]), jnp.float32)
    for i in range(chunks):
        k_i = k_ref[0, 0, i * cs:(i + 1) * cs]
        v_i = v_ref[0, 0, i * cs:(i + 1) * cs]
        b_i = bias_ref[0, :, i * cs:(i + 1) * cs].astype(jnp.float32)
        logits = jax.lax.dot_general(
            q, k_i, dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32) * scale + b_i
        m_new = jnp.maximum(m, jnp.max(logits, axis=-1, keepdims=True))
        alpha = jnp.exp(m - m_new)
        p = jnp.exp(logits - m_new)
        den = den * alpha + jnp.sum(p, axis=-1, keepdims=True)
        ctx = ctx * alpha + jax.lax.dot_general(
            p.astype(v_i.dtype), v_i,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        m = m_new
    out_ref[0, 0] = (ctx / den).astype(out_ref.dtype)


def online_forward(q, k, v, bias, scale, chunks):
    b, h, s, hd = q.shape
    tq = F._pick_tq(s, hd, q.dtype.itemsize)
    return pl.pallas_call(
        functools.partial(_online_kernel, scale=scale, chunks=chunks),
        grid=(h, s // tq, b),
        in_specs=[
            pl.BlockSpec((1, 1, tq, hd), lambda hi, qi, bi: (bi, hi, qi, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, s, hd), lambda hi, qi, bi: (bi, hi, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, s, hd), lambda hi, qi, bi: (bi, hi, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tq, s), lambda hi, qi, bi: (hi, qi, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 1, tq, hd),
                               lambda hi, qi, bi: (bi, hi, qi, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, h, s, hd), q.dtype),
    )(q, k, v, bias)


def main():
    rs = np.random.RandomState(0)
    q = F._pad_hd(jnp.asarray(rs.randn(B, H, S, HD), jnp.bfloat16))
    k = F._pad_hd(jnp.asarray(rs.randn(B, H, S, HD), jnp.bfloat16))
    v = F._pad_hd(jnp.asarray(rs.randn(B, H, S, HD), jnp.bfloat16))
    bias = jnp.asarray(rs.randn(H, S, S), jnp.bfloat16)
    scale = HD ** -0.5
    out = {"geometry": {"b": B, "s": S, "heads": H, "head_dim": HD}}

    ms, c = _time(lambda a, b_, vv, bb: F._flash_forward(
        a, b_, vv, bb, scale, False), q, k, v, bias)
    out["shipped"] = {"ms": round(ms, 3), "compile_s": round(c, 1)}
    print("shipped", out["shipped"], flush=True)

    ref = jax.jit(lambda a, b_, vv, bb: F._flash_forward(
        a, b_, vv, bb, scale, False))(q[:2], k[:2], v[:2], bias)
    for chunks in (2, 4):
        got = jax.jit(functools.partial(online_forward, scale=scale,
                                        chunks=chunks))(q[:2], k[:2], v[:2],
                                                        bias)
        diff = float(jnp.max(jnp.abs(got.astype(jnp.float32)
                                     - ref.astype(jnp.float32))))
        ms, c = _time(lambda a, b_, vv, bb, ch=chunks: online_forward(
            a, b_, vv, bb, scale, ch), q, k, v, bias)
        out[f"online_c{chunks}"] = {"ms": round(ms, 3),
                                    "compile_s": round(c, 1),
                                    "maxdiff_vs_shipped": diff}
        print(f"online_c{chunks}", out[f"online_c{chunks}"], flush=True)

    with open(os.path.join(REPO, "ATTN_ONLINE_PROBE.json"), "w") as f:
        json.dump(out, f, indent=1)
    print("wrote ATTN_ONLINE_PROBE.json")


if __name__ == "__main__":
    main()
