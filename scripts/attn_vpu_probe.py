"""Where does the 21k-768 level_2 attention's time go? (VERDICT r3 #1 tail)

The flash kernel at the 21k-768 level_2 geometry (16 windows x S=2304,
16 heads, head_dim 49) measures ~12 ms = 22 TF/s — far below the family's
matmul rates. Hypotheses, each isolated here on-chip:

  a. MXU K-padding: head_dim 49 pads to the MXU's 128-lane tiles, so the
     QK^T / AV matmuls run at <=49/128 of peak by construction. Probe:
     same-shape matmuls alone, hd 49 vs 128.
  b. VPU-bound softmax: b*H*S^2 = 1.36e9 exps + bias add + running-max
     bookkeeping are VPU work that the MXU cannot hide at this tiny
     arithmetic intensity. Probe: bias-softmax alone; flash with/without
     bias; jnp composed attention for cross-check.

Writes ATTN_VPU_PROBE.json. Run on the real chip (axon).
"""
from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import jax
import jax.numpy as jnp
import numpy as np

B, S, H, HD = 16, 2304, 16, 49  # 21k-768 level_2: 16 windows, window 48
ITERS, WINDOWS = 10, 4


def _time(fn, *args):
    """Chained-scalar-fetch timing (same protocol as bench.py)."""
    s = jnp.zeros((), jnp.float32)

    @jax.jit
    def step(s, *a):
        out = fn(*a)
        return s + jnp.asarray(out, jnp.float32).ravel()[0].astype(jnp.float32)

    t0 = time.time()
    s = step(s, *args)
    float(s)
    compile_s = time.time() - t0
    rates = []
    for _ in range(WINDOWS):
        t0 = time.perf_counter()
        for _ in range(ITERS):
            s = step(s, *args)
        float(s)
        rates.append((time.perf_counter() - t0) / ITERS * 1e3)
    return float(np.median(sorted(rates[1:]))), compile_s


def main():
    rs = np.random.RandomState(0)
    q = jnp.asarray(rs.randn(B, H, S, HD), jnp.bfloat16)
    k = jnp.asarray(rs.randn(B, H, S, HD), jnp.bfloat16)
    v = jnp.asarray(rs.randn(B, H, S, HD), jnp.bfloat16)
    bias = jnp.asarray(rs.randn(H, S, S), jnp.bfloat16)
    scores = jnp.asarray(rs.randn(B, H, S, S), jnp.bfloat16)
    q128 = jnp.asarray(rs.randn(B, H, S, 128), jnp.bfloat16)
    k128 = jnp.asarray(rs.randn(B, H, S, 128), jnp.bfloat16)

    out = {"geometry": {"b": B, "s": S, "heads": H, "head_dim": HD}}

    def rec(name, ms, compile_s, flops=None):
        row = {"ms": round(ms, 3), "compile_s": round(compile_s, 1)}
        if flops:
            row["tf_s"] = round(flops / (ms / 1e3) / 1e12, 1)
        out[name] = row
        print(name, row, flush=True)

    # a) matmuls alone (QK^T + AV), hd=49 vs hd=128
    qk_flops = 2 * B * H * S * S * HD
    av_flops = 2 * B * H * S * S * HD
    ms, c = _time(lambda a, b_: jnp.einsum(
        "bhqd,bhkd->bhqk", a, b_, preferred_element_type=jnp.float32), q, k)
    rec("qk_hd49", ms, c, qk_flops)
    ms, c = _time(lambda a, b_: jnp.einsum(
        "bhqd,bhkd->bhqk", a, b_, preferred_element_type=jnp.float32),
        q128, k128)
    rec("qk_hd128", ms, c, 2 * B * H * S * S * 128)
    ms, c = _time(lambda p, vv: jnp.einsum(
        "bhqk,bhkd->bhqd", p, vv, preferred_element_type=jnp.float32),
        scores, v)
    rec("av_hd49", ms, c, av_flops)

    # b) bias-add + softmax alone on materialized scores (pure VPU)
    ms, c = _time(lambda p, bb: jax.nn.softmax(
        p.astype(jnp.float32) + bb.astype(jnp.float32)[None], axis=-1
        ).astype(jnp.bfloat16), scores, bias)
    rec("bias_softmax_f32", ms, c)
    ms, c = _time(lambda p: jnp.exp(p.astype(jnp.float32)), scores)
    rec("exp_only_f32", ms, c)

    # c) the shipped flash kernel: bias f32 (production) vs bf16 (half the
    # largest streamed operand) vs no bias at all (a local kernel clone
    # minus the bias operand — isolates bias streaming + the add)
    import functools
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    from fastervit_tpu.ops import pallas_flash_attention as F

    qp, kp, vp = F._pad_hd(q), F._pad_hd(k), F._pad_hd(v)
    attn_flops = qk_flops + av_flops
    ms, c = _time(lambda a, b_, vv, bb: F._flash_forward(
        a, b_, vv, bb, HD ** -0.5, False), qp, kp, vp,
        bias.astype(jnp.float32))
    rec("flash_bias_f32", ms, c, attn_flops)
    ms, c = _time(lambda a, b_, vv, bb: F._flash_forward(
        a, b_, vv, bb, HD ** -0.5, False), qp, kp, vp, bias)
    rec("flash_bias_bf16", ms, c, attn_flops)

    def _nobias_kernel(q_ref, k_ref, v_ref, out_ref, *, scale):
        qq = q_ref[0, 0].astype(jnp.float32)
        logits = jax.lax.dot_general(
            qq, k_ref[0, 0], dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32) * scale
        mm = jnp.max(logits, axis=-1, keepdims=True)
        p = jnp.exp(logits - mm)
        ctx = jax.lax.dot_general(
            p.astype(v_ref.dtype), v_ref[0, 0],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        out_ref[0, 0] = (ctx / jnp.sum(p, -1, keepdims=True)).astype(
            out_ref.dtype)

    def flash_nobias(qa, ka, va):
        b, h, s, hd = qa.shape
        tq = F._pick_tq(s, hd, qa.dtype.itemsize)
        return pl.pallas_call(
            functools.partial(_nobias_kernel, scale=HD ** -0.5),
            grid=(h, s // tq, b),
            in_specs=[pl.BlockSpec((1, 1, tq, hd),
                                   lambda hi, qi, bi: (bi, hi, qi, 0),
                                   memory_space=pltpu.VMEM),
                      pl.BlockSpec((1, 1, s, hd),
                                   lambda hi, qi, bi: (bi, hi, 0, 0),
                                   memory_space=pltpu.VMEM),
                      pl.BlockSpec((1, 1, s, hd),
                                   lambda hi, qi, bi: (bi, hi, 0, 0),
                                   memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((1, 1, tq, hd),
                                   lambda hi, qi, bi: (bi, hi, qi, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((b, h, s, hd), qa.dtype),
        )(qa, ka, va)

    ms, c = _time(flash_nobias, qp, kp, vp)
    rec("flash_nobias", ms, c, attn_flops)

    # d) composed XLA attention for cross-check
    def composed(a, b_, vv, bb):
        p = jnp.einsum("bhqd,bhkd->bhqk", a, b_,
                       preferred_element_type=jnp.float32) * (HD ** -0.5)
        p = jax.nn.softmax(p + bb.astype(jnp.float32)[None], axis=-1)
        return jnp.einsum("bhqk,bhkd->bhqd", p.astype(jnp.bfloat16), vv,
                          preferred_element_type=jnp.float32)

    ms, c = _time(composed, q, k, v, bias)
    rec("composed_xla", ms, c, attn_flops)

    with open(os.path.join(REPO, "ATTN_VPU_PROBE.json"), "w") as f:
        json.dump(out, f, indent=1)
    print("wrote ATTN_VPU_PROBE.json")


if __name__ == "__main__":
    main()
