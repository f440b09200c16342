"""Fully-fused HAT transformer block as one Pallas TPU kernel.

One HAT block's joint section (reference faster_vit.py:690-691):

    x = x + γ3·proj(MHSA(LN1(x), bias))
    x = x + γ4·MLP(LN2(x))

lowered as ~20 XLA ops costs ~2ms/block on v5e at fv0 stage-2 shapes, almost
all of it HBM traffic between ops. This kernel keeps the whole block in VMEM:
weights (~1.6MB for fv0 stage 2) are grid-invariant inputs, activations for a
TB-window tile never leave the chip, and attention reuses the packed
per-window formulation of pallas_attention. x is read and written exactly
once per block.

Applies when the block's weights fit VMEM (≤ ~8MB — fv0..2 all stages, fv3/4
stage 2); callers fall back to the composed path otherwise. Forward-only
fusion: training's DropPath scales the residual branches per sample, so the
fused path is used when deterministic; the custom VJP recomputes through the
jnp composition.
"""
from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from fastervit_tpu.ops.pallas_attention import (_block_diag_bias, _pack_factor,
                                                _pick_block_b)

_LN_EPS = 1e-5


def _ln(x32, scale, bias):
    mean = jnp.mean(x32, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(x32 - mean), axis=-1, keepdims=True)
    return (x32 - mean) * jax.lax.rsqrt(var + _LN_EPS) * scale + bias


def _erf(x):
    """erf via Abramowitz-Stegun 7.1.26 (|error| < 1.5e-7): Mosaic has no
    erf/erfc primitive. Accuracy is far below bf16 resolution and below the
    fp32 parity tolerances used in tests."""
    sign = jnp.sign(x)
    ax = jnp.abs(x)
    t = 1.0 / (1.0 + 0.3275911 * ax)
    poly = t * (0.254829592 + t * (-0.284496736 + t * (1.421413741 + t * (
        -1.453152027 + t * 1.061405429))))
    return sign * (1.0 - poly * jnp.exp(-ax * ax))


def _gelu(x):
    # exact-erf GELU (torch nn.GELU default); erf itself approximated above
    return 0.5 * x * (1.0 + _erf(x * 0.7071067811865476))


def _hat_block_kernel(x_ref, ln1s_ref, ln1b_ref, qkvw_ref, qkvb_ref, bias_ref,
                      projw_ref, projb_ref, g3_ref, ln2s_ref, ln2b_ref,
                      fc1w_ref, fc1b_ref, fc2w_ref, fc2b_ref, g4_ref, out_ref,
                      *, num_heads: int, scale: float,
                      dp1_ref=None, dp2_ref=None):
    tb, s, c = x_ref.shape
    hd = c // num_heads
    cdt = x_ref.dtype

    x32 = x_ref[:].astype(jnp.float32)

    # --- attention branch -----------------------------------------------------
    y = _ln(x32, ln1s_ref[:].astype(jnp.float32), ln1b_ref[:].astype(jnp.float32))
    qkv = jax.lax.dot_general(
        y.reshape(tb * s, c).astype(cdt), qkvw_ref[:],
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32) + qkvb_ref[:].astype(jnp.float32)
    qkv = qkv.astype(cdt).reshape(tb, s, 3 * c)
    bias = bias_ref[:]
    ctx_heads = []
    for h in range(num_heads):
        q = qkv[:, :, h * hd:(h + 1) * hd]
        k = qkv[:, :, c + h * hd:c + (h + 1) * hd]
        v = qkv[:, :, 2 * c + h * hd:2 * c + (h + 1) * hd]
        logits = jax.lax.dot_general(
            q, k, dimension_numbers=(((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)
        logits = logits * scale + bias[h][None].astype(jnp.float32)
        m = jnp.max(logits, axis=-1, keepdims=True)
        p = jnp.exp(logits - m)
        p = p / jnp.sum(p, axis=-1, keepdims=True)
        ctx_heads.append(jax.lax.dot_general(
            p.astype(cdt), v, dimension_numbers=(((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32).astype(cdt))
    ctx = jnp.concatenate(ctx_heads, axis=-1)                 # (TB, S, C)
    proj = jax.lax.dot_general(
        ctx.reshape(tb * s, c), projw_ref[:],
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32) + projb_ref[:].astype(jnp.float32)
    attn_delta = g3_ref[:].astype(jnp.float32) * proj.reshape(tb, s, c)
    if dp1_ref is not None:
        # dp refs hold the full (BP, SP) scale array; slice this tile's rows
        dp1 = dp1_ref[pl.ds(pl.program_id(0) * tb, tb), :]
        attn_delta = attn_delta * dp1[..., None]
    x32 = x32 + attn_delta

    # --- MLP branch -------------------------------------------------------------
    y = _ln(x32, ln2s_ref[:].astype(jnp.float32), ln2b_ref[:].astype(jnp.float32))
    h1 = jax.lax.dot_general(
        y.reshape(tb * s, c).astype(cdt), fc1w_ref[:],
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32) + fc1b_ref[:].astype(jnp.float32)
    h1 = _gelu(h1).astype(cdt)
    h2 = jax.lax.dot_general(
        h1, fc2w_ref[:], dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32) + fc2b_ref[:].astype(jnp.float32)
    mlp_delta = g4_ref[:].astype(jnp.float32) * h2.reshape(tb, s, c)
    if dp2_ref is not None:
        dp2 = dp2_ref[pl.ds(pl.program_id(0) * tb, tb), :]
        mlp_delta = mlp_delta * dp2[..., None]
    x32 = x32 + mlp_delta

    out_ref[:] = x32.astype(out_ref.dtype)


def _hat_block_kernel_dp(x_ref, ln1s_ref, ln1b_ref, qkvw_ref, qkvb_ref,
                         bias_ref, projw_ref, projb_ref, g3_ref, ln2s_ref,
                         ln2b_ref, fc1w_ref, fc1b_ref, fc2w_ref, fc2b_ref,
                         g4_ref, dp1_ref, dp2_ref, out_ref, *, num_heads: int,
                         scale: float):
    """Variant with per-token residual-branch scales (DropPath masks expanded
    over packed windows), so the fused block also serves stochastic-depth
    training (reference timm DropPath applied at faster_vit.py:690-691)."""
    _hat_block_kernel(x_ref, ln1s_ref, ln1b_ref, qkvw_ref, qkvb_ref, bias_ref,
                      projw_ref, projb_ref, g3_ref, ln2s_ref, ln2b_ref,
                      fc1w_ref, fc1b_ref, fc2w_ref, fc2b_ref, g4_ref, out_ref,
                      num_heads=num_heads, scale=scale, dp1_ref=dp1_ref,
                      dp2_ref=dp2_ref)


def hat_block_reference(x, params, bias, num_heads: int, scale: float,
                        attn_impl: str = "jnp", dp1=None, dp2=None):
    """jnp composition with identical semantics (VJP + tests); with
    attn_impl='pallas' it is the VMEM-overflow fallback that still routes the
    attention itself through the packed Pallas kernel. dp1/dp2: optional
    per-row (B,) residual-branch scales (DropPath masks / keep_prob)."""
    x32 = x.astype(jnp.float32)
    y = _ln(x32, params["ln1_scale"].astype(jnp.float32),
            params["ln1_bias"].astype(jnp.float32))
    b, s, c = x.shape
    hd = c // num_heads
    qkv3 = (y.astype(x.dtype) @ params["qkv_w"]).astype(jnp.float32) + params["qkv_b"]
    qkv3 = qkv3.astype(x.dtype)
    if attn_impl == "pallas":
        # VMEM-gated dispatch (NOT fused_window_mhsa directly): large-window
        # shapes (21k-384/512/768, S>=576) exceed the packed kernel's scoped
        # vmem (17.4MB vs the 16MB limit at S=576) and must take the Q-tiled
        # flash kernel; window_mhsa routes on packed_supported().
        from fastervit_tpu.ops.attention import window_mhsa
        ctx = window_mhsa(qkv3, bias, num_heads, scale, impl="pallas")
    else:
        qkv = qkv3.reshape(b, s, 3, num_heads, hd).transpose(2, 0, 3, 1, 4)
        q, k, v = qkv[0], qkv[1], qkv[2]
        logits = jnp.einsum("bhsd,bhtd->bhst", q, k,
                            preferred_element_type=jnp.float32) * scale
        logits = logits + bias[None].astype(jnp.float32)
        p = jax.nn.softmax(logits, axis=-1)
        ctx = jnp.einsum("bhst,bhtd->bhsd", p.astype(x.dtype), v,
                         preferred_element_type=jnp.float32)
        ctx = ctx.astype(x.dtype).transpose(0, 2, 1, 3).reshape(b, s, c)
    proj = (ctx @ params["proj_w"]).astype(jnp.float32) + params["proj_b"]
    delta = params["gamma3"].astype(jnp.float32) * proj
    if dp1 is not None:
        delta = delta * dp1.astype(jnp.float32)[:, None, None]
    x32 = x32 + delta
    y = _ln(x32, params["ln2_scale"].astype(jnp.float32),
            params["ln2_bias"].astype(jnp.float32))
    h1 = (y.astype(x.dtype) @ params["fc1_w"]).astype(jnp.float32) + params["fc1_b"]
    h1 = _gelu(h1).astype(x.dtype)
    h2 = (h1 @ params["fc2_w"]).astype(jnp.float32) + params["fc2_b"]
    delta = params["gamma4"].astype(jnp.float32) * h2
    if dp2 is not None:
        delta = delta * dp2.astype(jnp.float32)[:, None, None]
    x32 = x32 + delta
    return x32.astype(x.dtype)


_PARAM_ORDER = ("ln1_scale", "ln1_bias", "qkv_w", "qkv_b", "proj_w", "proj_b",
                "gamma3", "ln2_scale", "ln2_bias", "fc1_w", "fc1_b", "fc2_w",
                "fc2_b", "gamma4")


def _weights_bytes(params):
    return sum(int(p.size) * p.dtype.itemsize for p in params.values())


def _row_bytes(s: int, c: int, hidden: int) -> int:
    """Rough fp32 VMEM bytes per packed sequence row of activations,
    including the (S, S) f32 logits + probs the attention section holds."""
    return s * (c * 10 + hidden) * 4 + 2 * s * s * 4


def fused_block_supported(x_shape, params, num_heads: int = 0,
                          weight_limit: int = 8 * 1024 * 1024,
                          act_limit: int = 6 * 1024 * 1024) -> bool:
    """Whether the whole block fits VMEM (weights grid-invariant + one
    activation tile + the grid-invariant (H, S, S) f32 attention bias).
    Large-C/long-S variants fall back to the composed path."""
    b, s, c = x_shape
    p = _pack_factor(b, s)
    sp = p * s
    hidden = params["fc1_w"].shape[1]
    bias_bytes = num_heads * sp * sp * 4
    return (_weights_bytes(params) + bias_bytes <= weight_limit
            and _row_bytes(sp, c, hidden) <= act_limit)


def _forward(x, params, bias, num_heads, scale, interpret, dp1=None, dp2=None):
    b, s, c = x.shape
    p = _pack_factor(b, s)
    xp = x.reshape(b // p, p * s, c)
    biasp = _block_diag_bias(bias, p) if p > 1 else bias
    bp, sp = xp.shape[0], xp.shape[1]
    # tile size: keep x tile + qkv + mlp hidden under a few MB
    hidden = params["fc1_w"].shape[1]
    per_row = _row_bytes(sp, c, hidden)
    tb = _pick_block_b(bp)
    while tb > 1 and tb * per_row > 6 * 1024 * 1024:
        tb //= 2
    while bp % tb:
        tb -= 1
    has_dp = dp1 is not None
    kernel = functools.partial(
        _hat_block_kernel_dp if has_dp else _hat_block_kernel,
        num_heads=num_heads, scale=scale)
    wspecs = [pl.BlockSpec(params[k].shape,
                           (lambda i, nd=params[k].ndim: (0,) * nd),
                           memory_space=pltpu.VMEM) for k in _PARAM_ORDER]
    # bias spec inserted after qkv_b (kernel arg order)
    specs = ([pl.BlockSpec((tb, sp, c), lambda i: (i, 0, 0),
                           memory_space=pltpu.VMEM)]
             + wspecs[:4]
             + [pl.BlockSpec(biasp.shape, lambda i: (0, 0, 0),
                             memory_space=pltpu.VMEM)]
             + wspecs[4:])
    args = ([xp] + [params[k] for k in _PARAM_ORDER[:4]] + [biasp]
            + [params[k] for k in _PARAM_ORDER[4:]])
    if has_dp:
        # (B,) per-row scales -> (BP, SP) per packed token, passed as ONE
        # grid-invariant VMEM block (131KB f32 at fv0 stage-2 shapes; a
        # (tb, sp, 1) tile would pad its lane dim 128x and double-buffer);
        # the kernel slices its tile's rows with pl.ds(program_id*tb)
        dp_spec = pl.BlockSpec((bp, sp), lambda i: (0, 0),
                               memory_space=pltpu.VMEM)
        for dpv in (dp1, dp2):
            args.append(jnp.repeat(dpv.astype(jnp.float32).reshape(b // p, p),
                                   s, axis=1))
            specs.append(dp_spec)
    hd = c // num_heads
    out = pl.pallas_call(
        kernel,
        grid=(bp // tb,),
        in_specs=specs,
        out_specs=pl.BlockSpec((tb, sp, c), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((bp, sp, c), x.dtype),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * bp * sp * c * (3 * c + c + 2 * hidden)
            + 4 * bp * num_heads * sp * sp * hd,
            bytes_accessed=2 * x.size * x.dtype.itemsize
            + _weights_bytes(params),
            transcendentals=bp * sp * (num_heads * sp + hidden),
        ),
    )(*args)
    return out.reshape(b, s, c)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
def fused_hat_block(x, params, bias, num_heads: int, scale: float,
                    interpret: bool = False):
    """x: (B, S, C); params: dict with keys _PARAM_ORDER; bias: (H, S, S)."""
    return _forward(x, params, bias, num_heads, scale, interpret)


def _fwd(x, params, bias, num_heads, scale, interpret):
    return _forward(x, params, bias, num_heads, scale, interpret), \
        (x, params, bias)


def _bwd(num_heads, scale, interpret, res, g):
    x, params, bias = res
    impl = "jnp" if interpret else "pallas"
    _, vjp = jax.vjp(
        lambda x, p, b: hat_block_reference(x, p, b, num_heads, scale,
                                            attn_impl=impl),
        x, params, bias)
    return vjp(g)


fused_hat_block.defvjp(_fwd, _bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6, 7))
def fused_hat_block_dp(x, params, bias, dp1, dp2, num_heads: int,
                       scale: float, interpret: bool = False):
    """Fused HAT block with per-row (B,) residual-branch scales — the
    DropPath-in-training entry point. Backward is a recompute VJP through the
    reference composition (attention via the packed Pallas kernel on TPU)."""
    return _forward(x, params, bias, num_heads, scale, interpret, dp1, dp2)


def _fwd_dp(x, params, bias, dp1, dp2, num_heads, scale, interpret):
    return _forward(x, params, bias, num_heads, scale, interpret, dp1, dp2), \
        (x, params, bias, dp1, dp2)


def _bwd_dp(num_heads, scale, interpret, res, g):
    x, params, bias, dp1, dp2 = res
    impl = "jnp" if interpret else "pallas"
    _, vjp = jax.vjp(
        lambda x, p, b, d1, d2: hat_block_reference(
            x, p, b, num_heads, scale, attn_impl=impl, dp1=d1, dp2=d2),
        x, params, bias, dp1, dp2)
    return vjp(g)


fused_hat_block_dp.defvjp(_fwd_dp, _bwd_dp)
