"""Fused window+carrier attention Pallas TPU kernel.

FasterViT's attention sites (reference faster_vit.py:557-568, 679) operate on
many small windows: (B = batch*num_windows) sequences of S = ws²(+ct²) tokens
(53..2308) with a dense per-head bias. The XLA lowering of the naive path
materializes three layout transposes (qkv split) and the (B, H, S, S) logits
in HBM. This kernel instead:

  * consumes the qkv projection output (B, S, 3C) directly — no host-side
    head split / transpose; heads are sliced in VMEM (channel layout is
    (3, H, hd) fastest-last, matching the reference's reshape),
  * keeps logits + softmax entirely in VMEM per (TB-window, head) tile,
  * adds the bias from a VMEM-resident (H, S, S) tile shared across the grid,
  * writes the (B, S, C) context ready for the output projection.

Backward: custom VJP that recomputes probabilities (flash-style remat) and
evaluates the standard attention gradient with XLA einsums — a Pallas
backward kernel can replace it later without touching callers.
"""
from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _pick_block_b(b: int, row_bytes: int = 0,
                  budget: int = 10 * 1024 * 1024) -> int:
    """Largest batch-tile that divides b and keeps ~row_bytes*tb under the
    VMEM budget (Mosaic's scoped-vmem stack is 16MB; leave headroom)."""
    for tb in (16, 8, 4, 2, 1):
        if b % tb == 0 and (row_bytes == 0 or tb * row_bytes <= budget or tb == 1):
            return tb
    return 1


_TOTAL_BUDGET = 12 * 1024 * 1024


def packed_supported(b: int, s: int, c: int, num_heads: int,
                     itemsize: int) -> bool:
    """Whether this shape fits the packed single-tile kernel's VMEM budget,
    counting the grid-invariant (H, S, S) f32 bias (which `_pick_block_b`
    does not) and the BACKWARD kernel's larger working set (bias in + dbias
    out). Shapes over budget route to the Q-tiled flash kernel instead —
    the 21k large-window stages (S = 576/1024/2304, faster_vit.py:1297-1410)
    would otherwise demand 21..340 MB of VMEM and fail to compile on TPU."""
    p = _pack_factor(b, s)
    sp = p * s
    bias_bytes = num_heads * sp * sp * 4
    fwd = bias_bytes + _fwd_row_bytes(sp, c, num_heads, itemsize)
    bwd = 2 * bias_bytes + _bwd_row_bytes(sp, c, num_heads, itemsize)
    return max(fwd, bwd) <= _TOTAL_BUDGET


def _fwd_row_bytes(s: int, c: int, num_heads: int, itemsize: int) -> int:
    # in/out tiles are double-buffered by the Mosaic pipeline (x2); f32
    # logits/probs scratch is not
    return 2 * s * (4 * c * itemsize) + 2 * s * s * 4


def _bwd_row_bytes(s: int, c: int, num_heads: int, itemsize: int) -> int:
    # qkv + g + dqkv tiles (double-buffered) + ~3 f32 (S,S) buffers + f32
    # dq/dk/dv slices
    hd = c // num_heads
    return 2 * s * 7 * c * itemsize + s * 3 * hd * 4 + 3 * s * s * 4


def _mhsa_kernel(qkv_ref, bias_ref, out_ref, *, num_heads: int, scale: float):
    tb, s, c3 = qkv_ref.shape
    c = c3 // 3
    hd = c // num_heads
    qkv = qkv_ref[:]
    bias = bias_ref[:]
    for h in range(num_heads):
        q = qkv[:, :, h * hd:(h + 1) * hd]
        k = qkv[:, :, c + h * hd:c + (h + 1) * hd]
        v = qkv[:, :, 2 * c + h * hd:2 * c + (h + 1) * hd]
        logits = jax.lax.dot_general(
            q, k, dimension_numbers=(((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)          # (TB, S, S)
        logits = logits * scale + bias[h][None].astype(jnp.float32)
        m = jnp.max(logits, axis=-1, keepdims=True)
        p = jnp.exp(logits - m)
        p = p / jnp.sum(p, axis=-1, keepdims=True)
        ctx = jax.lax.dot_general(
            p.astype(v.dtype), v,
            dimension_numbers=(((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)          # (TB, S, hd)
        out_ref[:, :, h * hd:(h + 1) * hd] = ctx.astype(out_ref.dtype)


def _mhsa_forward(qkv: jnp.ndarray, bias: jnp.ndarray, num_heads: int,
                  scale: float, interpret: bool) -> jnp.ndarray:
    b, s, c3 = qkv.shape
    c = c3 // 3
    tb = _pick_block_b(b, _fwd_row_bytes(s, c, num_heads, qkv.dtype.itemsize))
    kernel = functools.partial(_mhsa_kernel, num_heads=num_heads, scale=scale)
    return pl.pallas_call(
        kernel,
        grid=(b // tb,),
        in_specs=[
            pl.BlockSpec((tb, s, c3), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((num_heads, s, s), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tb, s, c), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, s, c), qkv.dtype),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=4 * b * num_heads * s * s * (c // num_heads),
            bytes_accessed=(qkv.size + b * s * c) * qkv.dtype.itemsize
            + bias.size * bias.dtype.itemsize,
            transcendentals=b * num_heads * s * s,
        ),
    )(qkv, bias)


def _split_heads(qkv, num_heads):
    b, s, c3 = qkv.shape
    hd = c3 // 3 // num_heads
    qkv = qkv.reshape(b, s, 3, num_heads, hd).transpose(2, 0, 3, 1, 4)
    return qkv[0], qkv[1], qkv[2]  # each (B, H, S, hd)


def _mhsa_reference(qkv, bias, num_heads, scale):
    """jnp fallback with identical semantics (used for grad + CPU)."""
    q, k, v = _split_heads(qkv, num_heads)
    logits = jnp.einsum("bhsd,bhtd->bhst", q, k,
                        preferred_element_type=jnp.float32) * scale
    logits = logits + bias[None].astype(jnp.float32)
    p = jax.nn.softmax(logits, axis=-1)
    ctx = jnp.einsum("bhst,bhtd->bhsd", p.astype(v.dtype), v)
    b, s = qkv.shape[0], qkv.shape[1]
    return ctx.transpose(0, 2, 1, 3).reshape(b, s, -1).astype(qkv.dtype)


_MASK = -1e30


def _pack_factor(b: int, s: int) -> int:
    """How many windows to pack into one kernel sequence.

    The family's windows are tiny (S = 16..53 for the 224-class models), so a
    per-window matmul occupies a fraction of one 128-wide MXU pass. Packing
    P = floor(128/S) windows along the sequence dim with a block-diagonal
    bias mask computes P windows' attention in the passes of one: 2x fewer
    MXU passes for S=49..53, 8x for the 16-token carrier attention.
    """
    p = max(1, 128 // s)
    while p > 1 and b % p:
        p -= 1
    return p


def _block_diag_bias(bias: jnp.ndarray, p: int) -> jnp.ndarray:
    """(H, S, S) -> (H, P*S, P*S): bias on diagonal blocks, -inf elsewhere."""
    h, s, _ = bias.shape
    tiled = jnp.tile(bias, (1, p, p))
    blk = jax.lax.broadcasted_iota(jnp.int32, (p * s, p * s), 0) // s == \
        jax.lax.broadcasted_iota(jnp.int32, (p * s, p * s), 1) // s
    return jnp.where(blk[None], tiled, _MASK)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4))
def fused_window_mhsa(qkv: jnp.ndarray, bias: jnp.ndarray, num_heads: int,
                      scale: float, interpret: bool = False) -> jnp.ndarray:
    """softmax(q kᵀ·scale + bias) v over per-window sequences.

    qkv: (B, S, 3C) with channels factored (3, H, hd); bias: (H, S, S).
    Returns (B, S, C)."""
    return _mhsa_packed_forward(qkv, bias, num_heads, scale, interpret)


def _mhsa_packed_forward(qkv, bias, num_heads, scale, interpret):
    b, s, c3 = qkv.shape
    p = _pack_factor(b, s)
    if p == 1:
        return _mhsa_forward(qkv, bias, num_heads, scale, interpret)
    packed = qkv.reshape(b // p, p * s, c3)
    out = _mhsa_forward(packed, _block_diag_bias(bias, p), num_heads, scale,
                        interpret)
    return out.reshape(b, s, c3 // 3)


def _mhsa_bwd_kernel(qkv_ref, bias_ref, g_ref, dqkv_ref, dbias_ref, *,
                     num_heads: int, scale: float):
    """Flash-style backward: recompute probs in VMEM, emit dqkv; dbias is
    accumulated across the batch grid (constant output index map)."""
    tb, s, c3 = qkv_ref.shape
    c = c3 // 3
    hd = c // num_heads
    qkv = qkv_ref[:]
    bias = bias_ref[:]
    g = g_ref[:]

    @pl.when(pl.program_id(0) == 0)
    def _():
        dbias_ref[:] = jnp.zeros_like(dbias_ref)

    for h in range(num_heads):
        q = qkv[:, :, h * hd:(h + 1) * hd]
        k = qkv[:, :, c + h * hd:c + (h + 1) * hd]
        v = qkv[:, :, 2 * c + h * hd:2 * c + (h + 1) * hd]
        gh = g[:, :, h * hd:(h + 1) * hd].astype(jnp.float32)
        logits = jax.lax.dot_general(
            q, k, dimension_numbers=(((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)
        logits = logits * scale + bias[h][None].astype(jnp.float32)
        m = jnp.max(logits, axis=-1, keepdims=True)
        p = jnp.exp(logits - m)
        p = p / jnp.sum(p, axis=-1, keepdims=True)          # (TB, S, S) f32

        dp = jax.lax.dot_general(
            gh, v.astype(jnp.float32),
            dimension_numbers=(((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)             # (TB, S, S)
        dl = p * (dp - jnp.sum(dp * p, axis=-1, keepdims=True))
        dbias_ref[h] += jnp.sum(dl, axis=0).astype(dbias_ref.dtype)
        dq = jax.lax.dot_general(
            dl, k.astype(jnp.float32),
            dimension_numbers=(((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32) * scale
        dk = jax.lax.dot_general(
            dl, q.astype(jnp.float32),
            dimension_numbers=(((1,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32) * scale
        dv = jax.lax.dot_general(
            p, gh, dimension_numbers=(((1,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)
        dqkv_ref[:, :, h * hd:(h + 1) * hd] = dq.astype(dqkv_ref.dtype)
        dqkv_ref[:, :, c + h * hd:c + (h + 1) * hd] = dk.astype(dqkv_ref.dtype)
        dqkv_ref[:, :, 2 * c + h * hd:2 * c + (h + 1) * hd] = \
            dv.astype(dqkv_ref.dtype)


def _mhsa_backward_pallas(qkv, bias, g, num_heads, scale, interpret):
    b, s, c3 = qkv.shape
    tb = _pick_block_b(b, _bwd_row_bytes(s, c3 // 3, num_heads,
                                         qkv.dtype.itemsize))
    kernel = functools.partial(_mhsa_bwd_kernel, num_heads=num_heads,
                               scale=scale)
    dqkv, dbias = pl.pallas_call(
        kernel,
        grid=(b // tb,),
        in_specs=[
            pl.BlockSpec((tb, s, c3), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(bias.shape, lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tb, s, c3 // 3), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((tb, s, c3), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(bias.shape, lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[jax.ShapeDtypeStruct(qkv.shape, qkv.dtype),
                   jax.ShapeDtypeStruct(bias.shape, bias.dtype)],
        interpret=interpret,
    )(qkv, bias, g)
    return dqkv, dbias


def _fwd(qkv, bias, num_heads, scale, interpret):
    return (_mhsa_packed_forward(qkv, bias, num_heads, scale, interpret),
            (qkv, bias))


def _bwd(num_heads, scale, interpret, res, g):
    qkv, bias = res
    b, s, c3 = qkv.shape
    p = _pack_factor(b, s)
    qkvp = qkv.reshape(b // p, p * s, c3)
    gp = g.reshape(b // p, p * s, c3 // 3)
    biasp = _block_diag_bias(bias, p) if p > 1 else bias
    dqkvp, dbiasp = _mhsa_backward_pallas(qkvp, biasp, gp, num_heads, scale,
                                          interpret)
    dqkv = dqkvp.reshape(b, s, c3)
    if p > 1:
        # the bias was tiled onto every diagonal block; its gradient is the
        # sum over those blocks (off-diagonal -inf mask is constant)
        dbias = sum(dbiasp[:, i * s:(i + 1) * s, i * s:(i + 1) * s]
                    for i in range(p))
    else:
        dbias = dbiasp
    return dqkv, dbias.astype(bias.dtype)


fused_window_mhsa.defvjp(_fwd, _bwd)


# Back-compat shim for the (q, k, v, bias) signature used by tests/older call
# sites: packs heads back into (B, S, 3C) and calls the fused kernel.
def fused_bias_attention(q, k, v, bias, scale, interpret: bool = False):
    b, h, s, d = q.shape
    pack = jnp.stack([q, k, v], axis=0)          # (3, B, H, S, D)
    qkv = pack.transpose(1, 3, 0, 2, 4).reshape(b, s, 3 * h * d)
    out = fused_window_mhsa(qkv, bias, h, scale, interpret)
    return out.reshape(b, s, h, d).transpose(0, 2, 1, 3)
