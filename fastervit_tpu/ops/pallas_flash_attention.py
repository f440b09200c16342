"""Q-tiled bias attention Pallas kernel for the large-window variants.

The packed kernel (pallas_attention.py) keeps the full (H, S, S) bias and an
(S, S) f32 logits tile resident in VMEM — perfect for the family's small
windows (S = 49..196) but impossible for the 21k large-window stages
(reference faster_vit.py:1297-1410: window 24/32/48 -> S = 576/1024/2304,
where the bias alone is 21..340 MB). This kernel handles those:

  * grid (B, H, nQ): each step computes one (TQ, S) slab of one head's
    attention. K and V for the head stay fully VMEM-resident (S x hd with
    hd = 49 padded to the 128-lane tile: <= 0.6 MB at S = 2304) so no
    online-softmax running state is needed — the softmax sees the whole row.
  * the bias is streamed as (TQ, S) tiles per (head, q-tile) — never
    batch-broadcast, never fully resident.
  * backward is two kernels (flash-style recompute of the probabilities):
    - dq + dbias on grid (H, nQ, B) with batch innermost, so the dbias
      output tile stays put while the batch accumulates into it;
    - dk + dv on grid (B, H, nQ) with the q-tile innermost, accumulating
      into the per-(b, h) dk/dv tiles.

Semantics match pallas_attention._mhsa_reference exactly:
softmax(q k^T * scale + bias) v per head, qkv channel layout (3, H, hd).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# Sized against on-chip measurements, not the 16 MB scoped-vmem limit alone:
# _tile_bytes overestimates actual Mosaic residency (kv/bias streams are not
# all double-buffered in practice — tq=384 at S=2304, formula 16.9 MB, and
# tq=1024 at S=1024, formula 18.9 MB, both compile and run; tq=576 at S=2304,
# formula 24.2 MB, fails). 17 MB admits every tile the FLASH_TQ_PROBE sweep
# measured fastest (S=2304 -> 384, S=1024 -> 512, S=576 -> 576) while
# excluding the measured compile failures. Tiles whose formula lands in the
# over-16MB band are additionally probe-compiled once per geometry
# (_probe_ok) so an unswept geometry falls back to the next smaller tile
# instead of failing Mosaic compilation at runtime (ADVICE r4).
_SAFE_VMEM = 16 * 1024 * 1024
_VMEM_BUDGET = 17 * 1024 * 1024
_PROBE_CACHE: dict = {}


def _pad128(n: int) -> int:
    return (n + 127) // 128 * 128


def _tile_bytes(tq: int, s: int, hd: int, itemsize: int) -> int:
    """VMEM bytes per grid step: double-buffered in/out tiles + f32 logits
    scratch. k/v are grid-invariant along nQ but still double-buffered."""
    kv = 2 * 2 * s * _pad128(hd) * itemsize            # k, v double-buffered
    qo = 2 * 2 * tq * _pad128(hd) * itemsize           # q, out
    bias = 2 * tq * s * 4                              # bias tile (f32)
    logits = 2 * tq * s * 4                            # logits + probs scratch
    return kv + qo + bias + logits


def _probe_ok(tq: int, s: int, hd: int, itemsize: int,
              bias_itemsize: int = 4) -> bool:
    """Compile the forward kernel standalone to check real Mosaic VMEM
    residency for a tile whose formula lands in the empirical (16, 17] MB
    band. Fidelity matters (code-review r5): the probe uses b=2/h=2 so the
    k/v blocks vary across grid steps (real double-buffering, not the
    grid-invariant b=1/h=1 special case) and the CALLER's bias dtype (the
    production bf16 path streams a bf16 bias — half the f32 tile). Cached
    per geometry; off-TPU backends (interpret-mode tests) trust the
    formula — they have no scoped-VMEM limit."""
    key = (tq, s, hd, itemsize, bias_itemsize)
    if key in _PROBE_CACHE:
        return _PROBE_CACHE[key]
    if jax.default_backend() != "tpu":
        _PROBE_CACHE[key] = True
        return True
    dtype = jnp.bfloat16 if itemsize == 2 else jnp.float32
    bias_dtype = jnp.bfloat16 if bias_itemsize == 2 else jnp.float32
    hdp = _pad128(hd)
    qkv = jax.ShapeDtypeStruct((2, 2, s, hdp), dtype)
    bias = jax.ShapeDtypeStruct((2, s, s), bias_dtype)
    try:
        jax.jit(functools.partial(
            _flash_forward, scale=1.0, interpret=False, tq=tq)).lower(
                qkv, qkv, qkv, bias).compile()
        ok = True
    except Exception as e:
        # Only a genuine Mosaic/VMEM/OOM refusal demotes the tile.
        # Anything else (e.g. a transient relay HTTP 500) must NOT
        # silently shrink tq — that cost ~10% at 21k-768 when it first
        # happened; trust the empirical budget instead, exactly as before
        # the probe existed.
        msg = f"{type(e).__name__}: {e}".lower()
        refusal = ("mosaic" in msg or "vmem" in msg or "memory" in msg
                   or "resource_exhausted" in msg or "scoped" in msg)
        ok = not refusal
    _PROBE_CACHE[key] = ok
    return ok


def _pick_tq(s: int, hd: int, itemsize: int, bias_itemsize: int = 4) -> int:
    """Largest fitting q-tile wins: fewer grid steps amortize the
    grid-invariant K/V fetch (FLASH_TQ_PROBE.json: at S=2304 tq=384 is 1.08x
    over tq=192; at S=576 the single-tile tq=576 is fastest). Tiles in the
    over-16MB empirical band must also pass a one-time compile probe."""
    best = 8
    for tq in (1024, 768, 576, 512, 448, 384, 320, 288, 256, 192, 160, 144,
               128, 96, 72, 64, 48, 32, 16, 8):
        if tq > s or s % tq != 0:
            continue
        nbytes = _tile_bytes(tq, s, hd, itemsize)
        if nbytes > _VMEM_BUDGET:
            continue
        if nbytes > _SAFE_VMEM and not _probe_ok(tq, s, hd, itemsize,
                                                 bias_itemsize):
            # formula admitted it; Mosaic refused — demote loudly: a
            # silent drop from the swept-fastest tile costs ~10% at 21k
            print(f"pallas_flash_attention: tq={tq} refused by Mosaic at "
                  f"S={s} hd={hd}; falling back to a smaller q-tile",
                  flush=True)
            continue
        return tq
    return best if s % best == 0 else s


def flash_supported(s: int, hd: int, itemsize: int) -> bool:
    """Whether one (8, S) q-slab + full-KV head state fits the VMEM budget."""
    tq = 8 if s % 8 == 0 else s
    return _tile_bytes(min(tq, s), s, hd, itemsize) <= _VMEM_BUDGET


def _split_heads(qkv: jnp.ndarray, num_heads: int):
    """(B, S, 3C) channel layout (3, H, hd) -> three (B, H, S, hd) arrays."""
    b, s, c3 = qkv.shape
    hd = c3 // 3 // num_heads
    parts = qkv.reshape(b, s, 3, num_heads, hd).transpose(2, 0, 3, 1, 4)
    return parts[0], parts[1], parts[2]


def _pad_hd(x: jnp.ndarray) -> jnp.ndarray:
    """Zero-pad the head dim to a 128-lane multiple. Mosaic compile time is
    pathological for unaligned minor block dims (measured on v5e: hd 49/64
    at 16 heads -> 1.5-8 MINUTES per kernel vs ~1s at hd 128); the zeros are
    free — K-dim zeros don't change q k^T, zero V columns slice off, and the
    MXU pads K<128 internally anyway."""
    hd = x.shape[-1]
    pad = (-hd) % 128
    if pad == 0:
        return x
    return jnp.pad(x, ((0, 0),) * (x.ndim - 1) + ((0, pad),))


def _merge_heads(ctx: jnp.ndarray) -> jnp.ndarray:
    b, h, s, hd = ctx.shape
    return ctx.transpose(0, 2, 1, 3).reshape(b, s, h * hd)


def _fwd_kernel(q_ref, k_ref, v_ref, bias_ref, out_ref, *, scale: float):
    q = q_ref[0, 0].astype(jnp.float32)                # (TQ, hd)
    k = k_ref[0, 0]                                    # (S, hd)
    logits = jax.lax.dot_general(
        q, k, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)            # (TQ, S)
    logits = logits * scale + bias_ref[0].astype(jnp.float32)
    m = jnp.max(logits, axis=-1, keepdims=True)
    p = jnp.exp(logits - m)
    ctx = jax.lax.dot_general(
        p.astype(v_ref.dtype), v_ref[0, 0],
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)            # (TQ, hd)
    # normalize the (TQ, hd) context, not the (TQ, S) probs: S/hd-fold less
    # VPU division work (18x at the 21k-768 level_2 geometry)
    out_ref[0, 0] = (ctx / jnp.sum(p, axis=-1, keepdims=True)).astype(
        out_ref.dtype)


def _flash_forward(q, k, v, bias, scale, interpret, grid_order="hqb",
                   tq=None):
    b, h, s, hd = q.shape
    if tq is None:
        tq = _pick_tq(s, hd, q.dtype.itemsize, bias.dtype.itemsize)
    kernel = functools.partial(_fwd_kernel, scale=scale)
    if grid_order == "hqb":
        # batch innermost: the (TQ, S) f32 bias tile — the largest streamed
        # operand (f32 and S wide; e.g. 21k-768: S=2304) — has index
        # (hi, qi), so it stays VMEM-resident across the whole batch sweep
        # instead of re-streaming per image. K/V (bf16, hd=128) re-fetch per
        # step, which costs half as much as re-streaming the bias did.
        grid = (h, s // tq, b)
        ix_q = lambda hi, qi, bi: (bi, hi, qi, 0)       # noqa: E731
        ix_kv = lambda hi, qi, bi: (bi, hi, 0, 0)       # noqa: E731
        ix_bias = lambda hi, qi, bi: (hi, qi, 0)        # noqa: E731
    else:  # "bhq": q-tiles innermost, K/V resident per (b, h)
        grid = (b, h, s // tq)
        ix_q = lambda bi, hi, qi: (bi, hi, qi, 0)       # noqa: E731
        ix_kv = lambda bi, hi, qi: (bi, hi, 0, 0)       # noqa: E731
        ix_bias = lambda bi, hi, qi: (hi, qi, 0)        # noqa: E731
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, 1, tq, hd), ix_q, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, s, hd), ix_kv, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, s, hd), ix_kv, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tq, s), ix_bias, memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 1, tq, hd), ix_q,
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, h, s, hd), q.dtype),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=4 * b * h * s * s * hd,
            bytes_accessed=(q.size * 2 + k.size + v.size) * q.dtype.itemsize
            + bias.size * 4,
            transcendentals=b * h * s * s,
        ),
    )(q, k, v, bias)


def _recompute_p(q, k, bias_tile, scale):
    logits = jax.lax.dot_general(
        q.astype(jnp.float32), k,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)
    logits = logits * scale + bias_tile.astype(jnp.float32)
    m = jnp.max(logits, axis=-1, keepdims=True)
    p = jnp.exp(logits - m)
    return p / jnp.sum(p, axis=-1, keepdims=True)      # (TQ, S) f32


def _dl_tile(q, k, v, g, bias_tile, scale):
    """Recompute probs and the logit gradient dl for one (TQ, S) slab."""
    p = _recompute_p(q, k, bias_tile, scale)
    dp = jax.lax.dot_general(
        g, v.astype(jnp.float32),
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)            # (TQ, S)
    dl = p * (dp - jnp.sum(dp * p, axis=-1, keepdims=True))
    return p, dl


def _bwd_dq_kernel(q_ref, k_ref, v_ref, bias_ref, g_ref, dq_ref, dbias_ref, *,
                   scale: float):
    # grid (H, nQ, B): batch innermost so dbias (hi, qi) accumulates in place
    q = q_ref[0, 0].astype(jnp.float32)
    k = k_ref[0, 0]
    g = g_ref[0, 0].astype(jnp.float32)

    @pl.when(pl.program_id(2) == 0)
    def _():
        dbias_ref[:] = jnp.zeros_like(dbias_ref)

    _, dl = _dl_tile(q, k, v_ref[0, 0], g, bias_ref[0], scale)
    dbias_ref[0] += dl.astype(dbias_ref.dtype)
    dq = jax.lax.dot_general(
        dl, k.astype(jnp.float32),
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32) * scale
    dq_ref[0, 0] = dq.astype(dq_ref.dtype)


def _bwd_dkv_kernel(q_ref, k_ref, v_ref, bias_ref, g_ref, dk_ref, dv_ref, *,
                    scale: float):
    # grid (B, H, nQ): q-tile innermost so dk/dv (bi, hi) accumulate in place
    q = q_ref[0, 0].astype(jnp.float32)
    k = k_ref[0, 0]
    g = g_ref[0, 0].astype(jnp.float32)

    @pl.when(pl.program_id(2) == 0)
    def _():
        dk_ref[:] = jnp.zeros_like(dk_ref)
        dv_ref[:] = jnp.zeros_like(dv_ref)

    p, dl = _dl_tile(q, k, v_ref[0, 0], g, bias_ref[0], scale)
    dv_ref[0, 0] += jax.lax.dot_general(
        p, g, dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32).astype(dv_ref.dtype)   # (S, hd)
    dk_ref[0, 0] += (jax.lax.dot_general(
        dl, q, dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32) * scale).astype(dk_ref.dtype)


def _flash_backward(q, k, v, bias, g, scale, interpret):
    b, h, s, hd = q.shape
    tq = _pick_tq(s, hd, q.dtype.itemsize, bias.dtype.itemsize)
    nq = s // tq
    dq, dbias = pl.pallas_call(
        functools.partial(_bwd_dq_kernel, scale=scale),
        grid=(h, nq, b),
        in_specs=[
            pl.BlockSpec((1, 1, tq, hd), lambda hi, qi, bi: (bi, hi, qi, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, s, hd), lambda hi, qi, bi: (bi, hi, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, s, hd), lambda hi, qi, bi: (bi, hi, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tq, s), lambda hi, qi, bi: (hi, qi, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, tq, hd), lambda hi, qi, bi: (bi, hi, qi, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, 1, tq, hd), lambda hi, qi, bi: (bi, hi, qi, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tq, s), lambda hi, qi, bi: (hi, qi, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[jax.ShapeDtypeStruct((b, h, s, hd), q.dtype),
                   # dbias accumulates across the batch grid dim: keep the
                   # accumulator f32 even when the bias streams bf16
                   jax.ShapeDtypeStruct((h, s, s), jnp.float32)],
        interpret=interpret,
    )(q, k, v, bias, g)
    dk, dv = pl.pallas_call(
        functools.partial(_bwd_dkv_kernel, scale=scale),
        grid=(b, h, nq),
        in_specs=[
            pl.BlockSpec((1, 1, tq, hd), lambda bi, hi, qi: (bi, hi, qi, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, s, hd), lambda bi, hi, qi: (bi, hi, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, s, hd), lambda bi, hi, qi: (bi, hi, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tq, s), lambda bi, hi, qi: (hi, qi, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, tq, hd), lambda bi, hi, qi: (bi, hi, qi, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, 1, s, hd), lambda bi, hi, qi: (bi, hi, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, s, hd), lambda bi, hi, qi: (bi, hi, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[jax.ShapeDtypeStruct((b, h, s, hd), q.dtype),
                   jax.ShapeDtypeStruct((b, h, s, hd), q.dtype)],
        interpret=interpret,
    )(q, k, v, bias, g)
    return dq, dk, dv, dbias


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4))
def flash_window_mhsa(qkv: jnp.ndarray, bias: jnp.ndarray, num_heads: int,
                      scale: float, interpret: bool = False) -> jnp.ndarray:
    """softmax(q k^T * scale + bias) v for sequences too long for the packed
    kernel. qkv: (B, S, 3C) channel layout (3, H, hd); bias: (H, S, S).
    Returns (B, S, C)."""
    q, k, v = _split_heads(qkv, num_heads)
    hd = q.shape[-1]
    ctx = _flash_forward(_pad_hd(q), _pad_hd(k), _pad_hd(v), bias, scale,
                         interpret)
    return _merge_heads(ctx[..., :hd])


def _fwd(qkv, bias, num_heads, scale, interpret):
    return flash_window_mhsa(qkv, bias, num_heads, scale, interpret), \
        (qkv, bias)


def _bwd(num_heads, scale, interpret, res, g):
    qkv, bias = res
    b, s, c3 = qkv.shape
    hd = c3 // 3 // num_heads
    q, k, v = _split_heads(qkv, num_heads)
    gh = g.reshape(b, s, num_heads, hd).transpose(0, 2, 1, 3)
    dq, dk, dv, dbias = _flash_backward(
        _pad_hd(q), _pad_hd(k), _pad_hd(v), bias, _pad_hd(gh), scale,
        interpret)
    dq, dk, dv = dq[..., :hd], dk[..., :hd], dv[..., :hd]
    dqkv = jnp.stack([dq, dk, dv], axis=0)             # (3, B, H, S, hd)
    dqkv = dqkv.transpose(1, 3, 0, 2, 4).reshape(b, s, c3)
    return dqkv, dbias.astype(bias.dtype)


flash_window_mhsa.defvjp(_fwd, _bwd)
