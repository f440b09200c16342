"""Gather-free MSDA forward: bilinear sampling as one-hot matmuls (TPU).

Every indexed-load formulation of MSDA's bilinear gather — XLA's gather
emitter, Pallas dynamic-slice loops, corner-packed single-row loads —
floors at ~16 ns/sample on v5e (MSDA_STRIPS_PROBE.json: 16.2 / 34-52 /
20.9 ns): TPU has no per-sublane addressing, so each sample pays a
dynamic-sublane access regardless of formulation. At MOTR streaming scale
(6 encoder layers x 4 levels x 3.26M samples) that floor alone is
~1.27 s/frame.

This module avoids the floor by not indexing at all. Samples are
processed in chunks of C consecutive (query, point)s; the encoder's
queries are raster-ordered, so a chunk's rows live in a narrow band
[r0, r0+R). The chunk then computes

    out[i] = w_i * Ay[i] . (Ax @ W_window)        (all dense)

where Ax (C, Wp) and Ay (C, R) are bilinear-weighted one-hot matrices
built by vectorized iota comparison — the 'gather' becomes an MXU matmul
at ~C*Wp*R*D FLOPs per chunk.

MEASURED OUTCOME (round 4, v5e): the trade does not pay at MOTR scale.
Per-sample cost is 2*Wp*R*D FLOPs — at the encoder's level-0 width
(Wp=388) that is ~400 kFLOP/sample at exact (HIGHEST) precision, far
above the 16 ns load it replaces: in-model MOTR exact streaming is
2.89 s/frame on rowmix vs 1.61 on the pallas gather kernel
(PROFILE_DOWNSTREAM.json). rowmix only wins on narrow maps (Wp <~ 64,
38.8 vs 46.6 ms at a 4-level Q=5440 probe) — but those already ride the
VMEM-resident pallas kernel. Kept as an opt-in backend: it is the one
GSPMD-shardable encoder-scale formulation, and the measurement pins the
indexed-load floor (~16 ns/sample, MSDA_GATHER_PROBE.json) as the real
chip limit for exact MSDA (VERDICT r3 #2).

Exactness does not depend on raster order: samples whose rows fall
outside their chunk's window keep weight 0 in the fast path and are
computed by a remainder pass (the classic gather path) behind a lax.cond
that only executes when some chunk actually overflows — never for the
encoder layouts MSDA sees in DINO/MOTR.

Levels whose padded height fits _FULL_MAP_ROWS skip windowing entirely
(whole map as the window: no r0, no remainder).

Pure XLA: shardable under GSPMD (unlike the Mosaic kernels), identical
custom-VJP backward (ops/msda.py re-gathers its own patches).

Reference semantics: ms_deform_attn_core_pytorch
(dino/models/dino/ops/functions/ms_deform_attn_func.py:41-61).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax

_C = 2048            # samples per chunk
_R = 16              # row-window height (windowed levels)
_FULL_MAP_ROWS = 64  # padded heights <= this use the whole map
_G = 8               # chunks per lax.map step (batches the matmul)

# MXU precision for the one-hot matmuls. TPU's DEFAULT f32 matmul is a
# single bf16 pass — it rounds both the bilinear fractions and the map
# values, costing ~2e-2 abs error in-model (measured on v5e). HIGHEST
# (float32, multi-pass) restores exact parity with the gather path at
# 3-6x the MXU cost. Speed-over-exactness callers (bf16 training, where
# the maps are bf16 anyway) may set DEFAULT.
_PRECISION = lax.Precision.HIGHEST


def _one_hot_weighted(idx, frac, size):
    """(..., C) int32 idx, f32 frac -> (..., C, size) bilinear one-hot:
    (1-frac) at idx, frac at idx+1. Built by iota compare (no scatter)."""
    io = lax.broadcasted_iota(jnp.int32, idx.shape + (size,), idx.ndim)
    idxb = idx[..., None]
    fracb = frac[..., None]
    return ((io == idxb) * (1.0 - fracb) + (io == idxb + 1) * fracb)


def rowmix_gather(vm: jnp.ndarray, iy: jnp.ndarray, ix: jnp.ndarray,
                  fy: jnp.ndarray, fx: jnp.ndarray, w: jnp.ndarray,
                  p: int) -> jnp.ndarray:
    """Same contract as ops/msda_pallas.fused_bilinear_gather: vm (B, Hp,
    Wp, D) zero-border level maps, iy/ix int32 and fy/fx/w f32 (B, QP)
    with each query's P samples consecutive; returns (B, QP/p, D) f32."""
    b, hp, wp, d = vm.shape
    qp = iy.shape[1]
    assert qp % p == 0, (qp, p)
    cdt = jnp.promote_types(vm.dtype, jnp.float32)
    full_map = hp <= _FULL_MAP_ROWS
    r = hp if full_map else _R

    chunk = min(_C, qp)
    pad = (-qp) % chunk
    if pad:
        padi = ((0, 0), (0, pad))
        # edge-replicate rows so padding can't widen a chunk's window
        iy, ix = (jnp.pad(t, padi, mode="edge") for t in (iy, ix))
        fy, fx = (jnp.pad(t, padi, mode="edge") for t in (fy, fx))
        w = jnp.pad(w, padi)
    qpp = qp + pad
    nchunk = qpp // chunk
    g = _G
    while nchunk % g:
        g //= 2

    sh = lambda t: t.reshape(b, nchunk, chunk)             # noqa: E731
    iy_c, ix_c = sh(iy), sh(ix)
    fy_c, fx_c, w_c = (sh(t).astype(cdt) for t in (fy, fx, w))
    if full_map:
        r0 = jnp.zeros((b, nchunk), jnp.int32)
        covered = None
    else:
        r0 = jnp.clip(jnp.min(iy_c, axis=2), 0, hp - r).astype(jnp.int32)
        # rows iy, iy+1 must lie inside [r0, r0+r)
        covered = iy_c <= r0[..., None] + (r - 2)
        w_c = jnp.where(covered, w_c, 0.0)

    vmf = vm.astype(cdt)

    def group(args):
        iyg, ixg, fyg, fxg, wg, r0g = args                 # (b, g, chunk)

        def one_map(vm_b, iyg, ixg, fyg, fxg, wg, r0g):
            if full_map:
                win = jnp.broadcast_to(vm_b[None], (g,) + vm_b.shape)
            else:
                win = jax.vmap(lambda rr: lax.dynamic_slice(
                    vm_b, (rr, 0, 0), (r, wp, d)))(r0g)    # (g, r, wp, d)
            w2 = win.transpose(0, 2, 1, 3).reshape(g, wp, r * d)
            ax = _one_hot_weighted(ixg, fxg, wp)           # (g, chunk, wp)
            colsel = jnp.einsum("gcx,gxk->gck", ax, w2,
                                preferred_element_type=cdt,
                                precision=_PRECISION)
            colsel = colsel.reshape(g, chunk, r, d)
            ay = _one_hot_weighted(iyg - r0g[:, None], fyg, r)
            return jnp.einsum("gcr,gcrd->gcd", ay * wg[..., None], colsel,
                              precision=_PRECISION)

        return jax.vmap(one_map)(vmf, iyg, ixg, fyg, fxg, wg, r0g)

    ng = nchunk // g

    def gr(t):
        return jnp.moveaxis(t.reshape((b, ng, g) + t.shape[2:]), 1, 0)

    out = lax.map(group, (gr(iy_c), gr(ix_c), gr(fy_c), gr(fx_c),
                          gr(w_c), jnp.moveaxis(
                              r0.reshape(b, ng, g), 1, 0)))
    out = jnp.moveaxis(out, 0, 1).reshape(b, qpp, d)[:, :qp]
    fast = out.reshape(b, qp // p, p, d).sum(2)
    if full_map:
        return fast

    def remainder(_):
        # exact fallback for samples outside their chunk window: the
        # indexed-load path with complementary weights (only compiled in;
        # executes only when triggered)
        w_rem = jnp.where(covered, 0.0, sh(w).astype(cdt)).reshape(b, qpp)
        dn = lax.GatherDimensionNumbers(
            offset_dims=(1, 2, 3), collapsed_slice_dims=(),
            start_index_map=(0, 1))
        idx = jnp.stack([iy, ix], -1)
        patches = jax.vmap(lambda op, ii: lax.gather(
            op, ii, dn, slice_sizes=(2, 2, d),
            mode=lax.GatherScatterMode.PROMISE_IN_BOUNDS))(vmf, idx)
        fyb = fy[..., None].astype(cdt)
        fxb = fx[..., None].astype(cdt)
        bil = ((1 - fyb) * (1 - fxb) * patches[:, :, 0, 0]
               + (1 - fyb) * fxb * patches[:, :, 0, 1]
               + fyb * (1 - fxb) * patches[:, :, 1, 0]
               + fyb * fxb * patches[:, :, 1, 1])
        contrib = (w_rem[..., None] * bil)[:, :qp]
        return contrib.reshape(b, qp // p, p, d).sum(2)

    any_overflow = jnp.logical_not(jnp.all(covered))
    return fast + lax.cond(any_overflow, remainder,
                           lambda _: jnp.zeros_like(fast), None)


def msda_forward_rowmix(spatial_shapes, value, sampling_locations,
                        attention_weights):
    """Drop-in forward for ops/msda.py's _msda_body: same arguments, same
    (N, Q, M*D) output, per-level rowmix matmuls instead of gathers."""
    from fastervit_tpu.ops import msda as _m

    n, s, m, d = value.shape
    q = sampling_locations.shape[1]
    p = sampling_locations.shape[4]
    acc = jnp.zeros((n * m, q, d), jnp.promote_types(value.dtype,
                                                     jnp.float32))
    start = 0
    for lvl, (h, w) in enumerate(spatial_shapes):
        v = lax.slice_in_dim(value, start, start + h * w, axis=1)
        start += h * w
        vm = _m._padded_level_map(v, n, h, w, m, d)
        ll = sampling_locations[:, :, :, lvl]
        fx, fy, valid, iy, ix = _m._level_geometry(ll, h, w)
        wl = attention_weights[:, :, :, lvl].astype(jnp.float32)
        w_eff = wl * valid[..., 0]
        flat = lambda t: _m._flat_qp(t, n, m)              # noqa: E731
        acc = acc + rowmix_gather(
            vm, flat(iy), flat(ix),
            flat(fy[..., 0]).astype(jnp.float32),
            flat(fx[..., 0]).astype(jnp.float32),
            flat(w_eff), p)
    assert start == s, (start, s)
    out = acc.reshape(n, m, q, d).transpose(0, 2, 1, 3)
    return out.reshape(n, q, m * d).astype(value.dtype)
