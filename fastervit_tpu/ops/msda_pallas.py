"""Fused bilinear-gather Pallas kernel for MSDA (TPU).

Replaces the XLA forward path of ops/msda.py at encoder scale: instead of
lax.gather-ing (2, 2, D) corner patches to HBM and running the bilinear
combine / attention weighting / point reduction as separate memory-bound
XLA passes, one kernel holds a head's zero-padded level map VMEM-resident
and emits the already-reduced per-query output:

    out[q] = sum_p w[q, p] * bilinear(level_map, loc[q, p])

Measured on v5e (scripts/msda_pallas_probe.py, MSDA_PALLAS_PROBE.json):
the per-patch cost is ~15.3 ns — the same per-issue floor XLA's gather
emitter hits (15.5 ns) — but the fused kernel also absorbs the ~88 ms per
encoder layer of elementwise passes. Both a hand Pallas loop and XLA's
emitter floor at ~14 cycles/patch: TPU has no per-sublane addressing, so
each sample costs a dynamic-sublane vector load regardless of formulation
— that is the chip's indexed-load limit (VERDICT r2 #3). The only
formulation that avoids loads entirely is ops/msda_rowmix.py (one-hot
MXU matmuls, opt-in); at level-0 geometry it measured 18.4 ns/sample vs
the gather's 16.2 (MSDA_STRIPS_PROBE.json) — the floor stands.

Reference semantics: ms_deform_attn_core_pytorch (downstream
object_detection/dino/models/dino/ops/functions/ms_deform_attn_func.py:
41-61); grid_sample zero-padding realized by the map's zero border.
"""
from __future__ import annotations

import functools
from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_CHUNK = 2048                 # samples (query*point) per grid step
# Per-head map bytes above which the blocked double-buffered map would
# overflow VMEM -> switch to the manual once-per-head DMA-resident path.
_MAP_DOUBLE_BUFFER_LIMIT = 6 * 1024 * 1024


def _sample_loop(iy_ref, ix_ref, fy_ref, fx_ref, w_ref, map_ref, out_ref,
                 unroll: int, p: int, map_lead: int):
    """Shared sampling loop: map_ref (Hp, Wp, D) VMEM with `map_lead`
    leading singleton block dims (indexed in place — a pre-sliced .at[0]
    view would materialize a memref slice whose minor dim D=32 is
    misaligned to the 128-lane tiling, which Mosaic rejects), scalar refs
    (1, 1, 8, cols) SMEM, out_ref (1, NQ, D) VMEM."""
    nq = out_ref.shape[-2]
    cols = iy_ref.shape[-1]
    lead = (0,) * map_lead

    def sample(s):
        r = s // cols
        c = s % cols
        iy, ix = iy_ref[0, 0, r, c], ix_ref[0, 0, r, c]
        fy, fx, w = fy_ref[0, 0, r, c], fx_ref[0, 0, r, c], w_ref[0, 0, r, c]
        patch = map_ref[lead + (pl.ds(iy, 2), pl.ds(ix, 2), slice(None))]
        pf = patch.astype(jnp.float32)
        top = pf[0, 0] * (1.0 - fx) + pf[0, 1] * fx
        bot = pf[1, 0] * (1.0 - fx) + pf[1, 1] * fx
        return w * (top * (1.0 - fy) + bot * fy)

    def one(q):
        acc = sample(q * p)
        for pp in range(1, p):
            acc = acc + sample(q * p + pp)
        out_ref[0, q, :] = acc.astype(out_ref.dtype)

    def body(j, _):
        for u in range(unroll):
            one(j * unroll + u)
        return 0

    assert nq % unroll == 0, (nq, unroll)
    jax.lax.fori_loop(0, nq // unroll, body, 0, unroll=1)


def _p_kernel(iy_ref, ix_ref, fy_ref, fx_ref, w_ref, vm_ref, out_ref, *,
              unroll: int, p: int):
    """Blocked-map variant: vm block (1, Hp, Wp, D) streamed by pallas
    (double-buffered; fine while two map copies fit VMEM)."""
    _sample_loop(iy_ref, ix_ref, fy_ref, fx_ref, w_ref, vm_ref,
                 out_ref, unroll, p, map_lead=1)


# NOTE on big maps (encoder level 0, 10 MB/head at 1536x800): a
# double-buffered blocked map overflows VMEM, and a manual HBM->scratch
# DMA cannot be expressed either — pallas exposes HBM operands at their
# PHYSICAL padded shape (D=32 lanes pad to the 128 tile), so the .at[h]
# logical slice is tile-misaligned and Mosaic rejects it ("Slice shape
# along dimension 3 must be aligned to tiling (128), but is 32").
# Three strip-tiled kernels (manual DMA of corner-packed tile-aligned
# row strips, scalar-prefetch-routed visits, two-strip windows) were
# built and measured in round 4 — ALL slower than the XLA gather at
# level-0 scale (34-52 ns/sample vs 16.2, MSDA_STRIPS_PROBE.json): every
# per-sample indexed-load formulation floors at the chip's
# dynamic-sublane access cost. Oversized maps here therefore fall back to
# the (query-chunked) XLA gather. ops/msda_rowmix.py reformulates the
# gather as one-hot MXU matmuls (no loads at all) but also probes slower
# at this geometry — the floor appears to be real.


def fused_bilinear_gather(vm: jnp.ndarray, iy: jnp.ndarray, ix: jnp.ndarray,
                          fy: jnp.ndarray, fx: jnp.ndarray, w: jnp.ndarray,
                          p: int, *, interpret: bool = False) -> jnp.ndarray:
    """vm: (B, Hp, Wp, D) padded level maps (B = batch*heads); iy/ix int32
    and fy/fx/w f32, all (B, QP) with each query's P samples consecutive.
    Returns (B, QP/p, D) f32: the weighted bilinear reduction per query.

    QP is padded internally to a _CHUNK multiple (pad samples index (0, 0)
    with weight 0). The map rides in blocked (double-buffered) VMEM; maps
    above _MAP_DOUBLE_BUFFER_LIMIT can't (see the NOTE above)."""
    b, hp, wp, d = vm.shape
    qp = iy.shape[1]
    assert qp % p == 0, (qp, p)
    # chunk must be a multiple of 8*p (SMEM 8-row tiling x whole queries);
    # qp % p == 0 then makes the pad a whole number of queries too
    step = 8 * p
    cap = max(step, _CHUNK // step * step)
    chunk = min(cap, (qp + step - 1) // step * step)
    assert chunk % step == 0, (chunk, p)
    pad = (-qp) % chunk
    if pad:
        padi = ((0, 0), (0, pad))
        iy, ix = jnp.pad(iy, padi), jnp.pad(ix, padi)
        fy, fx, w = (jnp.pad(t, padi) for t in (fy, fx, w))
    qpp = qp + pad
    nchunk = qpp // chunk
    unroll = 8
    # Mosaic lane-pads the map block's minor dim (D=32 -> 128), so the
    # double-buffered VMEM cost is 4x the logical bytes — the default 16 MB
    # scoped-vmem budget rejects the 2.5 MB (logical) encoder level-1 map.
    # Size the kernel's budget from the physical block instead.
    phys_map = hp * -(-wp // 8) * 8 * 128 * vm.dtype.itemsize
    vmem_budget = min(2 * phys_map + 8 * 1024 * 1024, 100 * 1024 * 1024)
    tile = lambda t: t.reshape(b, nchunk, 8, chunk // 8)       # noqa: E731
    smem = lambda: pl.BlockSpec((1, 1, 8, chunk // 8),         # noqa: E731
                                lambda h, c: (h, c, 0, 0),
                                memory_space=pltpu.SMEM)
    out = pl.pallas_call(
        functools.partial(_p_kernel, unroll=unroll, p=p),
        grid=(b, nchunk),
        in_specs=[smem(), smem(), smem(), smem(), smem(),
                  pl.BlockSpec((1, hp, wp, d), lambda h, c: (h, 0, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, chunk // p, d), lambda h, c: (h, c, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, qpp // p, d), jnp.float32),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=vmem_budget),
        interpret=interpret,
    )(tile(iy), tile(ix), tile(fy), tile(fx), tile(w), vm)
    return out[:, : qp // p]


def msda_forward_pallas(spatial_shapes: Sequence[Tuple[int, int]],
                        value: jnp.ndarray, sampling_locations: jnp.ndarray,
                        attention_weights: jnp.ndarray, *,
                        interpret: bool = False) -> jnp.ndarray:
    """Drop-in forward for ops/msda.py's _msda_body: same arguments, same
    (N, Q, M*D) output, per-level fused Pallas gathers instead of
    lax.gather + XLA elementwise passes."""
    from fastervit_tpu.ops import msda as _m

    n, s, m, d = value.shape
    q = sampling_locations.shape[1]
    p = sampling_locations.shape[4]
    out_dtype = value.dtype
    # Gather from f32 maps regardless of the value dtype. Two reasons,
    # both measured: (a) bf16 operands do not speed up indexed loads
    # (per-index overhead, not bandwidth — MSDA_GATHER_PROBE); (b) Mosaic
    # rejects the kernel's dynamic sublane starts on packed bf16 tiles
    # ("cannot statically prove that index in dimension 2 is a multiple
    # of 8" at the 1536x800 streaming maps, which only FIT the fused path
    # at bf16 — at f32 the same maps exceed _MAP_DOUBLE_BUFFER_LIMIT and
    # take the XLA branch, which is why f32 never hit it). The upcast
    # also makes the per-level dispatch thresholds dtype-invariant.
    value = value.astype(_m._compute_dtype(value.dtype))
    acc = jnp.zeros((n * m, q, d), jnp.float32)
    start = 0
    for lvl, (h, w) in enumerate(spatial_shapes):
        v = jax.lax.slice_in_dim(value, start, start + h * w, axis=1)
        start += h * w
        vm = _m._padded_level_map(v, n, h, w, m, d)
        ll = sampling_locations[:, :, :, lvl]           # (N, Q, M, P, 2)
        fx, fy, valid, iy, ix = _m._level_geometry(ll, h, w)
        wl = attention_weights[:, :, :, lvl].astype(jnp.float32)
        map_bytes = (h + 2) * (w + 2) * d * vm.dtype.itemsize
        w_eff = wl * valid[..., 0]                      # (N, Q, M, P)
        flat = lambda t: _m._flat_qp(t, n, m)           # noqa: E731
        if map_bytes <= _MAP_DOUBLE_BUFFER_LIMIT:
            gather = fused_bilinear_gather
        else:
            # oversized map (encoder level 0): XLA gather path,
            # query-chunked so full-Q patch temporaries never materialize
            # (ADVICE r3). See the NOTE above for why no VMEM-resident
            # variant exists. This chunked-XLA path IS what 'auto' uses at
            # these shapes; the opt-in ops/msda_rowmix.py alternative was
            # measured SLOWER at encoder scale (2.89 vs 1.61 s/frame,
            # PROFILE_DOWNSTREAM.json) and is kept only as the
            # GSPMD-shardable formulation.
            ck = 4096
            padq = (-q) % ck
            k = (q + padq) // ck

            def split(t):
                t = jnp.pad(t, ((0, 0), (0, padq)) + ((0, 0),) * (t.ndim - 2))
                return jnp.moveaxis(
                    t.reshape((n, k, ck) + t.shape[2:]), 1, 0)

            def xla_chunk(args):
                iy_c, ix_c, fy_c, fx_c, valid_c, wl_c = args
                patches = _m._level_patches(vm, iy_c, ix_c, n, ck, m, p, d)
                interp = _m._bilinear(patches, fx_c, fy_c, valid_c)
                return jnp.sum(interp * wl_c[..., None], axis=3)

            lvl_out = jax.lax.map(
                xla_chunk, tuple(split(t) for t in (iy, ix, fy, fx, valid,
                                                    wl)))
            lvl_out = jnp.moveaxis(lvl_out, 0, 1).reshape(
                n, q + padq, m, d)[:, :q]
            acc = acc + lvl_out.transpose(0, 2, 1, 3).reshape(
                n * m, q, d).astype(jnp.float32)
            continue
        acc = acc + gather(
            vm, flat(iy), flat(ix),
            flat(fy[..., 0]).astype(jnp.float32),
            flat(fx[..., 0]).astype(jnp.float32),
            flat(w_eff), p, interpret=interpret)
    assert start == s, (start, s)
    out = acc.reshape(n, m, q, d).transpose(0, 2, 1, 3)  # (N, Q, M, D)
    return out.reshape(n, q, m * d).astype(out_dtype)
