"""MSDA gather probe v2: attack the SCALAR-UNIT bound.

MSDA_PACKED_PROBE.json falsified the load-pair theory: packing the 4
bilinear corners into 128 lanes (1 dynamic load/sample instead of 2) is
SLOWER (19.9 vs 15.4 ns), so the loop is scalar-unit bound, not
load-issue bound. The per-sample scalar work in the round-2 kernel is
  r = s // cols; c = s % cols   (integer div + mod — multi-cycle)
  5 SMEM reads, ~6 scalar flops (bilinear coefficients)
This probe removes it piecewise:
  A pair_staticr : round-2 pair kernel, loop restructured so the SMEM
                   row index is a static Python int (no div/mod)
  B packed_coeff : corner-packed map + static-r + XLA-precomputed
                   c00..c11 coefficient scalars (no in-kernel flops)
  C packed_wide  : corner-packed map + lane-broadcast (chunk, 128)
                   coefficient rows in VMEM — per sample just 1 SMEM
                   read + 2 vector loads + 1 wide FMA; the 4-corner
                   lane-group reduction happens outside in XLA

Writes MSDA_PACKED_PROBE2.json. Usage:
  python scripts/msda_packed_probe2.py           # on-chip timing
  JAX_PLATFORMS=cpu python ... --interpret       # correctness only
"""
import argparse
import functools
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from msda_pallas_probe import (LEVELS, M, D, P, QP, make_case,  # noqa: E402
                               _bench, _reference)
from msda_packed_probe import pack_corners                      # noqa: E402


# --- A: pair kernel, static row index ---------------------------------------

def _pair_staticr_kernel(iy_ref, ix_ref, fy_ref, fx_ref, w_ref, vm_ref,
                         out_ref, *, p: int):
    """SMEM blocks (1, 1, 8, cols); loop over column groups of p with the
    row index a Python int — no integer div/mod on the scalar unit."""
    cols = iy_ref.shape[-1]
    qcols = cols // p

    def sample(r, c):
        iy, ix = iy_ref[0, 0, r, c], ix_ref[0, 0, r, c]
        fy, fx, w = fy_ref[0, 0, r, c], fx_ref[0, 0, r, c], w_ref[0, 0, r, c]
        patch = vm_ref[0, pl.ds(iy, 2), pl.ds(ix, 2), :]
        pf = patch.astype(jnp.float32)
        top = pf[0, 0] * (1.0 - fx) + pf[0, 1] * fx
        bot = pf[1, 0] * (1.0 - fx) + pf[1, 1] * fx
        return w * (top * (1.0 - fy) + bot * fy)

    def body(j, _):
        c0 = j * p
        for r in range(8):                     # static
            acc = sample(r, c0)
            for pp in range(1, p):
                acc = acc + sample(r, c0 + pp)
            out_ref[0, r * qcols + j, :] = acc
        return 0

    jax.lax.fori_loop(0, qcols, body, 0, unroll=1)


def pair_staticr(vm, iy, ix, fy, fx, w, *, p=P, chunk=2048,
                 vmem_cap=112 * 1024 * 1024, interpret=False):
    m, hp, wp, d = vm.shape
    qp = iy.shape[1]
    assert qp % chunk == 0 and chunk % (8 * p) == 0, (qp, chunk, p)
    nchunk = qp // chunk
    cols = chunk // 8
    phys_map = hp * -(-wp // 8) * 8 * 128 * vm.dtype.itemsize
    budget = min(2 * phys_map + 8 * 1024 * 1024, vmem_cap)
    # row-major query order: query q of a chunk sits at (r = q // qcols,
    # j = q % qcols), its p samples at columns j*p .. j*p+p-1
    tile = lambda t: t.reshape(m, nchunk, 8, cols)         # noqa: E731
    smem = lambda: pl.BlockSpec((1, 1, 8, cols),           # noqa: E731
                                lambda h, c: (h, c, 0, 0),
                                memory_space=pltpu.SMEM)
    return pl.pallas_call(
        functools.partial(_pair_staticr_kernel, p=p),
        grid=(m, nchunk),
        in_specs=[smem(), smem(), smem(), smem(), smem(),
                  pl.BlockSpec((1, hp, wp, d), lambda h, c: (h, 0, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, chunk // p, d), lambda h, c: (h, c, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((m, qp // p, d), jnp.float32),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=budget),
        interpret=interpret,
    )(tile(iy), tile(ix), tile(fy), tile(fx), tile(w), vm)


# --- B: packed map + precomputed coefficient scalars -------------------------

def _packed_coeff_kernel(fl_ref, c00_ref, c01_ref, c10_ref, c11_ref, pm_ref,
                         out_ref, *, p: int, d: int):
    cols = fl_ref.shape[-1]
    qcols = cols // p

    def sample(r, c):
        fl = fl_ref[0, 0, r, c]
        row = pm_ref[0, pl.ds(fl, 1), :]
        return (row[0, 0:d] * c00_ref[0, 0, r, c]
                + row[0, d:2 * d] * c01_ref[0, 0, r, c]
                + row[0, 2 * d:3 * d] * c10_ref[0, 0, r, c]
                + row[0, 3 * d:4 * d] * c11_ref[0, 0, r, c])

    def body(j, _):
        c0 = j * p
        for r in range(8):
            acc = sample(r, c0)
            for pp in range(1, p):
                acc = acc + sample(r, c0 + pp)
            out_ref[0, r * qcols + j, :] = acc
        return 0

    jax.lax.fori_loop(0, cols // p, body, 0, unroll=1)


def packed_coeff(pm, fl, c00, c01, c10, c11, *, p=P, chunk=2048,
                 vmem_cap=112 * 1024 * 1024, interpret=False):
    b, hw2, d4 = pm.shape
    d = d4 // 4
    qp = fl.shape[1]
    assert qp % chunk == 0 and chunk % (8 * p) == 0, (qp, chunk, p)
    nchunk = qp // chunk
    cols = chunk // 8
    phys_map = -(-hw2 // 8) * 8 * max(d4, 128) * pm.dtype.itemsize
    budget = min(2 * phys_map + 8 * 1024 * 1024, vmem_cap)
    tile = lambda t: t.reshape(b, nchunk, 8, cols)         # noqa: E731
    smem = lambda: pl.BlockSpec((1, 1, 8, cols),           # noqa: E731
                                lambda h, c: (h, c, 0, 0),
                                memory_space=pltpu.SMEM)
    return pl.pallas_call(
        functools.partial(_packed_coeff_kernel, p=p, d=d),
        grid=(b, nchunk),
        in_specs=[smem(), smem(), smem(), smem(), smem(),
                  pl.BlockSpec((1, hw2, d4), lambda h, c: (h, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, chunk // p, d), lambda h, c: (h, c, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, qp // p, d), jnp.float32),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=budget),
        interpret=interpret,
    )(tile(fl), tile(c00), tile(c01), tile(c10), tile(c11), pm)


# --- C: packed map + lane-broadcast coefficient rows + wide FMA ---------------

def _packed_wide_kernel(fl_ref, cf_ref, pm_ref, out_ref, *, p: int):
    """cf_ref (1, chunk, 128) VMEM: per-sample coefficients already
    broadcast to the 4 x d lane groups. Per sample: 1 SMEM read, 1 dynamic
    + 1 sequential vector load, 1 wide FMA. out (1, chunk/p, 128) keeps
    the 4 corner groups; XLA reduces them after the call."""
    cols = fl_ref.shape[-1]
    qcols = cols // p

    def sample(r, c):
        fl = fl_ref[0, 0, r, c]
        row = pm_ref[0, pl.ds(fl, 1), :]
        return row[0] * cf_ref[0, r * cols + c]

    def body(j, _):
        c0 = j * p
        for r in range(8):
            acc = sample(r, c0)
            for pp in range(1, p):
                acc = acc + sample(r, c0 + pp)
            out_ref[0, r * qcols + j, :] = acc
        return 0

    jax.lax.fori_loop(0, cols // p, body, 0, unroll=1)


def packed_wide(pm, fl, cf, *, p=P, chunk=2048,
                vmem_cap=112 * 1024 * 1024, interpret=False):
    """cf: (B, QP, 4D) f32 lane-broadcast coefficients. Returns
    (B, QP/p, 4D); caller reduces the 4 lane groups."""
    b, hw2, d4 = pm.shape
    qp = fl.shape[1]
    assert qp % chunk == 0 and chunk % (8 * p) == 0, (qp, chunk, p)
    nchunk = qp // chunk
    cols = chunk // 8
    phys_map = -(-hw2 // 8) * 8 * max(d4, 128) * pm.dtype.itemsize
    budget = min(2 * phys_map + 24 * 1024 * 1024, vmem_cap)
    tile = lambda t: t.reshape(b, nchunk, 8, cols)         # noqa: E731
    return pl.pallas_call(
        functools.partial(_packed_wide_kernel, p=p),
        grid=(b, nchunk),
        in_specs=[pl.BlockSpec((1, 1, 8, cols), lambda h, c: (h, c, 0, 0),
                               memory_space=pltpu.SMEM),
                  pl.BlockSpec((1, chunk, d4), lambda h, c: (h, c, 0),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((1, hw2, d4), lambda h, c: (h, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, chunk // p, d4), lambda h, c: (h, c, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, qp // p, d4), jnp.float32),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=budget),
        interpret=interpret,
    )(tile(fl), cf, pm)


def coeff_scalars(fy, fx, w):
    gy, gx = 1.0 - fy, 1.0 - fx
    return w * gy * gx, w * gy * fx, w * fy * gx, w * fy * fx


def coeff_wide(fy, fx, w, d):
    c00, c01, c10, c11 = coeff_scalars(fy, fx, w)
    return jnp.concatenate([jnp.repeat(c[..., None], d, axis=-1)
                            for c in (c00, c01, c10, c11)], axis=-1)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--interpret", action="store_true")
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument("--levels", type=int, default=2,
                    help="how many LEVELS rows to time (big ones first)")
    args = ap.parse_args()
    print(jax.devices(), flush=True)

    qp_c, chunk_c = (256, 128) if args.interpret else (2048, 1024)
    vm, iy, ix, fy, fx, w = make_case(27, 50, qp_c, seed=7)
    pm = pack_corners(vm)
    fl = iy * (50 - 1) + ix
    want = _reference(vm, iy, ix, fy, fx, w)
    want = want.reshape(M, qp_c // P, P, D).sum(2)
    kw = dict(chunk=chunk_c, interpret=args.interpret)

    got_a = pair_staticr(vm, iy, ix, fy, fx, w, **kw)
    got_b = packed_coeff(pm, fl, *coeff_scalars(fy, fx, w), **kw)
    got_c = packed_wide(pm, fl, coeff_wide(fy, fx, w, D), **kw)
    got_c = got_c.reshape(M, qp_c // P, 4, D).sum(2)
    errs = [float(jnp.max(jnp.abs(g - want))) for g in (got_a, got_b, got_c)]
    print("correctness A/B/C max|err|:", errs, flush=True)
    assert max(errs) < 1e-4, errs
    if args.interpret:
        print("interpret-mode correctness OK")
        return

    qp_pad = QP + ((-QP) % 2048)
    rows = [{"correctness_max_err": errs}]
    for hp, wp in LEVELS[:args.levels]:
        row = {"level": f"{hp - 2}x{wp - 2}"}
        vm, iy, ix, fy, fx, w = make_case(hp, wp, qp_pad)
        pm = pack_corners(vm)
        fl = iy * (wp - 1) + ix
        cs = coeff_scalars(fy, fx, w)
        cw = coeff_wide(fy, fx, w, D)
        for name, fn, fargs in [
            ("pair_staticr", pair_staticr, (vm, iy, ix, fy, fx, w)),
            ("packed_coeff", packed_coeff, (pm, fl) + cs),
            ("packed_wide", packed_wide, (pm, fl, cw)),
        ]:
            try:
                t, compile_s = _bench(fn, *fargs, iters=args.iters)
                row[f"ms_{name}"] = round(t * 1e3, 2)
                row[f"ns_{name}"] = round(t / (M * qp_pad) * 1e9, 2)
                row[f"compile_s_{name}"] = round(compile_s, 1)
            except Exception as e:                         # noqa: BLE001
                row[f"ms_{name}"] = f"{type(e).__name__}: {str(e)[:160]}"
            print(row, flush=True)
        rows.append(row)
    with open("MSDA_PACKED_PROBE2.json", "w") as f:
        json.dump(rows, f, indent=1)
    print("wrote MSDA_PACKED_PROBE2.json", flush=True)


if __name__ == "__main__":
    main()
