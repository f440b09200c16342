"""Packed-corner MSDA gather probe: beat the dynamic-sublane load-PAIR
floor by pre-packing the 4 bilinear corners into the 128-lane dimension.

MSDA_PALLAS_PROBE.json showed both XLA's gather emitter and a hand Pallas
loop floor at ~15.4 ns/sample because a (2, 2, D=32) corner patch costs a
dynamic-sublane vector load pair — and the D=32 minor dim lane-pads to
128, so 3/4 of every fetched vector is wasted. This probe stores the map
as pm[y*W'+x, 0:32 | 32:64 | 64:96 | 96:128] =
    [v[y,x], v[y,x+1], v[y+1,x], v[y+1,x+1]]
(4 shifted copies filling exactly the 128 lanes the padding wasted, so
PHYSICAL VMEM bytes are unchanged), turning each sample into ONE
single-sublane dynamic load + 4 static lane-slice FMAs. Also makes the
level-0 (10 MB logical / 40 MB physical) map expressible: the packed
minor dim is 128, tile-aligned, where the (…, 32) layout's logical .at[h]
slice was Mosaic-rejected.

Writes MSDA_PACKED_PROBE.json. Usage:
  python scripts/msda_packed_probe.py            # on-chip timing
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
                               _bench, _reference, fused_gather_p4)


def pack_corners(vm: jnp.ndarray) -> jnp.ndarray:
    """(B, Hp, Wp, D) -> (B, (Hp-1)*(Wp-1), 4D): corner-packed flat map."""
    b, hp, wp, d = vm.shape
    pm = jnp.concatenate([vm[:, :-1, :-1], vm[:, :-1, 1:],
                          vm[:, 1:, :-1], vm[:, 1:, 1:]], axis=-1)
    return pm.reshape(b, (hp - 1) * (wp - 1), 4 * d)


def _packed_kernel(fl_ref, fy_ref, fx_ref, w_ref, pm_ref, out_ref,
                   *, unroll: int, p: int, d: int):
    """out[q] = sum_p w * bilinear(corner-packed row fl[q*p+pp])."""
    nq = out_ref.shape[-2]
    cols = fl_ref.shape[-1]

    def sample(s):
        r = s // cols
        c = s % cols
        fl = fl_ref[0, 0, r, c]
        fy, fx, w = fy_ref[0, 0, r, c], fx_ref[0, 0, r, c], w_ref[0, 0, r, c]
        row = pm_ref[0, pl.ds(fl, 1), :]                   # (1, 4D)
        gy, gx = 1.0 - fy, 1.0 - fx
        return (row[0, 0:d] * (w * gy * gx)
                + row[0, d:2 * d] * (w * gy * fx)
                + row[0, 2 * d:3 * d] * (w * fy * gx)
                + row[0, 3 * d:4 * d] * (w * fy * fx))

    def one(q):
        acc = sample(q * p)
        for pp in range(1, p):
            acc = acc + sample(q * p + pp)
        out_ref[0, q, :] = acc

    def body(j, _):
        for u in range(unroll):
            one(j * unroll + u)
        return 0

    assert nq % unroll == 0, (nq, unroll)
    jax.lax.fori_loop(0, nq // unroll, body, 0, unroll=1)


def packed_gather(pm, fl, fy, fx, w, *, p=P, chunk=2048, unroll=8,
                  vmem_cap=112 * 1024 * 1024, interpret=False):
    """pm: (B, HW2, 4D) corner-packed maps; fl int32 / fy,fx,w f32 (B, QP)
    with each query's P samples consecutive. Returns (B, QP/p, D)."""
    b, hw2, d4 = pm.shape
    d = d4 // 4
    qp = fl.shape[1]
    assert qp % chunk == 0 and chunk % p == 0, (qp, chunk, p)
    nchunk = qp // chunk
    phys_map = -(-hw2 // 8) * 8 * max(d4, 128) * pm.dtype.itemsize
    budget = min(2 * phys_map + 8 * 1024 * 1024, vmem_cap)
    tile = lambda t: t.reshape(b, nchunk, 8, chunk // 8)   # noqa: E731
    smem = lambda: pl.BlockSpec((1, 1, 8, chunk // 8),     # noqa: E731
                                lambda h, c: (h, c, 0, 0),
                                memory_space=pltpu.SMEM)
    return pl.pallas_call(
        functools.partial(_packed_kernel, unroll=unroll, p=p, d=d),
        grid=(b, nchunk),
        in_specs=[smem(), smem(), smem(), smem(),
                  pl.BlockSpec((1, hw2, d4), lambda h, c: (h, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, chunk // p, d), lambda h, c: (h, c, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, qp // p, d), jnp.float32),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=budget),
        interpret=interpret,
    )(tile(fl), tile(fy), tile(fx), tile(w), pm)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--interpret", action="store_true")
    ap.add_argument("--iters", type=int, default=10)
    args = ap.parse_args()
    print(jax.devices(), flush=True)

    # correctness vs the take-based oracle
    qp_c, chunk_c = (384, 128) if args.interpret else (2048, 1024)
    vm, iy, ix, fy, fx, w = make_case(27, 50, qp_c, seed=7)
    pm = pack_corners(vm)
    fl = iy * (50 - 1) + ix
    got = packed_gather(pm, fl, fy, fx, w, chunk=chunk_c,
                        interpret=args.interpret)
    want = _reference(vm, iy, ix, fy, fx, w)
    want = want.reshape(M, qp_c // P, P, D).sum(2)
    err = float(jnp.max(jnp.abs(got - want)))
    print("correctness max|err|:", err, flush=True)
    assert err < 1e-4, err
    if args.interpret:
        print("interpret-mode correctness OK")
        return

    qp_pad = QP + ((-QP) % 2048)                           # 409600
    rows = [{"correctness_max_err": err}]
    for hp, wp in LEVELS:
        row = {"level": f"{hp - 2}x{wp - 2}",
               "packed_mb_per_head": round((hp - 1) * (wp - 1) * 4 * D
                                           * 4 / 1e6, 2)}
        vm, iy, ix, fy, fx, w = make_case(hp, wp, qp_pad)
        pm = pack_corners(vm)
        fl = iy * (wp - 1) + ix
        for name, fn, fargs in [
            ("packed_u8",
             lambda *a: packed_gather(*a, chunk=2048, unroll=8),
             (pm, fl, fy, fx, w)),
            ("packed_u16",
             lambda *a: packed_gather(*a, chunk=2048, unroll=16),
             (pm, fl, fy, fx, w)),
            ("pair_p4_u8",   # round-2 best, for an apples-to-apples row
             lambda *a: fused_gather_p4(*a, chunk=2048, unroll=8),
             (vm, iy, ix, fy, fx, w)),
        ]:
            try:
                t, compile_s = _bench(fn, *fargs, iters=args.iters)
                row[f"ms_{name}"] = round(t * 1e3, 2)
                row[f"ns_{name}"] = round(t / (M * qp_pad) * 1e9, 2)
                row[f"compile_s_{name}"] = round(compile_s, 1)
            except Exception as e:                         # noqa: BLE001
                row[f"ms_{name}"] = f"{type(e).__name__}: {str(e)[:200]}"
            print(row, flush=True)
        rows.append(row)
    with open("MSDA_PACKED_PROBE.json", "w") as f:
        json.dump(rows, f, indent=1)
    print("wrote MSDA_PACKED_PROBE.json", flush=True)


if __name__ == "__main__":
    main()
