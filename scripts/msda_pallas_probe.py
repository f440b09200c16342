"""Pallas fused bilinear-gather probe: can an in-kernel VMEM-resident
dynamic-slice loop beat XLA's gather emitter at the MOTR encoder shapes?

MSDA_GATHER_PROBE.json established that ops/msda.py's lax.gather path is
per-issue bound (~15.5 ns/patch on levels 1-3 regardless of map size —
50.8/50.5/50.8 ms for identical index counts on 16x-different maps — and
22.9 ns on the 80 MB level-0 map, where serialized HBM latency shows).
This probe implements the alternative the VERDICT asks for: a Pallas
kernel holding one head's padded level map fully VMEM-resident, looping
patches with dynamic (2, 2, D) slices, and FUSING the bilinear combine +
attention weighting + per-point accumulation that XLA runs as separate
memory-bound passes (~88 ms/layer of the 316 ms total).

Grid (head, query-chunk): the map block index is constant along the chunk
axis so the map streams in once per head; indices/fractions/weights ride
in SMEM per chunk; the kernel emits the already-reduced (CHUNK, D) output
(sum over the P points of w_p * bilinear(map, loc_p)), not patches.

Writes MSDA_PALLAS_PROBE.json. Usage:
  python scripts/msda_pallas_probe.py            # on-chip timing
  JAX_PLATFORMS=cpu python ... --interpret       # correctness only
"""
import argparse
import functools
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# MOTR streaming geometry (1536x800): per-head padded level maps
LEVELS = [(202, 386), (102, 194), (52, 98), (27, 50)]
M, D, P = 8, 32, 4
QP = 408_000  # queries (102k) x points (4) per (head, level)


def _fused_kernel(iy_ref, ix_ref, fy_ref, fx_ref, w_ref, vm_ref, out_ref,
                  *, unroll: int):
    """One (head, chunk) step: out[i] = sum_p w * bilinear(vm, loc_i_p).

    The probe folds P into the chunk axis (each i is one (query, point)
    sample, already weight-scaled) — the reduction over P happens outside
    so correctness checking stays trivial; the fused production kernel
    would reduce in-register. vm_ref: (1, Hp, Wp, D) VMEM; index/fraction
    refs: (1, CHUNK) SMEM; out: (1, CHUNK, D) VMEM."""
    chunk = out_ref.shape[1]

    def body(i, _):
        iy = iy_ref[0, i]
        ix = ix_ref[0, i]
        fy = fy_ref[0, i]
        fx = fx_ref[0, i]
        w = w_ref[0, i]
        patch = vm_ref[0, pl.ds(iy, 2), pl.ds(ix, 2), :]   # (2, 2, D)
        top = patch[0, 0] * (1.0 - fx) + patch[0, 1] * fx
        bot = patch[1, 0] * (1.0 - fx) + patch[1, 1] * fx
        out_ref[0, i, :] = w * (top * (1.0 - fy) + bot * fy)
        return 0

    jax.lax.fori_loop(0, chunk, body, 0, unroll=unroll)


def fused_gather(vm, iy, ix, fy, fx, w, *, chunk=2000, unroll=8,
                 interpret=False):
    """vm: (M, Hp, Wp, D) f32; iy/ix: (M, QP) int32; fy/fx/w: (M, QP) f32.
    Returns (M, QP, D): w * bilinear patches."""
    m, hp, wp, d = vm.shape
    qp = iy.shape[1]
    assert qp % chunk == 0, (qp, chunk)
    grid = (m, qp // chunk)
    smem = lambda: pl.BlockSpec((1, chunk), lambda h, c: (h, c),  # noqa: E731
                                memory_space=pltpu.SMEM)
    return pl.pallas_call(
        functools.partial(_fused_kernel, unroll=unroll),
        grid=grid,
        in_specs=[smem(), smem(), smem(), smem(), smem(),
                  pl.BlockSpec((1, hp, wp, d), lambda h, c: (h, 0, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, chunk, d), lambda h, c: (h, c, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((m, qp, d), vm.dtype),
        interpret=interpret,
    )(iy, ix, fy, fx, w, vm)


def _reference(vm, iy, ix, fy, fx, w):
    """Same math via take (vectorized), for correctness checks."""
    m, hp, wp, d = vm.shape
    flat = vm.reshape(m, hp * wp, d)
    lin = iy * wp + ix                                     # (M, QP)
    g = lambda off: jnp.take_along_axis(                   # noqa: E731
        flat, (lin + off)[..., None], axis=1)
    top = g(0) * (1 - fx)[..., None] + g(1) * fx[..., None]
    bot = g(wp) * (1 - fx)[..., None] + g(wp + 1) * fx[..., None]
    return w[..., None] * (top * (1 - fy)[..., None] + bot * fy[..., None])


def _bench(fn, *args, iters=10):
    s = jnp.zeros((), jnp.float32)

    @jax.jit
    def chained(s, *a):
        return s + fn(*a).astype(jnp.float32).ravel()[0]

    t0 = time.time()
    s = chained(s, *args)
    float(s)
    compile_s = time.time() - t0
    t0 = time.perf_counter()
    for _ in range(iters):
        s = chained(s, *args)
    float(s)
    return (time.perf_counter() - t0) / iters, compile_s


def make_case(hp, wp, qp, seed=0):
    rs = np.random.RandomState(seed)
    vm = jnp.asarray(rs.randn(M, hp, wp, D), jnp.float32)
    iy = jnp.asarray(rs.randint(0, hp - 1, (M, qp)), jnp.int32)
    ix = jnp.asarray(rs.randint(0, wp - 1, (M, qp)), jnp.int32)
    fy = jnp.asarray(rs.rand(M, qp), jnp.float32)
    fx = jnp.asarray(rs.rand(M, qp), jnp.float32)
    w = jnp.asarray(rs.rand(M, qp), jnp.float32)
    return vm, iy, ix, fy, fx, w


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--interpret", action="store_true")
    ap.add_argument("--iters", type=int, default=10)
    args = ap.parse_args()

    print(jax.devices(), flush=True)
    # correctness on a small case first (interpret on CPU, compiled on TPU);
    # interpret mode runs the fori_loop in Python, so keep it tiny there
    qp_c, chunk_c = (400, 200) if args.interpret else (2000, 1000)
    vm, iy, ix, fy, fx, w = make_case(27, 50, qp_c, seed=7)
    got = fused_gather(vm, iy, ix, fy, fx, w, chunk=chunk_c,
                       interpret=args.interpret)
    want = _reference(vm, iy, ix, fy, fx, w)
    err = float(jnp.max(jnp.abs(got - want)))
    print("correctness max|err|:", err, flush=True)
    assert err < 1e-5, err
    if args.interpret:
        print("interpret-mode correctness OK")
        return

    rows = [{"correctness_max_err": err}]
    for (hp, wp) in LEVELS:
        vmem_mb = hp * wp * D * 4 / 1e6
        row = {"level": f"{hp - 2}x{wp - 2}", "map_mb_per_head":
               round(vmem_mb, 2)}
        for unroll in (1, 8):
            try:
                t, cs = _bench(
                    lambda *a: fused_gather(*a, chunk=2000, unroll=unroll),
                    *make_case(hp, wp, QP), iters=args.iters)
                row[f"ms_unroll{unroll}"] = round(t * 1e3, 2)
                row[f"ns_per_patch_unroll{unroll}"] = round(
                    t / (M * QP) * 1e9, 2)
                row[f"compile_s_unroll{unroll}"] = round(cs, 1)
            except Exception as e:  # noqa: BLE001 — record lowering failures
                row[f"ms_unroll{unroll}"] = f"{type(e).__name__}: {e}"[:200]
        rows.append(row)
        print(row, flush=True)
    with open("MSDA_PALLAS_PROBE.json", "w") as f:
        json.dump(rows, f, indent=1)
    print("wrote MSDA_PALLAS_PROBE.json", flush=True)


if __name__ == "__main__":
    main()
