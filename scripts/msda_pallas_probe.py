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
    """One (head, chunk) step: out[i] = w * bilinear(vm, loc_i).

    The probe folds P into the chunk axis (each i is one (query, point)
    sample, already weight-scaled) — the reduction over P happens outside
    so correctness checking stays trivial; the fused production kernel
    would reduce in-register. vm_ref: (1, Hp, Wp, D) VMEM; index/fraction
    refs: (1, 1, 8, CHUNK/8) SMEM (tiled to satisfy Mosaic's block rule,
    addressed by flat math); out: (1, CHUNK, D) VMEM."""
    chunk = out_ref.shape[1]
    cols = iy_ref.shape[-1]

    def one(i):
        r = i // cols
        c = i % cols
        iy = iy_ref[0, 0, r, c]
        ix = ix_ref[0, 0, r, c]
        fy = fy_ref[0, 0, r, c]
        fx = fx_ref[0, 0, r, c]
        w = w_ref[0, 0, r, c]
        patch = vm_ref[0, pl.ds(iy, 2), pl.ds(ix, 2), :]   # (2, 2, D)
        top = patch[0, 0] * (1.0 - fx) + patch[0, 1] * fx
        bot = patch[1, 0] * (1.0 - fx) + patch[1, 1] * fx
        out_ref[0, i, :] = w * (top * (1.0 - fy) + bot * fy)

    # Mosaic's fori_loop supports only unroll=1 or full unroll — unroll
    # manually so U samples amortize each loop-carried branch
    def body(j, _):
        for u in range(unroll):
            one(j * unroll + u)
        return 0

    assert chunk % unroll == 0, (chunk, unroll)
    jax.lax.fori_loop(0, chunk // unroll, body, 0, unroll=1)


def fused_gather(vm, iy, ix, fy, fx, w, *, chunk=2048, unroll=8,
                 interpret=False):
    """vm: (M, Hp, Wp, D) f32; iy/ix: (M, QP) int32; fy/fx/w: (M, QP) f32.
    Returns (M, QP, D): w * bilinear patches. QP is padded to a chunk
    multiple internally (pad samples read (0, 0) with weight 0)."""
    m, hp, wp, d = vm.shape
    qp = iy.shape[1]
    pad = (-qp) % chunk
    if pad:
        padi = ((0, 0), (0, pad))
        iy, ix = jnp.pad(iy, padi), jnp.pad(ix, padi)
        fy, fx, w = (jnp.pad(t, padi) for t in (fy, fx, w))
    qpp = qp + pad
    nchunk = qpp // chunk
    grid = (m, nchunk)
    # Mosaic requires SMEM block tails (8, 128k)-aligned: carry the scalar
    # streams as (M, NCHUNK, 8, chunk/8) and address them by flat math.
    tile = lambda t: t.reshape(m, nchunk, 8, chunk // 8)   # noqa: E731
    smem = lambda: pl.BlockSpec((1, 1, 8, chunk // 8),     # noqa: E731
                                lambda h, c: (h, c, 0, 0),
                                memory_space=pltpu.SMEM)
    out = pl.pallas_call(
        functools.partial(_fused_kernel, unroll=unroll),
        grid=grid,
        in_specs=[smem(), smem(), smem(), smem(), smem(),
                  pl.BlockSpec((1, hp, wp, d), lambda h, c: (h, 0, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, chunk, d), lambda h, c: (h, c, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((m, qpp, d), vm.dtype),
        interpret=interpret,
    )(tile(iy), tile(ix), tile(fy), tile(fx), tile(w), vm)
    return out[:, :qp]


def _p4_kernel(iy_ref, ix_ref, fy_ref, fx_ref, w_ref, vm_ref, out_ref,
               *, unroll: int, p: int):
    """P-fused variant: each output row is the weighted SUM over the P
    consecutive samples of one (query, head) — P accumulations per store,
    matching MSDA's real reduction and saving (P-1)/P of the stores."""
    nq = out_ref.shape[1]
    cols = iy_ref.shape[-1]

    def one(q):
        acc = None
        for pp in range(p):
            s = q * p + pp
            r = s // cols
            c = s % cols
            iy = iy_ref[0, 0, r, c]
            ix = ix_ref[0, 0, r, c]
            fy = fy_ref[0, 0, r, c]
            fx = fx_ref[0, 0, r, c]
            w = w_ref[0, 0, r, c]
            patch = vm_ref[0, pl.ds(iy, 2), pl.ds(ix, 2), :]
            top = patch[0, 0] * (1.0 - fx) + patch[0, 1] * fx
            bot = patch[1, 0] * (1.0 - fx) + patch[1, 1] * fx
            v = w * (top * (1.0 - fy) + bot * fy)
            acc = v if acc is None else acc + v
        out_ref[0, q, :] = acc

    def body(j, _):
        for u in range(unroll):
            one(j * unroll + u)
        return 0

    assert nq % unroll == 0, (nq, unroll)
    jax.lax.fori_loop(0, nq // unroll, body, 0, unroll=1)


def fused_gather_p4(vm, iy, ix, fy, fx, w, *, chunk=2048, unroll=4,
                    p=P, interpret=False):
    """Like fused_gather but reduces over P consecutive samples per query:
    returns (M, QP/P, D). QP must be a multiple of chunk here (the real
    integration pads at the query level)."""
    m, hp, wp, d = vm.shape
    qp = iy.shape[1]
    assert qp % chunk == 0 and chunk % p == 0, (qp, chunk, p)
    nchunk = qp // chunk
    grid = (m, nchunk)
    tile = lambda t: t.reshape(m, nchunk, 8, chunk // 8)   # noqa: E731
    smem = lambda: pl.BlockSpec((1, 1, 8, chunk // 8),     # noqa: E731
                                lambda h, c: (h, c, 0, 0),
                                memory_space=pltpu.SMEM)
    return pl.pallas_call(
        functools.partial(_p4_kernel, unroll=unroll, p=p),
        grid=grid,
        in_specs=[smem(), smem(), smem(), smem(), smem(),
                  pl.BlockSpec((1, hp, wp, d), lambda h, c: (h, 0, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, chunk // p, d), lambda h, c: (h, c, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((m, qp // p, d), vm.dtype),
        interpret=interpret,
    )(tile(iy), tile(ix), tile(fy), tile(fx), tile(w), vm)


def _fused_kernel_ph(iy_ref, ix_ref, fy_ref, fx_ref, w_ref, vm_ref, out_ref,
                     *, unroll: int):
    """Per-head variant of _fused_kernel (blocks have no head dim)."""
    chunk = out_ref.shape[0]
    cols = iy_ref.shape[-1]

    def one(i):
        r = i // cols
        c = i % cols
        iy = iy_ref[0, r, c]
        ix = ix_ref[0, r, c]
        fy = fy_ref[0, r, c]
        fx = fx_ref[0, r, c]
        w = w_ref[0, r, c]
        patch = vm_ref[pl.ds(iy, 2), pl.ds(ix, 2), :]
        top = patch[0, 0] * (1.0 - fx) + patch[0, 1] * fx
        bot = patch[1, 0] * (1.0 - fx) + patch[1, 1] * fx
        out_ref[i, :] = w * (top * (1.0 - fy) + bot * fy)

    def body(j, _):
        for u in range(unroll):
            one(j * unroll + u)
        return 0

    assert chunk % unroll == 0, (chunk, unroll)
    jax.lax.fori_loop(0, chunk // unroll, body, 0, unroll=1)


def fused_gather_per_head(vm, iy, ix, fy, fx, w, *, chunk=2048, unroll=8,
                          interpret=False):
    """Level-0 variant: one pallas_call per head with the map block index
    CONSTANT over the whole grid, so the pipeline keeps a single ~10 MB
    buffer instead of double-buffering two (which overflows VMEM)."""
    m, hp, wp, d = vm.shape
    qp = iy.shape[1]
    assert qp % chunk == 0, (qp, chunk)
    nchunk = qp // chunk
    tile = lambda t: t.reshape(nchunk, 8, chunk // 8)      # noqa: E731
    smem = lambda: pl.BlockSpec((1, 8, chunk // 8),        # noqa: E731
                                lambda c: (c, 0, 0),
                                memory_space=pltpu.SMEM)
    outs = []
    for h in range(m):
        outs.append(pl.pallas_call(
            functools.partial(_fused_kernel_ph, unroll=unroll),
            grid=(nchunk,),
            in_specs=[smem(), smem(), smem(), smem(), smem(),
                      pl.BlockSpec((hp, wp, d), lambda c: (0, 0, 0),
                                   memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((chunk, d), lambda c: (c, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((qp, d), vm.dtype),
            interpret=interpret,
        )(tile(iy[h]), tile(ix[h]), tile(fy[h]), tile(fx[h]), tile(w[h]),
          vm[h]))
    return jnp.stack(outs)


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
        # consume a slice of EVERY output element's producer: [..., 0].sum()
        # touches all heads, so multi-call variants can't be DCE'd down to
        # the one pallas_call feeding ravel()[0]
        return s + fn(*a)[..., 0].astype(jnp.float32).sum()

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
    ap.add_argument("--e2e-only", action="store_true",
                    help="skip the kernel-variant grid, run only the "
                    "production ms_deform_attn backend comparison")
    args = ap.parse_args()

    print(jax.devices(), flush=True)
    # correctness on a small case first (interpret on CPU, compiled on TPU);
    # interpret mode runs the fori_loop in Python, so keep it tiny there
    qp_c, chunk_c = (400, 200) if args.interpret else (2048, 1024)
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

    # correctness of the P-fused and per-head variants vs the same oracle
    want_p4 = want.reshape(M, qp_c // P, P, D).sum(2)
    got_p4 = fused_gather_p4(vm, iy, ix, fy, fx, w, chunk=chunk_c)
    err_p4 = float(jnp.max(jnp.abs(got_p4 - want_p4)))
    got_ph = fused_gather_per_head(vm, iy, ix, fy, fx, w, chunk=chunk_c)
    err_ph = float(jnp.max(jnp.abs(got_ph - want)))
    print("correctness p4 / per-head:", err_p4, err_ph, flush=True)
    assert err_p4 < 1e-4 and err_ph < 1e-5, (err_p4, err_ph)

    qp_pad = QP + ((-QP) % 2048)                           # 409600
    variants = [
        ("flat_u8", lambda *a: fused_gather(*a, chunk=2048, unroll=8)),
        ("flat_u16", lambda *a: fused_gather(*a, chunk=2048, unroll=16)),
        ("flat_u32", lambda *a: fused_gather(*a, chunk=2048, unroll=32)),
        ("p4_u4", lambda *a: fused_gather_p4(*a, chunk=2048, unroll=4)),
        ("p4_u8", lambda *a: fused_gather_p4(*a, chunk=2048, unroll=8)),
        ("perhead_u8",
         lambda *a: fused_gather_per_head(*a, chunk=2048, unroll=8)),
    ]
    rows = [{"correctness_max_err": [err, err_p4, err_ph]}]
    for (hp, wp) in ([] if args.e2e_only else LEVELS):
        vmem_mb = hp * wp * D * 4 / 1e6
        row = {"level": f"{hp - 2}x{wp - 2}",
               "map_mb_per_head": round(vmem_mb, 2)}
        case = make_case(hp, wp, qp_pad)
        for name, fn in variants:
            # per-head single-buffering matters where the map is too big to
            # double-buffer; also measure it once at a small level for an
            # apples-to-apples python-loop-overhead comparison
            if name == "perhead_u8" and not (vmem_mb > 4.0 or hp == 102):
                continue
            # the flat variants overflow VMEM at level 0 (2x 10 MB double
            # buffer) — skip the known-failing compiles
            if name.startswith(("flat", "p4")) and vmem_mb > 6.0:
                continue
            try:
                t, cs = _bench(fn, *case, iters=args.iters)
                row[f"ms_{name}"] = round(t * 1e3, 2)
                row[f"ns_{name}"] = round(t / (M * qp_pad) * 1e9, 2)
                row[f"compile_s_{name}"] = round(cs, 1)
            except Exception as e:  # noqa: BLE001 — record lowering failures
                row[f"ms_{name}"] = f"{type(e).__name__}: {e}"[:160]
        rows.append(row)
        print(row, flush=True)
    # end-to-end: the production ms_deform_attn at full encoder geometry,
    # xla vs fused-pallas backend (parity + timing)
    from fastervit_tpu.ops import msda

    enc_levels = [(200, 384), (100, 192), (50, 96), (25, 48)]
    s_total = sum(h * w for h, w in enc_levels)
    rs = np.random.RandomState(9)
    value = jnp.asarray(rs.randn(1, s_total, M, D), jnp.float32)
    loc = jnp.asarray(rs.rand(1, s_total, M, 4, P, 2), jnp.float32)
    wts = jax.nn.softmax(jnp.asarray(
        rs.randn(1, s_total, M, 4 * P), jnp.float32), -1
    ).reshape(1, s_total, M, 4, P)
    e2e = {"S": s_total}
    outs = {}
    for backend in ("xla", "pallas"):
        prev = msda.set_msda_backend(backend)
        try:
            t, cs = _bench(
                lambda v, l, w: msda.ms_deform_attn(v, enc_levels, l, w),
                value, loc, wts, iters=5)
            e2e[f"ms_{backend}"] = round(t * 1e3, 1)
            e2e[f"compile_s_{backend}"] = round(cs, 1)
            outs[backend] = msda.ms_deform_attn(value, enc_levels, loc, wts)
        except Exception as e:  # noqa: BLE001
            e2e[f"ms_{backend}"] = f"{type(e).__name__}: {e}"[:200]
        finally:
            msda.set_msda_backend(prev)
    if len(outs) == 2:
        diff = jnp.max(jnp.abs(outs["xla"] - outs["pallas"]))
        e2e["parity_max_abs_diff"] = float(diff)
        e2e["speedup"] = round(e2e["ms_xla"] / e2e["ms_pallas"], 3)
    rows.append(e2e)
    print(e2e, flush=True)

    if args.e2e_only and os.path.exists("MSDA_PALLAS_PROBE.json"):
        # keep the previously measured kernel-variant grid rows
        old = json.load(open("MSDA_PALLAS_PROBE.json"))
        rows = [r for r in old if "ms_xla" not in r] + [e2e]
    with open("MSDA_PALLAS_PROBE.json", "w") as f:
        json.dump(rows, f, indent=1)
    print("wrote MSDA_PALLAS_PROBE.json", flush=True)


if __name__ == "__main__":
    main()
