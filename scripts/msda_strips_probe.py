"""On-chip probe: strip-visiting fused gather (fused_bilinear_gather_strips)
vs the XLA gather path on the MOTR level-0 map — the 80 MB stride-4 level
holding 75% of the encoder's 102k tokens, which round 3's fused kernel had
to leave on the XLA fallback (VERDICT r3 #2).

Geometry: MOTR streaming 1536x800 -> level-0 padded map (202, 386, 32) per
head, B = N*M = 8 maps, QP = 408k samples each. Sampling locations follow
the encoder's raster order (each query samples near its own pixel), which
is what gives the strip router its DMA reuse; a shuffled variant measures
the adversarial-order penalty.

Writes MSDA_STRIPS_PROBE.json.
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from fastervit_tpu.ops import msda as m
from fastervit_tpu.ops.msda_pallas import fused_bilinear_gather_strips

H, W, D, B, P = 200, 384, 32, 8, 4
Q = 102_000
QP = Q * P


def make_case(order="raster", seed=0):
    rs = np.random.RandomState(seed)
    vm = rs.randn(B, H + 2, W + 2, D).astype(np.float32)
    # queries in raster order over the full frame; each samples within a
    # +-8px window of its own position (typical learned offsets)
    qy = np.repeat(np.arange(Q) // W, P) % H
    qx = np.repeat(np.arange(Q) % W, P)
    iy = np.clip(qy + rs.randint(-8, 9, (B, QP)), 0, H)
    ix = np.clip(qx + rs.randint(-8, 9, (B, QP)), 0, W)
    if order == "shuffled":
        perm = rs.permutation(QP)
        iy, ix = iy[:, perm], ix[:, perm]
    fy = rs.rand(B, QP).astype(np.float32)
    fx = rs.rand(B, QP).astype(np.float32)
    w = rs.rand(B, QP).astype(np.float32)
    return (jnp.asarray(vm), jnp.asarray(iy, jnp.int32),
            jnp.asarray(ix, jnp.int32), jnp.asarray(fy), jnp.asarray(fx),
            jnp.asarray(w))


def xla_level(vm, iy, ix, fy, fx, w):
    """The old fallback for one level, flattened layout (B=N*M maps)."""
    dn = jax.lax.GatherDimensionNumbers(
        offset_dims=(1, 2, 3), collapsed_slice_dims=(), start_index_map=(0, 1))
    idx = jnp.stack([iy, ix], -1)
    patches = jax.vmap(lambda op, ii: jax.lax.gather(
        op, ii, dn, slice_sizes=(2, 2, D),
        mode=jax.lax.GatherScatterMode.PROMISE_IN_BOUNDS))(vm, idx)
    fyb = fy[..., None]
    fxb = fx[..., None]
    bil = ((1 - fyb) * (1 - fxb) * patches[:, :, 0, 0]
           + (1 - fyb) * fxb * patches[:, :, 0, 1]
           + fyb * (1 - fxb) * patches[:, :, 1, 0]
           + fyb * fxb * patches[:, :, 1, 1])
    out = (w[..., None] * bil).reshape(B, QP // P, P, D).sum(2)
    return out


def bench(fn, args, iters=8, windows=4):
    f = jax.jit(lambda s, *a: (fn(*a), s + fn(*a)[0, 0, 0]))
    s = jnp.zeros((), jnp.float32)
    t0 = time.time()
    out, s = f(s, *args)
    float(s)
    compile_s = time.time() - t0
    times = []
    for _ in range(windows):
        t0 = time.perf_counter()
        for _ in range(iters):
            out, s = f(s, *args)
        float(s)
        times.append((time.perf_counter() - t0) / iters / 2)  # fn called 2x
    return out, float(np.median(sorted(times[1:]))), compile_s


def main():
    case = make_case("raster")
    rows = {}
    out_x, t_x, c_x = bench(xla_level, case)
    rows["xla_gather"] = {"ms": round(t_x * 1e3, 2), "compile_s": round(c_x, 1),
                          "ns_per_sample": round(t_x / (B * QP) * 1e9, 2)}
    print(rows["xla_gather"], flush=True)
    out_s, t_s, c_s = bench(lambda *a: fused_bilinear_gather_strips(*a, P),
                            case)
    err = float(jnp.max(jnp.abs(out_s - out_x)))
    rows["strips_raster"] = {"ms": round(t_s * 1e3, 2),
                             "compile_s": round(c_s, 1),
                             "ns_per_sample": round(t_s / (B * QP) * 1e9, 2),
                             "max_abs_err_vs_xla": err}
    print(rows["strips_raster"], flush=True)
    case_sh = make_case("shuffled")
    out_s2, t_s2, _ = bench(lambda *a: fused_bilinear_gather_strips(*a, P),
                            case_sh)
    out_x2 = jax.jit(xla_level)(*case_sh)
    rows["strips_shuffled"] = {
        "ms": round(t_s2 * 1e3, 2),
        "ns_per_sample": round(t_s2 / (B * QP) * 1e9, 2),
        "max_abs_err_vs_xla": float(jnp.max(jnp.abs(out_s2 - out_x2)))}
    print(rows["strips_shuffled"], flush=True)
    rows["geometry"] = {"map": [H + 2, W + 2, D], "B": B, "QP": QP,
                        "order": "raster = encoder layout",
                        "method": "chained-scalar fetch, median of 3 kept "
                                  "windows x 8 iters, first window dropped"}
    with open(os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), "MSDA_STRIPS_PROBE.json"), "w") as f:
        json.dump(rows, f, indent=1)
    print("wrote MSDA_STRIPS_PROBE.json")


def xla_packed_level(vm, iy, ix, fy, fx, w):
    """Corner-packed XLA gather: one (1,1,4D) slice per sample instead of
    a (2,2,D) patch — tests whether XLA's gather emitter is per-issued-row
    bound (2 rows for a 2x2 slice) rather than per-byte bound."""
    b, hp, wp, d = vm.shape
    packed = jnp.concatenate(
        [vm[:, :-1, :-1], vm[:, :-1, 1:], vm[:, 1:, :-1], vm[:, 1:, 1:]],
        axis=-1)                                   # (B, hp-1, wp-1, 4D)
    dn = jax.lax.GatherDimensionNumbers(
        offset_dims=(1, 2, 3), collapsed_slice_dims=(), start_index_map=(0, 1))
    idx = jnp.stack([iy, ix], -1)
    g = jax.vmap(lambda op, ii: jax.lax.gather(
        op, ii, dn, slice_sizes=(1, 1, 4 * d),
        mode=jax.lax.GatherScatterMode.PROMISE_IN_BOUNDS))(packed, idx)
    g = g.reshape(b, QP, 4, d)                     # corners 00,01,10,11
    fyb = fy[..., None]
    fxb = fx[..., None]
    cw = jnp.stack([(1 - fyb) * (1 - fxb), (1 - fyb) * fxb,
                    fyb * (1 - fxb), fyb * fxb], axis=2)   # (B, QP, 4, 1)
    out = (w[..., None] * (g * cw).sum(2)).reshape(B, QP // P, P, d).sum(2)
    return out


def main_packed():
    case = make_case("raster")
    rows = {}
    if os.path.exists("MSDA_STRIPS_PROBE.json"):
        rows = json.load(open("MSDA_STRIPS_PROBE.json"))
    out_x, t_x, c_x = bench(xla_level, case)
    rows["xla_gather"] = {"ms": round(t_x * 1e3, 2), "compile_s": round(c_x, 1),
                          "ns_per_sample": round(t_x / (B * QP) * 1e9, 2)}
    print(rows["xla_gather"], flush=True)
    out_p, t_p, c_p = bench(xla_packed_level, case)
    rows["xla_packed_gather"] = {
        "ms": round(t_p * 1e3, 2), "compile_s": round(c_p, 1),
        "ns_per_sample": round(t_p / (B * QP) * 1e9, 2),
        "max_abs_err_vs_xla": float(jnp.max(jnp.abs(out_p - out_x)))}
    print(rows["xla_packed_gather"], flush=True)
    with open("MSDA_STRIPS_PROBE.json", "w") as f:
        json.dump(rows, f, indent=1)
    print("wrote MSDA_STRIPS_PROBE.json")




def xla_rowmix_level(vm, iy, ix, fy, fx, w, R=32, C=2000, G=4):
    """Gather-free bilinear: per chunk of C raster-ordered samples, slice
    an R-row window of the map (dynamic_slice, contiguous), then
    out[i] = Ay[i] . (Ax @ W) — Ax/Ay are bilinear-weighted one-hot
    matrices built by vectorized iota compares. No per-sample indexed
    loads anywhere: the 'gather' runs on the MXU at ~25 kFLOP/sample.
    Probe-only: samples whose rows fall outside their chunk window are
    dropped (production adds the lax.cond remainder pass)."""
    b, hp, wp, d = vm.shape
    qp = iy.shape[1]
    nchunk = qp // C
    assert nchunk % G == 0
    sh = lambda t: t.reshape(b, nchunk, C)
    iy_c, ix_c = sh(iy), sh(ix)
    fy_c, fx_c, w_c = sh(fy), sh(fx), sh(w)
    r0 = jnp.clip(jnp.min(iy_c, axis=2), 0, hp - R)       # (b, nchunk)

    def group(args):
        iyg, ixg, fyg, fxg, wg, r0g, bg = args            # (b, G, C) etc.

        def one_map(vm_b, iyg, ixg, fyg, fxg, wg, r0g):
            win = jax.vmap(lambda r: jax.lax.dynamic_slice(
                vm_b, (r, 0, 0), (R, wp, d)))(r0g)        # (G, R, wp, d)
            w2 = win.transpose(0, 2, 1, 3).reshape(G, wp, R * d)
            xi = jax.lax.broadcasted_iota(jnp.int32, (G, C, wp), 2)
            ax = ((xi == ixg[..., None]) * (1 - fxg[..., None])
                  + (xi == ixg[..., None] + 1) * fxg[..., None])
            colsel = jnp.einsum("gcx,gxk->gck", ax, w2,
                                preferred_element_type=jnp.float32)
            colsel = colsel.reshape(G, C, R, d)
            liy = iyg - r0g[:, None]
            ri = jax.lax.broadcasted_iota(jnp.int32, (G, C, R), 2)
            ay = ((ri == liy[..., None]) * (1 - fyg[..., None])
                  + (ri == liy[..., None] + 1) * fyg[..., None])
            return wg[..., None] * jnp.einsum("gcr,gcrd->gcd", ay, colsel)

        return jax.vmap(one_map)(bg, iyg, ixg, fyg, fxg, wg, r0g)

    ng = nchunk // G
    gr = lambda t: jnp.moveaxis(                          # (ng, b, G, C)
        t.reshape(b, ng, G, C), 1, 0)
    vms = jnp.broadcast_to(vm[None], (ng,) + vm.shape)
    out = jax.lax.map(group, (gr(iy_c), gr(ix_c), gr(fy_c), gr(fx_c),
                              gr(w_c), jnp.moveaxis(
                                  r0.reshape(b, ng, G), 1, 0), vms))
    out = jnp.moveaxis(out, 0, 1).reshape(b, qp, d)
    return out.reshape(b, qp // P, P, d).sum(2)


def main_rowmix():
    case = make_case("raster")
    rows = {}
    if os.path.exists("MSDA_STRIPS_PROBE.json"):
        rows = json.load(open("MSDA_STRIPS_PROBE.json"))
    out_r, t_r, c_r = bench(xla_rowmix_level, case)
    want = jax.jit(xla_level)(*case)
    # coverage: fraction of samples whose window holds both rows
    vm, iy, ix, fy, fx, w = case
    C = 2000
    iy_c = np.asarray(iy).reshape(B, -1, C)
    r0 = np.clip(iy_c.min(2), 0, (H + 2) - 32)
    cover = float(((iy_c >= r0[..., None])
                   & (iy_c <= r0[..., None] + 30)).mean())
    rows["xla_rowmix"] = {
        "ms": round(t_r * 1e3, 2), "compile_s": round(c_r, 1),
        "ns_per_sample": round(t_r / (B * QP) * 1e9, 2),
        "window_coverage": round(cover, 6),
        "max_abs_err_vs_xla_covered_only":
            float(jnp.max(jnp.abs(out_r - want))) if cover == 1.0 else None}
    print(rows["xla_rowmix"], flush=True)
    with open("MSDA_STRIPS_PROBE.json", "w") as f:
        json.dump(rows, f, indent=1)


if __name__ == "__main__":
    import sys as _sys
    if "--packed" in _sys.argv:
        main_packed()
    elif "--rowmix" in _sys.argv:
        main_rowmix()
    else:
        main()
