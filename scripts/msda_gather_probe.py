"""MSDA encoder-gather probe: is lax.gather at the chip's indexed-load
limit at the MOTR streaming shapes (1536x800, S=102k tokens)?

VERDICT r2 #3: the exact streaming path spends 1.91 s of 1.94 s/frame in 6
encoder MSDA layers; the cost is the forward corner-patch gather
(ops/msda.py:42-48). This probe isolates that gather and measures:

  1. pure patch-gather throughput at the exact encoder shapes, per level
     (ns/patch, effective GB/s vs the chip's ~819 GB/s HBM);
  2. a slice-granularity scan — same index count, growing slice bytes —
     separating per-index issue overhead from bandwidth;
  3. the full ms_deform_attn forward at encoder scale for several
     query_chunk sizes (the lax.map chunking knob);
  4. a dense one-hot-matmul forward reformulation (the forward analog of
     the backward's col2im-as-matmul win) on the smallest level, to
     validate the FLOP model that predicts it cannot pay at level 0.

Writes MSDA_GATHER_PROBE.json. Usage: python scripts/msda_gather_probe.py
"""
import functools
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

# MOTR exact streaming geometry: 1536x800 input, strides 4/8/16/32
LEVELS = [(200, 384), (100, 192), (50, 96), (25, 48)]
S = sum(h * w for h, w in LEVELS)            # 102000
N, M, D, L, P = 1, 8, 32, 4, 4
HBM_GBS = 819.0                               # v5e spec


def _bench(fn, *args, iters=10):
    s = jnp.zeros((), jnp.float32)

    @jax.jit
    def chained(s, *a):
        out = fn(*a)
        return s + out.astype(jnp.float32).ravel()[0]

    t0 = time.time()
    s = chained(s, *args)
    float(s)
    compile_s = time.time() - t0
    t0 = time.perf_counter()
    for _ in range(iters):
        s = chained(s, *args)
    float(s)
    return (time.perf_counter() - t0) / iters, compile_s


def pure_gather_per_level(q_total):
    """Measure ops/msda.py's _gather_patches at each level's map size with
    the encoder's index count (Q*P per (n,m))."""
    from fastervit_tpu.ops.msda import _gather_patches

    rs = np.random.RandomState(0)
    out = []
    for h, w in LEVELS:
        vm = jnp.asarray(rs.randn(N * M, h + 2, w + 2, D), jnp.float32)
        idx = jnp.asarray(
            np.stack([rs.randint(0, h, (N * M, q_total * P)),
                      rs.randint(0, w, (N * M, q_total * P))], -1),
            jnp.int32)
        fn = jax.vmap(functools.partial(_gather_patches, d=D))
        t, _ = _bench(lambda vm, idx: fn(vm, idx).sum(), vm, idx)
        patches = N * M * q_total * P
        bytes_moved = patches * 2 * 2 * D * 4
        row = {"level": f"{h}x{w}", "patches": patches,
               "time_ms": round(t * 1e3, 2),
               "ns_per_patch": round(t / patches * 1e9, 2),
               "eff_gbs": round(bytes_moved / t / 1e9, 1)}
        out.append(row)
        print("gather", row, flush=True)
    return out


def granularity_scan():
    """Same index count, growing contiguous slice: where does the per-index
    overhead stop dominating? (2,2,D) is the model's patch; if doubling
    slice bytes doesn't double time, we are issue-bound, not bandwidth-
    bound."""
    rs = np.random.RandomState(1)
    h, w = LEVELS[0]
    n_idx = 400_000
    out = []
    for (sy, sx, sd) in [(1, 1, 32), (2, 2, 32), (2, 2, 128), (2, 2, 256),
                         (4, 4, 256), (2, 48, 32)]:
        vm = jnp.asarray(rs.randn(h + 8, w + 64, max(sd, D)), jnp.float32)
        idx = jnp.asarray(
            np.stack([rs.randint(0, h, n_idx), rs.randint(0, w, n_idx)], -1),
            jnp.int32)
        dn = lax.GatherDimensionNumbers(offset_dims=(1, 2, 3),
                                        collapsed_slice_dims=(),
                                        start_index_map=(0, 1))

        def g(vm, idx):
            return lax.gather(
                vm, idx, dn, slice_sizes=(sy, sx, sd),
                mode=lax.GatherScatterMode.PROMISE_IN_BOUNDS).sum()

        t, _ = _bench(g, vm, idx)
        bytes_moved = n_idx * sy * sx * sd * 4
        row = {"slice": f"{sy}x{sx}x{sd}", "indices": n_idx,
               "time_ms": round(t * 1e3, 2),
               "ns_per_index": round(t / n_idx * 1e9, 2),
               "eff_gbs": round(bytes_moved / t / 1e9, 1)}
        out.append(row)
        print("granularity", row, flush=True)
    return out


def full_msda_chunk_scan():
    """End-to-end ms_deform_attn at encoder scale for several query_chunk
    values (the in-model knob)."""
    from fastervit_tpu.ops.msda import ms_deform_attn

    rs = np.random.RandomState(2)
    value = jnp.asarray(rs.randn(N, S, M, D), jnp.float32)
    loc = jnp.asarray(rs.rand(N, S, M, L, P, 2), jnp.float32)
    wts = jax.nn.softmax(
        jnp.asarray(rs.randn(N, S, M, L * P), jnp.float32), -1
    ).reshape(N, S, M, L, P)
    out = []
    for chunk in (2048, 4096, 8192, 16384, 32768):
        try:
            t, compile_s = _bench(
                lambda v, l, w: ms_deform_attn(v, LEVELS, l, w,
                                               query_chunk=chunk).sum(),
                value, loc, wts, iters=5)
            row = {"query_chunk": chunk, "time_ms": round(t * 1e3, 1),
                   "compile_s": round(compile_s, 1)}
        except Exception as e:  # noqa: BLE001 — record OOM/compile failures
            row = {"query_chunk": chunk,
                   "error": f"{type(e).__name__}: {e}"[:200]}
        out.append(row)
        print("msda", row, flush=True)
    return out


def onehot_forward_smallest_level():
    """Dense one-hot matmul forward on the 25x48 level only: validates the
    FLOP model (2*QP*Hp*Wp*D flops/level/batch) that rules this out at
    level 0 (where it implies ~1.6e13 flops/layer, ~4x the gather time even
    at peak MXU)."""
    rs = np.random.RandomState(3)
    h, w = LEVELS[3]
    hp, wp = h + 2, w + 2
    qp = 40_000  # scaled-down Q*P to keep the probe quick
    v = jnp.asarray(rs.randn(N * M, hp, wp, D), jnp.float32)
    iy = jnp.asarray(rs.randint(0, h, (N * M, qp)), jnp.int32)
    ix = jnp.asarray(rs.randint(0, w, (N * M, qp)), jnp.int32)
    fy = jnp.asarray(rs.rand(N * M, qp), jnp.float32)
    fx = jnp.asarray(rs.rand(N * M, qp), jnp.float32)

    def onehot(v, iy, ix, fy, fx):
        io_h = jnp.arange(hp, dtype=jnp.int32)
        io_w = jnp.arange(wp, dtype=jnp.int32)
        ay = ((iy[..., None] == io_h) * (1 - fy)[..., None]
              + ((iy + 1)[..., None] == io_h) * fy[..., None])
        ax = ((ix[..., None] == io_w) * (1 - fx)[..., None]
              + ((ix + 1)[..., None] == io_w) * fx[..., None])
        t = jnp.einsum("bqh,bhxd->bqxd", ay, v)
        return jnp.einsum("bqx,bqxd->bqd", ax, t).sum()

    t, _ = _bench(onehot, v, iy, ix, fy, fx, iters=5)
    flops = 2 * N * M * qp * hp * wp * D + 2 * N * M * qp * wp * D
    row = {"level": f"{h}x{w}", "qp": qp, "time_ms": round(t * 1e3, 2),
           "achieved_tflops": round(flops / t / 1e12, 1),
           "ns_per_sample": round(t / (N * M * qp) * 1e9, 2)}
    print("onehot", row, flush=True)
    return row


def main():
    print(jax.devices(), flush=True)
    result = {
        "geometry": {"levels": LEVELS, "S": S, "M": M, "D": D, "P": P},
        "pure_gather": pure_gather_per_level(q_total=S),
        "granularity": granularity_scan(),
        "full_msda_query_chunk": full_msda_chunk_scan(),
        "onehot_smallest_level": onehot_forward_smallest_level(),
        "hbm_gbs_spec": HBM_GBS,
    }
    with open("MSDA_GATHER_PROBE.json", "w") as f:
        json.dump(result, f, indent=1)
    print("wrote MSDA_GATHER_PROBE.json", flush=True)


if __name__ == "__main__":
    main()
