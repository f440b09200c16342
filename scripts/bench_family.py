"""Full-family inference benchmark on one TPU chip: fv0-fv6 @224 and the
21k variants at native resolution, each vs its A100 TensorRT baseline
(reference README.md:134-277; BASELINE.md).

Method: bench.py's chained-fetch timing (host fetch = only true barrier
through the relay; iteration chain serializes execution; median of 3
windows). Writes BENCH_FAMILY.json and prints a table.

Usage: python scripts/bench_family.py [--models fv0,fv1] [--out FILE]
"""
import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

# (model, resolution, batch, A100-TensorRT img/s baseline or None)
FAMILY = [
    ("faster_vit_0_224", 224, 256, 5802.0),     # README.md:146-155
    ("faster_vit_1_224", 224, 256, 4188.0),
    ("faster_vit_2_224", 224, 256, 3161.0),
    ("faster_vit_3_224", 224, 64, 1780.0),
    ("faster_vit_4_224", 224, 64, 849.0),
    ("faster_vit_5_224", 224, 64, 449.0),       # batches tuned on-chip
    ("faster_vit_6_224", 224, 64, 352.0),       # (scripts/bench_tune.py)
    ("faster_vit_4_21k_224", 224, 64, None),    # README.md:239-277: no
    ("faster_vit_4_21k_384", 384, 32, None),    # throughput column for 21k
    ("faster_vit_4_21k_512", 512, 32, None),
    ("faster_vit_4_21k_768", 768, 16, None),
]


def bench_one(name, res, batch, iters=20, int8=False, windows=6, baked=False):
    import fastervit_tpu as fvt
    model = fvt.create_model(name, dtype=jnp.bfloat16, quantized=int8)
    variables = jax.jit(model.module.init)(
        jax.random.PRNGKey(0), jnp.zeros((1, res, res, 3)))
    if baked:
        # deploy mode (reference switch_to_deploy): position-emb tensors
        # precomputed into the 'baked' collection; serving skips the
        # per-block CPB MLP + dense expansion
        variables = model.bake_posemb(variables, dtype=jnp.bfloat16)
    if int8:
        from fastervit_tpu.ops.quant import quantize_variables, quantized_call
        variables = jax.jit(quantize_variables)(variables)

        @jax.jit
        def fwd_chained(v, x, s):
            out = quantized_call(model.module.apply, v, x)
            return out, s + out[0, 0].astype(jnp.float32)
    else:

        @jax.jit
        def fwd_chained(v, x, s):
            out = model.module.apply(v, x)
            return out, s + out[0, 0].astype(jnp.float32)

    x = jnp.asarray(np.random.RandomState(0).randn(batch, res, res, 3),
                    jnp.bfloat16)
    s = jnp.zeros((), jnp.float32)
    t0 = time.time()
    out, s = fwd_chained(variables, x, s)
    float(s)
    compile_s = time.time() - t0
    out, s = fwd_chained(variables, x, s)
    float(s)
    # median over windows-1 measured windows (first discarded: relay
    # first-executable cost); min/max kept for spread reporting
    rates = []
    for _ in range(windows):
        t0 = time.perf_counter()
        for _ in range(iters):
            out, s = fwd_chained(variables, x, s)
        float(s)
        rates.append(batch * iters / (time.perf_counter() - t0))
    kept = sorted(rates[1:])
    return (float(np.median(kept)), compile_s, float(kept[0]),
            float(kept[-1]), len(kept))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--models", default="", help="comma substrings to select")
    ap.add_argument("--iters", type=int, default=20)
    ap.add_argument("--int8", action="store_true",
                    help="int8 serving path (ops/quant.py)")
    ap.add_argument("--baked", action="store_true",
                    help="deploy mode: bake position-emb tensors first "
                         "(Model.bake_posemb, reference switch_to_deploy)")
    ap.add_argument("--out", default="BENCH_FAMILY.json")
    args = ap.parse_args()
    if args.int8 and args.out == "BENCH_FAMILY.json":
        args.out = "BENCH_FAMILY_INT8.json"  # keep bf16 rows intact
    if args.baked and args.out == "BENCH_FAMILY.json":
        args.out = "BENCH_FAMILY_DEPLOY.json"  # keep live-path rows intact
    # 'fvN' is shorthand for 'faster_vit_N' (so --models fv1,fv5 works)
    pats = [s.replace("fv", "faster_vit_") if s.startswith("fv") else s
            for s in args.models.split(",") if s]
    sel = [m for m in FAMILY if not pats or any(s in m[0] for s in pats)]
    results = []
    for name, res, batch, base in sel:
        try:
            rate, compile_s, lo, hi, kept_windows = bench_one(
                name, res, batch, args.iters, int8=args.int8,
                baked=args.baked)
            row = {"model": name, "res": res, "batch": batch,
                   "img_s": round(rate, 1),
                   "spread_min": round(lo, 1), "spread_max": round(hi, 1),
                   "windows": kept_windows, "iters_per_window": args.iters,
                   "baked": args.baked,
                   "dtype": "int8" if args.int8 else "bfloat16",
                   "a100_trt_img_s": base,
                   "vs_baseline": round(rate / base, 3) if base else None,
                   "compile_s": round(compile_s, 1)}
        except Exception as e:  # keep going; record the failure
            row = {"model": name, "res": res, "batch": batch,
                   "error": f"{type(e).__name__}: {e}"[:300]}
        results.append(row)
        print(json.dumps(row), flush=True)
        # merge into the output file incrementally so partial runs persist
        merged = {}
        if os.path.exists(args.out):
            try:
                for r in json.load(open(args.out)):
                    merged[r["model"]] = r
            except Exception:
                pass
        merged[row["model"]] = row
        ordered = [merged[m[0]] for m in FAMILY if m[0] in merged]
        with open(args.out, "w") as f:
            json.dump(ordered, f, indent=1)
    print("wrote", args.out)


if __name__ == "__main__":
    main()
