"""fv0 headline drift bisect (VERDICT r3 #4): 7826 (r01) -> 7548 (r02) ->
7506 (r03) while fv0-affecting defaults changed (fused-HAT routing, MSDA
'auto' — the latter can't touch fv0). Sweeps the attention routing knobs
under the exact bench.py protocol so the drift is attributable to a code
path rather than relay variance.

Configs: auto (current default: packed pallas attention + fully-fused HAT
block), nofused (packed attention, fused block gated off), flash
(Q-tiled kernel), jnp (pure-XLA attention).

Writes BENCH_BISECT.json. Usage: python scripts/bench_bisect.py [--iters 30]
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

BATCH, MODEL = 256, "faster_vit_0_224"


def bench(attn_impl, iters, windows=6):
    import fastervit_tpu as fvt

    model = fvt.create_model(MODEL, dtype=jnp.bfloat16, attn_impl=attn_impl)
    variables = jax.jit(model.module.init)(jax.random.PRNGKey(0),
                                           jnp.zeros((1, 224, 224, 3)))

    @jax.jit
    def fwd(v, x, s):
        out = model.module.apply(v, x)
        return out, s + out[0, 0].astype(jnp.float32)

    x = jnp.asarray(np.random.RandomState(0).randn(BATCH, 224, 224, 3),
                    jnp.bfloat16)
    s = jnp.zeros((), jnp.float32)
    out, s = fwd(variables, x, s)
    float(s)
    out, s = fwd(variables, x, s)
    float(s)
    rates = []
    for _ in range(windows):
        t0 = time.perf_counter()
        for _ in range(iters):
            out, s = fwd(variables, x, s)
        float(s)
        rates.append(BATCH * iters / (time.perf_counter() - t0))
    kept = sorted(rates[1:])
    return float(np.median(kept)), float(kept[0]), float(kept[-1])


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=30)
    ap.add_argument("--configs", default="auto,nofused,flash,jnp")
    args = ap.parse_args()
    rows = {}
    out_path = os.path.join(REPO, "BENCH_BISECT.json")
    if os.path.exists(out_path):
        rows = json.load(open(out_path))
    for cfg in args.configs.split(","):
        import fastervit_tpu.ops.pallas_hat_block as phb
        orig = phb.fused_block_supported
        impl = cfg
        if cfg == "nofused":
            phb.fused_block_supported = lambda *a, **k: False
            impl = "pallas"
        try:
            med, lo, hi = bench(impl, args.iters)
        except Exception as e:
            rows[cfg] = {"error": f"{type(e).__name__}: {e}"[:200]}
            print(cfg, rows[cfg], flush=True)
            continue
        finally:
            phb.fused_block_supported = orig
        rows[cfg] = {"img_s": round(med, 1), "spread_min": round(lo, 1),
                     "spread_max": round(hi, 1), "batch": BATCH,
                     "iters_per_window": args.iters, "windows": 5}
        print(f"{cfg:10s} {med:8.1f} img/s  [{lo:.1f}, {hi:.1f}]",
              flush=True)
        with open(out_path, "w") as f:
            json.dump(rows, f, indent=1)
    print("wrote BENCH_BISECT.json")


if __name__ == "__main__":
    main()
