"""CPB bias expansion: gather vs separable one-hot matmuls, on-chip.

BLOCK_DECOMP_PROBE.json leaves ~11 ms/block of 21k-768 level_2 unexplained
by attention+matmuls+LN; the candidate is PosEmbMLPSwinv2D's dense-bias
materialization (S^2-row gather producing 340 MB + a (S,S,H)->(H,S,S)
transpose, recomputed every block). This times both expansions through the
real module at each 21k window geometry and records the crossover for the
'auto' gate.

Writes CPB_EXPAND_PROBE.json. Usage: python scripts/cpb_expand_probe.py
"""
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import jax
import jax.numpy as jnp
import numpy as np


def bench(fn, iters=20, windows=4):
    f = jax.jit(fn)
    s = jnp.zeros((), jnp.float32)
    t0 = time.time()
    float(f(s))
    c = time.time() - t0
    ts = []
    for _ in range(windows):
        t0 = time.perf_counter()
        for _ in range(iters):
            s = f(s)
        float(s)
        ts.append((time.perf_counter() - t0) / iters)
    return float(np.median(sorted(ts[1:]))), c


def main():
    from fastervit_tpu.models import layers as L

    geoms = [  # (window, heads) at each 21k attention geometry
        ("768_level2_w48_h16", 48, 16),
        ("512_level2_w32_h16", 32, 16),
        ("384_level2_w24_h16", 24, 16),
        ("768_level3_w24_h32", 24, 32),
        ("224_level2_w7_h16", 7, 16),
    ]
    rows = {}
    for name, w, heads in geoms:
        mod = L.PosEmbMLPSwinv2D(window_size=(w, w),
                                 pretrained_window_size=(w, w),
                                 num_heads=heads, seq_length=w * w)
        v = jax.jit(mod.init)(jax.random.PRNGKey(0))
        row = {}
        for mode in ("gather", "separable"):
            prev = L.set_bias_expand(mode)
            try:
                t, c = bench(lambda s: s + mod.apply(v).astype(
                    jnp.float32).mean())
                row[mode] = {"ms": round(t * 1e3, 3),
                             "compile_s": round(c, 1)}
                print(f"{name:22s} {mode:10s} {t * 1e3:8.3f} ms "
                      f"(compile {c:.0f}s)", flush=True)
            except Exception as e:  # noqa: BLE001
                row[mode] = {"error": f"{type(e).__name__}: {e}"[:160]}
                print(f"{name} {mode}: FAIL {e}"[:200], flush=True)
            finally:
                L.set_bias_expand(prev)
        rows[name] = row
    with open(os.path.join(REPO, "CPB_EXPAND_PROBE.json"), "w") as f:
        json.dump(rows, f, indent=1)
    print("wrote CPB_EXPAND_PROBE.json")


if __name__ == "__main__":
    main()
