"""Flash-kernel q-tile sweep at the 21k large-window geometries.

PROFILE_CLS.json (r4) localizes the 21k-768 tail: level_2 (S=2304, 12
blocks) is 74% of the forward. Inside the attention call, the 12 MB VMEM
budget picks tq=192 -> 3072 grid steps, each re-fetching K/V (1.18 MB):
~3.6 GB of HBM traffic per call (~4.4 ms of the measured 9.4 ms at b16).
v5e has 128 MB of VMEM; this probe sweeps tq (by raising the budget) and
grid order to find the true optimum, at the level_2 and level_3 geometries
of 21k-768 plus level_2 of 21k-512.

Writes FLASH_TQ_PROBE.json. Usage: python scripts/flash_tq_probe.py
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


def bench(fn, args, iters=20, windows=4):
    f = jax.jit(fn)
    s = jnp.zeros((), jnp.float32)
    t0 = time.time()
    s2 = f(s, *args)
    float(s2)
    compile_s = time.time() - t0
    ts = []
    for _ in range(windows):
        t0 = time.perf_counter()
        for _ in range(iters):
            s = f(s, *args)
        float(s)
        ts.append((time.perf_counter() - t0) / iters)
    return float(np.median(sorted(ts[1:]))), compile_s


def main():
    import fastervit_tpu.ops.pallas_flash_attention as pfa

    geoms = [
        # (name, B, H, S, hd)  B = batch*windows
        ("768_level2_b16", 16, 16, 2304, 49),
        ("768_level3_b16", 16, 32, 576, 49),
        ("512_level2_b32", 32, 16, 1024, 49),
    ]
    out_path = os.path.join(REPO, "FLASH_TQ_PROBE.json")
    rows = json.load(open(out_path)) if os.path.exists(out_path) else {}

    for name, b, h, s, hd in geoms:
        rs = np.random.RandomState(0)
        qkv = jnp.asarray(rs.randn(b, s, 3 * h * hd), jnp.bfloat16)
        bias = jnp.asarray(rs.randn(h, s, s), jnp.float32)
        scale = hd ** -0.5
        flops_pad = 4 * b * h * s * s * 128  # what the padded kernel executes
        tqs = sorted({tq for tq in (192, 384, 576, 768, 1152, 2304, 512,
                                    1024, 256, 128, 288)
                      if s % tq == 0 and tq <= s})
        geo = rows.setdefault(name, {})
        for tq in tqs:
            orig_pick, orig_budget = pfa._pick_tq, pfa._VMEM_BUDGET
            pfa._pick_tq = lambda *_a, **_k: tq
            pfa._VMEM_BUDGET = 120 * 1024 * 1024
            try:
                t, c = bench(
                    lambda st, qkv, bias: st + pfa.flash_window_mhsa(
                        qkv, bias, h, scale).astype(jnp.float32).mean(),
                    (qkv, bias))
                geo[f"tq{tq}"] = {
                    "ms": round(t * 1e3, 2), "compile_s": round(c, 1),
                    "tf_s_padded": round(flops_pad / t / 1e12, 1)}
                print(f"{name} tq={tq:5d}: {t * 1e3:7.2f} ms "
                      f"({flops_pad / t / 1e12:5.1f} TF/s padded, "
                      f"compile {c:.0f}s)", flush=True)
            except Exception as e:
                geo[f"tq{tq}"] = {"error": f"{type(e).__name__}: {e}"[:160]}
                print(f"{name} tq={tq}: FAIL {e}"[:200], flush=True)
            finally:
                pfa._pick_tq, pfa._VMEM_BUDGET = orig_pick, orig_budget
            with open(out_path, "w") as f:
                json.dump(rows, f, indent=1)
    print("wrote", out_path)


if __name__ == "__main__":
    main()
