"""Batch-size tuning for the family rows below A100 parity (fv5 0.96x,
fv6 0.91x) and the low-MFU high-res 21k rows (ROOFLINE.json: 21k-768 at
batch 4 = 10.8% MFU). Reuses bench_family's chained-fetch method; merges
winning rows into BENCH_FAMILY.json only when they beat the recorded rate.
"""
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from bench_family import FAMILY, bench_one  # noqa: E402  (scripts/ sibling)

CANDIDATES = [
    ("faster_vit_5_224", 224, [64, 128], 449.0),
    ("faster_vit_6_224", 224, [64, 128], 352.0),
    ("faster_vit_4_21k_384", 384, [64, 96], None),
    ("faster_vit_4_21k_512", 512, [48, 64], None),
    ("faster_vit_4_21k_768", 768, [24, 32], None),
]


def main():
    out = "BENCH_FAMILY.json"
    merged = {r["model"]: r for r in json.load(open(out))}
    for name, res, batches, base in CANDIDATES:
        for b in batches:
            try:
                rate, compile_s, lo, hi, kept_windows = bench_one(
                    name, res, b, iters=10)
            except Exception as e:
                print(f"{name} b{b}: FAIL {type(e).__name__}: {e}"[:200],
                      flush=True)
                continue
            prev = merged.get(name, {}).get("img_s", 0.0)
            print(f"{name} b{b}: {rate:.1f} img/s (prev {prev:.1f})",
                  flush=True)
            if rate > prev:
                merged[name] = {
                    "model": name, "res": res, "batch": b,
                    "img_s": round(rate, 1),
                    "spread_min": round(lo, 1), "spread_max": round(hi, 1),
                    "windows": kept_windows, "iters_per_window": 10,
                    "dtype": "bfloat16",
                    "a100_trt_img_s": base,
                    "vs_baseline": round(rate / base, 3) if base else None,
                    "compile_s": round(compile_s, 1)}
                ordered = [merged[m[0]] for m in FAMILY if m[0] in merged]
                with open(out, "w") as f:
                    json.dump(ordered, f, indent=1)
    print("wrote", out)


if __name__ == "__main__":
    main()
