"""Flash-kernel grid-order probe at the 21k large-window shapes.

The Q-tiled flash kernel streams a (TQ, S) f32 bias tile per grid step; at
21k-768 scale (S=2304, 16 heads) the full bias is ~340 MB, and with grid
(b, h, nq) it re-streams once per image. Grid (h, nq, b) keeps the bias
tile resident across the batch (index (hi, qi) is constant in the
innermost dim) at the cost of re-fetching the bf16 K/V head state per
step — about half the bytes. This probe times both orders at the real
shapes and writes FLASH_GRID_PROBE.json; the kernel default follows the
winner (ops/pallas_flash_attention._flash_forward grid_order).
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from fastervit_tpu.ops.pallas_flash_attention import (_flash_forward,
                                                      _pad_hd)

# (S, heads, hd, batch) — 21k-384/512/768 stage-3 window sizes (win 24/32/48)
CASES = [
    (576, 16, 64, 32),
    (1024, 16, 64, 32),
    (2304, 16, 64, 16),
    (2304, 16, 64, 32),
]


def bench(order, s, h, hd, b, iters=10):
    rs = np.random.RandomState(0)
    q = _pad_hd(jnp.asarray(rs.randn(b, h, s, hd), jnp.bfloat16))
    k = _pad_hd(jnp.asarray(rs.randn(b, h, s, hd), jnp.bfloat16))
    v = _pad_hd(jnp.asarray(rs.randn(b, h, s, hd), jnp.bfloat16))
    bias = jnp.asarray(rs.randn(h, s, s), jnp.float32)

    acc = jnp.zeros((), jnp.float32)

    # k/v/bias must be jit ARGUMENTS, not closures: closed-over device
    # arrays are serialized as HLO constants, and the 340 MB bias blows the
    # relay's remote-compile request-size limit (HTTP 413).
    @jax.jit
    def chained(acc, q, k, v, bias):
        out = _flash_forward(q, k, v, bias, hd ** -0.5, False,
                             grid_order=order)
        return acc + out[0, 0, 0, 0].astype(jnp.float32)

    t0 = time.time()
    acc = chained(acc, q, k, v, bias)
    float(acc)
    compile_s = time.time() - t0
    t0 = time.perf_counter()
    for _ in range(iters):
        acc = chained(acc, q, k, v, bias)
    float(acc)
    return (time.perf_counter() - t0) / iters, compile_s


def main():
    print(jax.devices(), flush=True)
    rows = []
    for s, h, hd, b in CASES:
        row = {"S": s, "heads": h, "hd": hd, "batch": b}
        for order in ("bhq", "hqb"):
            try:
                t, cs = bench(order, s, h, hd, b)
                row[f"ms_{order}"] = round(t * 1e3, 2)
                row[f"compile_{order}"] = round(cs, 1)
            except Exception as e:  # noqa: BLE001 — record failures
                row[f"ms_{order}"] = f"{type(e).__name__}: {e}"[:150]
        if isinstance(row.get("ms_bhq"), float) and \
                isinstance(row.get("ms_hqb"), float):
            row["speedup_hqb"] = round(row["ms_bhq"] / row["ms_hqb"], 3)
        rows.append(row)
        print(row, flush=True)
    with open("FLASH_GRID_PROBE.json", "w") as f:
        json.dump(rows, f, indent=1)
    print("wrote FLASH_GRID_PROBE.json", flush=True)


if __name__ == "__main__":
    main()
