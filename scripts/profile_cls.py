"""Per-stage latency breakdown for a classification variant on one TPU chip.

The 21k large-window tail (faster_vit_4_21k_768: 21.8% MFU vs 43-49% for the
224px family, ROOFLINE.json) needs a per-stage profile before more kernel
tuning: FLASH_GRID_PROBE showed 1.16-1.32x kernel-level attention wins that
did not move the end-to-end number, so the bottleneck is elsewhere.

Method: each stage (PatchEmbed + 4 FasterViTLayer levels + head) is built as
a standalone module, initialized at its true input shape, jitted with params
as arguments (never closed over — relay payload limit), and timed with the
chained-fetch protocol of scripts/profile_downstream.py. Per-stage FLOPs come
from XLA's cost analysis on the same jitted stage, giving a per-stage MFU
column against the v5e 197 TF bf16 peak.

Writes PROFILE_CLS.json. Usage:
    python scripts/profile_cls.py [--model faster_vit_4_21k_768] [--batch 4]
"""
import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from profile_downstream import time_fn  # noqa: E402  (same directory)

PEAK_TF = 197.0  # v5e bf16


def stage_flops(fn, *args):
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
    ap.add_argument("--batch", type=int, default=4)
    ap.add_argument("--dtype", default="bfloat16")
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument("--attn-impl", default="auto")
    args = ap.parse_args()

    import flax.linen as nn
    from fastervit_tpu.models.config import VARIANTS
    from fastervit_tpu.models.fastervit import _build_levels
    from fastervit_tpu.models.layers import PatchEmbed

    cfg = VARIANTS[args.model]
    dtype = jnp.dtype(args.dtype)
    res = cfg.resolution if isinstance(cfg.resolution, int) else cfg.resolution[0]
    rs = np.random.RandomState(0)
    key = jax.random.PRNGKey(0)

    class Wrap(nn.Module):
        """Bind one stage module standalone (they expect a compact parent)."""
        i: int          # -1 = patch_embed, 0..3 = levels
        impl: str = "auto"

        @nn.compact
        def __call__(self, x):
            if self.i < 0:
                return PatchEmbed(in_dim=cfg.in_dim, dim=cfg.dim, dtype=dtype,
                                  name="patch_embed")(x, training=False)
            lvl = _build_levels(cfg, dtype, self.impl)[self.i]
            return lvl(x, training=False)

    rows = {"model": args.model, "batch": args.batch, "dtype": args.dtype,
            "iters": args.iters, "stages": []}
    x = jnp.asarray(rs.randn(args.batch, res, res, 3), dtype)
    total_ms = 0.0
    for i in range(-1, cfg.num_levels):
        m = Wrap(i, impl=args.attn_impl)
        # init on CPU with the xla impl (identical param tree; the pallas
        # flash kernel cannot execute on the CPU backend)
        with jax.default_device(jax.local_devices(backend="cpu")[0]):
            v = Wrap(i, impl="xla").init(key, jnp.zeros_like(x))
        v = jax.device_put(v)
        fn = lambda v, x: m.apply(v, x)          # noqa: E731
        t, compile_s = time_fn(fn, (v, x), iters=args.iters)
        fl = stage_flops(fn, v, x)
        tf = fl / t / 1e12
        name = "patch_embed" if i < 0 else f"level_{i}"
        row = {"stage": name, "in_shape": list(x.shape),
               "ms": round(t * 1e3, 2), "compile_s": round(compile_s, 1),
               "gflops": round(fl / 1e9, 1), "tf_s": round(tf, 1),
               "mfu_pct": round(100 * tf / PEAK_TF, 1)}
        rows["stages"].append(row)
        total_ms += t * 1e3
        print(f"{name:12s} in={tuple(x.shape)!s:22s} {t*1e3:8.2f} ms "
              f"{fl/1e9:9.1f} GF  {tf:6.1f} TF/s  {100*tf/PEAK_TF:5.1f}% MFU",
              flush=True)
        x = jax.block_until_ready(jax.jit(fn)(v, x))
        if i == cfg.num_levels - 1:
            break
    rows["sum_ms"] = round(total_ms, 2)
    rows["img_s_from_sum"] = round(args.batch / (total_ms / 1e3), 1)
    with open("PROFILE_CLS.json", "w") as f:
        json.dump(rows, f, indent=1)
    print(f"sum {total_ms:.1f} ms -> {rows['img_s_from_sum']} img/s "
          f"(head/norm excluded); wrote PROFILE_CLS.json", flush=True)


if __name__ == "__main__":
    main()
