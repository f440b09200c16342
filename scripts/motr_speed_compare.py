"""MOTR streaming frame latency: exact f32 vs bf16 vs lite-encoder on one
chip (fv0 dynamic backbone, 1536x800, 60 queries, 6 enc / 6 dec — the
ROUND_NOTES 1.64 s/frame configuration). Chained-fetch timing; merges into
PROFILE_DOWNSTREAM.json under motr_1536x800_fv0.
"""
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import jax
import jax.numpy as jnp
import numpy as np

from profile_downstream import _emit, time_fn  # noqa: E402


def main():
    from fastervit_tpu.models.registry import get_config
    from fastervit_tpu.tracking.motr_exact import MOTRDetectorExact

    out_path = "PROFILE_DOWNSTREAM.json"
    section = "motr_1536x800_fv0"
    jnp.zeros((8, 128)).sum().item()     # discard first program

    cfg = get_config("faster_vit_0_224", resolution=1536)
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(1, 800, 1536, 3), jnp.float32)
    nq = 60
    qp = jnp.asarray(rng.randn(1, nq, 256), jnp.float32)
    rp = jnp.asarray(rng.rand(1, nq, 4), jnp.float32)
    rows = {}

    from fastervit_tpu.ops.msda import set_msda_backend

    import argparse
    ap = argparse.ArgumentParser()
    ap.add_argument("--variants", default="")
    ap.add_argument("--bisect", action="store_true",
                    help="sweep the two defaults that flipped between r3 "
                         "and r4 (fused_hat, bias_expand) for the drifted "
                         "frame_exact_f32_pallas config (VERDICT r4 #7)")
    args = ap.parse_args()

    if args.bisect:
        from fastervit_tpu.models import layers as L
        for fused in (False, True):
            for bias in ("separable", "gather"):
                key = (f"frame_exact_f32_pallas_"
                       f"{'fused' if fused else 'nofused'}_{bias}")
                set_msda_backend("pallas")
                prev_f, prev_b = L.set_fused_hat(fused), L.set_bias_expand(
                    bias)
                try:
                    det = MOTRDetectorExact(backbone_cfg=cfg, num_queries=nq,
                                            enc_layers=6, dec_layers=6)
                    v = jax.jit(det.init)(jax.random.PRNGKey(0), x, qp, rp)
                    t, c = time_fn(
                        lambda v, x, qp, rp, det=det: det.apply(v, x, qp,
                                                                rp),
                        (v, x, qp, rp), iters=6)
                    _emit(rows, key, t, out_path, section)
                    del det, v
                except Exception as e:
                    # same isolation as the main sweep: one relay error
                    # must not kill the remaining bisect combos
                    print(f"  {key}: FAIL {type(e).__name__}: {e}"[:300],
                          flush=True)
                finally:
                    L.set_fused_hat(prev_f)
                    L.set_bias_expand(prev_b)
                    set_msda_backend("auto")
        return
    table = {
        "frame_exact_f32": ("xla", {}),
        "frame_exact_f32_pallas": ("pallas", {}),
        "frame_exact_f32_rowmix": ("rowmix", {}),
        "frame_bf16": ("xla", {"dtype": jnp.bfloat16}),
        "frame_bf16_pallas": ("pallas", {"dtype": jnp.bfloat16}),
        "frame_bf16_rowmix": ("rowmix", {"dtype": jnp.bfloat16}),
        "frame_lite_encoder": ("xla", {"lite_encoder": True}),
        "frame_lite_bf16": ("xla",
                            {"lite_encoder": True, "dtype": jnp.bfloat16}),
        "frame_lite_bf16_pallas": ("pallas",
                                   {"lite_encoder": True,
                                    "dtype": jnp.bfloat16}),
    }
    sel = [v for v in args.variants.split(",") if v]
    for key, (backend, kw) in table.items():
        if sel and key not in sel:
            continue
        set_msda_backend(backend)
        try:
            det = MOTRDetectorExact(backbone_cfg=cfg, num_queries=nq,
                                    enc_layers=6, dec_layers=6, **kw)
            v = jax.jit(det.init)(jax.random.PRNGKey(0), x, qp, rp)
            t, c = time_fn(
                lambda v, x, qp, rp, det=det: det.apply(v, x, qp, rp),
                (v, x, qp, rp), iters=6)
            _emit(rows, key, t, out_path, section)
            del det, v
        except Exception as e:
            # keep going: one transient relay failure must not abort the
            # whole sweep (it cost 5 variants in the r5-A session)
            print(f"  {key}: FAIL {type(e).__name__}: {e}"[:300], flush=True)
        finally:
            set_msda_backend("auto")


if __name__ == "__main__":
    main()
