"""Load-bearing evidence for docs/MSDA_CHIP_LIMIT.md's multi-chip escape
hatch (VERDICT r4 #8): the exact MOTR streaming frame step, query-axis
sharded over a 1/2/4/8-device mesh via set_msda_token_sharding, must
(a) produce the single-device outputs (parity), and
(b) divide the per-device work: XLA compiles one SPMD partition per
    device, so the compiled partition's cost-analysis FLOPs must fall as
    the mesh grows (the replicated backbone is the floor; the sharded
    encoder/decoder dominate at streaming shapes).

The MSDA sample count per device is Q*M*L*P/n by construction once GSPMD
partitions the gather — (a)+(b) together show it actually did (a
replicated gather would keep FLOPs flat; a wrong partition would break
parity).

Runs entirely on CPU (virtual device mesh). Writes MSDA_SHARD_SCALING.json.

Usage: python scripts/msda_shard_scaling.py
"""
import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402
from jax.sharding import Mesh  # noqa: E402


def main():
    from fastervit_tpu.models.registry import get_config
    from fastervit_tpu.ops.msda import set_msda_token_sharding
    from fastervit_tpu.tracking.motr_exact import MOTRDetectorExact

    # reduced-but-real streaming config: the exact (checkpoint-compatible)
    # MOTR forward — 4-scale pyramid, deformable encoder/decoder, track
    # queries — at a CPU-tractable resolution. The sharded axis (encoder
    # tokens = MSDA queries) is the same axis that carries S=102k at the
    # submit resolution (PROFILE_DOWNSTREAM motr_1536x800_fv0).
    cfg = get_config("faster_vit_0_224", depths=[1, 1, 1, 1],
                     num_heads=[1, 2, 4, 8], dim=32, in_dim=16,
                     resolution=256)
    nq = 16
    det = MOTRDetectorExact(backbone_cfg=cfg, num_classes=1, dim=64,
                            num_queries=nq, enc_layers=3, dec_layers=3,
                            ffn_dim=256)
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(1, 256, 256, 3), jnp.float32)
    qp = jnp.asarray(rng.randn(1, nq, 64), jnp.float32)
    rp = jnp.asarray(rng.rand(1, nq, 4), jnp.float32)
    v = jax.jit(det.init)(jax.random.PRNGKey(0), x, qp, rp)

    # encoder token count = MSDA query count at this geometry
    s_enc = sum((256 // s) ** 2 for s in (8, 16, 32, 64))

    devices = jax.devices()
    rows, want = [], None
    for ndev in (1, 2, 4, 8):
        mesh = Mesh(np.array(devices[:ndev]), ("data",))
        prev = set_msda_token_sharding((mesh, "data"))
        try:
            with mesh:
                fwd = jax.jit(lambda v, x, qp, rp: det.apply(v, x, qp, rp))
                compiled = fwd.lower(v, x, qp, rp).compile()
                cost = compiled.cost_analysis()
                if isinstance(cost, list):
                    cost = cost[0]
                out = jax.tree.map(np.asarray, compiled(v, x, qp, rp))
        finally:
            set_msda_token_sharding(prev)
        if want is None:
            want = out
            maxdiff = 0.0
        else:
            maxdiff = max(float(np.max(np.abs(a - b)))
                          for a, b in zip(jax.tree.leaves(want),
                                          jax.tree.leaves(out)))
        row = {"devices": ndev,
               "per_device_gflops": round(float(cost.get("flops", 0.0))
                                          / 1e9, 3),
               "bytes_accessed_gb": round(float(
                   cost.get("bytes accessed", 0.0)) / 1e9, 3),
               "enc_tokens_total": s_enc,
               "msda_samples_per_device_enc_layer":
                   s_enc * 8 * 4 * 4 // ndev,
               "max_abs_diff_vs_1dev": maxdiff}
        rows.append(row)
        print(row, flush=True)

    f1 = rows[0]["per_device_gflops"]
    f8 = rows[-1]["per_device_gflops"]
    artifact = {
        "config": "MOTRDetectorExact reduced (256px, 4-scale, enc3/dec3, "
                  "16 queries, CPU mesh), query-axis sharding via "
                  "set_msda_token_sharding",
        "rows": rows,
        "per_device_flops_8dev_over_1dev": round(f8 / f1, 3),
        "parity_atol": 1e-4,
        "parity_ok": all(r["max_abs_diff_vs_1dev"] <= 1e-4 for r in rows),
        "flops_scale_ok": f8 < 0.6 * f1,
    }
    out_path = os.path.join(REPO, "MSDA_SHARD_SCALING.json")
    with open(out_path, "w") as f:
        json.dump(artifact, f, indent=1)
    print("wrote", out_path)
    if not (artifact["parity_ok"] and artifact["flops_scale_ok"]):
        sys.exit(1)


if __name__ == "__main__":
    main()
