"""The multi-chip MSDA scaling claim (docs/MSDA_CHIP_LIMIT.md), made
load-bearing: the exact MOTR streaming frame step, query-axis sharded via
set_msda_token_sharding, must produce the single-device outputs AND
compile to a per-device SPMD partition whose cost-analysis FLOPs drop
~1/n (a replicated gather would keep them flat; a wrong partition would
break parity). scripts/msda_shard_scaling.py runs the 1/2/4/8 sweep and
writes MSDA_SHARD_SCALING.json; this test pins the 1-vs-4 case.

Reference for the work being divided: ms_deform_im2col_cuda.cuh:237-330
(per-sample bilinear loads — the per-chip floor the sharding divides).
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh

from fastervit_tpu.models.registry import get_config
from fastervit_tpu.ops.msda import set_msda_token_sharding
from fastervit_tpu.tracking.motr_exact import MOTRDetectorExact


@pytest.mark.slow
def test_streaming_step_query_sharding_divides_work(cpu_devices):
    cfg = get_config("faster_vit_0_224", depths=[1, 1, 1, 1],
                     num_heads=[1, 2, 4, 8], dim=32, in_dim=16,
                     resolution=128)
    nq = 8
    det = MOTRDetectorExact(backbone_cfg=cfg, num_classes=1, dim=64,
                            num_queries=nq, enc_layers=2, dec_layers=2,
                            ffn_dim=128)
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(1, 128, 128, 3), jnp.float32)
    qp = jnp.asarray(rng.randn(1, nq, 64), jnp.float32)
    rp = jnp.asarray(rng.rand(1, nq, 4), jnp.float32)
    v = jax.jit(det.init)(jax.random.PRNGKey(0), x, qp, rp)

    results = {}
    for ndev in (1, 4):
        mesh = Mesh(np.array(cpu_devices[:ndev]), ("data",))
        prev = set_msda_token_sharding((mesh, "data"))
        try:
            with mesh:
                compiled = jax.jit(
                    lambda v, x, qp, rp: det.apply(v, x, qp, rp)).lower(
                        v, x, qp, rp).compile()
                cost = compiled.cost_analysis()
                if isinstance(cost, list):
                    cost = cost[0]
                out = jax.tree.map(np.asarray, compiled(v, x, qp, rp))
        finally:
            set_msda_token_sharding(prev)
        results[ndev] = (float(cost.get("flops", 0.0)), out)

    f1, out1 = results[1]
    f4, out4 = results[4]
    # parity: the partitioned program computes the same frame step
    for a, b in zip(jax.tree.leaves(out1), jax.tree.leaves(out4)):
        np.testing.assert_allclose(a, b, atol=1e-4)
    # work division: per-device partition FLOPs must drop well below the
    # single-device program (replicated backbone is the floor)
    assert f4 < 0.65 * f1, (f1, f4)
