"""Fully-fused HAT block kernel: equality with the jnp composition, gradient
correctness, and model-level equivalence of fused vs composed paths."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

import fastervit_tpu as fvt
from fastervit_tpu.ops.pallas_hat_block import (fused_block_supported,
                                                fused_hat_block,
                                                hat_block_reference)


def _make(b=8, s=53, h=4, c=128, hidden=None, seed=0):
    rng = np.random.RandomState(seed)
    hidden = hidden or 4 * c
    x = jnp.asarray(rng.randn(b, s, c) * 0.5, jnp.float32)
    params = {
        "ln1_scale": jnp.asarray(rng.rand(c) + 0.5, jnp.float32),
        "ln1_bias": jnp.asarray(rng.randn(c) * 0.1, jnp.float32),
        "qkv_w": jnp.asarray(rng.randn(c, 3 * c) * 0.05, jnp.float32),
        "qkv_b": jnp.asarray(rng.randn(3 * c) * 0.05, jnp.float32),
        "proj_w": jnp.asarray(rng.randn(c, c) * 0.05, jnp.float32),
        "proj_b": jnp.asarray(rng.randn(c) * 0.05, jnp.float32),
        "gamma3": jnp.asarray(rng.rand(c), jnp.float32),
        "ln2_scale": jnp.asarray(rng.rand(c) + 0.5, jnp.float32),
        "ln2_bias": jnp.asarray(rng.randn(c) * 0.1, jnp.float32),
        "fc1_w": jnp.asarray(rng.randn(c, hidden) * 0.05, jnp.float32),
        "fc1_b": jnp.asarray(rng.randn(hidden) * 0.05, jnp.float32),
        "fc2_w": jnp.asarray(rng.randn(hidden, c) * 0.05, jnp.float32),
        "fc2_b": jnp.asarray(rng.randn(c) * 0.05, jnp.float32),
        "gamma4": jnp.asarray(rng.rand(c), jnp.float32),
    }
    bias = jnp.asarray(rng.randn(h, s, s), jnp.float32)
    return x, params, bias


@pytest.mark.parametrize("b,s,h,c", [(8, 53, 4, 128), (4, 16, 8, 128),
                                     (8, 49, 2, 64)])
def test_fused_block_matches_reference(b, s, h, c):
    x, params, bias = _make(b, s, h, c)
    scale = (c // h) ** -0.5
    got = fused_hat_block(x, params, bias, h, scale, True)
    want = hat_block_reference(x, params, bias, h, scale)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=2e-5, rtol=2e-5)


def test_fused_block_gradients():
    x, params, bias = _make(4, 16, 2, 64)
    scale = 32 ** -0.5
    cot = jnp.asarray(np.random.RandomState(5).randn(4, 16, 64), jnp.float32)

    g_fused = jax.grad(lambda x, p, b: jnp.sum(
        fused_hat_block(x, p, b, 2, scale, True) * cot), argnums=(0, 1, 2))(
        x, params, bias)
    g_ref = jax.grad(lambda x, p, b: jnp.sum(
        hat_block_reference(x, p, b, 2, scale) * cot), argnums=(0, 1, 2))(
        x, params, bias)
    jax.tree.map(lambda a, e: np.testing.assert_allclose(
        np.asarray(a), np.asarray(e), atol=1e-4, rtol=1e-4), g_fused, g_ref)


def test_supported_gating():
    x, params, bias = _make(4, 16, 2, 64)
    assert fused_block_supported(x.shape, params)
    assert not fused_block_supported((4, 2304, 1568), params,
                                     act_limit=1024)


def test_model_fused_equals_composed():
    """Whole model: attn_impl='pallas' with the fused-block routing forced on
    (off by default since round 4 — BENCH_BISECT.json shows the composed path
    is faster on-chip) must match attn_impl='jnp' (composed modules) on the
    same variables; interpret mode on CPU."""
    from fastervit_tpu.models import layers as L
    kw = dict(depths=[1, 1, 2, 1], num_heads=[1, 2, 4, 8], dim=32, in_dim=16,
              resolution=112, num_classes=10, layer_scale=1e-5,
              do_propagation=True)
    m_jnp = fvt.create_model("faster_vit_0_224", attn_impl="jnp", **kw)
    m_pal = fvt.create_model("faster_vit_0_224", attn_impl="pallas", **kw)
    v = m_jnp.init(jax.random.PRNGKey(0))
    x = jnp.asarray(np.random.RandomState(0).randn(2, 112, 112, 3), jnp.float32)
    a = np.asarray(m_jnp.apply(v, x))
    prev = L.set_fused_hat(True)
    try:
        b = np.asarray(m_pal.apply(v, x))
    finally:
        L.set_fused_hat(prev)
    c = np.asarray(m_pal.apply(v, x))  # default: composed + pallas attention
    np.testing.assert_allclose(a, b, atol=5e-5, rtol=1e-4)
    np.testing.assert_allclose(a, c, atol=5e-5, rtol=1e-4)


def test_fused_hat_default_off():
    """The in-model fused-HAT routing default is pinned OFF (composed +
    packed Pallas attention): BENCH_BISECT.json r4 measured 8537 vs 7520
    img/s on fv0. Re-enabling is an explicit probe action."""
    from fastervit_tpu.models import layers as L
    assert L._FUSED_HAT is False


def test_fused_block_dp_matches_reference():
    """Per-row residual scales (DropPath masks): forward + gradients of the
    dp kernel vs the reference composition with the same scales."""
    from fastervit_tpu.ops.pallas_hat_block import fused_hat_block_dp
    b, s, h, c = 8, 16, 2, 64
    x, params, bias = _make(b, s, h, c)
    scale = (c // h) ** -0.5
    rng = np.random.RandomState(7)
    keep = 0.8
    dp1 = jnp.asarray((rng.rand(b) < keep) / keep, jnp.float32)
    dp2 = jnp.asarray((rng.rand(b) < keep) / keep, jnp.float32)

    got = fused_hat_block_dp(x, params, bias, dp1, dp2, h, scale, True)
    want = hat_block_reference(x, params, bias, h, scale, dp1=dp1, dp2=dp2)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=2e-5, rtol=2e-5)

    cot = jnp.asarray(rng.randn(b, s, c), jnp.float32)
    g_fused = jax.grad(lambda x, p, bb: jnp.sum(
        fused_hat_block_dp(x, p, bb, dp1, dp2, h, scale, True) * cot),
        argnums=(0, 1, 2))(x, params, bias)
    g_ref = jax.grad(lambda x, p, bb: jnp.sum(
        hat_block_reference(x, p, bb, h, scale, dp1=dp1, dp2=dp2) * cot),
        argnums=(0, 1, 2))(x, params, bias)
    jax.tree.map(lambda a, e: np.testing.assert_allclose(
        np.asarray(a), np.asarray(e), atol=1e-4, rtol=1e-4), g_fused, g_ref)


def test_model_train_mode_fused_dp_runs():
    """attn_impl='pallas' now covers stochastic-depth training: a train-mode
    forward with drop_path active runs through the dp kernel and stays
    finite; drop_path=0 rows of the mask mean some samples' blocks are
    identity + residual only."""
    kw = dict(depths=[1, 1, 2, 1], num_heads=[1, 2, 4, 8], dim=32, in_dim=16,
              resolution=112, num_classes=10, drop_path_rate=0.5)
    m = fvt.create_model("faster_vit_0_224", attn_impl="pallas", **kw)
    v = m.init(jax.random.PRNGKey(0))
    x = jnp.asarray(np.random.RandomState(0).randn(2, 112, 112, 3), jnp.float32)
    out, _ = m.module.apply(v, x, training=True,
                            rngs={"dropout": jax.random.PRNGKey(1)},
                            mutable=["batch_stats"])
    assert np.isfinite(np.asarray(out)).all()
