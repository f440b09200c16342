"""Pallas fused attention kernel: forward equality + gradients vs the jnp
reference (the reference repo's kernel-testing pattern, dino/models/dino/
ops/test.py:32-86 — forward allclose + gradcheck across sizes)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fastervit_tpu.ops.attention import window_mhsa
from fastervit_tpu.ops.pallas_attention import (_mhsa_reference,
                                                fused_window_mhsa)

# (B, S, heads, head_dim) covering the family's shapes:
# fv0 stage2 joint (53 = 49+4), hat (16), stage3 (49), fv4 hd=49, 21k-384 (576)
CASES = [
    (8, 53, 8, 32),
    (4, 16, 8, 32),
    (8, 49, 16, 32),
    (4, 53, 4, 49),
    (2, 576, 16, 49),
]


def _make(b, s, h, d, seed=0):
    rng = np.random.RandomState(seed)
    qkv = jnp.asarray(rng.randn(b, s, 3 * h * d), jnp.float32)
    bias = jnp.asarray(rng.randn(h, s, s), jnp.float32)
    return qkv, bias


@pytest.mark.parametrize("b,s,h,d", CASES)
def test_forward_matches_reference(b, s, h, d):
    qkv, bias = _make(b, s, h, d)
    scale = d ** -0.5
    got = fused_window_mhsa(qkv, bias, h, scale, True)  # interpret mode on CPU
    want = _mhsa_reference(qkv, bias, h, scale)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=1e-5, rtol=1e-5)


@pytest.mark.parametrize("b,s,h,d", CASES[:3])
def test_gradients_match_reference(b, s, h, d):
    qkv, bias = _make(b, s, h, d, seed=1)
    scale = d ** -0.5
    cot = jnp.asarray(np.random.RandomState(2).randn(b, s, h * d), jnp.float32)

    def loss_fused(qkv, bias):
        return jnp.sum(fused_window_mhsa(qkv, bias, h, scale, True) * cot)

    def loss_ref(qkv, bias):
        return jnp.sum(_mhsa_reference(qkv, bias, h, scale) * cot)

    g_fused = jax.grad(loss_fused, argnums=(0, 1))(qkv, bias)
    g_ref = jax.grad(loss_ref, argnums=(0, 1))(qkv, bias)
    for a, e, name in zip(g_fused, g_ref, ("dqkv", "dbias")):
        np.testing.assert_allclose(np.asarray(a), np.asarray(e),
                                   atol=1e-4, rtol=1e-4, err_msg=name)


def test_window_mhsa_jnp_equals_reference_module_path():
    """The dispatch's jnp path must equal the kernel reference exactly."""
    qkv, bias = _make(4, 53, 8, 32)
    scale = 32 ** -0.5
    a = window_mhsa(qkv, bias, 8, scale, impl="jnp")
    b_ = _mhsa_reference(qkv, bias, 8, scale)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b_), atol=1e-6)
