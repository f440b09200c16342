"""Gather-free MSDA forward (ops/msda_rowmix.py): one-hot-matmul bilinear
sampling vs the reference gather math, incl. the window-overflow remainder
path and gradients through the shared custom-VJP backward."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fastervit_tpu.ops import msda
from fastervit_tpu.ops import msda_rowmix as rm
from test_msda_pallas import SHAPES, _case, _ref_gather

pytestmark = pytest.mark.smoke


@pytest.mark.parametrize("order", ["raster", "random"])
def test_rowmix_gather_matches_manual(order):
    """Raster order rides the fast path; random order forces chunks to
    overflow their row window, exercising the lax.cond remainder —
    exactness must not depend on locality."""
    rs = np.random.RandomState(7)
    hp, wp, b, d, p = 70, 9, 2, 8, 2
    qp = 4096                           # > one chunk at _C=2048
    vm = jnp.asarray(rs.randn(b, hp, wp, d), jnp.float32)
    if order == "raster":
        rows = np.sort(rs.randint(0, hp - 1, (b, qp)), axis=1)
    else:
        rows = rs.randint(0, hp - 1, (b, qp))
    iy = jnp.asarray(rows, jnp.int32)
    ix = jnp.asarray(rs.randint(0, wp - 1, (b, qp)), jnp.int32)
    fy = jnp.asarray(rs.rand(b, qp), jnp.float32)
    fx = jnp.asarray(rs.rand(b, qp), jnp.float32)
    w = jnp.asarray(rs.rand(b, qp), jnp.float32)
    got = rm.rowmix_gather(vm, iy, ix, fy, fx, w, p)
    np.testing.assert_allclose(np.asarray(got),
                               _ref_gather(vm, iy, ix, fy, fx, w, p),
                               rtol=1e-5, atol=1e-5)


def test_rowmix_full_map_small_level():
    """Levels with few rows take the whole-map window (no remainder)."""
    rs = np.random.RandomState(8)
    hp, wp, b, d, p = 12, 30, 3, 4, 4
    qp = 64
    vm = jnp.asarray(rs.randn(b, hp, wp, d), jnp.float32)
    iy = jnp.asarray(rs.randint(0, hp - 1, (b, qp)), jnp.int32)
    ix = jnp.asarray(rs.randint(0, wp - 1, (b, qp)), jnp.int32)
    fy = jnp.asarray(rs.rand(b, qp), jnp.float32)
    fx = jnp.asarray(rs.rand(b, qp), jnp.float32)
    w = jnp.asarray(rs.rand(b, qp), jnp.float32)
    got = rm.rowmix_gather(vm, iy, ix, fy, fx, w, p)
    np.testing.assert_allclose(np.asarray(got),
                               _ref_gather(vm, iy, ix, fy, fx, w, p),
                               rtol=1e-5, atol=1e-5)


def test_forward_rowmix_matches_xla_body():
    value, loc, w = _case(12)
    want = msda._msda_body(SHAPES, value, loc, w)
    got = rm.msda_forward_rowmix(SHAPES, value, loc, w)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-6)


def test_rowmix_backend_and_gradients():
    value, loc, w = _case(13)

    def loss(core):
        def f(v, l, wt):
            out = core(SHAPES, v, l, wt)
            return jnp.sum(out * jnp.cos(
                jnp.arange(out.size).reshape(out.shape)))
        return f

    g_xla = jax.grad(loss(msda._msda_core), argnums=(0, 1, 2))(value, loc, w)
    g_rm = jax.grad(loss(msda._msda_core_rowmix),
                    argnums=(0, 1, 2))(value, loc, w)
    for a, b in zip(g_xla, g_rm):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-5)
    prev = msda.set_msda_backend("rowmix")
    try:
        out = msda.ms_deform_attn(value, SHAPES, loc, w)
    finally:
        msda.set_msda_backend(prev)
    np.testing.assert_allclose(
        np.asarray(out),
        np.asarray(msda._msda_body(SHAPES, value, loc, w)),
        rtol=1e-5, atol=1e-6)


def test_rowmix_bf16_value_dtype():
    """bf16 maps (training path) accumulate in f32 and return bf16."""
    value, loc, w = _case(14)
    vb = value.astype(jnp.bfloat16)
    got = rm.msda_forward_rowmix(SHAPES, vb, loc, w)
    assert got.dtype == jnp.bfloat16
    want = msda._msda_body(SHAPES, vb, loc, w)
    np.testing.assert_allclose(np.asarray(got, np.float32),
                               np.asarray(want, np.float32),
                               rtol=2e-2, atol=2e-2)
