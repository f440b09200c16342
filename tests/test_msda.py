"""MSDA vs a torch grid_sample oracle (the reference's own test strategy:
dino/models/dino/ops/test.py:32-86 — forward allclose in double/float +
gradient checks across channel sizes)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fastervit_tpu.ops.msda import ms_deform_attn

SHAPES = [(6, 4), (3, 2)]  # two pyramid levels


def _torch_oracle(value, shapes, loc, weights):
    """Reimplementation of ms_deform_attn_core_pytorch
    (ops/functions/ms_deform_attn_func.py:41-61) against torch's own
    grid_sample."""
    import torch
    import torch.nn.functional as F
    value = torch.from_numpy(value)
    loc = torch.from_numpy(loc)
    weights = torch.from_numpy(weights)
    n, s, m, d = value.shape
    _, q, _, l, p, _ = loc.shape
    value_list = value.split([h * w for h, w in shapes], dim=1)
    grids = 2 * loc - 1
    sampled = []
    for lid, (h, w) in enumerate(shapes):
        v = value_list[lid].flatten(2).transpose(1, 2).reshape(n * m, d, h, w)
        g = grids[:, :, :, lid].transpose(1, 2).flatten(0, 1)
        sampled.append(F.grid_sample(v, g, mode="bilinear",
                                     padding_mode="zeros",
                                     align_corners=False))
    weights = weights.transpose(1, 2).reshape(n * m, 1, q, l * p)
    out = (torch.stack(sampled, dim=-2).flatten(-2) * weights).sum(-1)
    return out.view(n, m * d, q).transpose(1, 2).contiguous().numpy()


def _make(n=2, q=5, m=2, d=4, p=3, seed=0, dtype=np.float64):
    rng = np.random.RandomState(seed)
    s = sum(h * w for h, w in SHAPES)
    value = rng.randn(n, s, m, d).astype(dtype)
    # include out-of-range locations to exercise zero padding
    loc = rng.uniform(-0.2, 1.2, (n, q, m, len(SHAPES), p, 2)).astype(dtype)
    w = rng.rand(n, q, m, len(SHAPES), p).astype(dtype)
    w /= w.reshape(n, q, m, -1).sum(-1)[..., None, None]
    return value, loc, w


@pytest.mark.parametrize("dtype", [np.float64, np.float32])
def test_forward_matches_torch_grid_sample(dtype):
    value, loc, w = _make(dtype=dtype)
    want = _torch_oracle(value, SHAPES, loc, w)
    if dtype == np.float64:
        jax.config.update("jax_enable_x64", True)
    try:
        got = np.asarray(ms_deform_attn(jnp.asarray(value), SHAPES,
                                        jnp.asarray(loc), jnp.asarray(w)))
    finally:
        jax.config.update("jax_enable_x64", False)
    tol = 1e-12 if dtype == np.float64 else 1e-5
    np.testing.assert_allclose(got, want, atol=tol, rtol=tol)


@pytest.mark.parametrize("d", [4, 30])
def test_gradients_numerical(d):
    """Finite-difference gradient check (analog of torch.autograd.gradcheck
    in the reference's ops/test.py:63-86)."""
    jax.config.update("jax_enable_x64", True)
    try:
        value, loc, w = _make(n=1, q=2, m=1, d=d, p=2, seed=1)
        val, locj, wj = map(jnp.asarray, (value, loc, w))
        cot = jnp.asarray(np.random.RandomState(2).randn(1, 2, d))

        def f(val, locj, wj):
            return jnp.sum(ms_deform_attn(val, SHAPES, locj, wj) * cot)

        grads = jax.grad(f, argnums=(0, 1, 2))(val, locj, wj)
        eps = 1e-6
        for argi, x in enumerate((val, locj, wj)):
            flat = np.asarray(x, np.float64).ravel()
            g_flat = np.asarray(grads[argi]).ravel()
            idxs = np.random.RandomState(3).choice(flat.size,
                                                   min(12, flat.size),
                                                   replace=False)
            for i in idxs:
                xp, xm = flat.copy(), flat.copy()
                xp[i] += eps
                xm[i] -= eps
                args_p = [val, locj, wj]
                args_m = [val, locj, wj]
                args_p[argi] = jnp.asarray(xp.reshape(x.shape))
                args_m[argi] = jnp.asarray(xm.reshape(x.shape))
                num = (f(*args_p) - f(*args_m)) / (2 * eps)
                np.testing.assert_allclose(g_flat[i], num, atol=1e-4,
                                           rtol=1e-4,
                                           err_msg=f"arg{argi} idx{i}")
    finally:
        jax.config.update("jax_enable_x64", False)


def test_custom_vjp_matches_autodiff():
    """The hand-written backward (scatter-as-matmuls col2im) must equal
    autodiff through the gather forward."""
    from fastervit_tpu.ops.msda import ms_deform_attn_autodiff

    value, loc, w = _make(q=7, dtype=np.float32)
    cot = np.random.RandomState(3).randn(2, 7, 8).astype(np.float32)

    def with_custom(v, l, ww):
        return jnp.sum(ms_deform_attn(v, SHAPES, l, ww) * cot)

    def with_auto(v, l, ww):
        return jnp.sum(ms_deform_attn_autodiff(v, SHAPES, l, ww) * cot)

    ga = jax.grad(with_custom, argnums=(0, 1, 2))(
        jnp.asarray(value), jnp.asarray(loc), jnp.asarray(w))
    gb = jax.grad(with_auto, argnums=(0, 1, 2))(
        jnp.asarray(value), jnp.asarray(loc), jnp.asarray(w))
    for a, b in zip(ga, gb):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=2e-5, rtol=2e-5)


def test_query_chunking_matches_unchunked():
    value, loc, w = _make(q=11, dtype=np.float32)
    a = ms_deform_attn(jnp.asarray(value), SHAPES, jnp.asarray(loc),
                       jnp.asarray(w), query_chunk=None)
    b = ms_deform_attn(jnp.asarray(value), SHAPES, jnp.asarray(loc),
                       jnp.asarray(w), query_chunk=4)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)


def test_query_sharded_msda_matches_unsharded(cpu_devices):
    """Query-axis GSPMD sharding for the encoder gather: value replicated,
    sampling locations/weights (and hence the output) sharded over Q on an
    8-device mesh. This is the TPU-native scaling lever for the MOTR
    streaming encoder (S=102k tokens: the per-index-bound gather splits
    linearly over chips — see MSDA_GATHER_PROBE.json / docs): each device
    gathers its Q/8 slice with no communication beyond the input scatter."""
    from jax.sharding import NamedSharding, PartitionSpec as P
    from fastervit_tpu.parallel.mesh import create_mesh, replicated

    value, loc, w = _make(q=16, dtype=np.float32)
    want = np.asarray(ms_deform_attn(jnp.asarray(value), SHAPES,
                                     jnp.asarray(loc), jnp.asarray(w)))

    mesh = create_mesh(cpu_devices)
    repl = replicated(mesh)
    qsh = NamedSharding(mesh, P(None, "data"))  # (N, Q, ...) -> shard Q
    with mesh:
        fn = jax.jit(
            lambda v, l, ww: ms_deform_attn(v, SHAPES, l, ww),
            in_shardings=(repl, qsh, qsh), out_shardings=qsh)
        got = fn(jnp.asarray(value), jnp.asarray(loc), jnp.asarray(w))
    np.testing.assert_allclose(np.asarray(got), want, atol=1e-6)
