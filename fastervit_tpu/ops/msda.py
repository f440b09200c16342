"""Multi-Scale Deformable Attention (MSDA) — TPU-native implementation.

The reference's only native kernel (CUDA im2col forward + 6 hand-written
col2im backward variants, downstream/object_detection/dino/models/dino/ops/
src/cuda/ms_deform_im2col_cuda.cuh:237-1326) behind the pure-torch oracle
`ms_deform_attn_core_pytorch` (ops/functions/ms_deform_attn_func.py:41-61).

TPU design (all verified against the torch oracle in tests/test_msda.py):

* Forward: one `lax.gather` of contiguous (2, 2, D) corner patches per
  (query, level, point) from a zero-padded level map — 4x fewer gathers
  than a per-corner formulation and no masking in the gather path (the
  border padding realizes grid_sample's zero padding). 2.3x faster than
  per-corner take_along_axis at DINO-4scale encoder shapes on v5e.

* Backward: custom VJP. The value gradient is the reference's col2im — a
  bilinear scatter-add — which XLA lowers to a serialized scatter on TPU
  (measured 13 s for ONE encoder-scale fwd+bwd at 640px). Here it is
  reformulated as two separable one-hot matmuls per level: row weights
  A_y (QP, H+2) and column weights A_x (QP, W+2) are built by iota
  comparison (no scatter), and dV = A_yᵀ @ (A_x ⊗ g·w) runs on the MXU,
  chunked over queries to bound memory. Location/attention-weight
  gradients come from a recomputed patch gather.

* Long query axes (the encoder's Q = S self-attention) are processed in
  `query_chunk` slices via lax.map so the forward patch temporaries stay
  bounded (XLA pads their tiny trailing dims 4x in HBM).
"""
from __future__ import annotations

import functools
from typing import Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
from jax import lax

_BWD_CHUNK = 2048      # QP chunk for the backward's one-hot matmuls


def _gather_patches(op: jnp.ndarray, idx: jnp.ndarray, d: int) -> jnp.ndarray:
    """op: (Hp, Wp, D); idx: (Q, 2) int32 (y, x) starts -> (Q, 2, 2, D)."""
    dn = lax.GatherDimensionNumbers(
        offset_dims=(1, 2, 3), collapsed_slice_dims=(),
        start_index_map=(0, 1))
    return lax.gather(op, idx, dn, slice_sizes=(2, 2, d),
                      mode=lax.GatherScatterMode.PROMISE_IN_BOUNDS)


def _compute_dtype(dtype):
    """f32 accumulation for low-precision inputs, f64 preserved under x64."""
    return jnp.promote_types(dtype, jnp.float32)


def _level_geometry(ll: jnp.ndarray, h: int, w: int):
    """Per-level sampling geometry. ll: (N, Q, M, P, 2) normalized (x, y).
    Returns fx, fy (N,Q,M,P,1); valid (N,Q,M,P,1); iy, ix int32 (N,Q,M,P)
    start indices into the padded (h+2, w+2) map."""
    cdt = _compute_dtype(ll.dtype)
    x = ll[..., 0].astype(cdt) * w - 0.5          # align_corners=False
    y = ll[..., 1].astype(cdt) * h - 0.5
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    fx = (x - x0)[..., None]
    fy = (y - y0)[..., None]
    # a patch is representable iff its 2x2 corners fit the padded map;
    # farther-out samples contribute exactly zero
    valid = ((x0 >= -1) & (x0 <= w - 1) & (y0 >= -1)
             & (y0 <= h - 1)).astype(cdt)[..., None]
    ix = jnp.clip(x0.astype(jnp.int32) + 1, 0, w)
    iy = jnp.clip(y0.astype(jnp.int32) + 1, 0, h)
    return fx, fy, valid, iy, ix


def _padded_level_map(v: jnp.ndarray, n: int, h: int, w: int, m: int, d: int):
    """(N, H*W, M, D) -> (N*M, H+2, W+2, D) with a zero border."""
    vm = v.reshape(n, h, w, m, d).transpose(0, 3, 1, 2, 4)
    vm = jnp.pad(vm, ((0, 0), (0, 0), (1, 1), (1, 1), (0, 0)))
    return vm.reshape(n * m, h + 2, w + 2, d)


def _level_patches(vm, iy, ix, n, q, m, p, d):
    """Gather (N,Q,M,P,2,2,D) f32 corner patches from the padded map."""
    idx = jnp.stack([iy, ix], -1).transpose(0, 2, 1, 3, 4)
    idx = idx.reshape(n * m, q * p, 2)
    patches = jax.vmap(functools.partial(_gather_patches, d=d))(vm, idx)
    patches = patches.reshape(n, m, q, p, 2, 2, d)
    return patches.transpose(0, 2, 1, 3, 4, 5, 6).astype(
        _compute_dtype(patches.dtype))


def _bilinear(patches, fx, fy, valid):
    return ((1 - fy) * (1 - fx) * patches[..., 0, 0, :]
            + (1 - fy) * fx * patches[..., 0, 1, :]
            + fy * (1 - fx) * patches[..., 1, 0, :]
            + fy * fx * patches[..., 1, 1, :]) * valid


def _msda_body(spatial_shapes, value, sampling_locations, attention_weights):
    """Non-chunked forward (shared by the custom-vjp primal and the
    autodiff reference path)."""
    n, s, m, d = value.shape
    q = sampling_locations.shape[1]
    p = sampling_locations.shape[4]
    acc = jnp.zeros((n, q, m, d), _compute_dtype(value.dtype))
    start = 0
    for lvl, (h, w) in enumerate(spatial_shapes):
        v = lax.slice_in_dim(value, start, start + h * w, axis=1)
        start += h * w
        vm = _padded_level_map(v, n, h, w, m, d)
        ll = sampling_locations[:, :, :, lvl]           # (N, Q, M, P, 2)
        fx, fy, valid, iy, ix = _level_geometry(ll, h, w)
        patches = _level_patches(vm, iy, ix, n, q, m, p, d)
        interp = _bilinear(patches, fx, fy, valid)
        acc = acc + jnp.sum(
            interp * attention_weights[:, :, :, lvl, :, None].astype(
                interp.dtype), axis=3)                   # (N, Q, M, D)
    assert start == s, (start, s)
    return acc.reshape(n, q, m * d).astype(value.dtype)


def _flat_qp(t, n, m):
    """(N, Q, M, P, ...) -> (N*M, Q*P, ...)."""
    perm = (0, 2, 1, 3) + tuple(range(4, t.ndim))
    t = t.transpose(perm)
    return t.reshape((n * m, -1) + t.shape[4:])


def _scatter_as_matmuls(rows, iy, ix, fy, fx, hp, wp, d):
    """dV[b, y, x, :] = sum_q A_y[b,q,y] * A_x[b,q,x] * rows[b,q,:] without
    any scatter: one-hot row/col weight matrices built by iota comparison,
    contracted on the MXU, accumulated over query chunks by lax.scan.

    rows: (B, QP, D) f32 (already weight- and validity-scaled);
    iy/ix int32, fy/fx f32: (B, QP). Returns (B, hp, wp, D) f32."""
    cdt = rows.dtype
    b, qp, _ = rows.shape
    pad = (-qp) % _BWD_CHUNK
    if pad:
        # padded rows are zero so their (arbitrary) one-hot entries add 0
        rows = jnp.pad(rows, ((0, 0), (0, pad), (0, 0)))
        iy = jnp.pad(iy, ((0, 0), (0, pad)))
        ix = jnp.pad(ix, ((0, 0), (0, pad)))
        fy = jnp.pad(fy, ((0, 0), (0, pad)))
        fx = jnp.pad(fx, ((0, 0), (0, pad)))
    k = (qp + pad) // _BWD_CHUNK

    def chunk(t):
        t = t.reshape((b, k, _BWD_CHUNK) + t.shape[2:])
        return jnp.moveaxis(t, 1, 0)

    io_h = jnp.arange(hp, dtype=jnp.int32)
    io_w = jnp.arange(wp, dtype=jnp.int32)

    def body(carry, args):
        rows_c, iy_c, ix_c, fy_c, fx_c = args
        ay = ((iy_c[..., None] == io_h) * (1.0 - fy_c)[..., None]
              + ((iy_c + 1)[..., None] == io_h) * fy_c[..., None])
        ax = ((ix_c[..., None] == io_w) * (1.0 - fx_c)[..., None]
              + ((ix_c + 1)[..., None] == io_w) * fx_c[..., None])
        t = ax[..., :, None] * rows_c[..., None, :]      # (B, C, Wp, D)
        dv = jnp.einsum("bqh,bqx->bhx", ay,
                        t.reshape(b, _BWD_CHUNK, wp * d),
                        preferred_element_type=cdt)
        return carry + dv.reshape(b, hp, wp, d), None

    init = jnp.zeros((b, hp, wp, d), cdt)
    dv, _ = lax.scan(body, init,
                     tuple(chunk(t) for t in (rows, iy, ix, fy, fx)))
    return dv


@functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def _msda_core(spatial_shapes, value, sampling_locations, attention_weights):
    return _msda_body(spatial_shapes, value, sampling_locations,
                      attention_weights)


def _msda_core_fwd(spatial_shapes, value, loc, w):
    return _msda_body(spatial_shapes, value, loc, w), (value, loc, w)


def _msda_core_bwd(spatial_shapes, res, g):
    value, loc, w = res
    n, s, m, d = value.shape
    q = loc.shape[1]
    p = loc.shape[4]
    cdt = _compute_dtype(value.dtype)
    g4 = g.reshape(n, q, m, d).astype(cdt)
    dval_parts, dloc_parts, dw_parts = [], [], []
    start = 0
    for lvl, (h, wd) in enumerate(spatial_shapes):
        v = lax.slice_in_dim(value, start, start + h * wd, axis=1)
        start += h * wd
        vm = _padded_level_map(v, n, h, wd, m, d)
        ll = loc[:, :, :, lvl]
        fx, fy, valid, iy, ix = _level_geometry(ll, h, wd)
        patches = _level_patches(vm, iy, ix, n, q, m, p, d)

        # attention-weight gradient: dL/dw = <interp, g>
        interp = _bilinear(patches, fx, fy, valid)
        dw_parts.append(jnp.einsum("nqmpd,nqmd->nqmp", interp, g4))

        wl = w[:, :, :, lvl].astype(cdt)                 # (N, Q, M, P)
        gq = g4[:, :, :, None, :] * wl[..., None]        # (N, Q, M, P, D)

        # sampling-location gradient (chain rule through pixel coords:
        # x = loc_x * W - 0.5)
        ddx = ((1 - fy) * (patches[..., 0, 1, :] - patches[..., 0, 0, :])
               + fy * (patches[..., 1, 1, :] - patches[..., 1, 0, :])) * valid
        ddy = ((1 - fx) * (patches[..., 1, 0, :] - patches[..., 0, 0, :])
               + fx * (patches[..., 1, 1, :] - patches[..., 0, 1, :])) * valid
        dx = jnp.sum(gq * ddx, -1) * wd
        dy = jnp.sum(gq * ddy, -1) * h
        dloc_parts.append(jnp.stack([dx, dy], -1))       # (N, Q, M, P, 2)

        # value gradient: separable one-hot matmul "col2im"
        rows = _flat_qp(gq * valid, n, m)                # (NM, QP, D)
        dvm = _scatter_as_matmuls(
            rows, _flat_qp(iy, n, m), _flat_qp(ix, n, m),
            _flat_qp(fy[..., 0], n, m), _flat_qp(fx[..., 0], n, m),
            h + 2, wd + 2, d)
        dv = dvm[:, 1:-1, 1:-1, :].reshape(n, m, h, wd, d)
        dval_parts.append(dv.transpose(0, 2, 3, 1, 4).reshape(n, h * wd, m, d))

    dvalue = jnp.concatenate(dval_parts, axis=1).astype(value.dtype)
    dloc = jnp.stack(dloc_parts, axis=3).astype(loc.dtype)
    dw = jnp.stack(dw_parts, axis=3).astype(w.dtype)
    return dvalue, dloc, dw


_msda_core.defvjp(_msda_core_fwd, _msda_core_bwd)


# --- fused Pallas forward (ops/msda_pallas.py) -------------------------------
# Same math, same custom-vjp backward (the backward re-gathers its own
# patches, so it is forward-implementation agnostic).

_BACKEND = "auto"           # 'auto' | 'xla' | 'pallas' | 'rowmix'
_PALLAS_MIN_Q = 4096        # 'auto' leaves xla below encoder scale


def set_msda_backend(backend: str) -> str:
    """Select the MSDA forward implementation globally. 'xla' is the
    lax.gather path; 'pallas' the fused VMEM-resident kernel
    (ops/msda_pallas.py); 'rowmix' the gather-free one-hot-matmul path
    (ops/msda_rowmix.py — samples become MXU matmuls; pure XLA, so unlike
    pallas it shards under GSPMD). 'auto' picks pallas on single-chip TPU
    for encoder-scale query counts. rowmix stays opt-in: at the level-0
    probe geometry it measured 18.4 ns/sample vs the gather's 16.2 with a
    ~10x compile cost (MSDA_STRIPS_PROBE.json). Returns the previous
    setting."""
    global _BACKEND
    assert backend in ("auto", "xla", "pallas", "rowmix"), backend
    prev, _BACKEND = _BACKEND, backend
    return prev


_TOKEN_SHARDING = None      # (Mesh, axis_name) or None


def set_msda_token_sharding(mesh_axis):
    """Query-axis GSPMD sharding for multi-chip streaming
    (docs/MSDA_CHIP_LIMIT.md's scaling claim): pass (mesh, axis_name) to
    constrain every MSDA call's query-indexed operands (sampling
    locations, attention weights, output) to shard dim 1 over that mesh
    axis while `value` stays replicated — GSPMD then partitions the
    per-query gather so the per-chip indexed-load floor divides by the
    mesh size (each device gathers only its Q/n slice). Pass None to
    clear. Returns the previous setting. Trace-time flag (same caveat as
    set_msda_backend: re-jit after toggling)."""
    global _TOKEN_SHARDING
    prev, _TOKEN_SHARDING = _TOKEN_SHARDING, mesh_axis
    return prev


def _qshard(t: jnp.ndarray) -> jnp.ndarray:
    """Constrain dim 1 (query axis) per set_msda_token_sharding."""
    if _TOKEN_SHARDING is None:
        return t
    from jax.sharding import NamedSharding, PartitionSpec
    mesh, axis = _TOKEN_SHARDING
    spec = PartitionSpec(*([None, axis] + [None] * (t.ndim - 2)))
    return jax.lax.with_sharding_constraint(t, NamedSharding(mesh, spec))


def _resolve_backend(q_total: int) -> str:
    if _BACKEND != "auto":
        return _BACKEND
    # Fused kernel wins at encoder scale (MSDA_PALLAS_PROBE.json e2e:
    # 252 ms vs 320 ms XLA at S=102k, parity 5e-7); at decoder scale the
    # few-query launch overhead isn't worth it. Multi-device processes stay
    # on xla: GSPMD cannot partition the Mosaic custom call, so a sharded
    # train step would replicate (or reject) the kernel. rowmix is opt-in
    # only — probe-slower than the gather at level-0 geometry
    # (MSDA_STRIPS_PROBE.json) pending an in-model win.
    if (jax.default_backend() == "tpu" and q_total >= _PALLAS_MIN_Q
            and jax.device_count() == 1):
        return "pallas"
    return "xla"


@functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def _msda_core_pallas(spatial_shapes, value, sampling_locations,
                      attention_weights):
    from fastervit_tpu.ops.msda_pallas import msda_forward_pallas
    return msda_forward_pallas(
        spatial_shapes, value, sampling_locations, attention_weights,
        interpret=jax.default_backend() != "tpu")


def _msda_core_pallas_fwd(spatial_shapes, value, loc, w):
    return _msda_core_pallas(spatial_shapes, value, loc, w), (value, loc, w)


_BWD_QUERY_CHUNK = 4096


def _msda_core_bwd_chunked(spatial_shapes, res, g):
    """_msda_core_bwd scanned over query chunks. The pallas forward takes
    the full query axis in one call (its kernel chunks internally), so its
    backward would otherwise materialize full-Q (N, Q, M, P, 2, 2, D)
    patch temporaries — ~1.7 GB logical per level at encoder streaming
    Q = 102k (ADVICE r3). Chunking here bounds the backward exactly like
    the lax.map the XLA path gets in ms_deform_attn, with dvalue
    accumulated across chunks."""
    value, loc, w = res
    q = loc.shape[1]
    chunk = _BWD_QUERY_CHUNK
    if q <= chunk:
        return _msda_core_bwd(spatial_shapes, res, g)
    n = value.shape[0]
    pad = (-q) % chunk
    locp = jnp.pad(loc, ((0, 0), (0, pad)) + ((0, 0),) * 4)
    wp = jnp.pad(w, ((0, 0), (0, pad)) + ((0, 0),) * 3)
    gp = jnp.pad(g, ((0, 0), (0, pad), (0, 0)))
    k = (q + pad) // chunk

    def split(t):
        return t.reshape((n, k, chunk) + t.shape[2:]).swapaxes(0, 1)

    cdt = _compute_dtype(value.dtype)

    def body(carry, args):
        lc, wc, gc = args
        dv, dl, dw = _msda_core_bwd(spatial_shapes, (value, lc, wc), gc)
        return carry + dv.astype(cdt), (dl, dw)

    dvalue, (dl, dw) = lax.scan(
        body, jnp.zeros(value.shape, cdt), (split(locp), split(wp), split(gp)))
    dl = dl.swapaxes(0, 1).reshape((n, q + pad) + loc.shape[2:])[:, :q]
    dw = dw.swapaxes(0, 1).reshape((n, q + pad) + w.shape[2:])[:, :q]
    return dvalue.astype(value.dtype), dl, dw


_msda_core_pallas.defvjp(_msda_core_pallas_fwd, _msda_core_bwd_chunked)


@functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def _msda_core_rowmix(spatial_shapes, value, sampling_locations,
                      attention_weights):
    from fastervit_tpu.ops.msda_rowmix import msda_forward_rowmix
    return msda_forward_rowmix(spatial_shapes, value, sampling_locations,
                               attention_weights)


def _msda_core_rowmix_fwd(spatial_shapes, value, loc, w):
    return _msda_core_rowmix(spatial_shapes, value, loc, w), (value, loc, w)


_msda_core_rowmix.defvjp(_msda_core_rowmix_fwd, _msda_core_bwd_chunked)


def ms_deform_attn_autodiff(value, spatial_shapes, sampling_locations,
                            attention_weights):
    """Autodiff-through-scatter path (slow on TPU) — kept as the gradient
    oracle for tests/test_msda.py."""
    return _msda_body(tuple(spatial_shapes), value, sampling_locations,
                      attention_weights)


def ms_deform_attn(value: jnp.ndarray,
                   spatial_shapes: Sequence[Tuple[int, int]],
                   sampling_locations: jnp.ndarray,
                   attention_weights: jnp.ndarray,
                   query_chunk: int = 4096) -> jnp.ndarray:
    """value: (N, S, M, D) with S = sum(H*W); spatial_shapes static;
    sampling_locations: (N, Q, M, L, P, 2) in [0, 1];
    attention_weights: (N, Q, M, L, P) (softmax-normalized over L*P).
    Returns (N, Q, M*D). The forward implementation follows
    set_msda_backend(); the fused pallas path chunks internally, so
    query_chunk only shapes the xla path."""
    shapes = tuple((int(h), int(w)) for h, w in spatial_shapes)
    q_total = sampling_locations.shape[1]
    backend = _resolve_backend(q_total)
    # multi-chip: shard the query-indexed operands (and thus the gather)
    # over the configured mesh axis; value stays replicated
    sampling_locations = _qshard(sampling_locations)
    attention_weights = _qshard(attention_weights)
    if backend == "pallas":
        return _qshard(_msda_core_pallas(shapes, value, sampling_locations,
                                         attention_weights))
    if backend == "rowmix":
        return _qshard(_msda_core_rowmix(shapes, value, sampling_locations,
                                         attention_weights))
    if _TOKEN_SHARDING is not None:
        # Sharding divides the query axis per device, which substitutes
        # for chunking ONLY while the per-device slice stays within the
        # chunk bound (the bound exists to limit full-Q patch temporaries
        # — ~1.7 GB logical per level at streaming Q=102k, ADVICE r3).
        # On a small mesh the slice can still be huge: keep the chunked
        # path then (values are sharding-agnostic; GSPMD may partition
        # the chunks less cleanly, the lesser evil vs HBM OOM —
        # code-review r5).
        mesh, axis = _TOKEN_SHARDING
        axes = axis if isinstance(axis, (tuple, list)) else (axis,)
        ndev = 1
        for a in axes:
            ndev *= mesh.shape[a]
        if query_chunk and q_total // max(ndev, 1) <= query_chunk:
            query_chunk = None
    if query_chunk and q_total > query_chunk:
        n = value.shape[0]
        pad = (-q_total) % query_chunk
        loc = jnp.pad(sampling_locations,
                      ((0, 0), (0, pad)) + ((0, 0),) * 4)
        w = jnp.pad(attention_weights, ((0, 0), (0, pad)) + ((0, 0),) * 3)
        k = (q_total + pad) // query_chunk
        loc = loc.reshape((n, k, query_chunk) + loc.shape[2:]).swapaxes(0, 1)
        w = w.reshape((n, k, query_chunk) + w.shape[2:]).swapaxes(0, 1)
        out = jax.lax.map(
            lambda args: _msda_core(shapes, value, args[0], args[1]),
            (loc, w))
        out = out.swapaxes(0, 1).reshape(n, q_total + pad, -1)
        return _qshard(out[:, :q_total])
    return _qshard(_msda_core(shapes, value, sampling_locations,
                              attention_weights))


def _sampling_offset_bias_init(n_heads: int, n_levels: int, n_points: int):
    """Directional bias init for the sampling-offset head (reference
    ops/modules/ms_deform_attn.py:47-60): head h points along angle
    2πh/n_heads, scaled by point index."""
    import numpy as np

    thetas = np.arange(n_heads, dtype=np.float64) * (2.0 * np.pi / n_heads)
    grid = np.stack([np.cos(thetas), np.sin(thetas)], -1)     # (M, 2)
    grid = grid / np.abs(grid).max(-1, keepdims=True)
    grid = np.tile(grid[:, None, None, :], (1, n_levels, n_points, 1))
    for i in range(n_points):
        grid[:, :, i, :] *= i + 1

    def init(key, shape, dtype=jnp.float32):
        return jnp.asarray(grid.reshape(-1), dtype)

    return init


class MSDeformAttnModule(nn.Module):
    """Deformable-attention layer (reference ops/modules/ms_deform_attn.py:
    30-126): value/offset/weight projections around ms_deform_attn."""
    d_model: int = 256
    n_levels: int = 4
    n_heads: int = 8
    n_points: int = 4
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, query, reference_points, input_flatten, spatial_shapes,
                 padding_mask=None):
        """query: (N, Q, C); reference_points: (N, Q, L, 2) or (N, Q, L, 4)
        normalized; input_flatten: (N, S, C); spatial_shapes: static
        ((H, W), ...); padding_mask: (N, S) bool, True = pad."""
        n, q, _ = query.shape
        s = input_flatten.shape[1]
        m, l, p = self.n_heads, self.n_levels, self.n_points
        value = nn.Dense(self.d_model, dtype=self.dtype, name="value_proj")(
            input_flatten)
        if padding_mask is not None:
            value = jnp.where(padding_mask[..., None], 0.0, value)
        value = value.reshape(n, s, m, self.d_model // m)

        offsets = nn.Dense(m * l * p * 2, dtype=self.dtype,
                           kernel_init=nn.initializers.zeros,
                           bias_init=_sampling_offset_bias_init(m, l, p),
                           name="sampling_offsets")(query)
        offsets = offsets.reshape(n, q, m, l, p, 2)
        weights = nn.Dense(m * l * p, dtype=self.dtype,
                           kernel_init=nn.initializers.zeros,
                           bias_init=nn.initializers.zeros,
                           name="attention_weights")(query)
        weights = jax.nn.softmax(weights.reshape(n, q, m, l * p), axis=-1)
        weights = weights.reshape(n, q, m, l, p)

        if reference_points.shape[-1] == 2:
            wh = jnp.asarray([[wd, ht] for ht, wd in spatial_shapes],
                             self.dtype)                      # (L, 2) as (W, H)
            loc = (reference_points[:, :, None, :, None, :]
                   + offsets / wh[None, None, None, :, None, :])
        elif reference_points.shape[-1] == 4:
            loc = (reference_points[:, :, None, :, None, :2]
                   + offsets / p * reference_points[:, :, None, :, None, 2:]
                   * 0.5)
        else:
            raise ValueError(reference_points.shape)

        out = ms_deform_attn(value, spatial_shapes, loc, weights)
        return nn.Dense(self.d_model, dtype=self.dtype, name="output_proj")(out)
