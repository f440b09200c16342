"""Building-block modules for FasterViT-TPU (flax.linen, NHWC).

TPU-first re-design of the reference blocks
(/root/reference/fastervit/models/faster_vit.py:213-738). Activations are
NHWC so convs hit XLA's preferred layout; position-bias tables are built from
static (trace-time) coordinate grids so only the tiny CPB MLPs run on device;
attention is routed through `fastervit_tpu.ops.attention` so the fused Pallas
kernel and the jnp reference share one call-site.

Numerics notes for weight parity with the PyTorch reference:
* torch nn.GELU is exact-erf GELU -> jax.nn.gelu(..., approximate=False).
* torch BatchNorm2d(momentum=0.1) -> flax BatchNorm(momentum=0.9).
* timm LayerNorm2d (channel LN on NCHW) -> plain LayerNorm on NHWC's last
  axis; timm's default eps is 1e-6 (vs torch LayerNorm 1e-5).
"""
from __future__ import annotations

from typing import Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from fastervit_tpu.ops import attention as attention_ops
from fastervit_tpu.ops.windows import (ct_dewindow, ct_window,
                                       nearest_upsample_tokens)

trunc_normal_init = nn.initializers.truncated_normal(stddev=0.02)


def gelu(x):
    # torch nn.GELU default is the exact erf formulation.
    return jax.nn.gelu(x, approximate=False)


class DropPath(nn.Module):
    """Per-sample stochastic depth (timm DropPath, scale_by_keep=True)."""
    rate: float = 0.0

    @nn.compact
    def __call__(self, x: jnp.ndarray, deterministic: bool = True) -> jnp.ndarray:
        if deterministic or self.rate == 0.0:
            return x
        keep = 1.0 - self.rate
        rng = self.make_rng("dropout")
        shape = (x.shape[0],) + (1,) * (x.ndim - 1)
        mask = jax.random.bernoulli(rng, keep, shape)
        return jnp.where(mask, x / keep, jnp.zeros_like(x))


class Mlp(nn.Module):
    """fc1 -> GELU -> fc2 (reference Mlp, faster_vit.py:370-407)."""
    hidden_features: int
    out_features: int
    drop: float = 0.0
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        x = nn.Dense(self.hidden_features, dtype=self.dtype,
                     kernel_init=trunc_normal_init, name="fc1")(x)
        x = gelu(x)
        if self.drop > 0.0:
            x = nn.Dropout(self.drop)(x, deterministic=deterministic)
        x = nn.Dense(self.out_features, dtype=self.dtype,
                     kernel_init=trunc_normal_init, name="fc2")(x)
        if self.drop > 0.0:
            x = nn.Dropout(self.drop)(x, deterministic=deterministic)
        return x


def _rank2_coords(seq_length: int) -> np.ndarray:
    """Static normalized grid for PosEmbMLPSwinv1D rank-2
    (reference faster_vit.py:354-360; integer-division normalization kept)."""
    g = int(seq_length ** 0.5)
    coords = np.arange(g, dtype=np.float32)
    table = np.stack(np.meshgrid(coords, coords, indexing="ij"))  # (2, g, g)
    table -= g // 2
    table /= g // 2
    return table.reshape(2, -1).T  # (g*g, 2), raster order


def _rank1_coords(seq_length: int) -> np.ndarray:
    coords = np.arange(seq_length, dtype=np.float32)
    coords -= seq_length // 2
    coords /= seq_length // 2
    return coords[:, None]  # (seq, 1)


def _rank2_coords_dynamic(grid_h: int, grid_w: int) -> np.ndarray:
    """Runtime-dynamic downstream variant (dino/motr fastervit.py
    PosEmbMLPSwinv1D.forward): rectangular grid normalized by the *total*
    token count // 2 instead of the grid edge // 2."""
    seq = grid_h * grid_w
    table = np.stack(np.meshgrid(np.arange(grid_h, dtype=np.float32),
                                 np.arange(grid_w, dtype=np.float32),
                                 indexing="ij"))
    table -= seq // 2
    table /= seq // 2
    return table.reshape(2, -1).T


class PosEmbMLPSwinv1D(nn.Module):
    """Absolute position bias: normalized grid -> MLP(rank->512->dim), added to
    tokens (reference PosEmbMLPSwinv1D, faster_vit.py:313-367). The coordinate
    table is a trace-time constant; only the two matmuls run on device.

    `grid` + `norm_by_seq` select the downstream runtime-dynamic variant's
    coordinate convention (dino fastervit.py:176-230)."""
    dim: int
    seq_length: int
    rank: int = 2
    grid: Optional[Tuple[int, int]] = None
    norm_by_seq: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        # deploy mode (reference switch_to_deploy, faster_vit.py:321-330):
        # the additive embedding is a pure function of params, baked into the
        # 'baked' collection by Model.bake_posemb. norm_by_seq (downstream
        # runtime-dynamic geometry) is never baked — its grid varies per call.
        if not self.norm_by_seq and self.has_variable("baked", "pos"):
            return x + self.get_variable("baked", "pos")[None]
        if self.rank == 1:
            coords = _rank1_coords(self.seq_length)
        elif self.norm_by_seq:
            gh, gw = self.grid or (int(self.seq_length ** 0.5),) * 2
            coords = _rank2_coords_dynamic(gh, gw)
        else:
            coords = _rank2_coords(self.seq_length)
        h = nn.Dense(512, dtype=self.dtype, kernel_init=trunc_normal_init,
                     name="fc1")(jnp.asarray(coords, dtype=self.dtype))
        h = nn.relu(h)
        pos = nn.Dense(self.dim, use_bias=False, dtype=self.dtype,
                       kernel_init=trunc_normal_init, name="fc2")(h)
        # written only under an explicit apply(..., mutable=["baked"]) from
        # Model.bake_posemb — never during init, where every collection is
        # mutable and a stale copy would silently shadow trained params
        if (not self.norm_by_seq and not self.is_initializing()
                and self.is_mutable_collection("baked")):
            self.variable("baked", "pos", lambda: pos)
        return x + pos[None]


def _log_cpb_table(window_size: Tuple[int, int],
                   pretrained_window_size: Tuple[int, int],
                   no_log: bool) -> np.ndarray:
    """Static log-spaced relative-coordinate table (SwinV2 CPB,
    reference faster_vit.py:226-241)."""
    wh, ww = window_size
    rel_h = np.arange(-(wh - 1), wh, dtype=np.float32)
    rel_w = np.arange(-(ww - 1), ww, dtype=np.float32)
    table = np.stack(np.meshgrid(rel_h, rel_w, indexing="ij"), axis=-1)  # (2wh-1, 2ww-1, 2)
    pwh, pww = pretrained_window_size
    if pwh > 0:
        table[..., 0] /= (pwh - 1)
        table[..., 1] /= (pww - 1)
    else:
        table[..., 0] /= (wh - 1)
        table[..., 1] /= (ww - 1)
    if not no_log:
        table *= 8.0
        table = np.sign(table) * np.log2(np.abs(table) + 1.0) / np.log2(8.0)
    return table.reshape(-1, 2)


def _relative_position_index(window_size: Tuple[int, int]) -> np.ndarray:
    """Static (S, S) index into the CPB table (reference faster_vit.py:244-254)."""
    wh, ww = window_size
    coords = np.stack(np.meshgrid(np.arange(wh), np.arange(ww), indexing="ij"))
    flat = coords.reshape(2, -1)
    rel = flat[:, :, None] - flat[:, None, :]  # (2, S, S)
    rel = rel.transpose(1, 2, 0).copy()
    rel[:, :, 0] += wh - 1
    rel[:, :, 1] += ww - 1
    rel[:, :, 0] *= 2 * ww - 1
    return rel.sum(-1)  # (S, S) int


def _ct_correct_indices(window_size: int, n_global: int) -> list:
    """Index remap for the ct_correct bias mode (reference faster_vit.py:283-295).
    Unused by the classification variants (WindowAttention never sets it) but
    kept for downstream-backbone parity."""
    step = window_size / (n_global ** 0.5 + 1)
    g = int(n_global ** 0.5)
    return [int((i + 1) * step * window_size + (j + 1) * step)
            for i in range(g) for j in range(g)]


# Fully-fused HAT-block kernel routing. Measured on-chip (BENCH_BISECT.json,
# fv0 b256 bf16, identical protocol): composed math + packed Pallas attention
# = 8537 img/s vs 7520 through the fused block — the monolithic kernel's
# serialization of attention with the MLP matmuls loses to XLA's overlap of
# the composed graph. Off by default; set_fused_hat(True) re-enables for
# probes/regression comparison. (The kernel itself stays tested in
# tests/test_fused_block.py.)
_FUSED_HAT = False


def set_fused_hat(on: bool) -> bool:
    """Enable/disable in-model routing through the fused HAT-block kernel;
    returns the previous setting (probe/test hook).

    NOTE: this flag (like set_bias_expand's) is read at TRACE time and does
    not participate in jax.jit cache keys — flipping it after a function has
    compiled silently reuses the old traced graph. Callers must build a
    fresh jit (or call .clear_cache()) after toggling; the probe scripts do
    (ADVICE r4)."""
    global _FUSED_HAT
    prev, _FUSED_HAT = _FUSED_HAT, bool(on)
    return prev


# Bias materialization strategy: 'auto' switches to the separable one-hot
# matmul expansion for large windows (S >= _SEPARABLE_MIN_S), where the
# gather of S^2 table rows plus the (S, S, H) -> (H, S, S) transpose costs
# ~11 ms/block at the 21k-768 level_2 geometry (BLOCK_DECOMP_PROBE.json);
# the matmul form is ~17 GFLOP there and rides the MXU instead.
_BIAS_EXPAND = "auto"      # 'auto' | 'gather' | 'separable'
_SEPARABLE_MIN_S = 1024


def set_bias_expand(mode: str) -> str:
    """Select how PosEmbMLPSwinv2D expands its CPB table into the dense
    (H, S, S) bias; returns the previous mode (probe/test hook)."""
    global _BIAS_EXPAND
    assert mode in ("auto", "gather", "separable"), mode
    prev, _BIAS_EXPAND = _BIAS_EXPAND, mode
    return prev


def _delta_onehot(n: int, dtype) -> jnp.ndarray:
    """(n, n, 2n-1) constant with [p, q, a] = 1 iff p - q + n - 1 == a."""
    p = np.arange(n)[:, None, None]
    q = np.arange(n)[None, :, None]
    a = np.arange(2 * n - 1)[None, None, :]
    return jnp.asarray((p - q + n - 1) == a, dtype=dtype)


class PosEmbMLPSwinv2D(nn.Module):
    """SwinV2-style continuous relative position bias, returned as a dense
    (num_heads, seq, seq) matrix (reference PosEmbMLPSwinv2D, faster_vit.py:213-310).

    The reference adds the bias to the attention logits inside the module; here
    the module *produces* the bias so the attention kernel (jnp or Pallas) can
    consume it as an operand, and so deploy-mode baking is a pure function of
    params.
    """
    window_size: Tuple[int, int]
    pretrained_window_size: Tuple[int, int]
    num_heads: int
    seq_length: int
    ct_correct: bool = False
    no_log: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self) -> jnp.ndarray:
        # deploy mode (reference switch_to_deploy, faster_vit.py:263-264):
        # the dense bias is a pure function of params; Model.bake_posemb
        # stores it in the 'baked' collection so serving skips the per-block
        # table MLP + expansion (~1.6 ms/block at the 21k-768 level_2
        # geometry, CPB_EXPAND_PROBE.json) and reads the tensor instead.
        if self.has_variable("baked", "bias"):
            return self.get_variable("baked", "bias")
        bias = self._compute_bias()
        # see PosEmbMLPSwinv1D: only Model.bake_posemb's mutable apply writes
        if not self.is_initializing() and self.is_mutable_collection("baked"):
            self.variable("baked", "bias", lambda: bias)
        return bias

    def _compute_bias(self) -> jnp.ndarray:
        table_coords = _log_cpb_table(self.window_size, self.pretrained_window_size,
                                      self.no_log)
        h = nn.Dense(512, dtype=self.dtype, kernel_init=trunc_normal_init,
                     name="fc1")(jnp.asarray(table_coords, dtype=self.dtype))
        h = nn.relu(h)
        table = nn.Dense(self.num_heads, use_bias=False, dtype=self.dtype,
                         kernel_init=trunc_normal_init, name="fc2")(h)
        wh, ww = self.window_size
        s_local = wh * ww
        # sigmoid commutes with the table -> bias expansion (both expansions
        # below select single table entries), so apply it on the tiny table.
        table = 16.0 * jax.nn.sigmoid(table)
        mode = _BIAS_EXPAND
        if mode == "auto":
            mode = ("separable" if s_local >= _SEPARABLE_MIN_S else "gather")
        if mode == "separable":
            # bias[h, (rp,cp), (rq,cq)] = T[rp-rq+wh-1, cp-cq+ww-1, h] is
            # block-Toeplitz in the 2D relative offsets, so the S^2-row
            # gather factorizes into two one-hot contractions that run on
            # the MXU and write the (H, S, S) layout directly — no 340 MB
            # gather output + transpose at the 21k-768 level_2 geometry.
            t3 = table.reshape(2 * wh - 1, 2 * ww - 1, self.num_heads)
            ohr = _delta_onehot(wh, table.dtype)
            ohc = _delta_onehot(ww, table.dtype)
            m1 = jnp.einsum("pqa,abh->pqbh", ohr, t3,
                            preferred_element_type=jnp.float32)
            bias = jnp.einsum("xyb,pqbh->hpxqy", ohc,
                              m1.astype(table.dtype),
                              preferred_element_type=jnp.float32)
            bias = bias.astype(table.dtype).reshape(
                self.num_heads, s_local, s_local)
        else:
            rel_idx = _relative_position_index(self.window_size)
            bias = table[rel_idx.reshape(-1)].reshape(
                s_local, s_local, self.num_heads)
            bias = bias.transpose(2, 0, 1)  # (H, S, S)
        n_global = self.seq_length - s_local
        if n_global <= 0:
            return bias
        if not self.ct_correct:
            # zero-pad carrier-token rows/cols at the top-left (faster_vit.py:296-299)
            return jnp.pad(bias, ((0, 0), (n_global, 0), (n_global, 0)))
        idx = np.asarray(_ct_correct_indices(self.window_size[0], n_global))
        lefttop = bias[:, idx][:, :, idx]
        top = bias[:, idx, :]
        left = bias[:, :, idx]
        out = jnp.zeros((self.num_heads, self.seq_length, self.seq_length),
                        dtype=bias.dtype)
        out = out.at[:, :n_global, :n_global].set(lefttop)
        out = out.at[:, :n_global, n_global:].set(top)
        out = out.at[:, n_global:, :n_global].set(left)
        return out


class _DenseParams(nn.Module):
    """Declare Dense-compatible params without computing (for fused kernels);
    names/shapes/init identical to nn.Dense so variables interchange with the
    composed path."""
    din: int
    dout: int
    use_bias: bool = True

    @nn.compact
    def __call__(self):
        k = self.param("kernel", trunc_normal_init, (self.din, self.dout))
        b = (self.param("bias", nn.initializers.zeros, (self.dout,))
             if self.use_bias else jnp.zeros((self.dout,), k.dtype))
        return k, b


class _LayerNormParams(nn.Module):
    dim: int

    @nn.compact
    def __call__(self):
        s = self.param("scale", nn.initializers.ones, (self.dim,))
        b = self.param("bias", nn.initializers.zeros, (self.dim,))
        return s, b


class _AttnParams(nn.Module):
    """WindowAttention's parameter set + computed bias, no attention compute."""
    dim: int
    num_heads: int
    resolution: int
    seq_length: int
    qkv_bias: bool = True
    ct_correct: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self):
        qkv = _DenseParams(self.dim, 3 * self.dim, self.qkv_bias, name="qkv")()
        proj = _DenseParams(self.dim, self.dim, True, name="proj")()
        bias = PosEmbMLPSwinv2D(
            window_size=(self.resolution, self.resolution),
            pretrained_window_size=(self.resolution, self.resolution),
            num_heads=self.num_heads, seq_length=self.seq_length,
            ct_correct=self.ct_correct, dtype=self.dtype,
            name="pos_emb_funct")()
        return qkv, proj, bias


class _MlpParams(nn.Module):
    din: int
    hidden: int

    @nn.compact
    def __call__(self):
        return (_DenseParams(self.din, self.hidden, name="fc1")(),
                _DenseParams(self.hidden, self.din, name="fc2")())


class WindowAttention(nn.Module):
    """MHSA over a window (+ prepended carrier tokens) with the CPB bias
    (reference WindowAttention, faster_vit.py:515-568)."""
    dim: int
    num_heads: int
    resolution: int              # attention grid edge (window size or ct grid edge)
    seq_length: int              # full sequence incl. carrier tokens
    qkv_bias: bool = True
    qk_scale: Optional[float] = None
    attn_drop: float = 0.0
    proj_drop: float = 0.0
    ct_correct: bool = False
    dtype: jnp.dtype = jnp.float32
    attn_impl: str = "auto"      # 'auto' | 'jnp' | 'pallas'

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        b, n, c = x.shape
        head_dim = self.dim // self.num_heads
        scale = self.qk_scale or head_dim ** -0.5
        qkv = nn.Dense(self.dim * 3, use_bias=self.qkv_bias, dtype=self.dtype,
                       kernel_init=trunc_normal_init, name="qkv")(x)
        bias = PosEmbMLPSwinv2D(
            window_size=(self.resolution, self.resolution),
            pretrained_window_size=(self.resolution, self.resolution),
            num_heads=self.num_heads, seq_length=self.seq_length,
            ct_correct=self.ct_correct, dtype=self.dtype,
            name="pos_emb_funct")()
        x = attention_ops.window_mhsa(
            qkv, bias, self.num_heads, scale,
            attn_drop=self.attn_drop, deterministic=deterministic,
            dropout_rng=self.make_rng("dropout") if (self.attn_drop > 0.0 and not deterministic) else None,
            impl=self.attn_impl)
        x = nn.Dense(self.dim, dtype=self.dtype, kernel_init=trunc_normal_init,
                     name="proj")(x)
        if self.proj_drop > 0.0:
            x = nn.Dropout(self.proj_drop)(x, deterministic=deterministic)
        return x


class PatchEmbed(nn.Module):
    """Stride-4 conv stem: (conv3x3 s2 -> BN eps1e-4 -> ReLU) x2
    (reference PatchEmbed, faster_vit.py:443-469)."""
    in_dim: int
    dim: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, training: bool = False):
        conv = lambda f, nm: nn.Conv(f, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)),
                                     use_bias=False, dtype=self.dtype, name=nm)
        bn = lambda nm: nn.BatchNorm(use_running_average=not training, momentum=0.9,
                                     epsilon=1e-4, dtype=self.dtype, name=nm)
        x = conv(self.in_dim, "conv1")(x)
        x = nn.relu(bn("norm1")(x))
        x = conv(self.dim, "conv2")(x)
        x = nn.relu(bn("norm2")(x))
        return x


class ConvBlock(nn.Module):
    """Residual conv block: conv3x3 -> BN(1e-5) -> GELU -> conv3x3 -> BN,
    optional layer-scale, DropPath (reference ConvBlock, faster_vit.py:472-512)."""
    dim: int
    drop_path: float = 0.0
    layer_scale: Optional[float] = None
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, training: bool = False, deterministic: bool = True):
        residual = x
        conv = lambda nm: nn.Conv(self.dim, (3, 3), padding=((1, 1), (1, 1)),
                                  use_bias=True, dtype=self.dtype, name=nm)
        bn = lambda nm: nn.BatchNorm(use_running_average=not training, momentum=0.9,
                                     epsilon=1e-5, dtype=self.dtype, name=nm)
        x = gelu(bn("norm1")(conv("conv1")(x)))
        x = bn("norm2")(conv("conv2")(x))
        if self.layer_scale is not None:
            gamma = self.param("gamma", nn.initializers.constant(self.layer_scale),
                               (self.dim,))
            x = x * gamma
        x = DropPath(self.drop_path)(x, deterministic=deterministic)
        return residual + x


class Downsample(nn.Module):
    """LayerNorm2d -> conv3x3 s2 (dim -> 2*dim), reference faster_vit.py:410-440."""
    dim: int
    keep_dim: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype, name="norm")(x)
        out = self.dim if self.keep_dim else 2 * self.dim
        x = nn.Conv(out, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)),
                    use_bias=False, dtype=self.dtype, name="reduction")(x)
        return x


class TokenInitializer(nn.Module):
    """Carrier-token initializer: depthwise conv pos-embed + strided average
    pool to a (ct*srH, ct*srW) grid, then window-grouped flatten
    (reference TokenInitializer, faster_vit.py:704-738 and the rectangular
    any-res form, faster_vit_any_res.py:709-751)."""
    dim: int
    input_resolution: Tuple[int, int]   # padded stage resolution
    window_size: int
    ct_size: int = 1
    raster_output: bool = False         # runtime-dynamic downstream variant
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        hr, wr = self.input_resolution
        pool = []
        for r in (hr, wr):
            out = int(self.ct_size * r / self.window_size)
            stride = int(r / out)
            kernel = r - (out - 1) * stride
            pool.append((kernel, stride))
        x = nn.Conv(self.dim, (3, 3), padding=((1, 1), (1, 1)),
                    feature_group_count=self.dim, use_bias=True,
                    dtype=self.dtype, name="pos_embed")(x)
        x = nn.avg_pool(x, window_shape=(pool[0][0], pool[1][0]),
                        strides=(pool[0][1], pool[1][1]))
        b, hc, wc, c = x.shape
        cs = self.ct_size
        if self.raster_output:
            # downstream variant (dino fastervit.py:567-591): pad the pooled
            # grid to a ct multiple and emit tokens in RASTER order with the
            # grid dims carried alongside
            pad_b = (cs - hc % cs) % cs
            pad_r = (cs - wc % cs) % cs
            if pad_b or pad_r:
                x = jnp.pad(x, ((0, 0), (0, pad_b), (0, pad_r), (0, 0)))
            hp, wp = hc + pad_b, wc + pad_r
            return x.reshape(b, hp * wp, c), (hp, wp)
        ct = x.reshape(b, hc // cs, cs, wc // cs, cs, c)
        ct = ct.transpose(0, 1, 3, 2, 4, 5)  # (B, nWh, nWw, cs, cs, C)
        return ct.reshape(b, hc * wc, c)


class HAT(nn.Module):
    """Hierarchical-Attention block (reference HAT, faster_vit.py:571-701;
    rectangular generalization from faster_vit_any_res.py:571-707).

    Carrier tokens do a global MHSA in raster order, are re-grouped per window,
    concatenated in front of the window tokens for a joint windowed MHSA, then
    split back; the last block can propagate ct into the feature map."""
    dim: int
    num_heads: int
    sr_ratio: Tuple[int, int]
    window_size: int
    ct_size: int
    mlp_ratio: float = 4.0
    qkv_bias: bool = True
    qk_scale: Optional[float] = None
    drop: float = 0.0
    attn_drop: float = 0.0
    drop_path: float = 0.0
    layer_scale: Optional[float] = None
    last: bool = False
    do_propagation: bool = False
    dynamic_mode: bool = False   # downstream runtime-dynamic variant (dino/motr)
    quantized: bool = False      # int8 serving (ops/quant.py): composed path only
    dtype: jnp.dtype = jnp.float32
    attn_impl: str = "auto"

    @property
    def do_sr_hat(self) -> bool:
        return self.sr_ratio[0] > 1 or self.sr_ratio[1] > 1

    @property
    def square(self) -> bool:
        return self.sr_ratio[0] == self.sr_ratio[1]

    def _sub_block(self, x, names, resolution, seq_length, g_attn, g_mlp,
                   dp, deterministic):
        """One pre-LN attention+MLP residual pair — used for both the
        carrier-token section (hat_*) and the joint windowed section. Routes
        through the fully-fused Pallas block when eligible (deterministic, no
        attention/proj dropout, weights fit VMEM, pallas backend)."""
        from fastervit_tpu.ops.pallas_hat_block import (fused_block_supported,
                                                        fused_hat_block)
        n1, attn_name, n2, mlp_name = names
        mlp_hidden = int(self.dim * self.mlp_ratio)
        head_dim = self.dim // self.num_heads
        scale = self.qk_scale or head_dim ** -0.5
        impl = attention_ops._resolve_impl(self.attn_impl, can_fuse=True)
        # pallas path covers training too: DropPath becomes per-row
        # residual-branch scales (dropout rates are 0.0 throughout the
        # family's recipes, so only drop_path matters). Measured on v5e
        # (fv0, b128, bf16): training goes through the composed reference
        # with the packed Pallas attention (2638 img/s) — the fully-fused
        # kernel's recompute VJP is slower (2151). Inference also routes
        # composed by default since round 4 (BENCH_BISECT.json: 8537 vs
        # 7520 img/s); set_fused_hat(True) restores the monolithic kernel.
        # int8 serving reads kernel_q via the Dense/Conv interceptor, which
        # the fused kernel's raw-param path would bypass.
        use_fused = (impl == "pallas" and not self.quantized
                     and self.drop == 0.0 and self.attn_drop == 0.0)
        if use_fused:
            dp1 = dp2 = None
            if not deterministic and self.drop_path > 0.0:
                keep = 1.0 - self.drop_path
                rng1, rng2 = jax.random.split(self.make_rng("dropout"))
                b = x.shape[0]
                dp1 = jax.random.bernoulli(rng1, keep, (b,)).astype(
                    jnp.float32) / keep
                dp2 = jax.random.bernoulli(rng2, keep, (b,)).astype(
                    jnp.float32) / keep
            (qkv_w, qkv_b), (proj_w, proj_b), bias = _AttnParams(
                self.dim, self.num_heads, resolution, seq_length,
                self.qkv_bias, dtype=self.dtype, name=attn_name)()
            ln1_s, ln1_b = _LayerNormParams(self.dim, name=n1)()
            ln2_s, ln2_b = _LayerNormParams(self.dim, name=n2)()
            (fc1_w, fc1_b), (fc2_w, fc2_b) = _MlpParams(
                self.dim, mlp_hidden, name=mlp_name)()
            ones = jnp.ones((self.dim,), jnp.float32)
            cd = self.dtype
            params = {
                "ln1_scale": ln1_s, "ln1_bias": ln1_b,
                "qkv_w": qkv_w.astype(cd), "qkv_b": qkv_b,
                "proj_w": proj_w.astype(cd), "proj_b": proj_b,
                "gamma3": g_attn if not isinstance(g_attn, float) else ones,
                "ln2_scale": ln2_s, "ln2_bias": ln2_b,
                "fc1_w": fc1_w.astype(cd), "fc1_b": fc1_b,
                "fc2_w": fc2_w.astype(cd), "fc2_b": fc2_b,
                "gamma4": g_mlp if not isinstance(g_mlp, float) else ones,
            }
            if (_FUSED_HAT and deterministic
                    and fused_block_supported(x.shape, params,
                                              self.num_heads)):
                interpret = not attention_ops._on_tpu()
                return fused_hat_block(x, params, bias, self.num_heads,
                                       scale, interpret)
            # VMEM overflow (large-C stages of fv3+): composed math but the
            # attention still goes through the packed Pallas kernel
            from fastervit_tpu.ops.pallas_hat_block import hat_block_reference
            return hat_block_reference(x, params, bias, self.num_heads, scale,
                                       attn_impl="pallas"
                                       if attention_ops._on_tpu() else "jnp",
                                       dp1=dp1, dp2=dp2)
        attn_out = WindowAttention(
            self.dim, num_heads=self.num_heads, qkv_bias=self.qkv_bias,
            qk_scale=self.qk_scale, attn_drop=self.attn_drop,
            proj_drop=self.drop, resolution=resolution,
            seq_length=seq_length, dtype=self.dtype, attn_impl=self.attn_impl,
            name=attn_name)(
                nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name=n1)(x),
                deterministic=deterministic)
        x = x + dp(g_attn * attn_out, deterministic=deterministic)
        mlp_out = Mlp(mlp_hidden, self.dim, drop=self.drop, dtype=self.dtype,
                      name=mlp_name)(
            nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name=n2)(x),
            deterministic=deterministic)
        return x + dp(g_mlp * mlp_out, deterministic=deterministic)

    @nn.compact
    def __call__(self, x, ct, deterministic: bool = True):
        b, t, c = x.shape  # b = batch * num_windows
        ws, cs = self.window_size, self.ct_size
        use_ls = self.layer_scale is not None
        ls_init = nn.initializers.constant(self.layer_scale if use_ls else 1.0)
        gamma = lambda nm: (self.param(nm, ls_init, (self.dim,)) if use_ls else 1.0)
        dp = DropPath(self.drop_path, name="drop_path")
        mlp_hidden = int(self.dim * self.mlp_ratio)

        x = PosEmbMLPSwinv1D(self.dim, seq_length=ws * ws, rank=2,
                             grid=(ws, ws), norm_by_seq=self.dynamic_mode,
                             dtype=self.dtype, name="pos_embed")(x)

        cr_per_window = cs * cs if self.do_sr_hat else 0
        grid_dims = None
        if self.dynamic_mode and isinstance(ct, tuple):
            ct, grid_dims = ct

        if self.do_sr_hat:
            bg, ng, cg = ct.shape
            if grid_dims is not None:
                gh, gw = grid_dims
            else:
                gh, gw = cs * self.sr_ratio[0], cs * self.sr_ratio[1]
            cr_total = gh * gw
            g1, g2 = gamma("gamma1"), gamma("gamma2")

            ct = ct_dewindow(ct, gh, gw, cs)
            if self.square or self.dynamic_mode:
                ct = PosEmbMLPSwinv1D(self.dim, seq_length=cr_total, rank=2,
                                      grid=(gh, gw),
                                      norm_by_seq=self.dynamic_mode,
                                      dtype=self.dtype, name="hat_pos_embed")(ct)
            hat_dp = DropPath(self.drop_path, name="hat_drop_path")
            ct = self._sub_block(ct, ("hat_norm1", "hat_attn", "hat_norm2",
                                      "hat_mlp"), int(cr_total ** 0.5),
                                 cr_total, g1, g2, hat_dp, deterministic)

            ct = ct_window(ct, gh, gw, cs)
            ct_per_win = ct.reshape(b, cr_per_window, c)
            x = jnp.concatenate([ct_per_win, x], axis=1)

        # joint windowed attention over (ct + window) tokens
        g3, g4 = gamma("gamma3"), gamma("gamma4")
        x = self._sub_block(x, ("norm1", "attn", "norm2", "mlp"), ws,
                            ws * ws + cr_per_window, g3, g4, dp, deterministic)

        if self.do_sr_hat:
            ctr, x = x[:, :cr_per_window], x[:, cr_per_window:]
            ct = ctr.reshape(bg, ng, cg)
            if self.last and self.do_propagation:
                # upsample each window's ct patch into its window tokens
                # (reference faster_vit.py:697-700; fp32 cast kept for parity)
                up = nearest_upsample_tokens(ctr.astype(jnp.float32), cs, ws)
                x = x + g1 * up.astype(x.dtype)
        if self.dynamic_mode:
            return x, (ct, grid_dims)
        return x, ct
