"""Int8 serving path: weight-static / activation-dynamic quantization.

TPU v5e executes s8 x s8 -> s32 matmuls and convolutions on the MXU at 2x
the bf16 rate (394 vs 197 TOPS peak), and int8 weights halve the HBM
parameter traffic — the lever for the largest family members (fv5/fv6,
dims 320..2560) whose bf16 inference sits at the chip's matmul ceiling
(see ROOFLINE.json: 47-49% MFU). The reference's deployment story is
TensorRT (README.md:33,46), which applies exactly this class of
quantization on A100; this module is the TPU-native counterpart.

Scheme (standard dynamic int8, no calibration data needed):
* weights: symmetric per-output-channel int8, quantized once offline
  (`quantize_variables`), stored as `kernel_q` (int8) + `kernel_scale`
  (f32, one per output channel) in place of `kernel`;
* activations: symmetric dynamic quantization at runtime — per-token
  (last-axis) scales for Dense inputs, per-tensor for Conv inputs;
* accumulation in int32 on the MXU, dequantized as
  `y = (xq @ wq) * x_scale * w_scale + bias` in the model dtype.

What is quantized: every Dense/Conv kernel with fan-in >= `min_fan_in`
(64) except depthwise convs (I==1: VPU-bound, 9-wide fan-in), the
position-bias MLPs (`pos_emb*`/`hat_pos_embed`: they produce the bias
*tables*, trace-time-cheap but accuracy-critical), and the classifier
head (negligible FLOPs, keeps full logit fidelity). Attention itself
(q k^T, p v) stays bf16 through the Pallas kernels — at the family's
window sizes those are a small fraction of the FLOPs (for fv6 stage 3,
MLP+qkv+proj = 12 D^2 per token vs 2 S D attention, S=49+4).

Integration is a flax call interceptor (`quantized_call`): `nn.Dense` /
`nn.Conv` modules whose bound params carry `kernel_q` are redirected to
the int8 compute; everything else (BatchNorm, LayerNorm, pooling, the
skipped layers) runs unchanged. The fused Pallas HAT block reads raw
f32 kernels, so quantized models set `quantized=True` on the module
tree (models/fastervit.py), which routes HAT through the composed path
(packed Pallas attention on dequantized bf16 qkv).
"""
from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

# Never-quantized layers (accuracy-critical or tiny), matched per path
# segment: exact segment names in SKIP_SEGMENTS, segment prefixes in
# SKIP_SEGMENT_PREFIXES ("pos_emb" covers pos_embed / pos_emb_funct /
# hat_pos_embed). Segment matching (not substring-of-joined-path) so a
# future module merely *containing* "head" (e.g. "head_mixer") is not
# silently excluded. "ref_point_head" (detection decoder query-position
# MLP, tiny and geometry-critical) is skipped explicitly; the boundary is
# pinned by tests/test_quant.py::test_skip_list_module_boundaries.
SKIP_SEGMENTS = ("head", "ref_point_head")
SKIP_SEGMENT_PREFIXES = ("pos_emb", "hat_pos_embed")
MIN_FAN_IN = 64


def quantize_kernel(kernel: jnp.ndarray):
    """Symmetric per-output-channel int8: kernel (..., O) -> (int8, (O,) f32)."""
    reduce_axes = tuple(range(kernel.ndim - 1))
    amax = jnp.max(jnp.abs(kernel), axis=reduce_axes)
    scale = jnp.maximum(amax, 1e-8) / 127.0
    kq = jnp.clip(jnp.round(kernel / scale), -127, 127).astype(jnp.int8)
    return kq, scale.astype(jnp.float32)


def _eligible(path_names, kernel) -> bool:
    for seg in path_names:
        s = seg.lower()
        if s in SKIP_SEGMENTS or s.startswith(SKIP_SEGMENT_PREFIXES):
            return False
    if kernel.ndim == 2:
        return kernel.shape[0] >= MIN_FAN_IN
    if kernel.ndim == 4:  # HWIO
        kh, kw, i, _ = kernel.shape
        if i == 1:  # depthwise
            return False
        return kh * kw * i >= MIN_FAN_IN
    return False


def quantize_variables(variables, verbose: bool = False):
    """Replace eligible `kernel` leaves in the params collection with
    `kernel_q` + `kernel_scale`. Other collections (batch_stats) pass
    through. Run once offline; the result is the serving checkpoint.

    With verbose=True, logs every kernel that was *skipped* (and why) so
    quantization coverage is auditable rather than a surprise."""

    import logging
    from collections.abc import Mapping

    log = logging.getLogger(__name__)
    skipped = []

    def walk(tree, path):
        if not isinstance(tree, Mapping):
            return tree
        out = {}
        for k, v in tree.items():
            if k == "kernel" and hasattr(v, "ndim"):
                if _eligible(path, v):
                    kq, scale = quantize_kernel(jnp.asarray(v, jnp.float32))
                    out["kernel_q"] = kq
                    out["kernel_scale"] = scale
                    continue
                skipped.append("/".join(path))
            out[k] = walk(v, path + (k,))
        return out

    result = {coll: (walk(tree, ()) if coll == "params" else tree)
              for coll, tree in variables.items()}
    if skipped:
        msg = ("int8: %d kernels left in full precision: %s"
               % (len(skipped), ", ".join(skipped)))
        print(msg) if verbose else log.info(msg)
    return result


def _act_scale(absx: jnp.ndarray, axis, clip_percentile: Optional[float]):
    """Symmetric activation scale: max|x| by default, or a percentile of
    |x| (e.g. 99.9) — the standard fallback for trained checkpoints whose
    activations carry outlier channels, where a single extreme value
    otherwise swallows the whole int8 range (quantization noise on every
    other channel). Out-of-range values saturate at +/-127."""
    if clip_percentile is None:
        amax = jnp.max(absx, axis=axis, keepdims=axis is not None)
        return jnp.maximum(amax, 1e-8) / 127.0
    q = jnp.quantile(absx.astype(jnp.float32), clip_percentile / 100.0,
                     axis=axis, keepdims=axis is not None)
    return jnp.maximum(q, 1e-8) / 127.0


def int8_dense(x: jnp.ndarray, kernel_q: jnp.ndarray,
               kernel_scale: jnp.ndarray,
               bias: Optional[jnp.ndarray],
               act_clip_percentile: Optional[float] = None) -> jnp.ndarray:
    """y = dequant(quant_token(x) @ kernel_q) + bias, MXU int32 accumulate.

    Per-token activation scales: x (..., K) -> scales (..., 1)."""
    out_dtype = x.dtype
    xf = x.astype(jnp.float32)
    xs = _act_scale(jnp.abs(xf), -1, act_clip_percentile)
    xq = jnp.clip(jnp.round(xf / xs), -127, 127).astype(jnp.int8)
    y = jax.lax.dot_general(
        xq, kernel_q,
        dimension_numbers=(((xq.ndim - 1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32)
    y = y.astype(jnp.float32) * xs * kernel_scale
    if bias is not None:
        y = y + bias
    return y.astype(out_dtype)


def int8_conv(x: jnp.ndarray, kernel_q: jnp.ndarray,
              kernel_scale: jnp.ndarray, bias: Optional[jnp.ndarray],
              strides, padding, feature_group_count: int = 1,
              act_clip_percentile: Optional[float] = None) -> jnp.ndarray:
    """NHWC conv with s8 operands, s32 accumulation, per-tensor act scale."""
    out_dtype = x.dtype
    xf = x.astype(jnp.float32)
    xs = _act_scale(jnp.abs(xf), None, act_clip_percentile)
    xq = jnp.clip(jnp.round(xf / xs), -127, 127).astype(jnp.int8)
    y = jax.lax.conv_general_dilated(
        xq, kernel_q, window_strides=tuple(strides), padding=padding,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=feature_group_count,
        preferred_element_type=jnp.int32)
    y = y.astype(jnp.float32) * xs * kernel_scale
    if bias is not None:
        y = y + bias
    return y.astype(out_dtype)


def _normalize_conv_padding(padding, kernel_hw):
    """flax nn.Conv accepts str | int | sequence of int|pair; lax wants
    str or explicit pairs."""
    if isinstance(padding, str):
        return padding
    if isinstance(padding, int):
        return [(padding, padding)] * len(kernel_hw)
    out = []
    for p in padding:
        out.append((p, p) if isinstance(p, int) else tuple(p))
    return out


def _is_default_dilation(d, nspatial: int) -> bool:
    if d is None:
        return True
    if isinstance(d, int):
        return d == 1
    return all(x == 1 for x in d)


def make_quant_interceptor(act_clip_percentile: Optional[float] = None):
    """flax intercept_methods hook factory: route Dense/Conv calls whose
    params hold `kernel_q` to the int8 kernels; pass everything else
    through. act_clip_percentile (e.g. 99.9) switches activation scales
    from max|x| to a percentile — the outlier-channel fallback.

    The int8 kernels implement the *default* Dense/Conv semantics only.
    A module carrying `kernel_q` but configured with dilation, masking, or
    a custom dot_general cannot silently fall through (its params no
    longer hold a full-precision `kernel`), so such configs raise — add
    the layer to SKIP_SEGMENTS before quantize_variables instead."""

    def quant_interceptor(next_fn, args, kwargs, context):
        mod = context.module
        if (context.method_name == "__call__"
                and isinstance(mod, (nn.Dense, nn.Conv))
                and mod.has_variable("params", "kernel_q")):
            p = mod.variables["params"]
            bias = p.get("bias") if mod.use_bias else None
            if isinstance(mod, nn.Dense):
                if getattr(mod, "dot_general", None) is not None:
                    raise NotImplementedError(
                        f"int8 path does not support custom dot_general on "
                        f"quantized Dense {mod.path}; skip this layer at "
                        f"quantize_variables time")
                return int8_dense(args[0], p["kernel_q"], p["kernel_scale"],
                                  bias, act_clip_percentile)
            nsp = len(mod.kernel_size)
            if (not _is_default_dilation(mod.kernel_dilation, nsp)
                    or not _is_default_dilation(mod.input_dilation, nsp)
                    or mod.mask is not None
                    or getattr(mod, "conv_general_dilated", None) is not None):
                raise NotImplementedError(
                    f"int8 path supports only default nn.Conv configs "
                    f"(no dilation/mask/custom conv op); quantized Conv "
                    f"{mod.path} has a non-default config — skip this layer "
                    f"at quantize_variables time")
            strides = mod.strides if mod.strides is not None else 1
            if isinstance(strides, int):
                strides = (strides,) * len(mod.kernel_size)
            padding = _normalize_conv_padding(mod.padding, mod.kernel_size)
            return int8_conv(args[0], p["kernel_q"], p["kernel_scale"], bias,
                             strides, padding, mod.feature_group_count,
                             act_clip_percentile)
        return next_fn(*args, **kwargs)

    return quant_interceptor


# default interceptor (max|x| activation scales), kept as a module-level
# name for existing callers
quant_interceptor = make_quant_interceptor()


def quantized_call(fn, *args, act_clip_percentile: Optional[float] = None,
                   **kwargs):
    """Run `fn` (typically module.apply) with int8 interception active."""
    interceptor = (quant_interceptor if act_clip_percentile is None
                   else make_quant_interceptor(act_clip_percentile))
    with nn.intercept_methods(interceptor):
        return fn(*args, **kwargs)
