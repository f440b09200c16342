"""Bias-added softmax attention: the FasterViT hot path.

Both attention sites in the model — the joint window+carrier MHSA
(reference faster_vit.py:557-568) and the carrier-token global MHSA
(faster_vit.py:679) — are softmax(q k^T * scale + bias) v with a per-head
dense bias. This module is the single dispatch point: a pure-jnp reference
(obviously correct, used for tests and as the autodiff fallback) and the
fused Pallas TPU kernel (fastervit_tpu.ops.pallas_attention).

Shapes: q, k, v are (B, H, S, D); bias is (H, S, S); output is (B, H, S, D).
B is batch*num_windows, S is window_tokens(+carrier_tokens), so S is small
(53..2308 across the model family) while B is large — the Pallas kernel
tiles over B and keeps each (S, S) attention matrix resident in VMEM.
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

# Default implementation, override per-call or via set_default_impl.
_DEFAULT_IMPL = "auto"


def set_default_impl(impl: str) -> None:
    global _DEFAULT_IMPL
    assert impl in ("auto", "jnp", "pallas", "flash")
    _DEFAULT_IMPL = impl


def _on_tpu() -> bool:
    try:
        return jax.devices()[0].platform == "tpu"
    except Exception:  # pragma: no cover
        return False


def bias_attention_reference(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray,
                             bias: jnp.ndarray, scale: float,
                             attn_drop: float = 0.0,
                             deterministic: bool = True,
                             dropout_rng: Optional[jax.Array] = None) -> jnp.ndarray:
    """Naive jnp implementation (materializes the (B, H, S, S) logits)."""
    attn = jnp.einsum("bhsd,bhtd->bhst", q, k) * scale
    attn = attn + bias[None]
    attn = jax.nn.softmax(attn, axis=-1)
    if attn_drop > 0.0 and not deterministic:
        keep = 1.0 - attn_drop
        mask = jax.random.bernoulli(dropout_rng, keep, attn.shape)
        attn = jnp.where(mask, attn / keep, 0.0)
    return jnp.einsum("bhst,bhtd->bhsd", attn, v)


def _resolve_impl(impl: str, can_fuse: bool) -> str:
    if impl == "auto":
        impl = _DEFAULT_IMPL
    if impl == "auto":
        impl = "pallas" if (_on_tpu() and can_fuse) else "jnp"
    return impl


def window_mhsa(qkv: jnp.ndarray, bias: jnp.ndarray, num_heads: int,
                scale: float, *, attn_drop: float = 0.0,
                deterministic: bool = True, dropout_rng=None,
                impl: str = "auto") -> jnp.ndarray:
    """Multi-head attention over per-window sequences, straight from the qkv
    projection output. qkv: (B, S, 3C) (channel layout (3, H, hd)); bias:
    (H, S, S). Returns (B, S, C) context — the model's hot path."""
    impl = _resolve_impl(impl, can_fuse=(attn_drop == 0.0 or deterministic))
    if impl in ("pallas", "flash"):
        b, s, c3 = qkv.shape
        from fastervit_tpu.ops.pallas_attention import (fused_window_mhsa,
                                                        packed_supported)
        if impl == "pallas" and packed_supported(b, s, c3 // 3, num_heads,
                                                 qkv.dtype.itemsize):
            return fused_window_mhsa(qkv, bias, num_heads, scale)
        # large-window shapes (21k-384/512/768): VMEM-safe Q-tiled kernel.
        # Under bf16 compute, stream the bias in bf16 too — it is the
        # largest per-tile operand; the kernel accumulates logits in f32
        # either way (ATTN_VPU_PROBE.json: 8.51 -> 8.20 ms at S=2304).
        from fastervit_tpu.ops.pallas_flash_attention import flash_window_mhsa
        if qkv.dtype == jnp.bfloat16:
            bias = bias.astype(jnp.bfloat16)
        return flash_window_mhsa(qkv, bias, num_heads, scale)
    b, s, c3 = qkv.shape
    hd = c3 // 3 // num_heads
    parts = qkv.reshape(b, s, 3, num_heads, hd).transpose(2, 0, 3, 1, 4)
    ctx = bias_attention_reference(parts[0], parts[1], parts[2], bias, scale,
                                   attn_drop, deterministic, dropout_rng)
    return ctx.transpose(0, 2, 1, 3).reshape(b, s, c3 // 3)


def bias_attention(q, k, v, bias, scale, *, attn_drop: float = 0.0,
                   deterministic: bool = True, dropout_rng=None,
                   impl: str = "auto") -> jnp.ndarray:
    impl = _resolve_impl(impl, can_fuse=(attn_drop == 0.0 or deterministic))
    if impl in ("pallas", "flash"):
        bq, h, s, d = q.shape
        from fastervit_tpu.ops.pallas_attention import (fused_bias_attention,
                                                        packed_supported)
        if impl == "flash" or not packed_supported(bq, s, h * d, h,
                                                   q.dtype.itemsize):
            from fastervit_tpu.ops.pallas_flash_attention import (
                flash_window_mhsa)
            pack = jnp.stack([q, k, v], axis=0)
            qkv = pack.transpose(1, 3, 0, 2, 4).reshape(bq, s, 3 * h * d)
            # same bf16 bias streaming as window_mhsa's flash path
            if qkv.dtype == jnp.bfloat16:
                bias = bias.astype(jnp.bfloat16)
            out = flash_window_mhsa(qkv, bias, h, scale)
            return out.reshape(bq, s, h, d).transpose(0, 2, 1, 3)
        return fused_bias_attention(q, k, v, bias, scale)
    return bias_attention_reference(q, k, v, bias, scale, attn_drop,
                                    deterministic, dropout_rng)
