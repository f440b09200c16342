"""Fused bias-attention Pallas TPU kernel (placeholder — falls back to jnp).

Real kernel lands next: grid over batch*windows, (S, S) logits resident in
VMEM, bias tile shared across the batch grid dimension.
"""
from __future__ import annotations

from fastervit_tpu.ops.attention import bias_attention_reference


def fused_bias_attention(q, k, v, bias, scale):
    return bias_attention_reference(q, k, v, bias, scale)
