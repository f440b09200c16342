"""Reference MOTRv2 checkpoint conversion (deformable_transformer_plus
state dict -> MOTRTransformer flax variables).

Mirrors detection/convert.py for the shared layer family; the MOTR
transformer has no two-stage/ref-point-head/CDN machinery, and its
refinement bbox heads are per-layer (with_box_refine,
motr.py:442-447)."""
from __future__ import annotations

import logging
from typing import Any, Dict, Optional, Tuple

import jax
import numpy as np

from fastervit_tpu.detection.convert import _linear, _mha_getter

log = logging.getLogger(__name__)

_LEAF = {"kernel": "weight", "bias": "bias", "scale": "weight",
         "embedding": "weight", "mean": "running_mean",
         "var": "running_var"}


def motr_torch_key(parts: Tuple[str, ...]) -> Optional[str]:
    """flax path inside MOTRTransformer -> torch key (no prefix)."""
    parts = list(parts)
    leaf = parts.pop()
    if not parts:
        return "level_embed" if leaf == "level_embed" else None
    p0 = parts[0]
    if p0.startswith("encoder_"):
        i = p0[len("encoder_"):]
        base = f"encoder.layers.{i}."
        rest = parts[1:]
        if rest[0] == "self_attn":
            return base + f"self_attn.{rest[1]}.{_LEAF[leaf]}"
        if rest[0] == "norm1":
            return base + f"norm1.{_LEAF[leaf]}"
        if rest[0] == "ffn":
            name = "norm2" if rest[1] == "norm" else rest[1]
            return base + f"{name}.{_LEAF[leaf]}"
    if p0.startswith("decoder_"):
        i = p0[len("decoder_"):]
        base = f"decoder.layers.{i}."
        rest = parts[1:]
        if rest[0] == "self_attn":
            return None                          # torch-MHA, custom unpack
        if rest[0] == "cross_attn":
            return base + f"cross_attn.{rest[1]}.{_LEAF[leaf]}"
        if rest[0] in ("norm1", "norm2"):
            return base + f"{rest[0]}.{_LEAF[leaf]}"
        if rest[0] == "ffn":
            name = "norm3" if rest[1] == "norm" else rest[1]
            return base + f"{name}.{_LEAF[leaf]}"
    if p0.startswith("bbox_embed_"):
        i = p0[len("bbox_embed_"):]
        j = parts[1][len("layer_"):]
        return f"decoder.bbox_embed.{i}.layers.{j}.{_LEAF[leaf]}"
    return None


def convert_motr_transformer(state_dict: Dict[str, Any], variables,
                             prefix: str = "") -> Any:
    """Fill MOTRTransformer variables from a torch state dict whose
    transformer keys live under `prefix` (e.g. 'transformer.' for a full
    MOTR checkpoint; bbox heads may live at top level 'bbox_embed.')."""

    def lookup(key):
        v = state_dict.get(prefix + key)
        if v is None and key.startswith("decoder.bbox_embed."):
            v = state_dict.get(key[len("decoder."):])
        return v

    flat = jax.tree_util.tree_flatten_with_path(variables)[0]
    treedef = jax.tree_util.tree_structure(variables)
    leaves, missing = [], []
    for path, init_val in flat:
        parts = tuple(getattr(p, "key", getattr(p, "idx", None))
                      for p in path)[1:]
        target_shape = tuple(np.asarray(init_val).shape)
        if (len(parts) >= 3 and parts[0].startswith("decoder_")
                and parts[1] == "self_attn"):
            i = parts[0][len("decoder_"):]
            base = f"{prefix}decoder.layers.{i}.self_attn."
            arr = _mha_getter(state_dict, base, parts[2], parts[3],
                              target_shape)
            if arr is None:
                missing.append(base + parts[2])
                leaves.append(init_val)
            else:
                leaves.append(np.ascontiguousarray(arr).astype(
                    np.asarray(init_val).dtype))
            continue
        tkey = motr_torch_key(parts)
        val = None if tkey is None else lookup(tkey)
        if val is None:
            missing.append(tkey or "/".join(str(p) for p in parts))
            leaves.append(init_val)
            continue
        arr = val.detach().cpu().numpy() if hasattr(val, "detach") \
            else np.asarray(val)
        if not tkey.endswith("level_embed"):
            arr = _linear(arr, target_shape)
        if arr.shape != target_shape:
            log.warning("shape mismatch %s: %s -> %s (kept init)", tkey,
                        arr.shape, target_shape)
            leaves.append(init_val)
            continue
        leaves.append(np.ascontiguousarray(arr).astype(
            np.asarray(init_val).dtype))
    if missing:
        log.info("convert_motr_transformer: %d params kept init (%s...)",
                 len(missing), missing[:4])
    return jax.tree_util.tree_unflatten(treedef, leaves)


def motr_model_torch_key(parts: Tuple[str, ...]) -> Optional[str]:
    """flax path inside MOTRDetectorExact -> torch MOTR checkpoint key."""
    parts = list(parts)
    leaf = parts.pop()
    if not parts:
        return {"query_embed": "query_embed.weight",
                "position": "position.weight",
                "yolox_embed": "yolox_embed.weight"}.get(leaf)
    head = parts[0]
    if head == "backbone":
        from fastervit_tpu.utils.convert import torch_key_for_path
        return "backbone.0." + torch_key_for_path(tuple(parts[1:] + [leaf]))
    if head.startswith("input_proj_norm_"):
        i = head[len("input_proj_norm_"):]
        return f"input_proj_fastervit.{i}.1.{_LEAF[leaf]}"
    if head.startswith("input_proj_"):
        i = head[len("input_proj_"):]
        return f"input_proj_fastervit.{i}.0.{_LEAF[leaf]}"
    if head.startswith("class_embed_"):
        i = head[len("class_embed_"):]
        return f"class_embed.{i}.{_LEAF[leaf]}"
    if head == "qim":
        rest = parts[1:]
        if rest and rest[0] == "self_attn":
            return None                          # torch-MHA, custom unpack
        name = rest[0] if rest else leaf
        return f"track_embed.{name}.{_LEAF[leaf]}"
    if head == "transformer":
        sub = motr_torch_key(tuple(parts[1:] + [leaf]))
        return None if sub is None else "transformer." + sub
    return None


def convert_motr_checkpoint(state_dict: Dict[str, Any], variables) -> Any:
    """Fill MOTRDetectorExact (or MOTRDetectorExact + QIMv2) variables from
    a reference MOTR checkpoint (lenient: unmatched params keep init)."""

    def lookup(key):
        v = state_dict.get(key)
        if v is None and key.startswith("transformer.decoder.bbox_embed."):
            v = state_dict.get("bbox_embed."
                               + key[len("transformer.decoder.bbox_embed."):])
        return v

    flat = jax.tree_util.tree_flatten_with_path(variables)[0]
    treedef = jax.tree_util.tree_structure(variables)
    leaves, missing = [], []
    for path, init_val in flat:
        parts = tuple(getattr(p, "key", getattr(p, "idx", None))
                      for p in path)[1:]
        target_shape = tuple(np.asarray(init_val).shape)
        mha_base = None
        if (len(parts) >= 4 and parts[0] == "transformer"
                and parts[1].startswith("decoder_")
                and parts[2] == "self_attn"):
            i = parts[1][len("decoder_"):]
            mha_base = (f"transformer.decoder.layers.{i}.self_attn.",
                        parts[3], parts[4])
        elif (len(parts) >= 3 and parts[0] == "qim"
                and parts[1] == "self_attn"):
            mha_base = ("track_embed.self_attn.", parts[2], parts[3])
        if mha_base is not None:
            arr = _mha_getter(state_dict, mha_base[0], mha_base[1],
                              mha_base[2], target_shape)
            if arr is None:
                missing.append(mha_base[0] + mha_base[1])
                leaves.append(init_val)
            else:
                leaves.append(np.ascontiguousarray(arr).astype(
                    np.asarray(init_val).dtype))
            continue
        tkey = motr_model_torch_key(parts)
        val = None if tkey is None else lookup(tkey)
        if val is None:
            missing.append(tkey or "/".join(str(p) for p in parts))
            leaves.append(init_val)
            continue
        arr = val.detach().cpu().numpy() if hasattr(val, "detach") \
            else np.asarray(val)
        no_t = tkey.endswith(("level_embed", "query_embed.weight",
                              "position.weight", "yolox_embed.weight"))
        if not no_t:
            arr = _linear(arr, target_shape)
        arr = arr.reshape(target_shape) if arr.size == np.prod(
            target_shape) else arr
        if arr.shape != target_shape:
            log.warning("shape mismatch %s: %s -> %s (kept init)", tkey,
                        arr.shape, target_shape)
            leaves.append(init_val)
            continue
        leaves.append(np.ascontiguousarray(arr).astype(
            np.asarray(init_val).dtype))
    if missing:
        log.info("convert_motr_checkpoint: %d params kept init (%s...)",
                 len(missing), missing[:4])
    return jax.tree_util.tree_unflatten(treedef, leaves)
