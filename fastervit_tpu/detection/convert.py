"""DINO checkpoint conversion: reference torch DINO state_dicts
(downstream/object_detection/dino) -> fastervit_tpu.detection.DINODetector
flax variables.

Covers the full detector: FasterViT pyramid backbone (`backbone.0.*`, via the
core converter's path map), input projections (`input_proj.{i}.{0,1}`), the
deformable transformer (encoder/decoder layers, two-stage enc_output + heads),
and the shared decoder box/class heads (registered in the checkpoint under
both `transformer.decoder.bbox_embed.*` and top-level `bbox_embed.*`;
dino.py:141-152).

torch nn.MultiheadAttention (decoder self-attn) packs qkv into
in_proj_weight/in_proj_bias — unpacked here into flax MHDPA's per-head
query/key/value/out kernels.
"""
from __future__ import annotations

import logging
from typing import Any, Callable, Dict, Optional, Tuple

import jax
import numpy as np

from fastervit_tpu.utils.convert import torch_key_for_path

log = logging.getLogger(__name__)

_FFN_LEAF = {"linear1": "linear1", "linear2": "linear2", "norm": None}
_LEAF_NAME = {"kernel": "weight", "scale": "weight", "bias": "bias",
              "embedding": "weight", "mean": "running_mean",
              "var": "running_var"}

# direct params (no kernel/bias leaf): torch key is the path itself
_DIRECT = {"level_embed": "level_embed", "tgt_embed": "tgt_embed.weight"}


def _linear(arr: np.ndarray, target_shape) -> np.ndarray:
    if arr.ndim == 2 and len(target_shape) == 2:
        arr = arr.T
    elif arr.ndim == 4 and len(target_shape) == 4:
        arr = arr.transpose(2, 3, 1, 0)
    return arr


def _mha_getter(sd: Dict[str, Any], base: str, which: str, leaf: str,
                target_shape) -> Optional[np.ndarray]:
    """Unpack torch MultiheadAttention params for flax MHDPA."""
    def get(k):
        v = sd.get(base + k)
        if v is None:
            return None
        return v.detach().cpu().numpy() if hasattr(v, "detach") else np.asarray(v)

    if which == "out":
        if leaf == "kernel":
            w = get("out_proj.weight")
            return None if w is None else w.T.reshape(target_shape)
        w = get("out_proj.bias")
        return w
    idx = {"query": 0, "key": 1, "value": 2}[which]
    if leaf == "kernel":
        w = get("in_proj_weight")
        if w is None:
            return None
        c = w.shape[1]
        return w[idx * c:(idx + 1) * c].T.reshape(target_shape)
    b = get("in_proj_bias")
    if b is None:
        return None
    c = b.shape[0] // 3
    return b[idx * c:(idx + 1) * c].reshape(target_shape)


def dino_torch_key(parts: Tuple[str, ...]) -> Optional[str]:
    """flax path inside DINODetector -> torch DINO checkpoint key.
    Returns None for paths needing custom handling (decoder torch-MHA)."""
    parts = list(parts)
    leaf = parts.pop()
    if not parts:
        return _DIRECT.get(leaf, leaf)
    head = parts[0]

    if head == "backbone":
        return "backbone.0." + torch_key_for_path(tuple(parts[1:] + [leaf]))
    if head.startswith("input_proj_norm_"):
        i = head[len("input_proj_norm_"):]
        return f"input_proj.{i}.1.{_LEAF_NAME[leaf]}"
    if head.startswith("input_proj_"):
        i = head[len("input_proj_"):]
        return f"input_proj.{i}.0.{_LEAF_NAME[leaf]}"
    if head != "transformer":
        return None

    # ---- inside the transformer scope --------------------------------
    parts = parts[1:]
    if not parts:
        return "transformer." + _DIRECT.get(leaf, leaf)
    p0 = parts[0]
    if p0.startswith("encoder_"):
        i = p0[len("encoder_"):]
        rest = parts[1:]
        base = f"transformer.encoder.layers.{i}."
        if rest[0] == "self_attn":
            return base + f"self_attn.{rest[1]}.{_LEAF_NAME[leaf]}"
        if rest[0] == "norm1":
            return base + f"norm1.{_LEAF_NAME[leaf]}"
        if rest[0] == "ffn":
            sub = rest[1]
            name = "norm2" if sub == "norm" else sub
            return base + f"{name}.{_LEAF_NAME[leaf]}"
    if p0.startswith("decoder_"):
        i = p0[len("decoder_"):]
        rest = parts[1:]
        base = f"transformer.decoder.layers.{i}."
        if rest[0] == "self_attn":
            return None                      # torch-MHA, custom unpack
        if rest[0] == "cross_attn":
            return base + f"cross_attn.{rest[1]}.{_LEAF_NAME[leaf]}"
        if rest[0] in ("norm1", "norm2"):
            return base + f"{rest[0]}.{_LEAF_NAME[leaf]}"
        if rest[0] == "ffn":
            sub = rest[1]
            name = "norm3" if sub == "norm" else sub
            return base + f"{name}.{_LEAF_NAME[leaf]}"
    if p0 == "ref_point_head":
        j = parts[1][len("layer_"):]
        return f"transformer.decoder.ref_point_head.layers.{j}.{_LEAF_NAME[leaf]}"
    if p0 == "dec_norm":
        return f"transformer.decoder.norm.{_LEAF_NAME[leaf]}"
    if p0 == "bbox_embed":
        j = parts[1][len("layer_"):]
        return f"transformer.decoder.bbox_embed.0.layers.{j}.{_LEAF_NAME[leaf]}"
    if p0 == "class_embed":
        return f"transformer.decoder.class_embed.0.{_LEAF_NAME[leaf]}"
    if p0 == "enc_output":
        return f"transformer.enc_output.{_LEAF_NAME[leaf]}"
    if p0 == "enc_output_norm":
        return f"transformer.enc_output_norm.{_LEAF_NAME[leaf]}"
    if p0 == "enc_out_class_embed":
        return f"transformer.enc_out_class_embed.{_LEAF_NAME[leaf]}"
    if p0 == "enc_out_bbox_embed":
        j = parts[1][len("layer_"):]
        return f"transformer.enc_out_bbox_embed.layers.{j}.{_LEAF_NAME[leaf]}"
    if p0 == "label_enc":
        return f"label_enc.{_LEAF_NAME[leaf]}"
    if p0 == "tgt_embed" or leaf == "tgt_embed":
        return "transformer.tgt_embed.weight"
    if leaf == "level_embed":
        return "transformer.level_embed"
    return None


_NO_TRANSPOSE_SUFFIX = ("tgt_embed.weight", "label_enc.weight", "level_embed")


def convert_dino_state_dict(state_dict: Dict[str, Any], variables) -> Any:
    """Fill DINODetector flax variables from a torch DINO state_dict
    (lenient: missing keys keep their init, with a warning)."""
    flat = jax.tree_util.tree_flatten_with_path(variables)[0]
    treedef = jax.tree_util.tree_structure(variables)
    missing = []
    leaves = []
    for path, init_val in flat:
        parts = tuple(getattr(p, "key", getattr(p, "idx", None)) for p in path)
        parts = parts[1:]                           # drop collection name
        target_shape = tuple(np.asarray(init_val).shape)

        # decoder torch-MHA unpack
        if (len(parts) >= 4 and parts[0] == "transformer"
                and parts[1].startswith("decoder_")
                and parts[2] == "self_attn"):
            i = parts[1][len("decoder_"):]
            base = f"transformer.decoder.layers.{i}.self_attn."
            arr = _mha_getter(state_dict, base, parts[3], parts[4], target_shape)
            if arr is None:
                missing.append(base + parts[3])
                leaves.append(init_val)
            else:
                leaves.append(np.ascontiguousarray(arr).astype(
                    np.asarray(init_val).dtype))
            continue

        tkey = dino_torch_key(parts)
        val = None if tkey is None else state_dict.get(tkey)
        if val is None and tkey is not None and tkey.startswith(
                "transformer.decoder.bbox_embed."):
            val = state_dict.get(tkey[len("transformer.decoder."):])
        if val is None and tkey is not None and tkey.startswith(
                "transformer.decoder.class_embed."):
            val = state_dict.get(tkey[len("transformer.decoder."):])
        if val is None:
            missing.append(tkey or ".".join(str(p) for p in parts))
            leaves.append(init_val)
            continue
        arr = val.detach().cpu().numpy() if hasattr(val, "detach") else np.asarray(val)
        if not tkey.endswith(_NO_TRANSPOSE_SUFFIX):
            arr = _linear(arr, target_shape)
        if arr.shape != target_shape:
            log.warning("shape mismatch %s: %s -> %s (kept init)", tkey,
                        arr.shape, target_shape)
            leaves.append(init_val)
            continue
        leaves.append(np.ascontiguousarray(arr).astype(
            np.asarray(init_val).dtype))
    if missing:
        log.warning("missing keys: %s", ", ".join(str(m) for m in missing))
    return jax.tree_util.tree_unflatten(treedef, leaves)
