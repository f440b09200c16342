"""PyTorch ⇄ JAX weight conversion for FasterViT checkpoints.

Converts reference checkpoints (/root/reference README model zoo, .pth.tar)
into this package's flax variable trees. The mapping is driven by *our* model
structure: we walk the initialized variable tree, derive the reference's
parameter name for every leaf, and fetch+transform it. Anything the checkpoint
is missing (or shape-mismatched) keeps its initialized value with a warning —
the same leniency as the reference loader (faster_vit.py:112-210), which is
what lets any-res models start from 224² weights.

Layout transforms:
  torch Linear  (out, in)        -> flax Dense kernel (in, out)
  torch Conv2d  (O, I/g, kh, kw) -> flax Conv kernel  (kh, kw, I/g, O)
  BatchNorm weight/bias/running_mean/running_var -> scale/bias + batch_stats
"""
from __future__ import annotations

import logging
from typing import Any, Dict, Tuple

import jax
import numpy as np

log = logging.getLogger(__name__)

# jax module names whose fc1/fc2 children are torch cpb_mlp Sequentials
_CPB_PARENTS = {"pos_embed", "hat_pos_embed", "pos_emb_funct"}
# patch_embed child -> index in the torch conv_down Sequential
_PATCH_EMBED_IDX = {"conv1": "0", "norm1": "1", "conv2": "3", "norm2": "4"}
_LEAF_NAME = {"kernel": "weight", "scale": "weight", "bias": "bias",
              "mean": "running_mean", "var": "running_var"}


def torch_key_for_path(path: Tuple[str, ...]) -> str:
    """Map a flax variable path (collection stripped) to the reference's
    state_dict key."""
    parts = list(path)
    leaf = parts.pop()
    out = []
    i = 0
    while i < len(parts):
        p = parts[i]
        if p.startswith("levels_"):
            out.append("levels." + p[len("levels_"):])
        elif p.startswith("blocks_"):
            out.append("blocks." + p[len("blocks_"):])
        elif p == "patch_embed":
            nxt = parts[i + 1] if i + 1 < len(parts) else None
            if nxt in _PATCH_EMBED_IDX:
                out.append("patch_embed.conv_down." + _PATCH_EMBED_IDX[nxt])
                i += 1
            else:
                out.append("patch_embed")
        elif p == "global_tokenizer":
            nxt = parts[i + 1] if i + 1 < len(parts) else None
            if nxt == "pos_embed":
                out.append("global_tokenizer.to_global_feature.pos")
                i += 1
            else:
                out.append("global_tokenizer")
        elif p == "downsample":
            nxt = parts[i + 1] if i + 1 < len(parts) else None
            if nxt == "reduction":
                out.append("downsample.reduction.0")
                i += 1
            else:
                out.append("downsample")
        elif p in ("fc1", "fc2") and out and out[-1].split(".")[-1] in _CPB_PARENTS:
            out.append("cpb_mlp." + ("0" if p == "fc1" else "2"))
        elif p.startswith("norm_") and p[len("norm_"):].isdigit():
            # pyramid per-stage norms: norm_0 -> norm0 (dino fastervit.py:792-796)
            out.append("norm" + p[len("norm_"):])
        else:
            out.append(p)
        i += 1
    if leaf.startswith("gamma"):
        return ".".join(out + [leaf])
    return ".".join(out + [_LEAF_NAME[leaf]])


def _to_jax_array(t: Any, target_shape: Tuple[int, ...]) -> np.ndarray:
    arr = t.detach().cpu().numpy() if hasattr(t, "detach") else np.asarray(t)
    if arr.ndim == 2 and len(target_shape) == 2:           # Linear
        arr = arr.T
    elif arr.ndim == 4 and len(target_shape) == 4:          # Conv2d
        arr = arr.transpose(2, 3, 1, 0)
    return np.ascontiguousarray(arr)


def normalize_state_dict(ckpt: Dict[str, Any], use_ema: bool = False) -> Dict[str, Any]:
    """Unwrap checkpoint containers and strip DDP/encoder prefixes
    (reference faster_vit.py:193-208, registry.py:161-181)."""
    sd = ckpt
    if isinstance(ckpt, dict) and not hasattr(next(iter(ckpt.values()), None), "shape"):
        for key in (("state_dict_ema",) if use_ema else ()) + ("state_dict", "model"):
            if key in ckpt:
                sd = ckpt[key]
                break
    sd = dict(sd)
    if next(iter(sd), "").startswith("module."):
        sd = {k[len("module."):]: v for k, v in sd.items()}
    if sorted(sd)[0].startswith("encoder."):
        sd = {k[len("encoder."):]: v for k, v in sd.items()
              if k.startswith("encoder.")}
    return sd


def convert_state_dict(state_dict: Dict[str, Any], variables) -> Any:
    """Fill a flax variable tree from a torch state_dict (lenient)."""
    flat = jax.tree_util.tree_flatten_with_path(variables)[0]
    treedef = jax.tree_util.tree_structure(variables)
    used, missing, mismatched = set(), [], []
    leaves = []
    for path, init_val in flat:
        parts = tuple(getattr(p, "key", getattr(p, "idx", None)) for p in path)
        tkey = torch_key_for_path(parts[1:])  # drop collection name
        if tkey not in state_dict and "to_global_feature.pos" in tkey:
            # core registers the tokenizer conv twice (pos_embed and
            # to_global_feature.pos, faster_vit.py:726-730); the downstream
            # variants only keep pos_embed
            tkey = tkey.replace("to_global_feature.pos", "pos_embed")
        if tkey not in state_dict:
            missing.append(tkey)
            leaves.append(init_val)
            continue
        arr = _to_jax_array(state_dict[tkey], init_val.shape)
        used.add(tkey)
        used.add(tkey.replace("pos_embed", "to_global_feature.pos")
                 if tkey.endswith(("pos_embed.weight", "pos_embed.bias"))
                 and "global_tokenizer" in tkey else tkey)
        used.add(tkey.replace("to_global_feature.pos", "pos_embed"))
        if arr.shape != init_val.shape:
            mismatched.append((tkey, arr.shape, tuple(init_val.shape)))
            leaves.append(init_val)
            continue
        leaves.append(arr.astype(np.asarray(init_val).dtype))
    unexpected = [k for k in state_dict
                  if k not in used and "num_batches_tracked" not in k
                  and not k.endswith(("relative_coords_table",
                                      "relative_position_index", "relative_bias"))]
    if missing:
        log.warning("missing keys in source state_dict: %s", ", ".join(missing))
    if mismatched:
        log.warning("shape-mismatched keys kept at init: %s",
                    ", ".join(f"{k} {s}->{t}" for k, s, t in mismatched))
    if unexpected:
        log.warning("unexpected keys in source state_dict: %s", ", ".join(unexpected))
    return jax.tree_util.tree_unflatten(treedef, leaves)


def load_pytorch_checkpoint(model, checkpoint_path: str, use_ema: bool = False,
                            rng=None):
    """Init the model and overwrite with converted torch weights."""
    import torch
    ckpt = torch.load(checkpoint_path, map_location="cpu", weights_only=False)
    if not isinstance(ckpt, dict):
        raise RuntimeError(f"no state_dict found in {checkpoint_path}")
    sd = normalize_state_dict(ckpt, use_ema=use_ema)
    variables = model.init(rng)
    return convert_state_dict(sd, variables)


def export_state_dict(variables) -> Dict[str, Any]:
    """Reverse conversion: flax variables -> a reference-layout torch
    state_dict (numpy tensors; call torch.from_numpy per value to save), so
    TPU-trained weights can flow back into the PyTorch ecosystem."""
    flat = jax.tree_util.tree_flatten_with_path(variables)[0]
    sd: Dict[str, Any] = {}
    for path, val in flat:
        parts = tuple(getattr(p, "key", getattr(p, "idx", None)) for p in path)
        tkey = torch_key_for_path(parts[1:])
        arr = np.asarray(val)
        if arr.ndim == 2:
            arr = arr.T
        elif arr.ndim == 4:
            arr = arr.transpose(3, 2, 0, 1)
        sd[tkey] = np.ascontiguousarray(arr)
        if "global_tokenizer.to_global_feature.pos." in tkey:
            # core registers the tokenizer conv under two names
            # (faster_vit.py:726-730); emit both
            sd[tkey.replace("to_global_feature.pos", "pos_embed")] = sd[tkey]
    return sd


def main(argv=None):
    """CLI: convert a reference .pth.tar into an orbax checkpoint.

        python -m fastervit_tpu.utils.convert \
            --model faster_vit_0_224 --checkpoint fv0.pth.tar --out fv0_orbax
    """
    import argparse

    from fastervit_tpu.models.registry import create_model
    from fastervit_tpu.utils.checkpoint import save_variables

    p = argparse.ArgumentParser(description=main.__doc__)
    p.add_argument("--model", required=True)
    p.add_argument("--checkpoint", required=True)
    p.add_argument("--out", required=True)
    p.add_argument("--use-ema", action="store_true")
    args = p.parse_args(argv)
    logging.basicConfig(level=logging.INFO)
    model = create_model(args.model)
    variables = load_pytorch_checkpoint(model, args.checkpoint,
                                        use_ema=args.use_ema)
    save_variables(args.out, variables)
    print(f"converted {args.checkpoint} -> {args.out}")


if __name__ == "__main__":
    main()
