"""Model validation (reference fastervit/validate.py:152-447, rebuilt):
single-model eval over a batch-sharded mesh, bulk validation over name
wildcards, and OOM-resilient batch-size decay retry.

Usage:
    python -m fastervit_tpu.validate --model faster_vit_0_224 \
        --data-dir /path/to/imagenet/val --checkpoint weights.pth.tar
"""
from __future__ import annotations

import argparse
import json
import logging
import time
from typing import Optional

import jax
import numpy as np
import jax.numpy as jnp

from fastervit_tpu.models.registry import create_model, list_models
from fastervit_tpu.parallel.mesh import batch_sharding, create_mesh, replicated
from fastervit_tpu.train.steps import make_eval_step

log = logging.getLogger("fastervit_tpu.validate")


class _MaskedModule:
    """Wrap a module so eval adds a logit mask (subset benchmarks)."""

    def __init__(self, module, mask):
        self._module = module
        self._mask = mask

    def apply(self, variables, x, **kw):
        return self._module.apply(variables, x, **kw) + self._mask


class _QuantizedModule:
    """Route apply through the int8 interceptor (ops/quant.py)."""

    def __init__(self, module):
        self._module = module

    def apply(self, variables, x, **kw):
        from fastervit_tpu.ops.quant import quantized_call
        return quantized_call(self._module.apply, variables, x, **kw)


class _TTAModule:
    """Test-time-augmentation reduction (reference train.py:981-985): the
    loader oversamples each image `factor` times consecutively; logits are
    mean-reduced per group."""

    def __init__(self, module, factor: int):
        self._module = module
        self._factor = factor

    def apply(self, variables, x, **kw):
        out = self._module.apply(variables, x, **kw)
        b, c = out.shape
        return out.reshape(b // self._factor, self._factor, c).mean(1)


def subset_logit_mask(classes, class_index_file: str, num_classes: int = 1000):
    """Logit mask for subset benchmarks (ImageNet-A/R have 200 of the 1k
    classes): classes present in the eval set keep their logits, the rest get
    -inf before argmax — the standard subset-evaluation protocol.

    `class_index_file`: one wnid per line in 1k-index order (the sorted train
    class list); `classes`: the eval folder's class names."""
    with open(class_index_file) as f:
        all_classes = [l.strip() for l in f if l.strip()]
    class_to_idx = {c: i for i, c in enumerate(all_classes)}
    mask = jnp.full((num_classes,), -jnp.inf)
    idx = jnp.asarray([class_to_idx[c] for c in classes])
    mask = mask.at[idx].set(0.0)
    return mask, class_to_idx


def imagenet_v2_class_to_idx(classes):
    """ImageNet-V2 folder layout adapter: top-level dirs are the 1k class
    INDICES as strings ("0".."999", matchedfrequency/threshold0.7/topimages
    releases all share it) — labels are the folder names parsed as ints, not
    the sorted-lexicographic enumeration ImageFolder would produce (which
    mis-sorts "10" < "2"). Robustness protocol: README.md:286-367 V2 rows."""
    return {c: int(c) for c in classes}


def validate(model, variables, loader, mesh=None, dtype=jnp.float32,
             logit_mask=None, tta: int = 0, real_labels=None) -> dict:
    """Run eval; returns {'top1', 'top5', 'loss', 'img_s', 'count'}.

    tta > 1: the loader oversamples each image `tta` consecutive times
    (EvalLoader(tta=2) gives [orig, hflip]); logits are mean-reduced per
    group (reference train.py:981-985). real_labels: a data.real_labels.
    RealLabels accumulator (single-process eval)."""
    mesh = mesh or create_mesh()
    repl, bsh = replicated(mesh), batch_sharding(mesh)
    module = model.module
    if getattr(module, "quantized", False):
        module = _QuantizedModule(module)
    if logit_mask is not None:
        module = _MaskedModule(module, logit_mask)
    if tta > 1:
        module = _TTAModule(module, tta)
    eval_step = jax.jit(make_eval_step(module), in_shardings=(repl, bsh))
    topk_fn = None
    if real_labels is not None:
        topk_fn = jax.jit(
            lambda v, x: jax.lax.top_k(module.apply(v, x), 5)[1],
            in_shardings=(repl, bsh))
    totals = {"loss_sum": 0.0, "top1": 0, "top5": 0, "count": 0}
    images = 0
    t_start = None
    with mesh:
        variables = jax.device_put(variables, repl)
        for i, batch in enumerate(loader):
            label = jnp.asarray(batch["label"])
            valid = jnp.asarray(batch["valid"])
            if tta > 1:
                label, valid = label[::tta], valid[::tta]
            images_dev = jax.device_put(jnp.asarray(batch["image"], dtype), bsh)
            batch = {"image": images_dev,
                     "label": jax.device_put(label, bsh),
                     "valid": jax.device_put(valid, bsh)}
            m = eval_step(variables, batch)
            if real_labels is not None:
                idx = np.asarray(topk_fn(variables, images_dev))
                real_labels.add_result(idx[np.asarray(valid)])
            m = jax.tree.map(lambda x: x.item(), m)   # host fetch = barrier
            if i == 0:
                t_start = time.perf_counter()         # skip compile in rate
            else:
                images += m["count"]
            for k in totals:
                totals[k] += m[k]
    dt = time.perf_counter() - t_start if t_start else float("inf")
    n = max(totals["count"], 1)
    return {"top1": 100.0 * totals["top1"] / n,
            "top5": 100.0 * totals["top5"] / n,
            "loss": totals["loss_sum"] / n,
            "img_s": images / dt if dt > 0 else 0.0,
            "count": totals["count"]}


def validate_with_batch_decay(make_loader, model, variables,
                              batch_size: int, decay_step: int = 2,
                              retries: int = 3, **kw) -> dict:
    """Halve the batch size on resource exhaustion (reference
    validate.py:367-387 decay_batch_step / check_batch_size_retry)."""
    bs = batch_size
    for attempt in range(retries + 1):
        try:
            return validate(model, variables, make_loader(bs), **kw)
        except (jax.errors.JaxRuntimeError, RuntimeError) as e:  # RESOURCE_EXHAUSTED
            if "RESOURCE_EXHAUSTED" not in str(e) or attempt == retries:
                raise
            bs = max(bs // decay_step, 1)
            log.warning("eval OOM; retrying with batch_size=%d", bs)
    raise RuntimeError("unreachable")


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--model", default="faster_vit_0_224",
                   help="name or fnmatch wildcard for bulk validation")
    p.add_argument("--data-dir", required=False, default=None)
    p.add_argument("--lmdb-dataset", action="store_true")
    p.add_argument("--checkpoint", default="",
                   help="reference .pth.tar to convert, or orbax dir")
    p.add_argument("--use-ema", action="store_true")
    p.add_argument("--batch-size", type=int, default=256)
    p.add_argument("--dtype", default="float32",
                   choices=["float32", "bfloat16"])
    p.add_argument("--int8", action="store_true",
                   help="int8 serving path: weights quantized offline, "
                        "activations dynamically (ops/quant.py)")
    p.add_argument("--synthetic", action="store_true",
                   help="random data (smoke test / throughput only)")
    p.add_argument("--class-index-file", default="",
                   help="1k wnid list (one per line, index order) enabling "
                        "ImageNet-A/R-style subset evaluation")
    p.add_argument("--imagenet-v2", action="store_true",
                   help="data-dir uses the ImageNet-V2 layout (folders are "
                        "class indices '0'..'999')")
    args = p.parse_args(argv)

    names = list_models(args.model) or [args.model]
    results = []
    for name in names:
        model = create_model(name, dtype=getattr(jnp, args.dtype),
                             quantized=args.int8)
        if args.checkpoint.endswith((".pth", ".pth.tar", ".pt")):
            variables = model.load_pytorch(args.checkpoint)
        elif args.checkpoint:
            from fastervit_tpu.utils.checkpoint import restore_variables
            variables = restore_variables(args.checkpoint, model)
        else:
            log.warning("no checkpoint: random weights (smoke test)")
            variables = model.init(jax.random.PRNGKey(0))
        if args.int8:
            variables = model.quantize_variables(variables)

        logit_mask = None
        if args.synthetic or not args.data_dir:
            from fastervit_tpu.data.imagenet import SyntheticLoader
            make_loader = lambda bs: SyntheticLoader(model.cfg.data, bs,
                                                     num_batches=8)
        else:
            from fastervit_tpu.data.imagenet import EvalLoader, index_image_folder
            class_to_idx = None
            if args.imagenet_v2:
                if args.lmdb_dataset:
                    p.error("--imagenet-v2 reads the folder layout and "
                            "cannot combine with --lmdb-dataset")
                class_to_idx = imagenet_v2_class_to_idx(
                    index_image_folder(args.data_dir)[2])
            elif args.class_index_file:
                classes = index_image_folder(args.data_dir)[2]
                logit_mask, class_to_idx = subset_logit_mask(
                    classes, args.class_index_file, model.cfg.num_classes)
            make_loader = lambda bs: EvalLoader(args.data_dir, model.cfg.data,
                                                bs, class_to_idx=class_to_idx,
                                                use_lmdb=args.lmdb_dataset)
        res = validate_with_batch_decay(make_loader, model, variables,
                                        args.batch_size, logit_mask=logit_mask)
        res["model"] = name
        print(json.dumps(res))
        results.append(res)
    return results


if __name__ == "__main__":
    logging.basicConfig(level=logging.INFO)
    main()
