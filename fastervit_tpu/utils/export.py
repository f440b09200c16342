"""Model export for deployment (reference onnx_convert.py / coreml_convert.py,
re-targeted):

* StableHLO via jax.export — the portable serialized artifact (the ONNX
  analog), with a symbolic (dynamic) batch dimension like the reference's
  dynamic batch axis (onnx_convert.py:85).
* TF SavedModel via jax2tf — interop with TF Serving / tf2onnx / TFLite
  (covers the CoreML-style deployment conversion need).

The reference's `switch_to_deploy` (faster_vit.py:263-264) caches position
biases into buffers; here the bias MLPs consume compile-time-constant
coordinate tables, so AOT compilation / export constant-folds them — deploy
mode is free.
"""
from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp


def _forward_fn(model, variables):
    # route through the registry wrapper so quantized models export their
    # int8 serving forward (quantized_call interceptor), not the raw f32
    # module.apply — the AOT artifact is how int8's 27x bf16 compile cost
    # (BENCH_FAMILY_INT8.json) is paid once offline instead of per process
    if getattr(model.module, "quantized", False):
        from fastervit_tpu.ops.quant import quantized_call
        return functools.partial(quantized_call, model.module.apply,
                                 variables)
    return functools.partial(model.module.apply, variables)


def export_stablehlo(model, variables, batch_size: Optional[int] = None,
                     dtype=jnp.float32):
    """Serialize the forward pass to portable StableHLO bytes.

    batch_size=None exports a symbolic batch dimension (dynamic batch,
    matching onnx_convert.py:85); pass an int for a fixed-shape artifact.
    Returns (serialized_bytes, jax.export.Exported)."""
    from jax import export as jexport

    h, w = model.cfg.resolution
    if batch_size is None:
        (b,) = jexport.symbolic_shape("b")
        spec = jax.ShapeDtypeStruct((b, h, w, model.cfg.in_chans), dtype)
    else:
        spec = jax.ShapeDtypeStruct((batch_size, h, w, model.cfg.in_chans),
                                    dtype)
    exported = jexport.export(jax.jit(_forward_fn(model, variables)))(spec)
    return exported.serialize(), exported


def load_stablehlo(blob: bytes):
    """Deserialize an exported artifact; returns a callable."""
    from jax import export as jexport

    exported = jexport.deserialize(blob)
    return exported.call


def export_executable(model, variables, batch_size: int,
                      dtype=jnp.float32):
    """Serialize the COMPILED executable (jax.experimental
    .serialize_executable) — the deploy artifact that actually amortizes
    XLA compile cost. Measured on-chip for fv1-int8 (INT8_AOT_PROBE.json):
    fresh compile 44.7 s; StableHLO deserialize + first call 40.8 s (the
    backend re-compiles — StableHLO is the *portability* artifact, not a
    compile cache); serialized executable deserialize 1.3 s + first call
    2.6 s — 11x faster serving startup, parity exact.

    Fixed shapes only (an executable is compiled for one geometry) and
    same-topology loads only (deserialize_and_load rebuilds the device
    assignment from the local client, so load on the same device count it
    was compiled for — the executable is compiled replicated over all
    addressable devices). Returns bytes; load with load_executable. The
    callable takes (variables, images)."""
    import pickle

    import numpy as np
    from jax.experimental import serialize_executable as se
    from jax.sharding import Mesh, NamedSharding, PartitionSpec

    h, w = model.cfg.resolution
    spec = jax.ShapeDtypeStruct((batch_size, h, w, model.cfg.in_chans),
                                dtype)
    # compile the forward with variables as a real argument (closing over
    # them would inline >50M params as constants into the payload)
    if getattr(model.module, "quantized", False):
        from fastervit_tpu.ops.quant import quantized_call
        call = functools.partial(quantized_call, model.module.apply)
    else:
        call = model.module.apply
    mesh = Mesh(np.array(jax.devices()), ("d",))
    repl = NamedSharding(mesh, PartitionSpec())
    vspecs = jax.tree_util.tree_map(
        lambda a: jax.ShapeDtypeStruct(a.shape, a.dtype), variables)
    compiled = jax.jit(
        call,
        in_shardings=(jax.tree_util.tree_map(lambda _: repl, vspecs), repl),
        out_shardings=repl).lower(vspecs, spec).compile()
    payload, in_tree, out_tree = se.serialize(compiled)
    return pickle.dumps({"payload": payload, "in_tree": in_tree,
                         "out_tree": out_tree})


def load_executable(blob: bytes):
    """Load an export_executable artifact; returns the compiled callable
    (variables, images) -> logits. Skips XLA compilation entirely
    (INT8_AOT_PROBE.json: 1.3 s load + 2.6 s first call vs 44.7 s fresh
    compile for fv1-int8). Topology must match the exporting process."""
    import pickle

    import numpy as np
    from jax.experimental import serialize_executable as se
    from jax.sharding import Mesh, NamedSharding, PartitionSpec

    d = pickle.loads(blob)
    loaded = se.deserialize_and_load(d["payload"], d["in_tree"],
                                     d["out_tree"])
    mesh = Mesh(np.array(jax.devices()), ("d",))
    repl = NamedSharding(mesh, PartitionSpec())

    def call(variables, images):
        args = jax.tree_util.tree_map(
            lambda a: jax.device_put(a, repl), (variables, images))
        return loaded(*args)

    return call


def export_onnx(model, variables, path: str, torch_model=None,
                batch_size: Optional[int] = None, opset: int = 17,
                optimize: bool = True) -> str:
    """Write a real .onnx artifact of the forward pass — the reference's
    onnx_convert.py:85-152 leg: flax weights flow through the verified
    reverse converter (utils/convert.export_state_dict) into the PyTorch
    reference model, which torch.onnx traces with a dynamic batch axis.

    torch_model: a reference-architecture torch.nn.Module to load the
    converted state_dict into. Defaults to building from the pip `fastervit`
    package (create_model(model.name)); pass explicitly when it isn't
    installed. The exported graph takes NCHW float32 input, exactly like the
    reference's ONNX artifact.

    optimize=True applies constant folding at export (torch.onnx
    do_constant_folding) — the counterpart of the reference's
    polygraphy fold-constants Optimizer pass (onnx_convert.py:97-152);
    verify with utils/onnx_inspect.check_constant_folded.

    Works without the `onnx` python package: torch's TorchScript exporter
    serializes the ModelProto in C++; the only step that imports `onnx`
    (_add_onnxscript_fn, a no-op unless custom onnxscript functions are
    registered) is patched out when `onnx` is unavailable."""
    import contextlib

    import torch

    from fastervit_tpu.utils.convert import export_state_dict

    if torch_model is None:
        from fastervit import create_model as _torch_create  # pip package
        torch_model = _torch_create(model.cfg.name, pretrained=False)
    sd = {k: torch.from_numpy(v) for k, v in export_state_dict(variables).items()}
    missing, unexpected = torch_model.load_state_dict(sd, strict=False)
    # deterministic registered buffers the torch module rebuilds at init
    # (cached biases + CPB coordinate tables) — not weights
    _buffers = ("relative_bias", "relative_coords_table",
                "relative_position_index")
    missing = [k for k in missing if not any(b in k for b in _buffers)]
    if missing or unexpected:
        raise ValueError(f"state_dict mismatch: missing={missing} "
                         f"unexpected={unexpected}")
    torch_model.eval()

    try:
        import onnx  # noqa: F401
        _has_onnx = True
    except ImportError:
        _has_onnx = False

    @contextlib.contextmanager
    def _onnx_pkg_guard():
        if _has_onnx:
            yield
            return
        from torch.onnx._internal.torchscript_exporter import onnx_proto_utils
        orig = onnx_proto_utils._add_onnxscript_fn
        onnx_proto_utils._add_onnxscript_fn = lambda proto, custom_opsets: proto
        try:
            yield
        finally:
            onnx_proto_utils._add_onnxscript_fn = orig

    h, w = model.cfg.resolution
    x = torch.randn(batch_size or 1, model.cfg.in_chans, h, w)
    dyn = None if batch_size else {"input": {0: "batch"},
                                   "output": {0: "batch"}}
    with torch.no_grad(), _onnx_pkg_guard():
        torch.onnx.export(torch_model, (x,), path, input_names=["input"],
                          output_names=["output"], dynamic_axes=dyn,
                          opset_version=opset, dynamo=False,
                          do_constant_folding=optimize)
    return path


def export_savedmodel(model, variables, directory: str,
                      batch_size: Optional[int] = None, dtype=jnp.float32):
    """Write a TF SavedModel of the forward pass (jax2tf)."""
    import tensorflow as tf
    from jax.experimental import jax2tf

    h, w = model.cfg.resolution
    fn = jax2tf.convert(_forward_fn(model, variables),
                        polymorphic_shapes=["(b, _, _, _)"]
                        if batch_size is None else None)
    tf_fn = tf.function(fn, autograph=False, input_signature=[
        tf.TensorSpec([batch_size, h, w, model.cfg.in_chans],
                      tf.as_dtype(jnp.dtype(dtype).name))])
    module = tf.Module()
    module.f = tf_fn
    tf.saved_model.save(module, directory)
    return directory


def main(argv=None):
    """CLI: export a model to a deploy artifact (the reference's
    onnx_convert.py:85-152 analog, covering all four formats).

        python -m fastervit_tpu.utils.export --model faster_vit_0_224 \\
            [--checkpoint fv0.pth.tar] --format stablehlo --out fv0.stablehlo
        # formats: stablehlo (portable, dynamic batch unless --batch),
        #          executable (compiled; amortizes XLA compile, needs --batch),
        #          onnx (via the reverse converter + torch tracer),
        #          savedmodel (TF serving tree)
    """
    import argparse

    import jax

    from fastervit_tpu.models.registry import create_model

    p = argparse.ArgumentParser(description=main.__doc__)
    p.add_argument("--model", required=True)
    p.add_argument("--checkpoint", default="",
                   help="reference .pth.tar (random init if omitted)")
    p.add_argument("--format", required=True,
                   choices=["stablehlo", "executable", "onnx", "savedmodel"])
    p.add_argument("--out", required=True)
    p.add_argument("--batch", type=int, default=0,
                   help="0 = dynamic batch (stablehlo/onnx/savedmodel)")
    p.add_argument("--dtype", default="float32")
    p.add_argument("--int8", action="store_true",
                   help="int8 serving forward (stablehlo/executable)")
    args = p.parse_args(argv)

    dtype = jnp.dtype(args.dtype)
    model = create_model(args.model, dtype=dtype, quantized=args.int8)
    if args.checkpoint:
        variables = model.load_pytorch(args.checkpoint)
    else:
        variables = model.init(jax.random.PRNGKey(0))
    if args.int8:
        variables = model.quantize_variables(variables)
    batch = args.batch or None

    if args.format == "stablehlo":
        blob, _ = export_stablehlo(model, variables, batch_size=batch,
                                   dtype=dtype)
        with open(args.out, "wb") as f:
            f.write(blob)
    elif args.format == "executable":
        if not batch:
            raise SystemExit("--format executable needs a fixed --batch "
                             "(an executable is compiled for one geometry)")
        blob = export_executable(model, variables, batch_size=batch,
                                 dtype=dtype)
        with open(args.out, "wb") as f:
            f.write(blob)
    elif args.format == "onnx":
        if args.int8:
            raise SystemExit("onnx export runs the torch tracer; the int8 "
                             "serving path exports via stablehlo/executable")
        export_onnx(model, variables, args.out, batch_size=batch)
    else:
        export_savedmodel(model, variables, args.out, batch_size=batch,
                          dtype=dtype)
    print(f"exported {args.model} [{args.format}"
          f"{', int8' if args.int8 else ''}] -> {args.out}")


if __name__ == "__main__":
    main()
