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
