"""Execute the exported ONNX artifact without onnxruntime (reference
onnx_test.py:13-18 runs ORT on the exported graph at an unseen shape; no
ORT exists in this image, so utils/onnx_eval.py evaluates the ModelProto
with numpy). The graph's dynamic axis is batch, so evaluating at a batch
never seen at export time is the shape-generalization analog; logits are
compared against the source flax model, so any drift in the exported
graph's math fails here."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

import fastervit_tpu as fvt

pytestmark = pytest.mark.smoke

KW = dict(depths=[1, 1, 1, 1], num_heads=[1, 2, 4, 8], dim=32, in_dim=16,
          num_classes=10)


@pytest.fixture(scope="module")
def exported(tmp_path_factory):
    pytest.importorskip("torch")
    import sys
    import os
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from reference_loader import load_reference
    from fastervit_tpu.utils.export import export_onnx

    fv = load_reference()
    model = fvt.create_model("faster_vit_0_224", **KW)
    variables = model.init(jax.random.PRNGKey(0))
    tm = fv.create_model("faster_vit_0_224", **KW)
    path = str(tmp_path_factory.mktemp("onnx") / "fv_tiny.onnx")
    export_onnx(model, variables, path, torch_model=tm)
    return path, model, variables


def test_evaluated_graph_matches_flax_at_unseen_batch(exported):
    from fastervit_tpu.utils.onnx_eval import run_onnx

    path, model, variables = exported
    x = np.random.RandomState(0).randn(3, 3, 224, 224).astype(np.float32)
    out = run_onnx(path, {"input": x})
    assert set(out) == {"output"} and out["output"].shape == (3, 10)
    want = np.asarray(model.apply(variables,
                                  jnp.asarray(x.transpose(0, 2, 3, 1))))
    np.testing.assert_allclose(out["output"], want, atol=2e-4)


def test_graph_decode_surface(exported):
    from fastervit_tpu.utils.onnx_eval import OnnxGraph

    path, _, _ = exported
    g = OnnxGraph(path)
    assert g.inputs == ["input"] and g.outputs == ["output"]
    assert len(g.nodes) > 100 and len(g.initializers) > 20
    # initializers decode to real arrays (raw_data path)
    total = sum(v.size for v in g.initializers.values())
    assert total > 10_000


def test_unknown_op_fails_loud():
    from fastervit_tpu.utils.onnx_eval import Node, OnnxGraph, evaluate

    g = OnnxGraph.__new__(OnnxGraph)
    n = Node.__new__(Node)
    n.op, n.inputs, n.outputs, n.attrs, n.name = ("NotAnOp", ["a"], ["b"],
                                                  {}, "n0")
    g.nodes, g.initializers, g.inputs, g.outputs = [n], {}, ["a"], ["b"]
    with pytest.raises(NotImplementedError):
        evaluate(g, {"a": np.zeros(1, np.float32)})
