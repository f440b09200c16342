"""Export smoke tests (reference onnx_test.py:13-18 pattern: run the exported
artifact and check outputs)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

import fastervit_tpu as fvt
from fastervit_tpu.utils.export import (export_savedmodel, export_stablehlo,
                                        load_stablehlo)


@pytest.fixture(scope="module")
def tiny():
    m = fvt.create_model("faster_vit_0_224", depths=[1, 1, 1, 1],
                         num_heads=[1, 2, 4, 8], dim=32, in_dim=16,
                         resolution=64, num_classes=10)
    v = m.init(jax.random.PRNGKey(0))
    return m, v


def test_stablehlo_roundtrip_dynamic_batch(tiny):
    model, variables = tiny
    blob, _ = export_stablehlo(model, variables)
    fn = load_stablehlo(blob)
    x2 = jnp.asarray(np.random.RandomState(0).randn(2, 64, 64, 3), jnp.float32)
    x5 = jnp.tile(x2, (3, 1, 1, 1))[:5]
    want = model.apply(variables, x2)
    got = fn(x2)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-5)
    assert fn(x5).shape == (5, 10)  # dynamic batch works


def test_executable_roundtrip_skips_compile(tiny):
    """The deploy artifact that actually amortizes compile cost
    (INT8_AOT_PROBE.json: StableHLO re-compiles at load; the serialized
    EXECUTABLE loads in ~1 s): serialize the compiled forward, reload,
    run — outputs must match the live model exactly."""
    from fastervit_tpu.utils.export import export_executable, load_executable

    model, variables = tiny
    blob = export_executable(model, variables, batch_size=2)
    fn = load_executable(blob)
    x = jnp.asarray(np.random.RandomState(1).randn(2, 64, 64, 3),
                    jnp.float32)
    want = np.asarray(model.apply(variables, x))
    got = np.asarray(fn(variables, x))
    # the artifact is a different XLA compilation (replicated shardings),
    # so fusion order differs at f32 ulp scale
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_onnx_export(tmp_path):
    """The ONNX leg (reference onnx_convert.py:85-152): flax weights ->
    reverse converter -> reference torch model -> torch.onnx trace with a
    dynamic batch axis. No `onnx`/`onnxruntime` in the image, so the
    artifact's source model is verified numerically (torch-with-converted-
    weights vs flax logits) and the serialized proto structurally."""
    torch = pytest.importorskip("torch")
    from reference_loader import load_reference
    from fastervit_tpu.utils.export import export_onnx

    fv = load_reference()
    # resolution must be the reference default (224): its window_partition
    # needs H,W >= window 7 at every stage
    kw = dict(depths=[1, 1, 1, 1], num_heads=[1, 2, 4, 8], dim=32, in_dim=16,
              num_classes=10)
    model = fvt.create_model("faster_vit_0_224", **kw)
    variables = model.init(jax.random.PRNGKey(0))
    tm = fv.create_model("faster_vit_0_224", **kw)
    path = str(tmp_path / "fv_tiny.onnx")
    export_onnx(model, variables, path, torch_model=tm)

    # the traced torch model carries the converted weights: logits match flax
    x = np.random.RandomState(0).randn(2, 224, 224, 3).astype(np.float32)
    with torch.no_grad():
        got = tm(torch.from_numpy(x.transpose(0, 3, 1, 2))).numpy()
    want = np.asarray(model.apply(variables, jnp.asarray(x)))
    np.testing.assert_allclose(got, want, atol=2e-4)

    data = open(path, "rb").read()
    assert len(data) > 50_000          # weights are embedded
    for token in (b"Conv", b"input", b"output", b"batch"):
        assert token in data, token


def test_savedmodel_export(tiny, tmp_path):
    tf = pytest.importorskip("tensorflow")
    model, variables = tiny
    d = export_savedmodel(model, variables, str(tmp_path / "sm"), batch_size=2)
    loaded = tf.saved_model.load(d)
    x = np.random.RandomState(1).randn(2, 64, 64, 3).astype(np.float32)
    got = loaded.f(tf.constant(x)).numpy()
    want = np.asarray(model.apply(variables, jnp.asarray(x)))
    np.testing.assert_allclose(got, want, atol=1e-4, rtol=1e-4)


def test_onnx_inspect_and_constant_folding(tmp_path):
    """The reference runs a polygraphy fold-constants Optimizer over its
    exported ONNX (onnx_convert.py:97-152). Our leg folds at export time
    (torch.onnx do_constant_folding) and verifies structurally via the
    pure-python proto reader (utils/onnx_inspect) since the `onnx` package
    cannot be installed here: the folded graph must carry no runtime
    Constant nodes beyond the unfolded graph and no more total nodes."""
    pytest.importorskip("torch")
    from reference_loader import load_reference
    from fastervit_tpu.utils.export import export_onnx
    from fastervit_tpu.utils.onnx_inspect import (check_constant_folded,
                                                  inspect_onnx)

    fv = load_reference()
    kw = dict(depths=[1, 1, 1, 1], num_heads=[1, 2, 4, 8], dim=32, in_dim=16,
              num_classes=10)
    model = fvt.create_model("faster_vit_0_224", **kw)
    variables = model.init(jax.random.PRNGKey(0))

    paths = {}
    for optimize in (True, False):
        tm = fv.create_model("faster_vit_0_224", **kw)
        p = str(tmp_path / f"fv_opt{optimize}.onnx")
        export_onnx(model, variables, p, torch_model=tm, optimize=optimize)
        paths[optimize] = p

    folded = inspect_onnx(paths[True])
    raw = inspect_onnx(paths[False])
    # sanity on the wire reader itself
    assert folded["inputs"] == ["input"]
    assert folded["outputs"] == ["output"]
    assert folded["opsets"].get("") == 17
    assert folded["num_nodes"] > 10
    assert folded["op_types"]["Conv"] >= 4
    # folding postcondition (the Optimizer's observable effect)
    assert folded["num_nodes"] <= raw["num_nodes"]
    assert (folded["op_types"].get("Constant", 0)
            <= raw["op_types"].get("Constant", 0))
    check_constant_folded(paths[True],
                          max_constant_nodes=folded["op_types"].get(
                              "Constant", 0))


def test_savedmodel_tf2onnx_leg(tiny, tmp_path):
    """SavedModel -> tf2onnx conversion (the docs' interop pointer). The
    image has no `tf2onnx`/`onnx` (no network egress; documented in
    docs/CONVERT_VALIDATE.md), so this exercises the leg when available and
    otherwise pins the documented limitation."""
    tf2onnx = pytest.importorskip(
        "tf2onnx", reason="tf2onnx not installed in this image (no network "
        "egress) — SavedModel export itself is tested above; the conversion "
        "command is documented in docs/CONVERT_VALIDATE.md")
    model, variables = tiny
    d = export_savedmodel(model, variables, str(tmp_path / "sm"),
                          batch_size=2)
    out = str(tmp_path / "sm.onnx")
    tf2onnx.convert.from_saved_model(d, output_path=out)
    from fastervit_tpu.utils.onnx_inspect import inspect_onnx
    assert inspect_onnx(out)["num_nodes"] > 10


def test_stablehlo_export_of_quantized_model(tmp_path):
    """Int8 serving deploys through the AOT artifact (the once-offline
    answer to XLA's 27x int8 compile cost): the exported StableHLO of a
    quantized model must carry the int8 forward, not the f32 one."""
    from fastervit_tpu.ops.quant import quantize_variables, quantized_call

    kw = dict(depths=[1, 1, 1, 1], num_heads=[1, 2, 4, 8], dim=32,
              in_dim=16, resolution=64, num_classes=10)
    m = fvt.create_model("faster_vit_0_224", **kw)
    v = m.init(jax.random.PRNGKey(0))
    mq = fvt.create_model("faster_vit_0_224", quantized=True, **kw)
    vq = quantize_variables(v)
    blob, _ = export_stablehlo(mq, vq, batch_size=2)
    fn = load_stablehlo(blob)
    x = jnp.asarray(np.random.RandomState(3).randn(2, 64, 64, 3),
                    jnp.float32)
    want = np.asarray(quantized_call(mq.module.apply, vq, x))
    got = np.asarray(fn(x))
    np.testing.assert_allclose(got, want, atol=1e-5)
    # and it is genuinely the int8 graph, not a f32 re-trace
    f32 = np.asarray(m.apply(v, x))
    assert np.abs(got - f32).max() > 1e-6
