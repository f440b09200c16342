"""Feature-pyramid backbone parity vs the reference DINO FasterViT
(downstream/object_detection/dino/models/dino/fastervit.py forward_raw)."""
import sys
import types
from pathlib import Path

import numpy as np
import pytest

sys.path.insert(0, str(Path(__file__).parent))
from reference_loader import _install_timm_stub  # noqa: E402

import jax.numpy as jnp  # noqa: E402

from fastervit_tpu import create_model  # noqa: E402
from fastervit_tpu.utils.convert import convert_state_dict  # noqa: E402

_DINO_DIR = "/root/reference/downstream/object_detection/dino"


def _load_dino_fastervit():
    _install_timm_stub()
    import torch

    if "util.misc" not in sys.modules:
        util = types.ModuleType("util")
        misc = types.ModuleType("util.misc")

        class NestedTensor:
            def __init__(self, tensors, mask):
                self.tensors, self.mask = tensors, mask

        misc.NestedTensor = NestedTensor
        util.misc = misc
        sys.modules["util"] = util
        sys.modules["util.misc"] = misc
    if _DINO_DIR not in sys.path:
        sys.path.insert(0, _DINO_DIR)
    import importlib.util as iu
    spec = iu.spec_from_file_location(
        "dino_fastervit", _DINO_DIR + "/models/dino/fastervit.py")
    mod = iu.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_pyramid_parity_dino_backbone():
    import torch
    dino = _load_dino_fastervit()
    torch.manual_seed(0)
    kw = dict(depths=[1, 1, 2, 2], num_heads=[1, 2, 4, 8], dim=32, in_dim=16,
              mlp_ratio=4, ct_size=2, window_size=[7, 7, 7, 7],
              hat=[False, False, True, False])
    tm = dino.FasterViT(**kw)
    tm.eval()

    jm = create_model("faster_vit_0_224", pyramid=True,
                      **{k: v for k, v in kw.items()
                         if k not in ("mlp_ratio",)})
    variables = convert_state_dict(tm.state_dict(), jm.init())

    x = np.random.RandomState(0).randn(2, 3, 224, 224).astype(np.float32)
    with torch.no_grad():
        touts = tm.forward_raw(torch.from_numpy(x))
    jouts = jm.apply(variables, jnp.asarray(x.transpose(0, 2, 3, 1)))

    assert sorted(jouts) == ["res2", "res3", "res4", "res5"]
    for i, tout in enumerate(touts):
        # forward_raw applies a stray permute(0,3,1,2) (fastervit.py:840);
        # DINO's real NestedTensor path returns plain NCHW. Undo it, then
        # compare NHWC.
        want = tout.permute(0, 2, 3, 1).numpy()      # back to NCHW
        want = want.transpose(0, 2, 3, 1)             # NCHW -> NHWC
        got = np.asarray(jouts[f"res{i + 2}"])
        assert got.shape == want.shape, (i, got.shape, want.shape)
        np.testing.assert_allclose(got, want, atol=2e-4, rtol=1e-3,
                                   err_msg=f"level {i}")


def test_msda_module_shapes():
    import jax
    from fastervit_tpu.ops.msda import MSDeformAttnModule
    shapes = ((8, 8), (4, 4))
    s = sum(h * w for h, w in shapes)
    m = MSDeformAttnModule(d_model=64, n_levels=2, n_heads=4, n_points=2)
    q = jnp.ones((2, 10, 64))
    ref = jnp.tile(jnp.linspace(0.1, 0.9, 10)[None, :, None, None], (2, 1, 2, 2))
    feats = jnp.ones((2, s, 64))
    variables = m.init(jax.random.PRNGKey(0), q, ref, feats, shapes)
    out = m.apply(variables, q, ref, feats, shapes)
    assert out.shape == (2, 10, 64)
    assert np.isfinite(np.asarray(out)).all()


def test_frozen_param_labels():
    import jax
    from fastervit_tpu.models.fastervit import frozen_param_labels
    jm = create_model("faster_vit_0_224", depths=[1, 1, 1, 1],
                      num_heads=[1, 2, 4, 8], dim=32, in_dim=16, resolution=64)
    params = jax.eval_shape(lambda: jm.init())["params"]
    labels = frozen_param_labels(params, frozen_stages=3)
    flat = jax.tree_util.tree_flatten_with_path(labels)[0]
    frozen_tops = {p[0].key for p, v in flat if v == "frozen"}
    assert frozen_tops == {"patch_embed", "levels_0", "levels_1"}
    labels0 = frozen_param_labels(params, frozen_stages=-1)
    assert all(v == "trainable" for _, v in
               jax.tree_util.tree_flatten_with_path(labels0)[0])

def test_pyramid_rectangular_input_with_padding():
    """Detection-style odd input (e.g. 200x320): stage maps pad to window
    multiples internally and crop back; output strides stay 4/8/16/32."""
    jm = create_model("faster_vit_0_224", pyramid=True, depths=[1, 1, 1, 1],
                      num_heads=[1, 2, 4, 8], dim=32, in_dim=16,
                      resolution=[200, 320])
    x = jnp.zeros((1, 200, 320, 3))
    v = jm.module.init(__import__("jax").random.PRNGKey(0), x)
    outs = jm.module.apply(v, x)
    assert outs["res2"].shape == (1, 50, 80, 32)
    assert outs["res3"].shape == (1, 25, 40, 64)
    assert outs["res4"].shape == (1, 13, 20, 128)   # ceil(25/2), 40/2
    assert outs["res5"].shape == (1, 7, 10, 256)
    for k, o in outs.items():
        assert np.isfinite(np.asarray(o)).all(), k
