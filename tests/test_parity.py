"""Numerical parity: fastervit_tpu (JAX) vs the reference PyTorch model.

Random-initialized reference weights are converted through
fastervit_tpu.utils.convert and the two models must agree on logits to fp32
tolerance — this exercises every layout/numerics subtlety at once (BN eps,
16·sigmoid CPB bias, ct token ordering, propagation, pad/crop). Mirrors the
reference's own kernel-vs-reference test strategy (SURVEY.md §4 item 4).
"""
import sys
from pathlib import Path

import numpy as np
import pytest

sys.path.insert(0, str(Path(__file__).parent))
from reference_loader import load_reference  # noqa: E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from fastervit_tpu import create_model  # noqa: E402
from fastervit_tpu.utils.convert import convert_state_dict  # noqa: E402


def _compare(name: str, torch_kwargs: dict, jax_kwargs: dict, resolution,
             batch: int = 2, atol: float = 2e-4, any_res: bool = False,
             features: bool = False):
    import torch
    fv = load_reference()
    torch.manual_seed(0)
    full = name.replace("_224", "_any_res") if any_res else name
    tm = fv.create_model(full, **torch_kwargs)
    tm.eval()

    jm = create_model(full, **jax_kwargs)
    variables = convert_state_dict(tm.state_dict(), jm.init())

    rng = np.random.RandomState(42)
    h, w = resolution
    x = rng.randn(batch, 3, h, w).astype(np.float32)
    with torch.no_grad():
        if features:
            ty = tm.forward_features(torch.from_numpy(x)).numpy().transpose(0, 2, 3, 1)
        else:
            ty = tm(torch.from_numpy(x)).numpy()
    jy = np.asarray(jm.apply(variables, jnp.asarray(x.transpose(0, 2, 3, 1)),
                             return_features=features))
    np.testing.assert_allclose(jy, ty, atol=atol, rtol=1e-3)
    return float(np.abs(jy - ty).max())


def test_parity_faster_vit_0_224():
    diff = _compare("faster_vit_0_224", {}, {}, (224, 224))
    print("max |diff| fv0:", diff)


def test_parity_tiny_propagation_layer_scale():
    """Small custom config exercising layer_scale, carrier-token propagation,
    and the hat pos-embed path (reference faster_vit.py:693-700)."""
    kw = dict(depths=[1, 1, 2, 2], num_heads=[1, 2, 4, 8], dim=32, in_dim=16,
              layer_scale=1e-5, do_propagation=True)
    diff = _compare("faster_vit_0_224", kw, kw, (224, 224))
    print("max |diff| tiny-prop:", diff)


def test_parity_any_res_rectangular():
    """Rectangular input with runtime pad/crop and non-square sr_ratio
    (reference faster_vit_any_res.py:824-870)."""
    kw = dict(depths=[1, 1, 2, 1], num_heads=[1, 2, 4, 8], dim=32, in_dim=16,
              resolution=[96, 160])
    diff = _compare("faster_vit_0_224", kw, kw, (96, 160), any_res=True)
    print("max |diff| any-res:", diff)


def test_parity_21k_style_global_attention():
    """21k-variant geometry: stage-2 window == resolution (sr=1, HAT off,
    global single-window attention; reference faster_vit.py:1255-1284)."""
    kw = dict(depths=[1, 1, 1, 1], num_heads=[1, 2, 4, 8], dim=32, in_dim=16,
              window_size=[7, 7, 14, 7], hat=[False, False, False, False],
              layer_scale=1e-5)
    diff = _compare("faster_vit_0_224", kw, kw, (224, 224))
    print("max |diff| 21k-style:", diff)


def test_parity_features():
    """forward_features parity (pre-head NHWC feature map)."""
    kw = dict(depths=[1, 1, 2, 2], num_heads=[1, 2, 4, 8], dim=32, in_dim=16)
    diff = _compare("faster_vit_0_224", kw, kw, (224, 224), features=True)
    print("max |diff| features:", diff)


@pytest.mark.slow
def test_parity_faster_vit_2_224():
    diff = _compare("faster_vit_2_224", {}, {}, (224, 224), batch=1)
    print("max |diff| fv2:", diff)


@pytest.mark.slow
def test_parity_faster_vit_1_224():
    diff = _compare("faster_vit_1_224", {}, {}, (224, 224), batch=1)
    print("max |diff| fv1:", diff)


@pytest.mark.slow
def test_parity_faster_vit_3_224():
    """Exercises layer_scale + propagation at full production scale."""
    diff = _compare("faster_vit_3_224", {}, {}, (224, 224), batch=1,
                    atol=5e-4)
    print("max |diff| fv3:", diff)


def test_export_state_dict_roundtrip():
    """flax -> torch state_dict -> flax must be the identity, and the torch
    reference must accept the exported dict (strict load)."""
    import torch
    from fastervit_tpu.utils.convert import convert_state_dict, export_state_dict
    fv = load_reference()
    kw = dict(depths=[1, 1, 1, 1], num_heads=[1, 2, 4, 8], dim=32, in_dim=16)
    jm = create_model("faster_vit_0_224", **kw)
    v = jm.init()
    sd = export_state_dict(v)
    tm = fv.create_model("faster_vit_0_224", **kw)
    tsd = {k: torch.from_numpy(val) for k, val in sd.items()
           if k in tm.state_dict()}
    missing = [k for k in tm.state_dict()
               if k not in tsd and "num_batches_tracked" not in k
               and not k.endswith(("relative_coords_table",
                                   "relative_position_index",
                                   "relative_bias"))]
    assert not missing, missing
    tm.load_state_dict(tsd, strict=False)
    back = convert_state_dict(sd, jm.init())
    jax.tree.map(lambda a, b: np.testing.assert_array_equal(
        np.asarray(a), np.asarray(b)), v, back)


@pytest.mark.slow
def test_parity_faster_vit_4_21k_224():
    """271M-param 21k variant: stage-2 window == resolution (global
    attention), squash-crop data config."""
    diff = _compare("faster_vit_4_21k_224", {}, {}, (224, 224), batch=1,
                    atol=5e-4)
    print("max |diff| fv4-21k:", diff)


@pytest.mark.slow
def test_parity_faster_vit_4_224():
    diff = _compare("faster_vit_4_224", {}, {}, (224, 224), batch=1,
                    atol=5e-4)
    print("max |diff| fv4:", diff)


@pytest.mark.slow
def test_parity_faster_vit_5_224():
    """975M params — the largest hat-propagation variant."""
    diff = _compare("faster_vit_5_224", {}, {}, (224, 224), batch=1,
                    atol=1e-3)
    print("max |diff| fv5:", diff)


@pytest.mark.slow
def test_parity_faster_vit_6_224():
    """1.36B params (reference README.md:212-221)."""
    diff = _compare("faster_vit_6_224", {}, {}, (224, 224), batch=1,
                    atol=1e-3)
    print("max |diff| fv6:", diff)


@pytest.mark.slow
def test_parity_faster_vit_4_21k_384():
    """Large-window variant at native res: stage-2 S=576 takes the flash
    attention path on TPU, jnp here (faster_vit.py:1297-1326)."""
    diff = _compare("faster_vit_4_21k_384", {}, {}, (384, 384), batch=1,
                    atol=1e-3)
    print("max |diff| fv4-21k-384:", diff)


@pytest.mark.slow
def test_parity_faster_vit_4_21k_512():
    diff = _compare("faster_vit_4_21k_512", {}, {}, (512, 512), batch=1,
                    atol=1e-3)
    print("max |diff| fv4-21k-512:", diff)


@pytest.mark.slow
def test_parity_faster_vit_4_21k_768():
    """S=2304 windows — the largest attention extent in the family
    (faster_vit.py:1381-1410)."""
    diff = _compare("faster_vit_4_21k_768", {}, {}, (768, 768), batch=1,
                    atol=2e-3)
    print("max |diff| fv4-21k-768:", diff)
