"""Structural checks for every registered variant (cheap: jax.eval_shape).

Parameter counts must match the reference README model zoo
(/root/reference/README.md:134-279) — a full-architecture structural parity
check across the whole family without instantiating any weights.
"""
import jax
import numpy as np
import pytest

from fastervit_tpu import VARIANTS, create_model, list_models

# Exact counts measured from the reference torch models (via
# tests/reference_loader). NOTE: the reference README claims 424.6M for
# faster_vit_4 (README.md:196) but the actual code builds 365.6M — we pin to
# the code, not the README.
EXPECTED_PARAMS = {
    "faster_vit_0_224": 31_404_840,
    "faster_vit_1_224": 53_366_696,
    "faster_vit_2_224": 75_923_816,
    "faster_vit_3_224": 159_547_944,
    "faster_vit_4_224": 365_555_712,
    "faster_vit_4_21k_224": 271_944_224,
    "faster_vit_4_21k_384": 271_944_224,
    "faster_vit_4_21k_512": 271_944_224,
    "faster_vit_4_21k_768": 271_944_224,
}


def _param_count(name):
    m = create_model(name)
    shapes = jax.eval_shape(lambda: m.module.init(jax.random.PRNGKey(0),
                                                  m.dummy_input()))
    return sum(int(np.prod(p.shape)) for p in jax.tree.leaves(shapes["params"]))


@pytest.mark.parametrize("name", sorted(EXPECTED_PARAMS))
def test_param_counts_match_reference(name):
    assert _param_count(name) == EXPECTED_PARAMS[name]


def test_registry_lists_all_variants():
    names = list_models()
    assert len(names) == len(VARIANTS) == 22
    assert list_models("faster_vit_*_any_res") == [
        n for n in names if n.endswith("_any_res")]
    assert len([n for n in names if n.endswith("_any_res")]) == 11


@pytest.mark.parametrize("name", ["faster_vit_0_any_res", "faster_vit_2_any_res"])
def test_any_res_output_shapes(name):
    m = create_model(name)
    out = jax.eval_shape(lambda: m.module.init(jax.random.PRNGKey(0),
                                               m.dummy_input()))
    logits = jax.eval_shape(
        lambda v: m.module.apply(v, m.dummy_input()), out)
    assert logits.shape == (1, 1000)


def test_bfloat16_numerics_close_to_fp32():
    """bf16 compute path (the deployment/bench configuration) must stay close
    to fp32 logits — guards against accidental fp32-only assumptions."""
    import jax.numpy as jnp
    m32 = create_model("faster_vit_0_224", depths=[1, 1, 1, 1],
                       num_heads=[1, 2, 4, 8], dim=32, in_dim=16,
                       resolution=64, num_classes=10)
    m16 = type(m32)(module=type(m32.module)(cfg=m32.cfg, dtype=jnp.bfloat16),
                    cfg=m32.cfg)
    v = m32.init(jax.random.PRNGKey(0))
    x = jnp.asarray(np.random.RandomState(0).randn(2, 64, 64, 3), jnp.float32)
    a = np.asarray(m32.apply(v, x), np.float32)
    b = np.asarray(m16.apply(v, x.astype(jnp.bfloat16)), np.float32)
    # bf16 has ~3 decimal digits; logits are O(1)
    assert np.abs(a - b).max() < 0.15
    assert (np.argmax(a, -1) == np.argmax(b, -1)).mean() >= 0.5
