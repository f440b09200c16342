"""Deploy-mode position-embedding baking (Model.bake_posemb) must be
bit-identical to the live path.

Reference semantics: switch_to_deploy (faster_vit.py:263-264 for the 2D CPB
bias, :321-330 for the 1D additive embedding) precomputes each module's
tensor into a buffer so serving skips the table MLP + dense expansion. Here
the tensors land in a 'baked' variables collection that the modules read
back via has_variable, so the transform is a pure function of variables.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

import fastervit_tpu as fvt
from fastervit_tpu.models import layers as L


@pytest.fixture(scope="module")
def model_and_vars():
    model = fvt.create_model("faster_vit_0_224")
    variables = jax.jit(model.module.init)(
        jax.random.PRNGKey(0), jnp.zeros((1, 224, 224, 3)))
    return model, variables


def test_baked_forward_bit_identical(model_and_vars):
    model, variables = model_and_vars
    x = jnp.asarray(np.random.RandomState(0).randn(2, 224, 224, 3),
                    jnp.float32)
    ref = np.asarray(model.module.apply(variables, x))
    baked = model.bake_posemb(variables)
    out = np.asarray(model.module.apply(baked, x))
    np.testing.assert_array_equal(out, ref)


def test_baked_collection_contents(model_and_vars):
    model, variables = model_and_vars
    baked = model.bake_posemb(variables)["baked"]
    leaves = jax.tree_util.tree_leaves(baked)
    assert leaves, "bake produced no tensors"
    # fv0 window 7: every attention bias is (heads, S, S) with S >= 49;
    # every 1D embedding is (S, dim). All finite.
    for leaf in leaves:
        assert np.isfinite(np.asarray(leaf)).all()
    # original collections are untouched
    assert set(model.bake_posemb(variables)) == {"params", "batch_stats",
                                                 "baked"}


def test_baked_wrong_resolution_fails_loudly(model_and_vars):
    """Baked tensors are resolution-specific: applying 224-baked variables
    at another input size must raise (shape mismatch), never silently use a
    wrong bias."""
    model, variables = model_and_vars
    baked = model.bake_posemb(variables)
    x = jnp.zeros((1, 256, 256, 3), jnp.float32)
    # any-res semantics change the window geometry at 256px; the stored
    # (H, S, S) tensors no longer match
    with pytest.raises(Exception):
        jax.eval_shape(lambda v, xx: model.module.apply(v, xx), baked, x)


def test_rebake_after_weight_update_recomputes(model_and_vars):
    """bake_posemb on variables that already carry a 'baked' collection must
    recompute from the CURRENT params, not early-return the stale tensors
    (ADVICE r4): perturb a posemb param, re-bake, and require the baked
    tensors to change."""
    model, variables = model_and_vars
    baked1 = model.bake_posemb(variables)
    # perturb every param leaf under a relative_bias / pos_emb module
    def bump(path, leaf):
        names = "/".join(str(p.key) for p in path if hasattr(p, "key"))
        if "pos_emb" in names or "relative_bias" in names or "cpb" in names:
            return leaf + 0.05
        return leaf
    params2 = jax.tree_util.tree_map_with_path(bump, baked1["params"])
    changed = any(
        not np.array_equal(np.asarray(a), np.asarray(b))
        for a, b in zip(jax.tree_util.tree_leaves(baked1["params"]),
                        jax.tree_util.tree_leaves(params2)))
    assert changed, "perturbation touched no posemb params — fix the filter"
    baked2 = model.bake_posemb({**baked1, "params": params2})
    stale = all(
        np.array_equal(np.asarray(a), np.asarray(b))
        for a, b in zip(jax.tree_util.tree_leaves(baked1["baked"]),
                        jax.tree_util.tree_leaves(baked2["baked"])))
    assert not stale, "re-bake returned the stale 'baked' tensors"


def test_bias_expand_modes_share_baked_value(model_and_vars):
    """The baked bias is independent of the expansion strategy that
    produced it (gather vs separable are value-identical)."""
    model, variables = model_and_vars
    prev = L.set_bias_expand("gather")
    try:
        bg = model.bake_posemb(variables)["baked"]
        L.set_bias_expand("separable")
        bs = model.bake_posemb(variables)["baked"]
    finally:
        L.set_bias_expand(prev)
    for a, b in zip(jax.tree_util.tree_leaves(bg),
                    jax.tree_util.tree_leaves(bs)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-6)
