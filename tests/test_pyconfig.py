"""PyConfig: python-file configs with _base_ inheritance / _delete_ / dotted
overrides (reference util/slconfig.py semantics)."""
import numpy as np
import pytest

pytestmark = pytest.mark.smoke

from fastervit_tpu.utils.pyconfig import PyConfig


def test_base_inheritance_and_override(tmp_path):
    (tmp_path / "base.py").write_text("lr = 0.1\nmodel = dict(dim=64, n=2)\n")
    (tmp_path / "child.py").write_text(
        "_base_ = ['base.py']\nlr = 0.2\nmodel = dict(dim=128)\nnew = 7\n")
    cfg = PyConfig.fromfile(tmp_path / "child.py")
    assert cfg.lr == 0.2
    assert cfg.model.dim == 128          # child wins
    assert cfg.model.n == 2              # base survives deep-merge
    assert cfg.new == 7


def test_delete_key_replaces_dict(tmp_path):
    (tmp_path / "base.py").write_text("model = dict(dim=64, n=2)\n")
    (tmp_path / "child.py").write_text(
        "_base_ = ['base.py']\nmodel = dict(_delete_=True, dim=128)\n")
    cfg = PyConfig.fromfile(tmp_path / "child.py")
    assert cfg.model == {"dim": 128}     # base 'n' gone


def test_duplicate_base_keys_rejected(tmp_path):
    (tmp_path / "a.py").write_text("x = 1\n")
    (tmp_path / "b.py").write_text("x = 2\n")
    (tmp_path / "c.py").write_text("_base_ = ['a.py', 'b.py']\n")
    with pytest.raises(KeyError):
        PyConfig.fromfile(tmp_path / "c.py")


def test_merge_from_list_literals():
    cfg = PyConfig({"lr": 0.1, "model": {"dim": 64}})
    cfg.merge_from_list(["lr=0.5", "model.dim=128", "name=abc",
                         "flags=[1, 2]"])
    assert cfg.lr == 0.5 and cfg.model.dim == 128
    assert cfg.name == "abc" and cfg.flags == [1, 2]


def test_shipped_dino_config_builds_detector():
    import jax
    import jax.numpy as jnp

    from fastervit_tpu.detection.dino import build_dino_from_config

    cfg = PyConfig.fromfile("configs/dino/dino_4scale_faster_vit_4_21k_224.py")
    assert cfg.data_aug_max_size == 1333     # from the _base_ file
    assert cfg.num_queries == 900 and cfg.hidden_dim == 256
    # shrink for a cheap forward-shape smoke test
    cfg.merge_from_list(["backbone=faster_vit_0_224", "enc_layers=1",
                         "dec_layers=1", "num_queries=10", "hidden_dim=64",
                         "num_classes=7"])
    cfg.backbone_overrides = dict(depths=(1, 1, 1, 1),
                                  num_heads=(1, 2, 4, 8), dim=32, in_dim=16,
                                  resolution=128)
    det = build_dino_from_config(cfg)
    x = jnp.zeros((1, 128, 128, 3))
    v = det.init(jax.random.PRNGKey(0), x)
    out = det.apply(v, x)
    assert out["logits"][-1].shape == (1, 10, 7)
