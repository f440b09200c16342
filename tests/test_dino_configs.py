"""DINO config library: all 16 reference configs
(dino/config/DINO/DINO_{4,5}scale_faster_vit_*.py) build a DINODetector with
the right backbone/levels/schedule fields."""
import glob
import os

import pytest

pytestmark = pytest.mark.smoke

from fastervit_tpu.detection.dino import build_dino_from_config
from fastervit_tpu.utils.pyconfig import PyConfig

CFG_DIR = os.path.join(os.path.dirname(__file__), "..", "configs", "dino")
NAMES = sorted(os.path.basename(p) for p in glob.glob(
    os.path.join(CFG_DIR, "dino_*.py")))


def test_sixteen_configs_present():
    assert len(NAMES) == 16, NAMES
    assert sum("5scale" in n for n in NAMES) == 6
    assert sum("4scale" in n for n in NAMES) == 10


@pytest.mark.parametrize("name", NAMES)
def test_config_builds(name):
    cfg = PyConfig.fromfile(os.path.join(CFG_DIR, name))
    det = build_dino_from_config(cfg)
    assert det.num_queries == 900 and det.dim == 256
    scale = 5 if "5scale" in name else 4
    assert det.num_feature_levels == scale
    assert len(det.return_interm_indices) == scale - 1
    # backbone name embedded in the file name matches the config
    want_backbone = "faster_vit_" + name.split("faster_vit_")[1].replace(
        ".py", "").replace("_12ep", "").replace("_24ep", "").replace(
        "_36ep", "")
    assert cfg["backbone"] == want_backbone
    # reference schedules: 12ep/lr_drop 11, 24ep/18, 36ep/30
    drop = {12: 11, 24: 18, 36: 30}[int(cfg.get("epochs", 12))]
    assert int(cfg.get("lr_drop", 11)) == drop
    assert float(cfg["lr"]) == 1e-4 and float(cfg["lr_backbone"]) == 1e-5
