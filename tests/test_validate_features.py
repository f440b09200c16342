"""validate.py feature tests: TTA oversampling reduction, real-labels
accumulator, subset logit mask."""
import json

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from PIL import Image

import fastervit_tpu as fvt
from fastervit_tpu.data.imagenet import EvalLoader
from fastervit_tpu.data.real_labels import RealLabels
from fastervit_tpu.models.config import DataConfig
from fastervit_tpu.parallel.mesh import create_mesh
from fastervit_tpu.validate import subset_logit_mask, validate


@pytest.fixture
def val_folder(tmp_path):
    rng = np.random.RandomState(0)
    for ci, cls in enumerate(["n01", "n02"]):
        d = tmp_path / "val" / cls
        d.mkdir(parents=True)
        for i in range(3):
            Image.fromarray(rng.randint(0, 255, (70, 70, 3), np.uint8)).save(
                d / f"img_{ci}_{i}.png")
    return str(tmp_path / "val")


def _tiny_model():
    return fvt.create_model("faster_vit_0_224", depths=[1, 1, 1, 1],
                            num_heads=[1, 2, 4, 8], dim=32, in_dim=16,
                            resolution=64, num_classes=4)


def test_tta_eval_runs_and_counts_once_per_image(val_folder, cpu_devices):
    model = _tiny_model()
    v = model.init(jax.random.PRNGKey(0))
    mesh = create_mesh(cpu_devices[:2])
    loader = EvalLoader(val_folder, DataConfig(input_size=(64, 64)),
                        batch_size=4, num_workers=2, tta=2)
    res = validate(model, v, loader, mesh=mesh, tta=2)
    assert res["count"] == 6  # 6 images despite 12 forward samples


def test_real_labels_accumulator():
    import tempfile, os
    d = tempfile.mkdtemp()
    path = os.path.join(d, "real.json")
    with open(path, "w") as f:
        json.dump({"a.JPEG": [1, 2], "b.JPEG": [], "c.JPEG": [5]}, f)
    rl = RealLabels(["a.JPEG", "b.JPEG", "c.JPEG"], path)
    rl.add_result(np.array([[2, 9, 9, 9, 9],     # a: top1 hit
                            [1, 2, 3, 4, 5],     # b: empty set -> skipped
                            [9, 5, 0, 0, 0]]))   # c: top1 miss, top5 hit
    assert rl._count == 2
    assert rl.get_accuracy(1) == 50.0
    assert rl.get_accuracy(5) == 100.0


def test_imagenet_v2_class_to_idx(tmp_path):
    """V2 folders are class indices as strings; the adapter parses them as
    ints instead of the lexicographic enumeration ("10" < "2") ImageFolder
    ordering would produce."""
    from fastervit_tpu.data.imagenet import index_image_folder
    from fastervit_tpu.validate import imagenet_v2_class_to_idx
    rng = np.random.RandomState(0)
    for cls in ["0", "2", "10", "999"]:
        d = tmp_path / "v2" / cls
        d.mkdir(parents=True)
        Image.fromarray(rng.randint(0, 255, (32, 32, 3), np.uint8)).save(
            d / "a.png")
    paths, labels, classes = index_image_folder(str(tmp_path / "v2"))
    c2i = imagenet_v2_class_to_idx(classes)
    assert c2i == {"0": 0, "2": 2, "10": 10, "999": 999}
    # lexicographic folder enumeration would call "10" class 1 — the adapter
    # must recover the true index for every file
    by_path = {p: c2i[classes[l]] for p, l in zip(paths, labels)}
    for p, lbl in by_path.items():
        assert f"/{lbl}/" in p


def test_subset_logit_mask(tmp_path):
    f = tmp_path / "classes.txt"
    f.write_text("n01\nn02\nn03\nn04\n")
    mask, c2i = subset_logit_mask(["n02", "n04"], str(f), num_classes=4)
    np.testing.assert_array_equal(np.isneginf(np.asarray(mask)),
                                  [True, False, True, False])
    assert c2i == {"n01": 0, "n02": 1, "n03": 2, "n04": 3}
