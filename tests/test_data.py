"""Data pipeline tests: preprocessing geometry, RandAugment determinism,
folder loaders over a synthetic ImageFolder, train-loop smoke run."""
import os

import numpy as np
import pytest
from PIL import Image

from fastervit_tpu.data.preprocess import eval_transform, normalize, resize_crop
from fastervit_tpu.data.randaugment import create_randaugment
from fastervit_tpu.data.train_loader import random_erasing, random_resized_crop
from fastervit_tpu.models.config import DataConfig


def _img(w=300, h=200, seed=0):
    rng = np.random.RandomState(seed)
    return Image.fromarray(rng.randint(0, 255, (h, w, 3), np.uint8))


def test_resize_crop_center_geometry():
    out = resize_crop(_img(300, 200), (224, 224), crop_pct=0.875,
                      crop_mode="center")
    assert out.size == (224, 224)
    # shorter side (200) scaled to 256 => width 384, crop center 224
    out2 = resize_crop(_img(300, 200), (224, 224), crop_pct=1.0,
                       crop_mode="center")
    assert out2.size == (224, 224)


def test_resize_crop_squash_ignores_aspect():
    out = resize_crop(_img(300, 100), (224, 224), crop_pct=0.95,
                      crop_mode="squash")
    assert out.size == (224, 224)


def test_eval_transform_normalized_stats():
    cfg = DataConfig(input_size=(224, 224))
    x = eval_transform(_img(), cfg)
    assert x.shape == (224, 224, 3) and x.dtype == np.float32
    assert -3.0 < x.mean() < 3.0


def test_randaugment_deterministic_and_valid():
    ra1 = create_randaugment("rand-m9-mstd0.5-inc1", seed=7)
    ra2 = create_randaugment("rand-m9-mstd0.5-inc1", seed=7)
    img = _img(224, 224)
    a, b = ra1(img), ra2(img)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    assert a.size == (224, 224)
    # spec parsing
    ra = create_randaugment("rand-m7-n3-mstd1.0-inc0")
    assert ra.magnitude == 7 and ra.num_layers == 3 and ra.mstd == 1.0
    assert not ra.increasing


def test_random_resized_crop_and_erasing():
    import random
    rng = random.Random(0)
    out = random_resized_crop(_img(), (224, 224), rng)
    assert out.size == (224, 224)
    x = normalize(np.asarray(out), (0.485, 0.456, 0.406), (0.229, 0.224, 0.225))
    x2 = random_erasing(x.copy(), random.Random(1), prob=1.0)
    assert x2.shape == x.shape and not np.array_equal(x, x2)


@pytest.fixture
def image_folder(tmp_path):
    for cls in ("class_a", "class_b"):
        d = tmp_path / "train" / cls
        d.mkdir(parents=True)
        for i in range(6):
            _img(64 + i, 64, seed=i).save(d / f"{i}.png")
    return str(tmp_path / "train")


def test_eval_loader_batches_and_padding(image_folder):
    from fastervit_tpu.data.imagenet import EvalLoader
    cfg = DataConfig(input_size=(64, 64))
    loader = EvalLoader(image_folder, cfg, batch_size=5, num_workers=2)
    batches = list(loader)
    assert len(batches) == 3  # 12 images / 5
    assert batches[0]["image"].shape == (5, 64, 64, 3)
    assert batches[-1]["valid"].sum() == 2  # 12 - 10
    assert sorted(np.concatenate([b["label"][b["valid"]] for b in batches])
                  .tolist()) == [0] * 6 + [1] * 6


def test_train_loader_epoch_shuffle(image_folder):
    from fastervit_tpu.data.train_loader import TrainLoader
    cfg = DataConfig(input_size=(64, 64))
    loader = TrainLoader(image_folder, cfg, batch_size=4, num_workers=2,
                         aa="rand-m9-mstd0.5-inc1")
    b0 = next(iter(loader))
    assert b0["image"].shape == (4, 64, 64, 3)
    loader.set_epoch(1)
    b1 = next(iter(loader))
    assert not np.array_equal(b0["label"], b1["label"]) or \
        not np.array_equal(b0["image"], b1["image"])


def test_train_cli_smoke(tmp_path):
    """One tiny synthetic epoch end-to-end through the CLI path: runs,
    writes summary.csv + a checkpoint, and resumes."""
    from fastervit_tpu.train.train import main
    out = str(tmp_path / "run")
    argv = ["--model", "faster_vit_0_224", "--synthetic",
            "--num-classes", "8", "--batch-size", "8",
            "--epochs", "1", "--warmup-epochs", "0", "--cooldown-epochs", "0",
            "--data-len", "16", "--mesa", "0.1", "--mesa-start-ratio", "0.0",
            "--output", out, "--log-interval", "1"]
    # shrink the model via model kwargs? use the smallest registered then
    # override depths through config overrides is not exposed on the CLI;
    # tiny data_len keeps it to 2 steps.
    import fastervit_tpu.train.train as T
    old = T.create_model

    def tiny_create(name, **kw):
        kw.update(depths=[1, 1, 1, 1], num_heads=[1, 2, 4, 8], dim=32,
                  in_dim=16, resolution=64)
        return old(name, **kw)

    T.create_model = tiny_create
    try:
        res = main(argv)
        assert np.isfinite(res["best_top1"])
        assert os.path.exists(os.path.join(out, "summary.csv"))
        ckpts = os.listdir(os.path.join(out, "checkpoints"))
        assert len(ckpts) >= 1
        # resume path
        res2 = main(argv + ["--resume", os.path.join(out, "checkpoints")])
        assert np.isfinite(res2["best_top1"])
    finally:
        T.create_model = old
