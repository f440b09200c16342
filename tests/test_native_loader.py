"""Native (C++) decode/resample runtime vs the PIL reference path.

Mirrors the reference's kernel-vs-oracle testing pattern
(dino/models/dino/ops/test.py): the native implementation must match the
slow-but-obviously-correct path — here bit-exactly for resampling (Pillow
fixed-point algorithm) and to fp32 rounding for the fused normalize."""
import io
import os

import numpy as np
import pytest
from PIL import Image

from fastervit_tpu.data import native
from fastervit_tpu.data.preprocess import eval_transform
from fastervit_tpu.models.config import DataConfig

pytestmark = pytest.mark.skipif(not native.available(),
                                reason="native runtime unavailable")


def _jpeg_bytes(arr, quality=90):
    b = io.BytesIO()
    Image.fromarray(arr).save(b, "JPEG", quality=quality)
    return b.getvalue()


def _cfg(**kw):
    base = dict(input_size=(224, 224), crop_pct=0.875, crop_mode="center",
                interpolation="bicubic", mean=(0.485, 0.456, 0.406),
                std=(0.229, 0.224, 0.225))
    base.update(kw)
    return DataConfig(**base)


@pytest.mark.parametrize("size,box", [
    ((224, 224), None),            # upscale
    ((17, 29), None),              # downscale
    ((100, 80), (3.5, 2.25, 50.0, 30.75)),  # float box
    ((224, 224), (10, 5, 40, 30)),  # box upscale
    ((37, 53), None),              # identity
])
def test_resize_bicubic_bit_exact(size, box):
    rng = np.random.RandomState(0)
    img = rng.randint(0, 256, (37, 53, 3), np.uint8)
    ref = np.asarray(Image.fromarray(img).resize(size[::-1], Image.BICUBIC,
                                                 box=box))
    got = native.resize_bicubic(img, size, box)
    np.testing.assert_array_equal(got, ref)


def test_decode_jpeg_matches_pil():
    rng = np.random.RandomState(1)
    for shape in [(64, 48), (123, 77), (300, 400)]:
        buf = _jpeg_bytes(rng.randint(0, 256, shape + (3,), np.uint8))
        ref = np.asarray(Image.open(io.BytesIO(buf)).convert("RGB"))
        got = native.decode_jpeg(buf)
        np.testing.assert_array_equal(got, ref)
        assert native.jpeg_dims(buf) == (shape[1], shape[0])


@pytest.mark.parametrize("mode,crop_pct", [("center", 0.875),
                                           ("center", 0.95),
                                           ("squash", 0.9)])
def test_eval_batch_parity(mode, crop_pct):
    rng = np.random.RandomState(2)
    shapes = [(300, 400), (123, 77), (224, 224), (640, 480), (251, 333)]
    bufs = [_jpeg_bytes(rng.randint(0, 256, s + (3,), np.uint8))
            for s in shapes]
    cfg = _cfg(crop_pct=crop_pct, crop_mode=mode)
    out, ok = native.eval_batch(bufs, (224, 224), crop_pct, mode == "squash",
                                cfg.mean, cfg.std, num_threads=2)
    assert ok.all()
    for i, b in enumerate(bufs):
        ref = eval_transform(Image.open(io.BytesIO(b)), cfg)
        np.testing.assert_allclose(out[i], ref, atol=2e-6)


def test_eval_batch_declines_non_jpeg():
    png = io.BytesIO()
    Image.fromarray(np.zeros((32, 32, 3), np.uint8)).save(png, "PNG")
    cfg = _cfg()
    out, ok = native.eval_batch([png.getvalue()], (224, 224), 0.875, False,
                                cfg.mean, cfg.std)
    assert not ok[0]


def _make_folder(tmp_path, n_classes=2, per_class=3, png_in=None):
    rng = np.random.RandomState(3)
    for c in range(n_classes):
        d = tmp_path / f"class{c}"
        d.mkdir()
        for i in range(per_class):
            h, w = int(rng.randint(80, 320)), int(rng.randint(80, 320))
            arr = rng.randint(0, 256, (h, w, 3), np.uint8)
            if png_in == (c, i):
                Image.fromarray(arr).save(d / f"img{i}.png")
            else:
                (d / f"img{i}.jpg").write_bytes(_jpeg_bytes(arr))
    return str(tmp_path)


def test_eval_loader_native_matches_pil(tmp_path):
    from fastervit_tpu.data.imagenet import EvalLoader
    root = _make_folder(tmp_path, png_in=(0, 1))  # one PIL-fallback image
    cfg = _cfg(input_size=(64, 64))
    a = list(EvalLoader(root, cfg, batch_size=4, num_workers=2,
                        use_native=True))
    b = list(EvalLoader(root, cfg, batch_size=4, num_workers=2,
                        use_native=False))
    assert len(a) == len(b)
    for ba, bb in zip(a, b):
        np.testing.assert_allclose(ba["image"], bb["image"], atol=2e-6)
        np.testing.assert_array_equal(ba["label"], bb["label"])


def test_train_loader_native_matches_pil(tmp_path):
    from fastervit_tpu.data.train_loader import TrainLoader
    root = _make_folder(tmp_path)
    cfg = _cfg(input_size=(64, 64))
    kw = dict(batch_size=3, num_workers=2, seed=7)
    a = list(TrainLoader(root, cfg, use_native=True, **kw))
    b = list(TrainLoader(root, cfg, use_native=False, **kw))
    assert len(a) == len(b) and len(a) > 0
    for ba, bb in zip(a, b):
        # RRC resample is bit-exact, RandAugment/normalize/erasing consume
        # the identical rng stream -> batches are bit-identical
        np.testing.assert_array_equal(ba["image"], bb["image"])
        np.testing.assert_array_equal(ba["label"], bb["label"])
