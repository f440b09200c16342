"""Downstream CLI entrypoints (reference dino/main.py, motrv2/main.py,
submit_dance.py analogs) — synthetic smoke runs on tiny models."""
import os

import numpy as np
import pytest
from PIL import Image


def test_detection_main_synthetic(tmp_path):
    from fastervit_tpu.detection.main import main

    out = main([
        "--config", "configs/dino/dino_4scale_faster_vit_4_21k_224.py",
        "--options", "backbone=faster_vit_0_224",
        "backbone_overrides={\"depths\": [1, 1, 1, 1], \"dim\": 32, "
        "\"in_dim\": 16, \"num_heads\": [1, 2, 4, 8]}",
        "use_checkpoint=false", "epochs=1", "enc_layers=1", "dec_layers=1",
        "num_queries=12", "hidden_dim=32", "num_select=10",
        "--synthetic", "--batch-size", "1", "--image-size", "64",
        "--output", str(tmp_path)])
    assert "best_mAP" in out
    assert os.path.exists(tmp_path / "best.pkl")


def test_tracking_main_synthetic(tmp_path):
    from fastervit_tpu.tracking.main import main

    out = main([
        "--synthetic", "--epochs", "1", "--img-height", "64",
        "--img-width", "64", "--dim", "32", "--num-queries", "8",
        "--num-proposals", "2", "--enc-layers", "1", "--dec-layers", "1",
        "--backbone", "faster_vit_0_any_res", "--sampler-lengths", "2",
        "--output", str(tmp_path)])
    assert np.isfinite(out["loss"])
    assert os.path.exists(tmp_path / "checkpoint.pkl")


def test_tracking_submit_sequence(tmp_path):
    from fastervit_tpu.tracking.submit import main

    seq = tmp_path / "val" / "seq01" / "img1"
    seq.mkdir(parents=True)
    rng = np.random.RandomState(0)
    for i in range(1, 4):
        Image.fromarray(rng.randint(0, 255, (48, 64, 3), np.uint8)).save(
            seq / f"{i:08d}.jpg")
    outdir = tmp_path / "results"
    main(["--mot-path", str(tmp_path), "--split", "val",
          "--output", str(outdir), "--img-height", "64", "--img-width", "64",
          "--dim", "32", "--num-queries", "8", "--num-proposals", "2",
          "--enc-layers", "1", "--dec-layers", "1",
          "--backbone", "faster_vit_0_any_res", "--score-thresh", "0.0"])
    res = (outdir / "seq01.txt").read_text()
    # score-thresh 0 births tracks even at random init
    assert len(res.strip().split("\n")) >= 1


def test_tracking_submit_exact_path(tmp_path):
    """--exact routes through the checkpoint-exact assembly; --dtype
    bfloat16 covers the reduced-precision streaming path."""
    from fastervit_tpu.tracking.submit import main

    seq = tmp_path / "val" / "seq01" / "img1"
    seq.mkdir(parents=True)
    rng = np.random.RandomState(0)
    for i in range(1, 3):
        Image.fromarray(rng.randint(0, 255, (48, 64, 3), np.uint8)).save(
            seq / f"{i:08d}.jpg")
    outdir = tmp_path / "results"
    main(["--mot-path", str(tmp_path), "--split", "val",
          "--output", str(outdir), "--img-height", "64", "--img-width", "64",
          "--dim", "256", "--num-queries", "3", "--num-proposals", "2",
          "--enc-layers", "1", "--dec-layers", "1",
          "--backbone", "faster_vit_0_any_res", "--score-thresh", "0.0",
          "--exact", "--track-capacity", "4", "--dtype", "bfloat16"])
    assert (outdir / "seq01.txt").exists()
