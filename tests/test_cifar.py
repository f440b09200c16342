"""CIFAR loader tests over a synthetic pickle-batch directory."""
import os
import pickle

import numpy as np
import pytest

from fastervit_tpu.data.cifar import (CifarLoader, get_loaders, load_cifar,
                                      my_random_split)


@pytest.fixture
def cifar_root(tmp_path):
    d = tmp_path / "cifar-10-batches-py"
    d.mkdir()
    rng = np.random.RandomState(0)
    for i in range(1, 6):
        with open(d / f"data_batch_{i}", "wb") as f:
            pickle.dump({"data": rng.randint(0, 255, (20, 3072), np.uint8),
                         "labels": rng.randint(0, 10, 20).tolist()}, f)
    with open(d / "test_batch", "wb") as f:
        pickle.dump({"data": rng.randint(0, 255, (30, 3072), np.uint8),
                     "labels": rng.randint(0, 10, 30).tolist()}, f)
    return str(tmp_path)


def test_load_and_shapes(cifar_root):
    x, y = load_cifar(cifar_root, "cifar10", train=True)
    assert x.shape == (100, 32, 32, 3) and y.shape == (100,)
    xt, yt = load_cifar(cifar_root, "cifar10", train=False)
    assert xt.shape == (30, 32, 32, 3)


def test_my_random_split_deterministic():
    a1, b1 = my_random_split(100, [80, 20], seed=7)
    a2, b2 = my_random_split(100, [80, 20], seed=7)
    np.testing.assert_array_equal(a1, a2)
    assert len(np.intersect1d(a1, b1)) == 0
    assert len(a1) == 80 and len(b1) == 20
    a3, _ = my_random_split(100, [80, 20], seed=8)
    assert not np.array_equal(a1, a3)


def test_loaders_eval_and_search(cifar_root):
    tr, te = get_loaders(cifar_root, batch_size=16, mode="eval")
    b = next(iter(tr))
    assert b["image"].shape == (16, 32, 32, 3)
    assert abs(b["image"].mean()) < 1.0  # normalized
    assert len(te) == 2  # 30 / 16 -> 2 padded batches
    last = list(te)[-1]
    assert last["valid"].sum() == 14

    tr2, val2 = get_loaders(cifar_root, batch_size=10, mode="search",
                            search_split=70)
    assert len(val2.images) == 30
    # train loader reshuffles per epoch
    b0 = next(iter(tr2))
    tr2.set_epoch(1)
    b1 = next(iter(tr2))
    assert not np.array_equal(b0["image"], b1["image"])
