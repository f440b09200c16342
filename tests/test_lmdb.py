"""LMDB ImageNet storage (reference utils/datasets.py:458-498). The lmdb
package is absent in this environment, so a minimal in-process stub stands
in — it implements exactly the env/txn API surface the module uses, which is
what these tests pin down."""
import json
import os
import sys
import types

import numpy as np
import pytest


class _FakeTxn:
    def __init__(self, store, write):
        self.store, self.write = store, write

    def __enter__(self):
        return self

    def __exit__(self, *a):
        return False

    def put(self, k, v):
        self.store[bytes(k)] = bytes(v)

    def get(self, k):
        return self.store.get(bytes(k))


class _FakeEnv:
    def __init__(self, path):
        self.path = path
        os.makedirs(path, exist_ok=True)
        self._file = os.path.join(path, "data.json")
        self.store = {}
        if os.path.exists(self._file):
            with open(self._file) as f:
                self.store = {bytes.fromhex(k): bytes.fromhex(v)
                              for k, v in json.load(f).items()}

    def begin(self, write=False, buffers=False):
        return _FakeTxn(self.store, write)

    def close(self):
        with open(self._file, "w") as f:
            json.dump({k.hex(): v.hex() for k, v in self.store.items()}, f)


@pytest.fixture()
def fake_lmdb(monkeypatch):
    mod = types.ModuleType("lmdb")
    envs = {}

    def open_(path, **kw):
        if path not in envs or not kw.get("readonly"):
            envs[path] = _FakeEnv(path)
        return envs[path]

    mod.open = open_
    monkeypatch.setitem(sys.modules, "lmdb", mod)
    return mod


def _make_imagefolder(root, classes=("cat", "dog"), per_class=2):
    from PIL import Image

    for ci, cls in enumerate(classes):
        d = os.path.join(root, cls)
        os.makedirs(d, exist_ok=True)
        for i in range(per_class):
            arr = np.full((8, 8, 3), 40 * ci + i, np.uint8)
            Image.fromarray(arr).save(os.path.join(d, f"{i}.jpg"))


def test_build_and_read_roundtrip(tmp_path, fake_lmdb):
    from fastervit_tpu.data.lmdb_dataset import (LmdbImageReader,
                                                 build_imagenet_lmdb,
                                                 load_lmdb_index)

    root = str(tmp_path / "train")
    _make_imagefolder(root)
    build_imagenet_lmdb(root)
    paths, labels, classes = load_lmdb_index(root)
    assert len(paths) == 4 and classes == ["cat", "dog"]
    assert sorted(set(labels)) == [0, 1]
    reader = LmdbImageReader(root)
    img = reader.read(paths[0])
    assert img.size == (8, 8) and img.mode == "RGB"
    with pytest.raises(KeyError):
        reader.read("missing.jpg")


def test_eval_loader_via_lmdb(tmp_path, fake_lmdb):
    import fastervit_tpu as fvt
    from fastervit_tpu.data.imagenet import EvalLoader
    from fastervit_tpu.data.lmdb_dataset import build_imagenet_lmdb

    root = str(tmp_path / "val")
    _make_imagefolder(root)
    build_imagenet_lmdb(root)
    cfg = fvt.get_config("faster_vit_0_224").data
    loader = EvalLoader(root, cfg, batch_size=4, num_workers=2,
                        use_lmdb=True)
    batch = next(iter(loader))
    assert batch["image"].shape == (4, 224, 224, 3)
    assert batch["valid"].all()


def test_missing_lmdb_package_message(tmp_path, monkeypatch):
    monkeypatch.setitem(sys.modules, "lmdb", None)
    from fastervit_tpu.data.lmdb_dataset import _require_lmdb
    with pytest.raises(ImportError, match="lmdb package is required"):
        _require_lmdb()
