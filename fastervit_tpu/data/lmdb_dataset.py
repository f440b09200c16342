"""LMDB-backed ImageNet storage (reference fastervit/utils/datasets.py:
458-498 `imagenet_lmdb_dataset` / `lmdb_loader`).

Layout kept compatible with the reference so its prebuilt databases drop in:
`<root>_faster_imagefolder.lmdb` maps ascii image paths -> raw encoded
bytes; the index lives beside it. The reference pickles a torchvision
ImageFolder as `<root>_faster_imagefolder.lmdb.pt`; this rebuild writes a
plain JSON index `<root>_faster_imagefolder.lmdb.json` (no torch needed to
read it) but falls back to loading the .pt when only that exists.

The `lmdb` package is optional in this environment: import is deferred and
errors carry an actionable message. `LmdbImageReader.read(path)` returns
decoded RGB PIL images, the plug-in replacement for file loading inside the
data loaders.
"""
from __future__ import annotations

import io
import json
import os
from typing import List, Optional, Tuple


def _require_lmdb():
    try:
        import lmdb  # noqa: F401
    except ImportError as e:
        raise ImportError(
            "the lmdb package is required for LMDB datasets "
            "(pip install lmdb); ImageFolder loading works without it"
        ) from e
    import lmdb
    return lmdb


def lmdb_paths(root: str) -> Tuple[str, str, str]:
    root = root.rstrip("/")
    return (root + "_faster_imagefolder.lmdb",
            root + "_faster_imagefolder.lmdb.json",
            root + "_faster_imagefolder.lmdb.pt")


def build_imagenet_lmdb(root: str, map_size: int = int(1e12)) -> str:
    """Index an ImageFolder tree and pack every image's raw bytes into LMDB
    (reference datasets.py:479-489). Returns the lmdb path."""
    from fastervit_tpu.data.imagenet import index_image_folder

    lmdb = _require_lmdb()
    lmdb_path, json_path, _ = lmdb_paths(root)
    paths, labels, classes = index_image_folder(root)
    env = lmdb.open(lmdb_path, map_size=map_size)
    with env.begin(write=True) as txn:
        for p in paths:
            with open(p, "rb") as f:
                txn.put(p.encode("ascii"), f.read())
    env.close()
    with open(json_path, "w") as f:
        json.dump({"samples": list(zip(paths, labels)),
                   "classes": classes}, f)
    return lmdb_path


def load_lmdb_index(root: str) -> Tuple[List[str], List[int], List[str]]:
    """(paths, labels, classes) from the JSON index, or the reference's
    pickled ImageFolder (.pt) when only that exists."""
    _, json_path, pt_path = lmdb_paths(root)
    if os.path.isfile(json_path):
        with open(json_path) as f:
            idx = json.load(f)
        paths = [p for p, _ in idx["samples"]]
        labels = [int(l) for _, l in idx["samples"]]
        return paths, labels, idx.get("classes", [])
    if os.path.isfile(pt_path):
        import torch

        ds = torch.load(pt_path, map_location="cpu", weights_only=False)
        paths = [p for p, _ in ds.imgs]
        labels = [int(l) for _, l in ds.imgs]
        return paths, labels, list(getattr(ds, "classes", []))
    raise FileNotFoundError(f"no LMDB index next to {root!r} "
                            f"(looked for {json_path} and {pt_path})")


class LmdbImageReader:
    """Open-once reader returning decoded RGB PIL images
    (reference lmdb_loader, datasets.py:458-463)."""

    def __init__(self, root: str):
        lmdb = _require_lmdb()
        lmdb_path, _, _ = lmdb_paths(root)
        if not os.path.isdir(lmdb_path):
            raise FileNotFoundError(lmdb_path)
        self.env = lmdb.open(lmdb_path, readonly=True, max_readers=1,
                             lock=False, readahead=False, meminit=False)

    def read_bytes(self, path: str) -> bytes:
        with self.env.begin(write=False, buffers=True) as txn:
            data = txn.get(path.encode("ascii"))
        if data is None:
            raise KeyError(path)
        return bytes(data)

    def read(self, path: str):
        from PIL import Image

        return Image.open(io.BytesIO(self.read_bytes(path))).convert("RGB")

    def close(self):
        self.env.close()
