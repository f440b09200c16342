"""ImageNet-style input pipeline (reference utils/datasets.py + timm
create_loader, re-designed host-side for TPU feeding).

An ImageFolder directory tree (class-per-subdir) is indexed once; per-host
sharding follows `jax.process_index()` (the GSPMD analog of
DistributedSampler, samplers cited in SURVEY.md §2.10). Decode + resize run
in a thread pool; batches come out as numpy ready for device_put onto a
batch-sharded mesh. A synthetic dataset covers smoke tests and benchmarking
without data.
"""
from __future__ import annotations

import concurrent.futures as cf
import os
from typing import Iterator, List, Optional, Tuple

import numpy as np

from fastervit_tpu.data.preprocess import eval_transform
from fastervit_tpu.models.config import DataConfig

IMG_EXTENSIONS = (".jpg", ".jpeg", ".png", ".bmp", ".webp")


def index_image_folder(root: str) -> Tuple[List[str], List[int], List[str]]:
    """Walk a class-per-subdir tree -> (paths, labels, class_names)."""
    classes = sorted(d for d in os.listdir(root)
                     if os.path.isdir(os.path.join(root, d)))
    paths, labels = [], []
    for idx, cls in enumerate(classes):
        cdir = os.path.join(root, cls)
        for fname in sorted(os.listdir(cdir)):
            if fname.lower().endswith(IMG_EXTENSIONS):
                paths.append(os.path.join(cdir, fname))
                labels.append(idx)
    return paths, labels, classes


class EvalLoader:
    """Deterministic, host-sharded eval loader (last partial batch padded and
    masked via 'valid').

    `class_to_idx` remaps folder class names to label ids — used for
    ImageNet-A/R/V2 style subsets whose 200 wnid folders must map into the
    1k label space (reference README robustness table, README.md:286-367).
    """

    def __init__(self, root: str, cfg: DataConfig, batch_size: int,
                 num_workers: int = 16, process_index: int = 0,
                 process_count: int = 1, class_to_idx: Optional[dict] = None,
                 tta: int = 0, use_lmdb: bool = False,
                 use_native: str = "auto"):
        if use_lmdb:
            # LMDB-backed ImageNet (reference utils/datasets.py:458-498)
            from fastervit_tpu.data.lmdb_dataset import (LmdbImageReader,
                                                         load_lmdb_index)
            paths, labels, self.classes = load_lmdb_index(root)
            self.reader = LmdbImageReader(root)
        else:
            paths, labels, self.classes = index_image_folder(root)
            self.reader = None
        if class_to_idx is not None:
            remap = np.asarray([class_to_idx[c] for c in self.classes])
            labels = remap[np.asarray(labels)]
        self.paths = paths[process_index::process_count]
        self.labels = np.asarray(labels[process_index::process_count], np.int32)
        self.cfg = cfg
        self.batch_size = batch_size
        self.num_workers = num_workers
        if tta not in (0, 1, 2):
            raise ValueError("tta oversampling supports factor 2 (orig+hflip)")
        self.tta = tta
        if use_native == "auto":
            from fastervit_tpu.data import native
            self.use_native = native.available()
        else:
            self.use_native = bool(use_native)

    def __len__(self):
        return (len(self.paths) + self.batch_size - 1) // self.batch_size

    def _native_chunk(self, chunk) -> list:
        """Decode+resize+crop+normalize a chunk through the native (C++)
        batch runtime; per-image fallback to the PIL path for images the
        native decoder declines (non-JPEG, CMYK)."""
        from fastervit_tpu.data import native
        if self.reader is not None:
            bufs = [self.reader.read_bytes(p) for p in chunk]
        else:
            bufs = []
            for p in chunk:
                with open(p, "rb") as f:
                    bufs.append(f.read())
        h, w = self.cfg.input_size
        out, ok = native.eval_batch(
            bufs, (h, w), self.cfg.crop_pct, self.cfg.crop_mode == "squash",
            self.cfg.mean, self.cfg.std, num_threads=self.num_workers)
        imgs = list(out)
        for i in np.nonzero(~ok)[0]:
            src = self.reader.read(chunk[i]) if self.reader else chunk[i]
            imgs[i] = eval_transform(src, self.cfg)
        return imgs

    def __iter__(self) -> Iterator[dict]:
        h, w = self.cfg.input_size
        factor = self.tta if self.tta > 1 else 1
        per_batch = self.batch_size // factor
        with cf.ThreadPoolExecutor(self.num_workers) as pool:
            for start in range(0, len(self.paths), per_batch):
                chunk = self.paths[start:start + per_batch]
                if self.use_native:
                    imgs = self._native_chunk(chunk)
                else:
                    src = (chunk if self.reader is None
                           else [self.reader.read(p) for p in chunk])
                    imgs = list(pool.map(lambda p: eval_transform(p, self.cfg),
                                         src))
                if factor == 2:
                    imgs = [im for x in imgs for im in (x, x[:, ::-1])]
                n = len(imgs)
                batch = np.zeros((self.batch_size, h, w, 3), np.float32)
                batch[:n] = np.stack(imgs)
                labels = np.zeros((self.batch_size,), np.int32)
                labels[:n] = np.repeat(self.labels[start:start + len(chunk)],
                                       factor)
                valid = np.zeros((self.batch_size,), bool)
                valid[:n] = True
                yield {"image": batch, "label": labels, "valid": valid}


class SyntheticLoader:
    """Random data with the right shapes — smoke tests / benchmarking."""

    def __init__(self, cfg: DataConfig, batch_size: int, num_batches: int = 16,
                 num_classes: int = 1000, seed: int = 0):
        self.cfg, self.batch_size = cfg, batch_size
        self.num_batches, self.num_classes = num_batches, num_classes
        self.seed = seed

    def __len__(self):
        return self.num_batches

    def __iter__(self):
        rng = np.random.RandomState(self.seed)
        h, w = self.cfg.input_size
        for _ in range(self.num_batches):
            yield {
                "image": rng.randn(self.batch_size, h, w, 3).astype(np.float32),
                "label": rng.randint(0, self.num_classes,
                                     self.batch_size).astype(np.int32),
                "valid": np.ones((self.batch_size,), bool),
            }
