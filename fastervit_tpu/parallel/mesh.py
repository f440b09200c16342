"""Device-mesh and sharding helpers.

The reference's only parallelism is NCCL data-parallel DDP + SyncBN
(SURVEY.md §2.10). The TPU-native equivalent is GSPMD: a 1-D 'data' mesh,
batch-sharded inputs, replicated params. XLA then inserts the gradient
all-reduce and — because BatchNorm reduces over the sharded batch axis —
computes *global-batch* BN statistics automatically, subsuming torch SyncBN
and the post-epoch distribute_bn reduction (train.py:467-478, 751-754).

A second optional 'model' axis shards attention heads / MLP features (tensor
parallel) for the larger family members; unused (size 1) by default.
"""
from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
MODEL_AXIS = "model"


def create_mesh(devices: Optional[Sequence] = None, model_parallel: int = 1) -> Mesh:
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    assert n % model_parallel == 0, (n, model_parallel)
    arr = np.asarray(devices).reshape(n // model_parallel, model_parallel)
    return Mesh(arr, (DATA_AXIS, MODEL_AXIS))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading (batch) axis over the data axis."""
    return NamedSharding(mesh, P(DATA_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, batch):
    """Place a host batch pytree onto the mesh, batch-sharded."""
    sh = batch_sharding(mesh)
    return jax.tree.map(lambda x: jax.device_put(x, sh), batch)


def shard_batch_global(mesh: Mesh, local_batch):
    """Multi-process analog of shard_batch: each process passes its *local*
    slice of the global batch (the loader's process_index/process_count
    sharding, e.g. data/imagenet.py:65) and gets back global batch-sharded
    jax.Arrays spanning all processes — the DistributedSampler + DDP input
    contract (reference train.py:392-406) in GSPMD form. Also correct in
    the single-process case, where it reduces to shard_batch."""
    sh = batch_sharding(mesh)
    nproc = jax.process_count()

    def put(x):
        x = np.asarray(x)
        return jax.make_array_from_process_local_data(
            sh, x, (x.shape[0] * nproc,) + tuple(x.shape[1:]))

    return jax.tree.map(put, local_batch)
