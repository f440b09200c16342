"""Worker for the multi-process distributed test (launched by
tests/test_multiprocess.py, NOT collected by pytest).

Exercises the reference's actual deployment shape — torchrun-style
multi-process rendezvous + per-process input sharding + cross-process
reduction (reference train.py:392-406, dino/util/misc.py:475-520) — on the
JAX CPU backend: WORLD_SIZE>1 runs jax.distributed over Gloo collectives,
WORLD_SIZE=1 is the single-process control with the same 2-device mesh.

Env in: RANK, WORLD_SIZE, MASTER_ADDR, MASTER_PORT, OUT (json path).
Writes OUT with train-step loss/grad_norm and global eval sums.
"""
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

if int(os.environ["WORLD_SIZE"]) == 1:
    # single-process control: same global mesh size (2) on one process
    flags = os.environ.get("XLA_FLAGS", "")
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=2").strip()

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import jax.numpy as jnp  # noqa: E402
from jax.sharding import NamedSharding, PartitionSpec as P  # noqa: E402

from fastervit_tpu.models.registry import create_model  # noqa: E402
from fastervit_tpu.parallel import distributed, mesh as pmesh  # noqa: E402
from fastervit_tpu.train.steps import (  # noqa: E402
    TrainConfig, create_optimizer, create_train_state, make_eval_step,
    make_train_step)

GLOBAL_BATCH = 8
DATASET = 16
RES = 64


def main():
    world = int(os.environ["WORLD_SIZE"])
    if world > 1:
        # no-arg call: exercises the torchrun MASTER_ADDR/RANK env branch
        info = distributed.initialize()
        assert info["process_count"] == world, info
    rank, nproc = jax.process_index(), jax.process_count()
    mesh = pmesh.create_mesh()
    assert mesh.devices.size == 2, mesh

    model = create_model("faster_vit_0_224", depths=[1, 1, 1, 1],
                         num_heads=[1, 2, 4, 8], dim=32, in_dim=16,
                         resolution=RES, num_classes=10)
    from fastervit_tpu.train.mixup import MixupConfig
    cfg = TrainConfig(mesa=0.0, mixup=MixupConfig(num_classes=10))
    tx = create_optimizer(lambda s: 1e-3, cfg)

    repl = NamedSharding(mesh, P())
    init_fn = jax.jit(
        lambda: create_train_state(model, tx, jax.random.PRNGKey(0), cfg),
        out_shardings=repl)
    with mesh:
        state = init_fn()

    # deterministic dataset; each process keeps the loader's
    # [process_index::process_count] shard (data/imagenet.py:65) and
    # contributes local_batch = GLOBAL_BATCH // nproc examples per step
    rs = np.random.RandomState(0)
    images = rs.randn(DATASET, RES, RES, 3).astype(np.float32)
    labels = rs.randint(0, 10, DATASET).astype(np.int32)
    if nproc > 1:
        per = GLOBAL_BATCH // nproc
        local = {"image": images[rank::nproc][:per],
                 "label": labels[rank::nproc][:per]}
    else:
        # single-process control: assemble the SAME global batch order the
        # EMULATE_PROCS-process run produces (concatenation of per-process
        # loader shards), so mixup pairings match exactly
        em = int(os.environ.get("EMULATE_PROCS", "2"))
        per = GLOBAL_BATCH // em
        order = np.concatenate([np.arange(DATASET)[r::em][:per]
                                for r in range(em)])
        local = {"image": images[order], "label": labels[order]}
    batch = pmesh.shard_batch_global(mesh, local)

    train_step = make_train_step(model.module, tx, cfg, lambda s: 1e-3)

    def step_seeded(state, batch, seed):
        return train_step(state, batch, jax.random.PRNGKey(seed))

    step_jit = jax.jit(step_seeded, static_argnums=2)
    eval_jit = jax.jit(make_eval_step(model.module))
    with mesh:
        state, metrics = step_jit(state, batch, 0)
        em = eval_jit({"params": state.params,
                       "batch_stats": state.batch_stats}, batch)
    out = {"rank": rank, "world": nproc,
           "loss": float(metrics["loss"]),
           "grad_norm": float(metrics["grad_norm"]),
           "eval_loss_sum": float(em["loss_sum"]),
           "eval_top1": int(em["top1"]),
           "eval_count": int(em["count"])}
    with open(os.environ["OUT"], "w") as f:
        json.dump(out, f)
    print("worker done:", out, flush=True)


if __name__ == "__main__":
    main()
