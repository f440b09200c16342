"""Multi-process distributed execution test (SURVEY.md §2.10 communication
backend; reference train.py:392-406 torchrun DDP, dino/util/misc.py:475-520).

Launches TWO separate OS processes that rendezvous through
`parallel/distributed.initialize()`'s torchrun-style env branch
(MASTER_ADDR/MASTER_PORT/RANK/WORLD_SIZE), shard the input pipeline by
`process_index` (the loader rule, data/imagenet.py:65), and run one real
train step + eval step over a 2-device global mesh — so the gradient
all-reduce, global-batch BN statistics, and metric reductions actually
cross process boundaries (Gloo CPU collectives).

Asserts: both ranks observe identical global metrics, and those metrics
match a single-process control run on an identical 2-device mesh.
"""
import json
import os
import socket
import subprocess
import sys

import pytest

WORKER = os.path.join(os.path.dirname(__file__), "multiproc_worker.py")


def _free_port():
    s = socket.socket()
    s.bind(("localhost", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def _run_world(world, tmpdir, timeout=600):
    port = _free_port()
    procs, outs = [], []
    for rank in range(world):
        out = os.path.join(str(tmpdir), f"w{world}_r{rank}.json")
        env = dict(os.environ,
                   MASTER_ADDR="localhost", MASTER_PORT=str(port),
                   RANK=str(rank), WORLD_SIZE=str(world), OUT=out)
        # workers must not inherit the 8-device test XLA_FLAGS
        env.pop("XLA_FLAGS", None)
        env.pop("JAX_PLATFORMS", None)
        procs.append(subprocess.Popen(
            [sys.executable, WORKER], env=env,
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True))
        outs.append(out)
    logs = [p.communicate(timeout=timeout)[0] for p in procs]
    for p, log in zip(procs, logs):
        assert p.returncode == 0, f"worker failed:\n{log[-3000:]}"
    return [json.load(open(o)) for o in outs]


@pytest.mark.slow
def test_two_process_train_step_matches_single_process(tmp_path):
    two = _run_world(2, tmp_path)
    one = _run_world(1, tmp_path)[0]

    # both ranks see the same replicated global metrics
    for key in ("loss", "grad_norm", "eval_loss_sum"):
        assert two[0][key] == pytest.approx(two[1][key], rel=1e-6), key
    assert two[0]["eval_top1"] == two[1]["eval_top1"]
    assert two[0]["eval_count"] == two[1]["eval_count"] == 8

    # cross-process reduction == single-process result on the same mesh
    # (identical data layout; tolerance covers collective reduction-order
    # float differences between Gloo and the single-process path)
    for key in ("loss", "grad_norm", "eval_loss_sum"):
        assert two[0][key] == pytest.approx(one[key], rel=2e-4), (
            key, two[0][key], one[key])
    assert two[0]["eval_top1"] == one["eval_top1"]
