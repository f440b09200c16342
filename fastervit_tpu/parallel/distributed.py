"""Multi-host initialization (reference torch.distributed/NCCL bootstrap,
train.py:392-406 and dino/util/misc.py:475-520, replaced by
jax.distributed).

One call per host process; afterwards jax.devices() spans the slice and the
GSPMD mesh in parallel/mesh.py covers all chips. Data loaders take
(process_index, process_count) for per-host input sharding — the
DistributedSampler analog.
"""
from __future__ import annotations

import logging
import os
from typing import Optional

import jax

log = logging.getLogger(__name__)


def initialize(coordinator_address: Optional[str] = None,
               num_processes: Optional[int] = None,
               process_id: Optional[int] = None) -> dict:
    """Initialize multi-host JAX if a cluster environment is detected.

    Resolution order mirrors the reference's env bootstrap: explicit args,
    then JAX/cloud-TPU auto-detection, then SLURM variables, else single
    process. Returns {'process_index', 'process_count', 'local_devices'}.
    """
    if num_processes is None and "SLURM_NTASKS" in os.environ:
        num_processes = int(os.environ["SLURM_NTASKS"])
        process_id = int(os.environ.get("SLURM_PROCID", 0))
        if coordinator_address is None:
            nodelist = os.environ.get("SLURM_STEP_NODELIST", "")
            coordinator_address = nodelist.split(",")[0].split("[")[0] or None
    if num_processes is None and "MASTER_ADDR" in os.environ \
            and "RANK" in os.environ:
        # torchrun-style env:// rendezvous (reference train.py:392-406,
        # motrv2/tools/ddp_train.sh:16)
        num_processes = int(os.environ.get("WORLD_SIZE", "1"))
        process_id = int(os.environ["RANK"])
        if coordinator_address is None:
            coordinator_address = (f"{os.environ['MASTER_ADDR']}:"
                                   f"{os.environ.get('MASTER_PORT', '8476')}")

    should_init = (coordinator_address is not None
                   or num_processes not in (None, 1)
                   or os.environ.get("JAX_COORDINATOR_ADDRESS"))
    if should_init:
        jax.distributed.initialize(coordinator_address=coordinator_address,
                                   num_processes=num_processes,
                                   process_id=process_id)
        log.info("jax.distributed initialized: process %d/%d",
                 jax.process_index(), jax.process_count())
    return {"process_index": jax.process_index(),
            "process_count": jax.process_count(),
            "local_devices": jax.local_devices()}
