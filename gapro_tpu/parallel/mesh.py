"""Device mesh + multi-host helpers.

The reference's distributed layer is DDP over NCCL
(ISBNet/isbnet/util/dist.py:9-70, ISBNet/tools/train.py:300-303). The
TPU-native equivalent is one `jax.sharding.Mesh` over ICI:

  * DP = shard the scene micro-batch axis; XLA inserts the gradient psum
    (train/step.py `make_dp_train_step`);
  * cross-host DCN is handled by `jax.distributed.initialize` — the analog
    of the reference's `init_process_group(backend="nccl")`;
  * result collection across processes replaces the reference's pickled
    all_gather (dist.py:42-70) with `multihost_utils.process_allgather`.

Model sizes here (~30M params) need no TP/PP: params replicate, activations
shard on the batch axis (SURVEY.md §2.5).
"""

from __future__ import annotations

import os
from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def initialize_multihost(coordinator: Optional[str] = None,
                         num_processes: Optional[int] = None,
                         process_id: Optional[int] = None) -> None:
    """`jax.distributed.initialize` with env fallbacks (JAX_COORDINATOR etc.).
    No-op for single-process runs."""
    coordinator = coordinator or os.environ.get("JAX_COORDINATOR")
    if coordinator is None:
        return
    if os.environ.get("JAX_PLATFORMS", "").split(",")[0] == "cpu":
        # multi-process CPU (tests / local smoke) needs a cross-process
        # collectives backend; without it each process builds an isolated
        # client and process_count() stays 1
        jax.config.update("jax_cpu_collectives_implementation", "gloo")
    jax.distributed.initialize(
        coordinator_address=coordinator,
        num_processes=num_processes or int(os.environ["JAX_NUM_PROCESSES"]),
        process_id=process_id or int(os.environ["JAX_PROCESS_ID"]),
    )


def data_parallel_mesh(n_devices: Optional[int] = None) -> Mesh:
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    return Mesh(np.array(devs), ("dp",))


def replicate(tree, mesh: Mesh):
    """Place a pytree replicated on every mesh device."""
    sharding = NamedSharding(mesh, P())
    return jax.device_put(tree, sharding)


def shard_batch(tree, mesh: Mesh):
    """Place a pytree with leading dp axis sharded across the mesh."""
    sharding = NamedSharding(mesh, P("dp"))
    return jax.device_put(tree, sharding)


def process_allgather(tree):
    """Gather per-process results on every host (eval collection; the
    reference's collect_results_gpu analog)."""
    from jax.experimental import multihost_utils

    return multihost_utils.process_allgather(tree)
