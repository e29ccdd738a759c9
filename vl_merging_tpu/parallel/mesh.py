"""Device mesh + sharding rules.

The reference's only training parallelism is DDP over up to 48 GPUs with an
optional fairscale ZeRO-2 plugin (reference: src/run.py:204-288, §2.11 of
SURVEY.md).  The TPU-native equivalent is a 2-D ``Mesh`` with axes
``("data", "fsdp")``:

  * batches shard over ``data`` (pure DP ≡ DDP; XLA derives the gradient
    all-reduce from replicated param sharding),
  * with ``use_sharded_training`` params/optimizer state additionally shard
    their largest aligned axis over ``fsdp`` (ZeRO-3-style; covers the
    reference's ``ddp_sharded``),
  * cross-replica contrastive negatives need no explicit all_gather: losses
    are written over the global batch inside ``jit`` and XLA inserts the
    collectives implied by the shardings.

Multi-host bootstrap goes through ``jax.distributed.initialize`` (the
replacement for the reference's OpenMPI rank discovery, run.py:70-123).
"""

from __future__ import annotations

import os
from typing import Dict, Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..models.spec import Params

DATA_AXIS = "data"
FSDP_AXIS = "fsdp"


def cluster_spec_from_env(environ=None) -> Optional[Dict[str, object]]:
    """Map cluster launcher env vars to jax.distributed.initialize kwargs.

    Replaces OMPIClusterEnvironment (reference run.py:70-138).  Priority:

      1. JAX/Megascale native vars → let jax.distributed auto-detect
         (returns {} → initialize() with no args).
      2. OpenMPI launches: ``OMPI_COMM_WORLD_{RANK,SIZE}`` give
         process_id/num_processes; the coordinator is
         ``MASTER_ADDR:MASTER_PORT`` with the reference's defaults
         (localhost:12345, run.py:119-123).
      3. Generic torchrun-style ``RANK/WORLD_SIZE/MASTER_ADDR``.

    Returns None when no multi-process launch is detected (single host).
    """
    env = os.environ if environ is None else environ
    if env.get("JAX_COORDINATOR_ADDRESS") or \
            env.get("MEGASCALE_COORDINATOR_ADDRESS"):
        return {}
    if "OMPI_COMM_WORLD_SIZE" in env and \
            int(env["OMPI_COMM_WORLD_SIZE"]) > 1:
        addr = env.get("MASTER_ADDR", "localhost")
        port = int(env.get("MASTER_PORT", 12345))
        return dict(
            coordinator_address=f"{addr}:{port}",
            num_processes=int(env["OMPI_COMM_WORLD_SIZE"]),
            process_id=int(env.get("OMPI_COMM_WORLD_RANK", 0)),
        )
    if "WORLD_SIZE" in env and int(env["WORLD_SIZE"]) > 1:
        addr = env.get("MASTER_ADDR", "localhost")
        port = int(env.get("MASTER_PORT", 12345))
        return dict(
            coordinator_address=f"{addr}:{port}",
            num_processes=int(env["WORLD_SIZE"]),
            process_id=int(env.get("RANK", 0)),
        )
    return None


def initialize_multihost(environ=None) -> bool:
    """Bootstrap multi-host JAX from cluster env vars if present.

    Replaces the reference's OMPI rank discovery + TCP rendezvous
    (run.py:70-138): JAX's coordinator-based rendezvous wires the DCN
    collectives.  Returns True if distributed init ran.
    """
    spec = cluster_spec_from_env(environ)
    if spec is None:
        return False
    jax.distributed.initialize(**spec)
    return True


def make_mesh(
    num_devices: Optional[int] = None, fsdp: int = 1,
    devices=None,
) -> Mesh:
    """1-D data mesh, optionally folding an fsdp axis (data × fsdp)."""
    if devices is None:
        devices = jax.devices()
    if num_devices is not None:
        devices = devices[:num_devices]
    n = len(devices)
    if n % fsdp != 0:
        raise ValueError(f"{n} devices not divisible by fsdp={fsdp}")
    dev_array = np.asarray(devices).reshape(n // fsdp, fsdp)
    return Mesh(dev_array, (DATA_AXIS, FSDP_AXIS))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Batches shard their leading axis over data (and fsdp, which acts as
    extra data parallelism for activations)."""
    return NamedSharding(mesh, P((DATA_AXIS, FSDP_AXIS)))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def _fsdp_spec(shape, fsdp_size: int) -> P:
    """Shard the largest axis divisible by the fsdp size; replicate others.

    Small tensors (biases, LNs, scalars) stay replicated — sharding them
    would cost more in collective latency than it saves in HBM.
    """
    if fsdp_size == 1 or not shape:
        return P()
    best_axis, best_dim = None, 0
    for i, d in enumerate(shape):
        if d % fsdp_size == 0 and d > best_dim and d >= 128:
            best_axis, best_dim = i, d
    if best_axis is None:
        return P()
    spec = [None] * len(shape)
    spec[best_axis] = FSDP_AXIS
    return P(*spec)


def param_shardings(
    params: Params, mesh: Mesh,
) -> Dict[str, NamedSharding]:
    fsdp_size = mesh.shape[FSDP_AXIS]
    return {
        k: NamedSharding(mesh, _fsdp_spec(np.shape(v), fsdp_size))
        for k, v in params.items()
    }


def shard_params(params: Params, mesh: Mesh) -> Params:
    shardings = param_shardings(params, mesh)
    return {k: jax.device_put(v, shardings[k]) for k, v in params.items()}


def global_put(arr, mesh: Mesh, spec: P):
    """Place one host array onto the mesh under ``spec``.

    Single-process: a plain sharded device_put.  Multi-host: each process
    holds only ITS slice of the global batch (ShardedBatchSampler yields
    per-host shares), so the global array must be assembled from
    process-local data — device_put would instead interpret every host's
    (different) array as the same global value and silently drop all but
    the local rows of each.
    """
    sh = NamedSharding(mesh, spec)
    if jax.process_count() > 1:
        return jax.make_array_from_process_local_data(sh, np.asarray(arr))
    return jax.device_put(arr, sh)


def shard_batch(batch: Dict, mesh: Mesh) -> Dict:
    spec = P((DATA_AXIS, FSDP_AXIS))
    return {k: global_put(v, mesh, spec) if v is not None else None
            for k, v in batch.items()}
