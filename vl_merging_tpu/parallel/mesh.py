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


def initialize_multihost() -> None:
    """Bootstrap multi-host JAX from cluster env vars if present.

    Replaces OMPIClusterEnvironment (run.py:70-138): JAX's own
    coordinator-based rendezvous reads standard cluster env vars
    (or explicit ones) and wires DCN collectives.
    """
    if os.environ.get("JAX_COORDINATOR_ADDRESS") or \
            os.environ.get("MEGASCALE_COORDINATOR_ADDRESS"):
        jax.distributed.initialize()


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


def shard_batch(batch: Dict, mesh: Mesh) -> Dict:
    sh = batch_sharding(mesh)
    return {k: jax.device_put(v, sh) if v is not None else None
            for k, v in batch.items()}
