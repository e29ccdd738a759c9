"""Host-level distributed utilities.

Covers the reference's ``dist_utils`` surface (reference:
src/vilt/modules/dist_utils.py:84-224 — pickled-object all_gather/gather,
reduce_dict, synchronize, rank queries) with the JAX-native equivalents:
in-jit tensor collectives come from shardings (parallel/mesh.py); these
helpers handle the host-side cases (eval result assembly, rank-0 file
merges).
"""

from __future__ import annotations

from typing import Any, Dict, List

import jax
import numpy as np


def get_rank() -> int:
    return jax.process_index()


def get_world_size() -> int:
    return jax.process_count()


def is_main_process() -> bool:
    return jax.process_index() == 0


def synchronize() -> None:
    """Cross-host barrier (the reference's dist.barrier)."""
    if jax.process_count() > 1:
        from jax.experimental import multihost_utils

        multihost_utils.sync_global_devices("vlm_tpu_sync")


def fetch_global(x) -> np.ndarray:
    """``np.asarray`` that also works for GLOBAL jax.Arrays on multi-host
    runs: a batch-sharded jit output spans other hosts' devices
    (``is_fully_addressable`` False), where a plain np.asarray raises —
    gather it to every process first.  Single-host / replicated values
    take the plain path."""
    if isinstance(x, jax.Array) and not x.is_fully_addressable:
        from jax.experimental import multihost_utils

        return np.asarray(multihost_utils.process_allgather(x, tiled=True))
    return np.asarray(x)


def process_rows(n_global_rows: int) -> slice:
    """This process's contiguous row share of a global, device-divisible
    batch (the ShardedBatchSampler / ``parallel.global_put`` contract:
    rank r holds rows [r·share, (r+1)·share))."""
    share = n_global_rows // jax.process_count()
    lo = jax.process_index() * share
    return slice(lo, lo + share)


def all_gather_objects(obj: Any) -> List[Any]:
    """Gather an arbitrary picklable object from every process
    (reference dist_utils.all_gather:84-122, which likewise pickles to a
    byte tensor, all-gathers the sizes, pads to the max, then gathers).
    process_allgather alone only handles same-shaped numeric pytrees, so
    ragged/string payloads go through the same pickle+pad protocol."""
    if jax.process_count() == 1:
        return [obj]
    import pickle

    from jax.experimental import multihost_utils

    payload = np.frombuffer(pickle.dumps(obj), np.uint8)
    sizes = multihost_utils.process_allgather(np.int64(payload.size))
    sizes = np.asarray(sizes).reshape(-1)
    padded = np.zeros(int(sizes.max()), np.uint8)
    padded[:payload.size] = payload
    rows = np.asarray(multihost_utils.process_allgather(padded))
    return [pickle.loads(rows[r, :int(sizes[r])].tobytes())
            for r in range(jax.process_count())]


def reduce_dict(d: Dict[str, float], average: bool = True) -> Dict[str, float]:
    """Sum (or mean) scalar dicts across processes
    (reference dist_utils.reduce_dict)."""
    if jax.process_count() == 1:
        return dict(d)
    gathered = all_gather_objects(d)
    out: Dict[str, float] = {}
    for g in gathered:
        for k, v in g.items():
            out[k] = out.get(k, 0.0) + float(v)
    if average:
        out = {k: v / len(gathered) for k, v in out.items()}
    return out
