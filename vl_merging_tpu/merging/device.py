"""HBM-resident merging: the interpolation / task-vector transforms as one
jitted pytree function over a FLEET of checkpoints (north star: "a vmapped
pytree transform over HBM-resident checkpoints").

The host path (`merging/core.py`) remains the contract surface — its NumPy /
torch-CPU arithmetic is bit-identical to the executed reference
(vilt_module.py:533-746) and is what `merge.py` uses.  This module is the
device FAST PATH for sweeps: merging K checkpoints × R ratios in one XLA
dispatch, with every intermediate resident in HBM.  The math is the same
elementwise lerp per key, so the per-checkpoint result matches the host path
to f32 ulp (XLA FMA contraction and f32 ratio arithmetic are the only
divergences — test-pinned ≤4 ulp at operand scale on the CPU backend);
RegMean is
deliberately NOT offered here — its contract is f64 LAPACK bit-identity and
the TPU MXU has no f64.

Layout: a fleet is a flat ``{name: jnp.ndarray}`` dict whose leaves carry a
leading fleet axis (K, *param_shape) — built by :func:`stack_checkpoints`.
Because the merge math is purely elementwise, broadcasting over the leading
axis IS the vmap; ``merge_ratio`` may likewise be a scalar or a (K,) vector
(one ratio per fleet member), which is how a ratio sweep of a single
checkpoint runs as one dispatch.
"""

from __future__ import annotations

from functools import partial
from typing import Dict, List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from .core import (LAYER_ORDERS, _param_names, _passthrough,
                   modalities_for_layer)

Fleet = Dict[str, jax.Array]


def stack_checkpoints(state_dicts: Sequence[Dict[str, np.ndarray]],
                      device=None) -> Fleet:
    """Stack K same-keyed checkpoints into one fleet pytree on device.

    One ``device_put`` per key (K stacked host arrays), so the whole fleet
    lands in HBM in a single transfer pass.
    """
    keys = state_dicts[0].keys()
    for sd in state_dicts[1:]:
        if sd.keys() != keys:
            missing = set(keys) ^ set(sd.keys())
            raise ValueError(f"fleet checkpoints disagree on keys: {missing}")
    out = {}
    for k in keys:
        stacked = np.stack([np.asarray(sd[k]) for sd in state_dicts])
        out[k] = jax.device_put(stacked, device)
    return out


def _bshape(x: jax.Array, ratio) -> jax.Array:
    """Broadcast a scalar or (K,) per-fleet-member ratio against (K, ...)."""
    r = jnp.asarray(ratio, jnp.float32)
    if r.ndim == 0:
        return r.astype(x.dtype)
    return r.reshape(r.shape + (1,) * (x.ndim - 1)).astype(x.dtype)


def _merge_tree(state: Fleet, central: Optional[Fleet], merge_ratio,
                sum_lambda, *, kind: str, num_layers: int,
                vlffn_start_layer_index: int, loss_names: Dict[str, float],
                only_activate_used_experts: bool) -> Fleet:
    """Traced body shared by both transforms — same control flow as the host
    path (key presence is static, so the fallback branches resolve at trace
    time exactly like core.merge_weights / core.sum_task_vectors)."""
    new = _passthrough(state)
    for i in range(num_layers):
        mods = modalities_for_layer(i, vlffn_start_layer_index, loss_names,
                                    only_activate_used_experts)
        for pair in LAYER_ORDERS:
            for name_fn, merged_name in _param_names(pair, i):
                present = [m for m in mods if name_fn(m) in state]
                if len(present) != len(mods):
                    # reference fallback: keep the existing merged weight
                    new[merged_name] = state[merged_name]
                    continue
                if kind == "interp":
                    if len(mods) == 1:
                        ratios: Dict[str, object] = {mods[0]: 1.0}
                    elif len(mods) == 3:
                        ratios = {"v": (2 / 3) * merge_ratio,
                                  "l": (2 / 3) * (1 - merge_ratio),
                                  "vl": 1 / 3}
                    else:
                        ratios = {"v": merge_ratio, "l": 1 - merge_ratio}
                    acc = 0
                    for m in mods:
                        w = state[name_fn(m)]
                        acc = acc + _bshape(w, ratios[m]) * w
                else:  # task-vector sequential lerp (core.sum_task_vectors)
                    lam = 1.0 if len(mods) == 1 else sum_lambda
                    acc = central[merged_name]
                    for m in mods:
                        w = state[name_fn(m)]
                        acc = acc + _bshape(w, lam) * (w - acc)
                new[merged_name] = acc
    return new


@partial(jax.jit, static_argnames=("num_layers", "vlffn_start_layer_index",
                                   "loss_key", "only_activate_used_experts"))
def _merge_weights_jit(state, merge_ratio, *, num_layers,
                       vlffn_start_layer_index, loss_key,
                       only_activate_used_experts):
    return _merge_tree(state, None, merge_ratio, None, kind="interp",
                       num_layers=num_layers,
                       vlffn_start_layer_index=vlffn_start_layer_index,
                       loss_names=dict(loss_key),
                       only_activate_used_experts=only_activate_used_experts)


@partial(jax.jit, static_argnames=("num_layers", "vlffn_start_layer_index",
                                   "loss_key", "only_activate_used_experts"))
def _sum_task_vectors_jit(state, central, sum_lambda, *, num_layers,
                          vlffn_start_layer_index, loss_key,
                          only_activate_used_experts):
    return _merge_tree(state, central, None, sum_lambda, kind="task_vector",
                       num_layers=num_layers,
                       vlffn_start_layer_index=vlffn_start_layer_index,
                       loss_names=dict(loss_key),
                       only_activate_used_experts=only_activate_used_experts)


def _loss_key(loss_names: Dict[str, float]):
    return tuple(sorted(loss_names.items()))


def merge_weights_device(state: Fleet, *, num_layers: int,
                         vlffn_start_layer_index: int,
                         loss_names: Dict[str, float],
                         merge_ratio=0.5,
                         only_activate_used_experts: bool = False) -> Fleet:
    """Interpolation merging on device (core.merge_weights semantics).

    ``state`` leaves may carry a leading fleet axis; ``merge_ratio`` may be a
    scalar or a (K,) vector for a per-member ratio sweep.  One XLA dispatch
    merges the whole fleet.
    """
    return _merge_weights_jit(
        state, jnp.asarray(merge_ratio, jnp.float32),
        num_layers=num_layers,
        vlffn_start_layer_index=vlffn_start_layer_index,
        loss_key=_loss_key(loss_names),
        only_activate_used_experts=only_activate_used_experts)


def sum_task_vectors_device(state: Fleet, central: Fleet, *, num_layers: int,
                            vlffn_start_layer_index: int,
                            loss_names: Dict[str, float],
                            sum_lambda=1.0,
                            only_activate_used_experts: bool = False
                            ) -> Fleet:
    """Task-vector merging on device (core.sum_task_vectors semantics —
    the reference's sequential in-place lerp, NOT a sum)."""
    return _sum_task_vectors_jit(
        state, central, jnp.asarray(sum_lambda, jnp.float32),
        num_layers=num_layers,
        vlffn_start_layer_index=vlffn_start_layer_index,
        loss_key=_loss_key(loss_names),
        only_activate_used_experts=only_activate_used_experts)


def ratio_sweep(state_dict: Dict[str, np.ndarray], ratios: Sequence[float],
                **kw) -> Fleet:
    """Sweep merge_ratio over one checkpoint in a single dispatch: tile the
    checkpoint to a (R, ...) fleet and pass ratios as the (R,) vector."""
    fleet = stack_checkpoints([state_dict] * len(ratios))
    return merge_weights_device(
        fleet, merge_ratio=np.asarray(list(ratios), np.float32), **kw)
