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


# ---------------------------------------------------------------------------
# RegMean on device (f32 prototype)
# ---------------------------------------------------------------------------

def _regmean_tree(state: Fleet, grams: Fleet, *, num_layers: int,
                  vlffn_start_layer_index: int, loss_names: Dict[str, float],
                  scaling_for_non_diag: float) -> Fleet:
    """Traced RegMean body — control flow mirrors core.regmean exactly
    (incl. its hard-coded expert-set rule and the missing-key fallbacks);
    arithmetic is f32 `solve` instead of the host's f64 matmul+inv."""
    new = _passthrough(state)

    def layer_mods(i):
        if i < vlffn_start_layer_index:
            return ["v", "l"]
        if loss_names.get("irtr", 0) > 0:
            return ["v", "l"]
        if loss_names.get("vqa", 0) > 0:
            return ["vl"]
        return ["v", "l", "vl"]

    def scale_g(G):
        G = G.astype(jnp.float32)
        eye = jnp.eye(G.shape[-1], dtype=jnp.float32)
        diag = jnp.diagonal(G, axis1=-2, axis2=-1)[..., None, :] * eye
        return scaling_for_non_diag * G + (1 - scaling_for_non_diag) * diag

    def gram_merge(i, mods, expert_t, merged_name, gram_suffix):
        summed_gram = None
        acc = 0
        for m in mods:
            name = (expert_t.format(i, m) if gram_suffix == ".qkv.weight"
                    else expert_t.format(i, m, "weight"))
            gram_name = name.replace(gram_suffix, "")
            if name in state:
                if gram_name not in grams:
                    continue
                G = scale_g(grams[gram_name])
                summed_gram = G if summed_gram is None else summed_gram + G
                acc = acc + jnp.matmul(state[name].astype(jnp.float32), G)
            else:
                acc = state[merged_name]
                break
        if summed_gram is None:
            new[merged_name] = acc
        else:
            # w = acc @ inv(ΣG)  solved as  ΣGᵀ wᵀ = accᵀ (f32, batched)
            sol = jnp.linalg.solve(
                jnp.swapaxes(summed_gram, -1, -2),
                jnp.swapaxes(acc.astype(jnp.float32), -1, -2))
            new[merged_name] = jnp.swapaxes(sol, -1, -2)

    def avg_merge(i, mods, expert_t, merged_name, n):
        acc = 0
        count = 0
        for m in mods:
            name = expert_t.format(i, m, n)
            if name in state:
                acc = acc + state[name]
                count += 1
            else:
                acc = state[merged_name]
                break
        new[merged_name] = acc if count == 0 else acc / count

    for i in range(num_layers):
        mods = layer_mods(i)
        for expert_t, merged_t in LAYER_ORDERS:
            if "qkv" in expert_t:
                gram_merge(i, mods, expert_t, merged_t.format(i),
                           ".qkv.weight")
            elif "attn" in expert_t and "proj" not in expert_t:
                for n in ("q_bias", "v_bias"):
                    avg_merge(i, mods, expert_t, merged_t.format(i, n), n)
            elif "mlp" in expert_t or "proj" in expert_t:
                gram_merge(i, mods, expert_t, merged_t.format(i, "weight"),
                           ".weight")
                avg_merge(i, mods, expert_t, merged_t.format(i, "bias"),
                          "bias")
            else:  # norms
                for n in ("weight", "bias"):
                    avg_merge(i, mods, expert_t, merged_t.format(i, n), n)
    return new


@partial(jax.jit, static_argnames=("num_layers", "vlffn_start_layer_index",
                                   "loss_key", "scaling_for_non_diag"))
def _regmean_jit(state, grams, *, num_layers, vlffn_start_layer_index,
                 loss_key, scaling_for_non_diag):
    return _regmean_tree(state, grams, num_layers=num_layers,
                         vlffn_start_layer_index=vlffn_start_layer_index,
                         loss_names=dict(loss_key),
                         scaling_for_non_diag=scaling_for_non_diag)


def regmean_device(state: Fleet, gram_matrices: Fleet, *, num_layers: int,
                   vlffn_start_layer_index: int,
                   loss_names: Dict[str, float],
                   scaling_for_non_diag: float = 1.0) -> Fleet:
    """RegMean on device: w = (Σ wG)(ΣG)⁻¹ per matmul weight, biases/norms
    simple-averaged — one dispatch over the fleet (gram leaves may also
    carry the fleet axis).

    PROTOTYPE numerics: f32 batched `solve` on the MXU, NOT the host
    path's f64 LAPACK — use it to sweep fleets/λ on device, then re-run
    the chosen config through `core.regmean` for the bit-identical
    contract checkpoint.  With the typical well-conditioned activation
    grams the f32 drift is ~1e-5 relative (test-pinned)."""
    return _regmean_jit(
        state, gram_matrices, num_layers=num_layers,
        vlffn_start_layer_index=vlffn_start_layer_index,
        loss_key=_loss_key(loss_names),
        scaling_for_non_diag=float(scaling_for_non_diag))
