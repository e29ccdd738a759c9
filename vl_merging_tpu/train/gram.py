"""Gram-matrix caching for RegMean.

One validation pass accumulating per-module input grams ΣXᵀX
(reference: src/cache_gram_matrices.py:141-357).  The reference hook casts
each module input to float64 BEFORE the matmul
(cache_gram_matrices.py:251-252: ``flatten_input.to(torch.float64)`` then
``matmul``), so parity requires the per-batch gram itself in f64, not just
f64 accumulation.  Default mode therefore captures the raw activations
inside the jitted forward and computes xᵀx on host in float64 through torch
CPU (same dgemm as a torch hook pipeline would use); grams are saved as a
torch .pth keyed by reference module names so caches interop both ways.

``precision="f32_device"`` keeps round-1's faster approximation — gram in
f32 on device, f64 accumulation on host — for when exact cache parity does
not matter (e.g. self-produced grams consumed by our own regmean).
"""

from __future__ import annotations

from typing import Dict, Iterable, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..models.spec import ModelSpec, Params
from ..models.taps import (CaptureTap, GramTap, MOE_GRAM_SUFFIXES,
                           UFO_GRAM_SUFFIXES, active_tap)
from .train_step import compute_losses


def _gram_suffixes(cfg: Dict):
    return MOE_GRAM_SUFFIXES if cfg["use_moe"] else UFO_GRAM_SUFFIXES


def make_gram_step(cfg: Dict, spec: ModelSpec, mim_label_fn=None):
    """f32-on-device gram step (fast path)."""
    suffixes = _gram_suffixes(cfg)

    def fn(params, batch, rng):
        tap = GramTap(suffixes)
        with active_tap(tap):
            compute_losses(params, spec, cfg, batch, rng, train=False,
                           mim_label_fn=mim_label_fn)
        return tap.grams

    return jax.jit(fn)


def make_capture_step(cfg: Dict, spec: ModelSpec, mim_label_fn=None):
    """Returns the raw per-call module inputs (reference-parity path)."""
    suffixes = _gram_suffixes(cfg)

    def fn(params, batch, rng):
        tap = CaptureTap(suffixes)
        with active_tap(tap):
            compute_losses(params, spec, cfg, batch, rng, train=False,
                           mim_label_fn=mim_label_fn)
        return tap.activations

    return jax.jit(fn)


def gram_f64(act: np.ndarray) -> np.ndarray:
    """Reference hook math on one module input: flatten to (B·L, D), cast to
    float64, xᵀx — via torch CPU so the dgemm matches a torch-hook oracle
    bit-for-bit (cache_gram_matrices.py:246-254)."""
    import torch

    flat = torch.from_numpy(
        np.ascontiguousarray(act.reshape(-1, act.shape[-1])))
    flat = flat.to(torch.float64)
    return torch.matmul(flat.T, flat).numpy()


def _to_numpy_f32_or_wider(a) -> np.ndarray:
    # numpy has no bfloat16; widen on device first (exact)
    if a.dtype == jnp.bfloat16:
        a = a.astype(jnp.float32)
    return np.asarray(a)


def cache_gram_matrices(
    params: Params, spec: ModelSpec, cfg: Dict,
    val_batches: Iterable[Dict], *, limit_batches: Optional[int] = None,
    precision: str = "f64_host",
) -> Dict[str, np.ndarray]:
    """Accumulate grams over a validation epoch; returns a float64 host dict.

    precision="f64_host" (default): per-call f64(x)ᵀf64(x) like the
    reference hooks.  precision="f32_device": per-batch f32 gram on device,
    f64 accumulation (faster, approximate).
    """
    acc: Dict[str, np.ndarray] = {}
    rng = jax.random.PRNGKey(cfg["seed"])

    if precision == "f32_device":
        step = make_gram_step(cfg, spec)
        for i, batch in enumerate(val_batches):
            if limit_batches is not None and i >= limit_batches:
                break
            rng, key = jax.random.split(rng)
            for name, g in step(params, batch, key).items():
                g64 = np.asarray(g, dtype=np.float64)
                acc[name] = acc.get(name, 0.0) + g64
        return acc

    if precision != "f64_host":
        raise ValueError(f"unknown gram precision {precision!r}")
    step = make_capture_step(cfg, spec)
    for i, batch in enumerate(val_batches):
        if limit_batches is not None and i >= limit_batches:
            break
        rng, key = jax.random.split(rng)
        for name, acts in step(params, batch, key).items():
            for a in acts:
                g = gram_f64(_to_numpy_f32_or_wider(a))
                acc[name] = acc.get(name, 0.0) + g
    return acc


def save_gram_matrices(grams: Dict[str, np.ndarray], path: str) -> None:
    from ..ckpt.io import save_torch_checkpoint

    save_torch_checkpoint(grams, path, lightning_envelope=False)
