"""Gram-matrix caching for RegMean.

One validation pass accumulating per-module input grams ΣXᵀX
(reference: src/cache_gram_matrices.py:141-357).  On-device f32 grams per
batch (via model taps), f64 accumulation on host — matching the
reference's float64-on-CPU accumulation — saved as a torch .pth keyed by
reference module names so gram caches interop both ways.
"""

from __future__ import annotations

from typing import Dict, Iterable, Optional

import jax
import numpy as np

from ..models.spec import ModelSpec, Params
from ..models.taps import (GramTap, MOE_GRAM_SUFFIXES, UFO_GRAM_SUFFIXES,
                           active_tap)
from .train_step import compute_losses


def make_gram_step(cfg: Dict, spec: ModelSpec,
                   mim_label_fn=None):
    suffixes = MOE_GRAM_SUFFIXES if cfg["use_moe"] else UFO_GRAM_SUFFIXES

    def fn(params, batch, rng):
        tap = GramTap(suffixes)
        with active_tap(tap):
            compute_losses(params, spec, cfg, batch, rng, train=False,
                           mim_label_fn=mim_label_fn)
        return tap.grams

    return jax.jit(fn)


def cache_gram_matrices(
    params: Params, spec: ModelSpec, cfg: Dict,
    val_batches: Iterable[Dict], *, limit_batches: Optional[int] = None,
) -> Dict[str, np.ndarray]:
    """Accumulate grams over a validation epoch; returns float64 host dict."""
    step = make_gram_step(cfg, spec)
    acc: Dict[str, np.ndarray] = {}
    rng = jax.random.PRNGKey(cfg["seed"])
    for i, batch in enumerate(val_batches):
        if limit_batches is not None and i >= limit_batches:
            break
        rng, key = jax.random.split(rng)
        grams = step(params, batch, key)
        for name, g in grams.items():
            g64 = np.asarray(g, dtype=np.float64)
            acc[name] = acc.get(name, 0.0) + g64
    return acc


def save_gram_matrices(grams: Dict[str, np.ndarray], path: str) -> None:
    from ..ckpt.io import save_torch_checkpoint

    save_torch_checkpoint(grams, path, lightning_envelope=False)
