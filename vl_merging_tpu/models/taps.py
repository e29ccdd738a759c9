"""Activation taps: functional replacement for forward hooks.

The reference registers torch forward hooks on expert Linears to
accumulate per-layer input gram matrices XᵀX for RegMean
(reference: src/cache_gram_matrices.py:246-281).  A pure-function model
has no hooks, so the MoME block instead calls ``tap_add(name, x)`` at the
exact module-input points; a contextvar-scoped GramTap collects the traced
grams during one jit trace and the jitted function returns them as outputs.

Zero overhead when no tap is active (the calls are no-ops at trace time).
"""

from __future__ import annotations

import contextlib
import contextvars
from typing import Dict, Optional, Sequence

import jax
import jax.numpy as jnp

_ACTIVE_TAP: contextvars.ContextVar = contextvars.ContextVar(
    "vlm_tpu_tap", default=None)


class GramTap:
    """Accumulates Σ xᵀx per tapped module over one traced forward.

    Grams include every token position (padding too) — same as the
    reference's hooks, which see the raw (B, L, D) module inputs."""

    def __init__(self, suffixes: Sequence[str]):
        self.suffixes = tuple(suffixes)
        self.grams: Dict[str, jax.Array] = {}

    def wants(self, name: str) -> bool:
        return any(name.endswith(s) for s in self.suffixes)

    def add(self, name: str, x: jax.Array) -> None:
        if not self.wants(name):
            return
        flat = x.reshape(-1, x.shape[-1]).astype(jnp.float32)
        gram = flat.T @ flat
        if name in self.grams:
            self.grams[name] = self.grams[name] + gram
        else:
            self.grams[name] = gram


def tap_add(name: str, x) -> None:
    tap = _ACTIVE_TAP.get()
    if tap is not None:
        tap.add(name, x)


@contextlib.contextmanager
def active_tap(tap: Optional[GramTap]):
    token = _ACTIVE_TAP.set(tap)
    try:
        yield tap
    finally:
        _ACTIVE_TAP.reset(token)


class CaptureTap:
    """Captures raw module-input activations (the reference's
    get_middle_representation / hook_input path,
    cache_gram_matrices.py:240-262) for offline analysis."""

    def __init__(self, suffixes: Sequence[str]):
        self.suffixes = tuple(suffixes)
        self.activations: Dict[str, list] = {}

    def wants(self, name: str) -> bool:
        return any(name.endswith(s) for s in self.suffixes)

    def add(self, name: str, x: jax.Array) -> None:
        if not self.wants(name):
            return
        self.activations.setdefault(name, []).append(x)


MOE_GRAM_SUFFIXES = (
    # reference cache_gram_matrices.py:264-274
    "mlp.fc1", "mlp.fc2",
    "mlp.v.fc1", "mlp.l.fc1", "mlp.vl.fc1",
    "mlp.v.fc2", "mlp.l.fc2", "mlp.vl.fc2",
    "attn", "attn.v", "attn.l", "attn.vl",
    "attn.proj", "attn.v.proj", "attn.l.proj", "attn.vl.proj",
)

UFO_GRAM_SUFFIXES = (
    # reference cache_gram_matrices.py:276
    "mlp.fc1", "mlp.fc2", "attn.proj", "norm1", "norm2",
)
