"""Primitive layers: torch-layout linear, layernorm, gelu, dropout, droppath.

All weights are stored in torch layout (Linear weight = (out, in)) so the
param dict maps 1:1 onto reference state_dict keys; XLA folds the transpose
into the matmul, so this costs nothing on the MXU.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp


def linear(x: jax.Array, weight: jax.Array, bias: Optional[jax.Array] = None,
           dtype=None) -> jax.Array:
    """y = x @ W.T + b with torch-layout W=(out, in)."""
    if dtype is not None:
        x = x.astype(dtype)
        weight = weight.astype(dtype)
    y = jax.lax.dot_general(
        x, weight,
        dimension_numbers=(((x.ndim - 1,), (1,)), ((), ())),
        preferred_element_type=x.dtype,
    )
    if bias is not None:
        y = y + bias.astype(y.dtype)
    return y


def layer_norm(x: jax.Array, weight: jax.Array, bias: jax.Array,
               eps: float = 1e-6) -> jax.Array:
    """LayerNorm over the trailing dim, computed in f32 for stability."""
    dtype = x.dtype
    x32 = x.astype(jnp.float32)
    mean = jnp.mean(x32, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(x32 - mean), axis=-1, keepdims=True)
    y = (x32 - mean) * jax.lax.rsqrt(var + eps)
    y = y * weight.astype(jnp.float32) + bias.astype(jnp.float32)
    return y.astype(dtype)


def gelu(x: jax.Array) -> jax.Array:
    """Exact (erf) GELU, matching torch nn.GELU's default."""
    return jax.nn.gelu(x, approximate=False)


def dropout(x: jax.Array, rate: float, rng: Optional[jax.Array],
            train: bool) -> jax.Array:
    if not train or rate <= 0.0 or rng is None:
        return x
    keep = 1.0 - rate
    mask = jax.random.bernoulli(rng, keep, x.shape)
    return jnp.where(mask, x / keep, jnp.zeros_like(x))


def drop_path(x: jax.Array, rate: float, rng: Optional[jax.Array],
              train: bool) -> jax.Array:
    """Stochastic depth: drop the whole residual branch per sample
    (timm DropPath semantics, scaled by keep prob).

    The mask math happens on the tiny (B, 1, 1) side — one broadcast
    multiply touches the branch.  The earlier ``where(mask, x/keep, 0)``
    form cost ~15 ms/step of unfused (B, N, C) HBM passes across the 24
    applications per forward at @224 B22 (tools/fwd224c_probe.py)."""
    if not train or rate <= 0.0 or rng is None:
        return x
    keep = 1.0 - rate
    shape = (x.shape[0],) + (1,) * (x.ndim - 1)
    mask = jax.random.bernoulli(rng, keep, shape)
    return x * (mask.astype(x.dtype) / keep)
