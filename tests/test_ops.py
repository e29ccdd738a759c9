"""Pallas kernel parity tests (interpret mode on CPU)."""

import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vl_merging_tpu.ops.attention import (
    _mha_kernel, reference_attention, _round_up)


def pallas_interpret_attention(q, k, v, bias, mask, scale):
    """Run the exact kernel in interpreter mode with the same padding."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    B, H, N, d = q.shape
    Np, dp = _round_up(N, 128), _round_up(d, 128)
    q, k, v = [jnp.pad(x, ((0, 0), (0, 0), (0, Np - N), (0, dp - d)))
               for x in (q, k, v)]
    bias = jnp.pad(bias, ((0, 0), (0, Np - N), (0, Np - N)))
    mask = jnp.pad(mask, ((0, 0), (0, Np - N)))
    out = pl.pallas_call(
        functools.partial(_mha_kernel, scale=scale),
        out_shape=jax.ShapeDtypeStruct((B, H, Np, dp), q.dtype),
        grid=(B, H),
        in_specs=[
            pl.BlockSpec((1, 1, Np, dp), lambda b, h: (b, h, 0, 0)),
            pl.BlockSpec((1, 1, Np, dp), lambda b, h: (b, h, 0, 0)),
            pl.BlockSpec((1, 1, Np, dp), lambda b, h: (b, h, 0, 0)),
            pl.BlockSpec((1, Np, Np), lambda b, h: (h, 0, 0)),
            pl.BlockSpec((1, 1, Np), lambda b, h: (b, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, 1, Np, dp), lambda b, h: (b, h, 0, 0)),
        interpret=True,
    )(q, k, v, bias, mask.astype(jnp.int32)[:, None, :])
    return out[:, :, :N, :d]


@pytest.mark.parametrize("n,d", [(40, 16), (197, 64)])
def test_fused_attention_matches_reference(n, d):
    rng = np.random.RandomState(0)
    B, H = 2, 3
    q = jnp.asarray(rng.randn(B, H, n, d).astype(np.float32))
    k = jnp.asarray(rng.randn(B, H, n, d).astype(np.float32))
    v = jnp.asarray(rng.randn(B, H, n, d).astype(np.float32))
    bias = jnp.asarray(rng.randn(H, n, n).astype(np.float32))
    mask = np.ones((B, n), np.int32)
    mask[0, n // 2:] = 0  # padded keys in row 0
    mask = jnp.asarray(mask)
    scale = d ** -0.5

    want = reference_attention(q, k, v, bias, mask, scale)
    got = pallas_interpret_attention(q, k, v, bias, mask, scale)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=2e-5, rtol=2e-5)
    # padded-out queries produce finite values for valid rows
    assert np.isfinite(np.asarray(got)[:, :, : n // 2]).all()
