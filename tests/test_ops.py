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


def test_packed_attention_fwd_bwd_interpret_matches_xla_vjp(monkeypatch):
    """The TRAINING kernels (packed forward + fused backward,
    ops/attention.py:250/373) vs the XLA composition's VJP, in interpret
    mode on CPU — the in-suite version of tools/attention_bwd_probe.py.
    f32 inputs so agreement is tight; B=5 with block_b=2 exercises the
    batch-padding path (the padded row is fully masked — the kernels'
    anyvalid guard keeps its contribution zero where XLA would NaN)."""
    from vl_merging_tpu.ops import attention as A

    monkeypatch.setattr(A, "_INTERPRET", True)
    rng = np.random.RandomState(0)
    B, N, H = 5, 64, 2
    C = 64 * H
    scale = 64 ** -0.5
    qkv = jnp.asarray(rng.randn(B, N, 3 * C).astype(np.float32))
    bias = jnp.asarray(rng.randn(H, N, N).astype(np.float32))
    mask = np.ones((B, N), np.int32)
    mask[:, 50:] = 0  # padded keys
    mask = jnp.asarray(mask)
    g = jnp.asarray(rng.randn(B, N, C).astype(np.float32))

    got = A._pallas_packed_attention(qkv, bias, mask.astype(jnp.int32),
                                     scale, H, block_b=2)
    want, vjp = jax.vjp(
        lambda qkv_, bias_: A._packed_reference(qkv_, bias_, mask, scale, H),
        qkv, bias)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=2e-5, rtol=2e-5)

    dqkv, dbias = A._pallas_packed_attention_bwd(
        qkv, bias, mask.astype(jnp.int32), g, scale, H, block_b=2)
    dqkv_want, dbias_want = vjp(g)
    np.testing.assert_allclose(np.asarray(dqkv), np.asarray(dqkv_want),
                               atol=5e-5, rtol=5e-5)
    np.testing.assert_allclose(np.asarray(dbias), np.asarray(dbias_want),
                               atol=5e-5, rtol=5e-5)
    # fully-masked rows: the kernel stays finite where the XLA softmax
    # NaNs (STATUS Perf: training robustness property of the fused bwd)
    mask0 = jnp.zeros_like(mask)
    dqkv0, dbias0 = A._pallas_packed_attention_bwd(
        qkv, bias, mask0, g, scale, H, block_b=2)
    assert np.isfinite(np.asarray(dqkv0)).all()
    assert np.isfinite(np.asarray(dbias0)).all()


def test_ln_qkv_attention_interpret_bit_equals_split_pair(monkeypatch):
    """The single-kernel LN+qkv+attention fusion (ops/attention.py
    _pallas_ln_qkv_attention) vs the ln_linear -> packed-attention pair it
    replaces: bit-equal in bf16 (the fused kernel rounds its qkv slices to
    the block dtype exactly where ln_linear stores them to HBM), and
    within tolerance of the pure-XLA composition."""
    from vl_merging_tpu.ops import attention as A
    from vl_merging_tpu.ops import fused_block as F

    monkeypatch.setattr(A, "_INTERPRET", True)
    monkeypatch.setattr(F, "_INTERPRET", True)
    # ln_linear/packed gates check the backend; interpret runs anywhere
    # (A.jax and F.jax are the same module object)
    monkeypatch.setattr(A.jax, "default_backend", lambda: "tpu")

    rng = np.random.RandomState(11)
    B, H, Np, valid_n = 2, 2, 272, 260
    C = 64 * H
    scale = 64 ** -0.5

    def t(shape, s=0.5, dtype=jnp.bfloat16):
        return jnp.asarray((rng.randn(*shape) * s).astype(np.float32)) \
            .astype(dtype)

    x = t((B, Np, C), 1.0)
    lnw = t((C,), 1.0, jnp.float32)
    lnb = t((C,), 0.05, jnp.float32)
    wqkv = t((3 * C, C), 0.05)
    qkvb = t((3 * C,), 0.05, jnp.float32)
    bias = t((H, Np, Np), 0.5, jnp.float32)
    mask = np.ones((B, Np), np.int32)
    mask[:, valid_n:] = 0
    mask = jnp.asarray(mask)
    args = (x, lnw, lnb, wqkv, qkvb, bias, mask, scale, H)

    monkeypatch.setattr(A, "_FUSE_LN_QKV_ATTN", True)
    fused = A.ln_qkv_attention(*args, use_pallas=True)
    monkeypatch.setattr(A, "_FUSE_LN_QKV_ATTN", False)
    pair = A.ln_qkv_attention(*args, use_pallas=True)
    assert (np.asarray(fused, np.float32)[:, :valid_n]
            == np.asarray(pair, np.float32)[:, :valid_n]).all()

    xla = A.ln_qkv_attention(*args, use_pallas=False)
    np.testing.assert_allclose(
        np.asarray(fused, np.float32)[:, :valid_n],
        np.asarray(xla, np.float32)[:, :valid_n], atol=0.03, rtol=0.03)
