"""W8A8 int8 eval kernels (ops/int8.py).

Kernel-level: the Pallas kernels (interpret mode off-TPU) must match the
jnp reference compositions of the SAME quantized math exactly — the
reference compositions are what the CPU fallback runs and what the
on-chip parity probe (tools/int8_parity_probe.py) baselines against.
Accuracy-level: quantized outputs must track the unquantized linear
within W8A8's expected error envelope on realistic magnitudes.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from vl_merging_tpu.ops import int8 as i8
from vl_merging_tpu.ops.fused_block import LN_EPS


@pytest.fixture(autouse=True)
def _interpret_kernels(monkeypatch):
    monkeypatch.setattr(i8, "_INTERPRET", True)


def _rand(rng, *shape):
    return jnp.asarray(rng.randn(*shape).astype(np.float32))


def test_quantize_weight_roundtrip():
    rng = np.random.RandomState(0)
    w = rng.randn(256, 128).astype(np.float32) * 0.05
    q, s = i8.quantize_weight(w)
    assert q.dtype == jnp.int8 and s.shape == (256,)
    deq = np.asarray(q, np.float32) * np.asarray(s)[:, None]
    # symmetric per-channel: error <= scale/2 per element
    assert np.abs(deq - w).max() <= np.asarray(s).max() / 2 + 1e-7
    # each row's absmax hits ±127 exactly
    assert (np.abs(np.asarray(q)).max(axis=1) == 127).all()


def test_ln_linear_i8_kernel_matches_reference():
    rng = np.random.RandomState(1)
    B, N, C, O = 2, 512, 256, 384
    x = _rand(rng, B, N, C).astype(jnp.bfloat16)
    ln_w, ln_b = _rand(rng, C), _rand(rng, C) * 0.1
    wq, ws = i8.quantize_weight(_rand(rng, O, C) * 0.05)
    b = _rand(rng, O) * 0.1

    got = i8.ln_linear_i8(x, ln_w, ln_b, wq, ws, b, use_pallas=True)
    want = i8.ref_ln_linear_i8(x, ln_w, ln_b, wq, ws, b)
    _assert_near_exact(got, want)


def _assert_near_exact(got, want, max_mismatch=1e-4):
    """Kernel vs jnp composition: identical math, but FMA contraction can
    flip round-to-nearest exactly at a quantization tie — tolerate <=
    1e-4 of elements off, each by <= 1 bf16 ulp (measured 1.5e-5)."""
    g = np.asarray(got, np.float32)
    w = np.asarray(want, np.float32)
    mism = (g != w)
    assert mism.mean() <= max_mismatch, mism.mean()
    ulp = np.maximum(np.abs(w), 2.0 ** -6) * 2.0 ** -7  # 1 bf16 ulp
    assert (np.abs(g - w) <= ulp + 1e-7).all(), np.abs(g - w).max()


def test_proj_mlp_tail_i8_kernel_matches_reference():
    rng = np.random.RandomState(2)
    B, N, C, H = 2, 512, 256, 512
    ctx = _rand(rng, B, N, C).astype(jnp.bfloat16)
    res = _rand(rng, B, N, C).astype(jnp.bfloat16)
    pq, ps = i8.quantize_weight(_rand(rng, C, C) * 0.05)
    bp = _rand(rng, C) * 0.1
    g1, g2 = _rand(rng, C) * 0.1, _rand(rng, C) * 0.1
    ln_w, ln_b = _rand(rng, C), _rand(rng, C) * 0.1
    w1q, w1s = i8.quantize_weight(_rand(rng, H, C) * 0.05)
    b1 = _rand(rng, H) * 0.1
    w2q, w2s = i8.quantize_weight(_rand(rng, C, H) * 0.05)
    b2 = _rand(rng, C) * 0.1

    got = i8.proj_mlp_tail_i8(ctx, pq, ps, bp, g1, res, ln_w, ln_b,
                              w1q, w1s, b1, w2q, w2s, b2, g2,
                              use_pallas=True)
    want = i8.ref_proj_mlp_tail_i8(ctx, pq, ps, bp, g1, res, ln_w, ln_b,
                                   w1q, w1s, b1, w2q, w2s, b2, g2)
    # three chained quantizers: a single tie-flip upstream (FMA
    # contraction differences) perturbs that row's LN stats and cascades
    # through the row — measured 0.23% of elements, max 2 bf16 ulp,
    # mean 4e-6.  A real kernel bug (wrong scale, missing bias, swapped
    # weights) moves the MEAN by orders of magnitude.
    g = np.asarray(got, np.float32)
    w = np.asarray(want, np.float32)
    assert (g != w).mean() <= 0.01
    assert np.abs(g - w).max() <= 0.05
    assert np.abs(g - w).mean() <= 1e-4


def test_w8a8_tracks_exact_linear():
    """Accuracy envelope: per-token + per-channel symmetric W8A8 on
    LN-normalized activations stays within ~1% relative of the exact
    matmul (the envelope the on-chip drift probe quantifies at model
    scale)."""
    rng = np.random.RandomState(3)
    B, N, C, O = 2, 512, 256, 384
    x = _rand(rng, B, N, C)
    ln_w = jnp.ones((C,))
    ln_b = jnp.zeros((C,))
    w = _rand(rng, O, C) * 0.05
    b = jnp.zeros((O,))
    wq, ws = i8.quantize_weight(w)

    got = np.asarray(
        i8.ref_ln_linear_i8(x, ln_w, ln_b, wq, ws, b), np.float32)
    xn = np.asarray(x)
    mean = xn.mean(-1, keepdims=True)
    var = ((xn - mean) ** 2).mean(-1, keepdims=True)
    xs = (xn - mean) / np.sqrt(var + LN_EPS)
    want = xs @ np.asarray(w).T
    denom = np.abs(want).mean()
    assert np.abs(got - want).mean() / denom < 0.01


def test_poly_gelu_error_bound():
    """The int8 MLP's fma-only polynomial gelu must stay within its
    documented 5e-5 envelope of EXACT erf-gelu (math.erf, f64) across
    the clip region and both saturated tails — two orders below the
    per-token int8 quantization step it feeds."""
    import math

    from vl_merging_tpu.ops.mlp import _poly_gelu

    x = np.linspace(-40.0, 40.0, 400001).astype(np.float32)
    got = np.asarray(_poly_gelu(jnp.asarray(x)), np.float64)
    want = np.array([0.5 * v * (1.0 + math.erf(v / math.sqrt(2)))
                     for v in x.astype(np.float64)])
    assert np.abs(got - want).max() <= 5e-5
    # saturated tails: gelu(x) -> x and -> 0 (Σcoef = 1 by construction)
    assert abs(got[-1] - x[-1]) <= 2e-5 * abs(x[-1])
    assert abs(got[0]) <= 2e-5 * abs(x[0])


def test_quantize_eval_params_selects_block_projections():
    params = {
        "transformer.blocks.0.attn.qkv.weight": np.ones((6, 2), np.float32),
        "transformer.blocks.0.attn.v.proj.weight": np.ones((2, 2),
                                                           np.float32),
        "transformer.blocks.3.mlp.vl.fc1.weight": np.ones((8, 2),
                                                          np.float32),
        "transformer.blocks.3.mlp.vl.fc1.bias": np.ones((8,), np.float32),
        "transformer.norm.weight": np.ones((2,), np.float32),
        "mlm_score.decoder.weight": np.ones((4, 2), np.float32),
    }
    out = i8.quantize_eval_params(params)
    added = sorted(k for k in out if k not in params)
    assert added == [
        "transformer.blocks.0.attn.qkv.weight::int8",
        "transformer.blocks.0.attn.qkv.weight::scale8",
        "transformer.blocks.0.attn.v.proj.weight::int8",
        "transformer.blocks.0.attn.v.proj.weight::scale8",
        "transformer.blocks.3.mlp.vl.fc1.weight::int8",
        "transformer.blocks.3.mlp.vl.fc1.weight::scale8",
    ]
    # originals untouched
    for k in params:
        np.testing.assert_array_equal(out[k], params[k])


def test_poly11_gelu_error_bound():
    """The shorter 5-fma gelu (VLM_TPU_I8_GELU=poly11) must stay within
    its documented 9e-4 envelope of exact erf-gelu — still below the
    per-token int8 quantization step of the hidden it feeds."""
    import math

    from vl_merging_tpu.ops.mlp import _poly11_gelu

    x = np.linspace(-40.0, 40.0, 400001).astype(np.float32)
    got = np.asarray(_poly11_gelu(jnp.asarray(x)), np.float64)
    want = np.array([0.5 * v * (1.0 + math.erf(v / math.sqrt(2)))
                     for v in x.astype(np.float64)])
    assert np.abs(got - want).max() <= 9e-4
    # exact saturation (Σcoef = 1 by construction)
    assert abs(got[-1] - x[-1]) <= 2e-5 * abs(x[-1])
    assert abs(got[0]) <= 2e-5 * abs(x[0])


def test_poly13_gelu_error_bound():
    """The middle-rung 6-fma gelu (VLM_TPU_I8_GELU=poly13) must stay
    within its documented 2e-4 envelope of exact erf-gelu — 4.7x tighter
    than poly11 at one extra fma (T=3.95 moves the clip-saturation error
    off the critical path; see ops/mlp._poly13_gelu)."""
    import math

    from vl_merging_tpu.ops.mlp import _poly13_gelu

    x = np.linspace(-40.0, 40.0, 400001).astype(np.float32)
    got = np.asarray(_poly13_gelu(jnp.asarray(x)), np.float64)
    want = np.array([0.5 * v * (1.0 + math.erf(v / math.sqrt(2)))
                     for v in x.astype(np.float64)])
    assert np.abs(got - want).max() <= 2e-4
    # exact saturation (Σcoef = 1 by construction)
    assert abs(got[-1] - x[-1]) <= 2e-5 * abs(x[-1])
    assert abs(got[0]) <= 2e-5 * abs(x[0])


def test_packed_attention_i8qk_kernel_matches_twin():
    """The opt-in int8-QK eval kernel (attention._packed_kernel_i8qk) vs
    its jnp twin (_packed_reference_i8qk): identical quantization math,
    tolerance one bf16 ulp (reduction-order rounding in softmax), and a
    bounded drift vs the f32-logit reference path."""
    from vl_merging_tpu.ops import attention as att

    old = att._INTERPRET
    att._INTERPRET = True
    try:
        rng = np.random.RandomState(0)
        B, N, H, d = 4, 128, 4, 64
        C = H * d
        qkv = jnp.asarray(rng.randn(B, N, 3 * C).astype(np.float32)) \
            .astype(jnp.bfloat16)
        bias = jnp.asarray(rng.randn(H, N, N).astype(np.float32))
        mask = np.ones((B, N), np.int32)
        mask[0, N // 2:] = 0
        mask = jnp.asarray(mask)
        scale = d ** -0.5

        twin = att._packed_reference_i8qk(qkv, bias, mask, scale, H)
        ker = att._pallas_packed_attention(qkv, bias, mask, scale, H,
                                           block_b=2, qk_int8=True)
        d_kt = np.abs(np.asarray(twin, np.float32)
                      - np.asarray(ker, np.float32))
        assert d_kt.max() <= 0.008  # ~1 bf16 ulp at O(1) magnitudes

        exact = att._packed_reference(qkv, bias, mask, scale, H)
        drift = np.abs(np.asarray(exact, np.float32)
                       - np.asarray(twin, np.float32))
        assert drift.max() <= 0.05  # int8-QK logit quantization envelope
        # the dispatcher routes qk_int8 to the twin off-TPU
        att._INTERPRET = False
        via = att.packed_fused_attention(qkv, bias, mask, scale, H,
                                         qk_int8=True)
        np.testing.assert_array_equal(np.asarray(via, np.float32),
                                      np.asarray(twin, np.float32))
    finally:
        att._INTERPRET = old


def test_fused_eval_block_i8_qk_int8_path():
    """fused_eval_block_i8(qk_int8=True) composes the int8-QK attention
    with the int8 projections and stays close to the qk_int8=False
    composition (the quantization drift envelope at these magnitudes)."""
    rng = np.random.RandomState(1)
    B, N, H, d = 2, 128, 4, 64
    C, Hd = H * d, 4 * H * d
    x = _rand(rng, B, N, C).astype(jnp.bfloat16)
    ln1_w, ln1_b = jnp.ones((C,)), jnp.zeros((C,))
    wq3, b3 = _rand(rng, 3 * C, C) * 0.05, jnp.zeros((3 * C,))
    q3, s3 = i8.quantize_weight(wq3)
    bias = _rand(rng, H, N, N) * 0.1
    mask = jnp.ones((B, N), jnp.int32)
    wp, bp = _rand(rng, C, C) * 0.05, jnp.zeros((C,))
    pq, ps = i8.quantize_weight(wp)
    g1 = jnp.ones((C,)) * 0.1
    ln2_w, ln2_b = jnp.ones((C,)), jnp.zeros((C,))
    w1, b1 = _rand(rng, Hd, C) * 0.05, jnp.zeros((Hd,))
    w1q, w1s = i8.quantize_weight(w1)
    w2, b2 = _rand(rng, C, Hd) * 0.05, jnp.zeros((C,))
    w2q, w2s = i8.quantize_weight(w2)
    g2 = jnp.ones((C,)) * 0.1

    args = (x, ln1_w, ln1_b, q3, s3, b3, bias, mask, d ** -0.5, H,
            pq, ps, bp, g1, ln2_w, ln2_b, w1q, w1s, b1, w2q, w2s, b2, g2)
    base = np.asarray(i8.fused_eval_block_i8(*args, qk_int8=False),
                      np.float32)
    qk = np.asarray(i8.fused_eval_block_i8(*args, qk_int8=True),
                    np.float32)
    assert np.abs(base - qk).max() <= 0.05
    assert np.abs(base - qk).max() > 0.0  # the mode actually engages
