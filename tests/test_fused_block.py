"""Interpret-mode parity for the fused block-glue kernels.

The public entry points (ln_linear / linear_residual / mlp_tail /
proj_mlp_tail) fall back to the XLA composition off-TPU, so on the CPU
test mesh the kernel bodies never run.  These tests force the Pallas
path through ``fused_block._INTERPRET`` and pin each kernel to its own
fallback (which is itself pinned to the executed reference by the
full-tower tests).  Shapes use C=128/H=512 so ``_shapes_ok`` passes with
a tiny row count.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from vl_merging_tpu.ops import fused_block as F


@pytest.fixture()
def interpret_kernels(monkeypatch):
    monkeypatch.setattr(F, "_INTERPRET", True)
    # Force the TPU-only gate open: the interpret path runs anywhere.
    monkeypatch.setattr(F.jax, "default_backend", lambda: "tpu")
    # Small blocks so M >= BLOCK_M with test-size inputs.
    monkeypatch.setattr(F, "BLOCK_M", 8)


def _rand(rng, shape, dtype=jnp.float32, s=0.5):
    return jnp.asarray((rng.randn(*shape) * s).astype(np.float32)) \
        .astype(dtype)


def test_ln_linear_interpret_matches_fallback(interpret_kernels):
    rng = np.random.RandomState(0)
    B, N, C, O = 2, 9, 128, 384  # N odd => row padding path
    x = _rand(rng, (B, N, C))
    lnw, lnb = _rand(rng, (C,), s=1.0), _rand(rng, (C,))
    w, b = _rand(rng, (O, C), s=0.05), _rand(rng, (O,))
    got = F.ln_linear(x, lnw, lnb, w, b, use_pallas=True)
    want = F.ln_linear(x, lnw, lnb, w, b, use_pallas=False)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=2e-5, rtol=2e-5)


def test_linear_residual_interpret_matches_fallback(interpret_kernels):
    rng = np.random.RandomState(1)
    B, N, C = 2, 8, 128
    x = _rand(rng, (B, N, C))
    res = _rand(rng, (B, N, C))
    w, b = _rand(rng, (C, C), s=0.05), _rand(rng, (C,))
    g = _rand(rng, (C,), s=0.1)
    got = F.linear_residual(x, w, b, g, res, use_pallas=True)
    want = F.linear_residual(x, w, b, g, res, use_pallas=False)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=2e-5, rtol=2e-5)


def test_mlp_tail_interpret_matches_fallback(interpret_kernels):
    rng = np.random.RandomState(2)
    B, N, C, H = 2, 8, 128, 512
    x = _rand(rng, (B, N, C))
    lnw, lnb = _rand(rng, (C,), s=1.0), _rand(rng, (C,))
    w1, b1 = _rand(rng, (H, C), s=0.05), _rand(rng, (H,))
    w2, b2 = _rand(rng, (C, H), s=0.05), _rand(rng, (C,))
    g = _rand(rng, (C,), s=0.1)
    got = F.mlp_tail(x, lnw, lnb, w1, b1, w2, b2, g, use_pallas=True)
    want = F.mlp_tail(x, lnw, lnb, w1, b1, w2, b2, g, use_pallas=False)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=2e-5, rtol=2e-5)


def test_proj_mlp_tail_escape_hatch_routes_to_pair(interpret_kernels,
                                                   monkeypatch):
    """VLM_TPU_FUSE_PROJ_MLP=0 (-> _FUSE_WHOLE_TAIL=False) must route
    proj_mlp_tail through the linear_residual -> mlp_tail pair with
    identical results — the compile-path safety valve for the fused
    kernel."""
    rng = np.random.RandomState(4)
    B, N, C, H = 2, 8, 128, 512
    ctx, res = _rand(rng, (B, N, C)), _rand(rng, (B, N, C))
    wp, bp = _rand(rng, (C, C), s=0.05), _rand(rng, (C,))
    g1, g2 = _rand(rng, (C,), s=0.1), _rand(rng, (C,), s=0.1)
    lnw, lnb = _rand(rng, (C,), s=1.0), _rand(rng, (C,))
    w1, b1 = _rand(rng, (H, C), s=0.05), _rand(rng, (H,))
    w2, b2 = _rand(rng, (C, H), s=0.05), _rand(rng, (C,))
    args = (ctx, wp, bp, g1, res, lnw, lnb, w1, b1, w2, b2, g2)
    fused = F.proj_mlp_tail(*args, use_pallas=True)
    monkeypatch.setattr(F, "_FUSE_WHOLE_TAIL", False)
    hatched = F.proj_mlp_tail(*args, use_pallas=True)
    want = F.mlp_tail(F.linear_residual(ctx, wp, bp, g1, res,
                                        use_pallas=True),
                      lnw, lnb, w1, b1, w2, b2, g2, use_pallas=True)
    assert (np.asarray(hatched) == np.asarray(want)).all()
    np.testing.assert_allclose(np.asarray(fused), np.asarray(hatched),
                               atol=2e-5, rtol=2e-5)


def test_fused_eval_block_megakernel_bit_equals_staged(interpret_kernels,
                                                       monkeypatch):
    """The whole-block megakernel (fused_eval_block's single-kernel path,
    VLM_TPU_FUSE_EVAL_BLOCK=1) vs the staged ln_qkv_attention →
    proj_mlp_tail pipeline: bit-equal in bf16 (identical rounding points)
    and within tolerance of the pure-XLA composition."""
    from vl_merging_tpu.ops import attention as A

    monkeypatch.setattr(A, "_INTERPRET", True)
    monkeypatch.setattr(A.jax, "default_backend", lambda: "tpu")
    rng = np.random.RandomState(7)
    B, H, Np, valid_n = 2, 2, 272, 260
    C, H1 = 64 * H, 512
    scale = 64 ** -0.5

    def t(shape, s=0.5, dtype=jnp.bfloat16):
        return jnp.asarray((rng.randn(*shape) * s).astype(np.float32)) \
            .astype(dtype)

    x = t((B, Np, C), 1.0)
    ln1w, ln1b = t((C,), 1.0, jnp.float32), t((C,), 0.05, jnp.float32)
    wqkv = t((3 * C, C), 0.05)
    qkvb = t((3 * C,), 0.05, jnp.float32)
    bias = t((H, Np, Np), 0.5, jnp.float32)
    mask = np.ones((B, Np), np.int32)
    mask[:, valid_n:] = 0
    mask = jnp.asarray(mask)
    wp, bp = t((C, C), 0.05), t((C,), 0.05, jnp.float32)
    g1, g2 = t((C,), 0.1, jnp.float32), t((C,), 0.1, jnp.float32)
    ln2w, ln2b = t((C,), 1.0, jnp.float32), t((C,), 0.05, jnp.float32)
    w1, b1 = t((H1, C), 0.05), t((H1,), 0.05, jnp.float32)
    w2, b2 = t((C, H1), 0.05), t((C,), 0.05, jnp.float32)
    args = (x, ln1w, ln1b, wqkv, qkvb, bias, mask, scale, H,
            wp, bp, g1, ln2w, ln2b, w1, b1, w2, b2, g2)

    monkeypatch.setattr(F, "_FUSE_EVAL_BLOCK", True)
    mega = F.fused_eval_block(*args, use_pallas=True)
    monkeypatch.setattr(F, "_FUSE_EVAL_BLOCK", False)
    monkeypatch.setattr(A, "_FUSE_LN_QKV_ATTN", True)
    staged = F.fused_eval_block(*args, use_pallas=True)
    monkeypatch.setattr(A, "_FUSE_LN_QKV_ATTN", False)
    split = F.fused_eval_block(*args, use_pallas=True)
    a = np.asarray(mega, np.float32)[:, :valid_n]
    assert (a == np.asarray(staged, np.float32)[:, :valid_n]).all()
    assert (a == np.asarray(split, np.float32)[:, :valid_n]).all()

    xla = F.fused_eval_block(*args, use_pallas=False)
    np.testing.assert_allclose(
        a, np.asarray(xla, np.float32)[:, :valid_n], atol=0.05, rtol=0.05)


def test_proj_mlp_tail_interpret_matches_split_pair(interpret_kernels):
    """The one-kernel post-attention half == linear_residual → mlp_tail,
    including the bf16 rounding of the intermediate x'."""
    rng = np.random.RandomState(3)
    B, N, C, H = 2, 8, 128, 512
    for dtype in (jnp.float32, jnp.bfloat16):
        ctx = _rand(rng, (B, N, C), dtype)
        res = _rand(rng, (B, N, C), dtype)
        wp, bp = _rand(rng, (C, C), s=0.05), _rand(rng, (C,))
        g1, g2 = _rand(rng, (C,), s=0.1), _rand(rng, (C,), s=0.1)
        lnw, lnb = _rand(rng, (C,), s=1.0), _rand(rng, (C,))
        w1, b1 = _rand(rng, (H, C), s=0.05), _rand(rng, (H,))
        w2, b2 = _rand(rng, (C, H), s=0.05), _rand(rng, (C,))
        got = F.proj_mlp_tail(ctx, wp, bp, g1, res, lnw, lnb,
                              w1, b1, w2, b2, g2, use_pallas=True)
        x1 = F.linear_residual(ctx, wp, bp, g1, res, use_pallas=True)
        want = F.mlp_tail(x1, lnw, lnb, w1, b1, w2, b2, g2,
                          use_pallas=True)
        assert got.dtype == dtype
        if dtype == jnp.bfloat16:
            # identical rounding points => bit-equal
            assert (np.asarray(got, np.float32)
                    == np.asarray(want, np.float32)).all()
        else:
            np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                       atol=2e-5, rtol=2e-5)
