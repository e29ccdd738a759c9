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
