"""Training-forward fusion (VLM_TPU_TRAIN_FUSION, VERDICT r3 #4).

The fused train path pairs Pallas forwards with XLA-recompute backwards
(custom_vjp of the bit-matching unfused composition), so:
  * op-level gradients must equal the unfused composition's EXACTLY
    (the bwd literally is jax.vjp of that composition), and
  * block-level loss/grads through mome.block_forward must match the
    gated-off path within f32 tolerance (forward rounding points differ
    only where the eval kernels' contract already allows).

Everything runs in interpret mode on CPU; on-chip adoption is decided by
tools/train_fusion_probe.py.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vl_merging_tpu.config import build_config
from vl_merging_tpu.models import V, init_params, make_model_spec, mome
from vl_merging_tpu.ops import fused_block as F


@pytest.fixture()
def interpret_kernels(monkeypatch):
    monkeypatch.setattr(F, "_INTERPRET", True)
    monkeypatch.setattr(F.jax, "default_backend", lambda: "tpu")
    monkeypatch.setattr(F, "BLOCK_M", 8)


def _rand(rng, shape, dtype=jnp.float32, s=0.5):
    return jnp.asarray((rng.randn(*shape) * s).astype(np.float32)) \
        .astype(dtype)


def _tail_args(rng, B=2, N=10, C=128, H=512):
    ctx = _rand(rng, (B, N, C))
    res = _rand(rng, (B, N, C))
    wp, bp = _rand(rng, (C, C), s=0.05), _rand(rng, (C,))
    g1 = _rand(rng, (B, 1, C), s=0.1)
    g2 = _rand(rng, (B, 1, C), s=0.1)
    lnw, lnb = _rand(rng, (C,), s=1.0), _rand(rng, (C,))
    w1, b1 = _rand(rng, (H, C), s=0.05), _rand(rng, (H,))
    w2, b2 = _rand(rng, (C, H), s=0.05), _rand(rng, (C,))
    return (ctx, wp, bp, g1, res, lnw, lnb, w1, b1, w2, b2, g2)


def test_tail_train_forward_matches_reference(interpret_kernels):
    args = _tail_args(np.random.RandomState(0))
    got = F.proj_mlp_tail_train(*args)
    want = F._tail_reference(*args)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=2e-5, rtol=2e-5)


def test_tail_train_grads_equal_reference_exactly(interpret_kernels):
    """The custom bwd IS jax.vjp of _tail_reference at the same primals,
    so single-op grads are bit-equal to differentiating the reference."""
    args = _tail_args(np.random.RandomState(1))
    cot = _rand(np.random.RandomState(2), args[0].shape)

    def loss(f):
        return lambda *a: (f(*a) * cot).sum()

    got = jax.grad(loss(F.proj_mlp_tail_train), argnums=tuple(range(12)))(
        *args)
    want = jax.grad(loss(F._tail_reference), argnums=tuple(range(12)))(
        *args)
    for i, (a, b) in enumerate(zip(got, want)):
        assert (np.asarray(a) == np.asarray(b)).all(), f"arg {i}"


def test_ln_linear_train_forward_and_grads(interpret_kernels):
    rng = np.random.RandomState(3)
    B, N, C, O = 2, 9, 128, 384
    x = _rand(rng, (B, N, C))
    lnw, lnb = _rand(rng, (C,), s=1.0), _rand(rng, (C,))
    w, b = _rand(rng, (O, C), s=0.05), _rand(rng, (O,))
    got = F.ln_linear_train(x, lnw, lnb, w, b)
    want = F._ln_linear_ref(x, lnw, lnb, w, b)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=2e-5, rtol=2e-5)

    cot = _rand(np.random.RandomState(4), (B, N, O))
    g_got = jax.grad(lambda *a: (F.ln_linear_train(*a) * cot).sum(),
                     argnums=(0, 1, 2, 3, 4))(x, lnw, lnb, w, b)
    g_want = jax.grad(lambda *a: (F._ln_linear_ref(*a) * cot).sum(),
                      argnums=(0, 1, 2, 3, 4))(x, lnw, lnb, w, b)
    for i, (a, b_) in enumerate(zip(g_got, g_want)):
        assert (np.asarray(a) == np.asarray(b_)).all(), f"arg {i}"


def test_block_forward_train_fusion_levels_match_unfused(
        interpret_kernels, monkeypatch):
    """Drive the ACTUAL _block_fast_train wiring (param-key plumbing,
    qkv-bias assembly, dp_scale→effective-γ fold, N=10→16 tail padding)
    through mome.block_forward at both fusion levels: loss and grads
    must match the gated-off train path within f32 tolerance."""
    cfg = build_config(
        "task_test_vit_tiny_mlm_itm_ifm_square_randaug_base_vl", "ufo",
        overrides=dict(hidden_size=128, num_heads=2, num_layers=2,
                       image_size=256, patch_size=16, max_text_len=8,
                       max_text_len_of_initckpt=16,
                       vlffn_start_layer_index=2, precision="f32"))
    spec = make_model_spec(cfg)
    params = init_params(spec, 0)
    b = spec.blocks[0]
    rng = np.random.RandomState(5)
    B, N, C = 2, 10, 128
    x = _rand(rng, (B, N, C), s=1.0)
    mask = jnp.ones((B, N), jnp.float32)
    dp = jnp.asarray(rng.uniform(0.5, 1.5, (2, B)).astype(np.float32))
    cot = _rand(np.random.RandomState(6), (B, N, C))

    def loss(params, x):
        out, _ = mome.block_forward(params, spec, b, x, mask, None, V,
                                    train=True, dp_scale=dp)
        return (out * cot).sum()

    results = {}
    for level in ("0", "tail", "full"):
        monkeypatch.setattr(F, "_TRAIN_FUSION", level)
        results[level] = jax.value_and_grad(loss, argnums=(0, 1))(
            params, x)

    base_loss, (base_gp, base_gx) = results["0"]
    for level in ("tail", "full"):
        l, (gp, gx) = results[level]
        np.testing.assert_allclose(float(l), float(base_loss),
                                   atol=2e-4, rtol=2e-5,
                                   err_msg=f"loss at level={level}")
        np.testing.assert_allclose(np.asarray(gx), np.asarray(base_gx),
                                   atol=2e-4, rtol=2e-3,
                                   err_msg=f"dx at level={level}")
        used = [k for k in base_gp
                if np.abs(np.asarray(base_gp[k])).max() > 0]
        assert any(k.startswith("transformer.blocks.0.") for k in used)
        for k in used:
            np.testing.assert_allclose(
                np.asarray(gp[k]), np.asarray(base_gp[k]),
                atol=2e-4, rtol=2e-3, err_msg=f"{level}: {k}")


def test_train_fusion_skips_legacy_rng_drop_path(interpret_kernels,
                                                 monkeypatch):
    """dp_scale=None with an active drop-path RNG takes the legacy
    per-block bernoulli path, which the fused path cannot replicate
    bit-for-bit — the gate must decline (return the unfused result)."""
    cfg = build_config(
        "task_test_vit_tiny_mlm_itm_ifm_square_randaug_base_vl", "ufo",
        overrides=dict(hidden_size=128, num_heads=2, num_layers=2,
                       image_size=256, patch_size=16, max_text_len=8,
                       max_text_len_of_initckpt=16,
                       vlffn_start_layer_index=2, precision="f32"))
    spec = make_model_spec(cfg)
    params = init_params(spec, 0)
    b = spec.blocks[0]
    rng = np.random.RandomState(7)
    x = _rand(rng, (2, 10, 128), s=1.0)
    mask = jnp.ones((2, 10), jnp.float32)
    key = jax.random.PRNGKey(0)

    monkeypatch.setattr(F, "_TRAIN_FUSION", "full")
    fused_off = mome._block_fast_train(
        params, spec, b, x, mask, None, V, None, None,
        drop_path_rate=0.1, rng=key)
    assert fused_off is None
    # but with drop-path inactive (rate 0), the gate synthesizes unit
    # scales and fuses
    fused_on = mome._block_fast_train(
        params, spec, b, x, mask, None, V, None, None,
        drop_path_rate=0.0, rng=None)
    assert fused_on is not None
