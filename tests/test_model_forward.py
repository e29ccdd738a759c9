"""Model forward smoke + structure tests across every architecture mode."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vl_merging_tpu.config import build_config
from vl_merging_tpu.models import (
    make_model_spec, param_shapes, init_params, model, V, L, VL,
)


def tiny_cfg(*modes, **over):
    overrides = dict(
        vit="vit_tiny_patch16_224", hidden_size=64, num_heads=2, num_layers=4,
        image_size=64, patch_size=16, max_text_len=8,
        max_text_len_of_initckpt=16, vlffn_start_layer_index=2,
        precision="f32",
    )
    overrides.update(over)
    return build_config(*modes, overrides=overrides)


def make_batch(spec, bsz=2, seed=0):
    rng = np.random.RandomState(seed)
    return {
        "text_ids": jnp.asarray(
            rng.randint(0, spec.vocab_size, (bsz, spec.max_text_len))),
        "text_masks": jnp.ones((bsz, spec.max_text_len), jnp.int32),
        "text_labels": jnp.full((bsz, spec.max_text_len), -100, jnp.int32),
        "image": jnp.asarray(
            rng.randn(bsz, 3, spec.image_size, spec.image_size)
            .astype(np.float32)),
    }


MODES = ["ufo", "ln_moe", "attn_moe", "ffn_moe", "all_moe"]


@pytest.mark.parametrize("mode", MODES)
def test_forward_all_modes(mode):
    cfg = tiny_cfg(mode)
    spec = make_model_spec(cfg)
    params = init_params(spec, seed=0)
    batch = make_batch(spec)

    out = model.infer(params, spec, batch)
    n_tokens = spec.max_text_len + spec.image_len
    assert out["cls_feats"].shape == (2, spec.hidden_size)
    assert out["text_feats"].shape == (2, spec.max_text_len, spec.hidden_size)
    assert out["image_feats"].shape == (2, spec.image_len, spec.hidden_size)
    assert np.all(np.isfinite(np.asarray(out["cls_feats"])))

    t = model.infer_text(params, spec, batch)
    assert t["cls_feats"].shape == (2, spec.hidden_size)
    assert t["cls_vlffn_feats"].shape == (2, spec.hidden_size)
    np.testing.assert_allclose(
        np.linalg.norm(np.asarray(t["cls_feats"]), axis=-1), 1.0, rtol=1e-5)

    i = model.infer_image(params, spec, batch)
    assert i["cls_feats"].shape == (2, spec.hidden_size)
    assert np.all(np.isfinite(np.asarray(i["cls_vlffn_feats"])))


@pytest.mark.parametrize("mode", MODES)
def test_param_schema_expert_structure(mode):
    cfg = tiny_cfg(mode)
    spec = make_model_spec(cfg)
    shapes = param_shapes(spec)

    shallow, deep = 0, 3  # vlffn_start_layer_index=2
    if mode in ("attn_moe", "all_moe"):
        assert f"transformer.blocks.{shallow}.attn.v.qkv.weight" in shapes
        assert f"transformer.blocks.{shallow}.attn.l.qkv.weight" in shapes
        assert f"transformer.blocks.{shallow}.attn.vl.qkv.weight" not in shapes
        assert f"transformer.blocks.{deep}.attn.vl.qkv.weight" in shapes
    else:
        assert f"transformer.blocks.{deep}.attn.qkv.weight" in shapes
    if mode in ("ffn_moe", "all_moe"):
        assert f"transformer.blocks.{deep}.mlp.vl.fc1.weight" in shapes
        assert f"transformer.blocks.{deep}.norm2.vl.weight" in shapes
    if mode == "ufo":
        assert f"transformer.blocks.{deep}.mlp.fc1.weight" in shapes
        assert not any(".mlp.v." in k for k in shapes)
    if mode == "ln_moe":
        assert f"transformer.blocks.{deep}.norm1.vl.weight" in shapes
        assert f"transformer.blocks.{deep}.norm2.v.weight" in shapes
        assert f"transformer.blocks.{deep}.attn.qkv.weight" in shapes


def test_text_padding_mask_respected():
    """Padded text tokens must not affect valid-token outputs."""
    cfg = tiny_cfg("ufo")
    spec = make_model_spec(cfg)
    params = init_params(spec, seed=0)
    batch = make_batch(spec)
    mask = np.ones((2, spec.max_text_len), np.int32)
    mask[:, 5:] = 0
    batch["text_masks"] = jnp.asarray(mask)

    out1 = model.infer_text_ft(params, spec, batch)
    ids2 = np.asarray(batch["text_ids"]).copy()
    ids2[:, 5:] = 123  # garbage in padded region
    batch2 = dict(batch, text_ids=jnp.asarray(ids2))
    out2 = model.infer_text_ft(params, spec, batch2)
    np.testing.assert_allclose(
        np.asarray(out1["text_feats"])[:, :5],
        np.asarray(out2["text_feats"])[:, :5], atol=1e-5)


def test_moe_expert_routing_is_modality_specific():
    """Perturbing the v expert must change image outputs, not text outputs."""
    cfg = tiny_cfg("all_moe")
    spec = make_model_spec(cfg)
    params = init_params(spec, seed=0)
    batch = make_batch(spec)

    t0 = np.asarray(model.infer_text_ft(params, spec, batch)["cls_feats"])
    i0 = np.asarray(model.infer_image_ft(params, spec, batch)["cls_feats"])

    p2 = dict(params)
    for k in params:
        if ".mlp.v." in k or ".attn.v." in k:
            p2[k] = params[k] + 0.05
    t1 = np.asarray(model.infer_text_ft(p2, spec, batch)["cls_feats"])
    i1 = np.asarray(model.infer_image_ft(p2, spec, batch)["cls_feats"])

    np.testing.assert_allclose(t0, t1, atol=1e-6)  # text untouched
    assert np.abs(i0 - i1).max() > 1e-4            # image changed


def test_fused_blockdiag_equals_separate_for_ufo_shallow():
    """In ufo separate-inference mode the fused pass runs block-diagonal
    attention below vlffn_start; a fused pass must therefore agree with
    running each modality alone through those layers."""
    cfg = tiny_cfg("ufo", vlffn_start_layer_index=4)  # all layers shallow
    spec = make_model_spec(cfg)
    params = init_params(spec, seed=0)
    batch = make_batch(spec)

    fused = model.infer(params, spec, batch)
    text_alone = model.infer_text_ft(params, spec, batch)
    # The text half of the fused pass sees the same attention pattern except
    # for cross-modal rel-pos buckets feeding only masked-out... actually the
    # split drops cross-modal connections entirely, so results match exactly.
    np.testing.assert_allclose(
        np.asarray(fused["text_feats"]),
        np.asarray(text_alone["text_feats"]), atol=2e-5)


def test_relpos_index_values():
    from vl_merging_tpu.models import relpos
    cfg = tiny_cfg("ufo")
    spec = make_model_spec(cfg)
    idx = relpos.fused_index(spec)
    T, I = spec.max_text_len, spec.image_len
    assert idx.shape == (T + I, T + I)
    # cross-modal buckets
    assert np.all(idx[:T, T:] == spec.num_relative_distance)
    assert np.all(idx[T:, :T] == spec.num_relative_distance + 1)
    # all indices within table
    assert idx.max() < spec.all_num_relative_distance
    assert idx.min() >= 0
    # text cls buckets
    assert idx[0, 0] == spec.all_num_relative_distance - 1
    assert idx[0, 1] == spec.all_num_relative_distance - 3
    assert idx[1, 0] == spec.all_num_relative_distance - 2


def test_padded_trunk_matches_unpadded():
    """The Pallas eval fast path lane-pads the image sequence once per
    forward (model._seq_pad); on CPU the kernels fall back to identical
    XLA math, so padding must be output-invariant."""
    import jax.numpy as jnp

    from vl_merging_tpu.models.mome import pallas_attention

    cfg = build_config(
        "task_test_vit_tiny_mlm_itm_ifm_square_randaug_base_vl", "all_moe",
        overrides=dict(hidden_size=128, num_heads=2, num_layers=3,
                       image_size=256, patch_size=16, max_text_len=8,
                       max_text_len_of_initckpt=16,
                       vlffn_start_layer_index=2, precision="f32"))
    spec = make_model_spec(cfg)     # 257 image tokens -> pads to 272
    params = init_params(spec, 0)
    rng = np.random.RandomState(0)
    img = jnp.asarray(rng.randn(2, 3, 256, 256).astype(np.float32))

    plain = model.infer_image(params, spec, {}, image=img)
    with pallas_attention(True):
        padded = model.infer_image(params, spec, {}, image=img)
    for k in ("cls_feats", "cls_vlffn_feats", "raw_cls_feats"):
        np.testing.assert_allclose(
            np.asarray(plain[k]), np.asarray(padded[k]), atol=1e-5,
            err_msg=k)
    assert padded["image_feats"].shape == plain["image_feats"].shape
    np.testing.assert_allclose(
        np.asarray(plain["image_feats"]), np.asarray(padded["image_feats"]),
        atol=1e-5)


def test_packed_attention_fallback_matches_split():
    """packed_fused_attention's non-TPU fallback equals the reference
    split-head path."""
    import jax.numpy as jnp

    from vl_merging_tpu.ops.attention import (packed_fused_attention,
                                              reference_attention)

    B, H, N, C, d = 2, 4, 128, 256, 64
    rng = np.random.RandomState(0)
    qkv = jnp.asarray(rng.randn(B, N, 3 * C) * 0.3, jnp.float32)
    bias = jnp.asarray(rng.randn(H, N, N) * 0.1, jnp.float32)
    mask = jnp.asarray((np.arange(N)[None] < 100) * np.ones((B, 1)),
                       jnp.int32)
    got = packed_fused_attention(qkv, bias, mask, 0.125, H)
    q, k, v = jnp.split(qkv, 3, -1)

    def heads(t):
        return jnp.transpose(t.reshape(B, N, H, d), (0, 2, 1, 3))

    want = reference_attention(heads(q), heads(k), heads(v), bias, mask,
                               0.125)
    want = jnp.transpose(want, (0, 2, 1, 3)).reshape(B, N, C)
    np.testing.assert_allclose(np.asarray(got)[:, :100],
                               np.asarray(want)[:, :100], atol=1e-5)


def test_padded_fused_trunk_matches_unpadded():
    """Fused VL pass with lane padding == unpadded, across routing modes
    (incl. the split sep_plain/moe-expert paths, which must use the
    explicit text_len rather than shape inference on padded input)."""
    import jax.numpy as jnp

    from vl_merging_tpu.models.mome import pallas_attention

    for mode in ("ufo", "all_moe", "ffn_moe"):
        cfg = build_config(
            "task_test_vit_tiny_mlm_itm_ifm_square_randaug_base_vl", mode,
            overrides=dict(hidden_size=128, num_heads=2, num_layers=3,
                           image_size=256, patch_size=16, max_text_len=8,
                           max_text_len_of_initckpt=16,
                           vlffn_start_layer_index=2, precision="f32"))
        spec = make_model_spec(cfg)   # fused N = 8 + 257 -> pads to 384
        params = init_params(spec, 0)
        rng = np.random.RandomState(0)
        batch = {
            "text_ids": jnp.asarray(
                rng.randint(0, spec.vocab_size, (2, 8))),
            "text_masks": jnp.asarray(
                (rng.rand(2, 8) < 0.8).astype(np.int32)),
            "image": jnp.asarray(
                rng.randn(2, 3, 256, 256).astype(np.float32)),
        }
        plain = model.infer(params, spec, batch)
        with pallas_attention(True):
            padded = model.infer(params, spec, batch)
        for k in ("cls_feats", "raw_cls_feats", "text_feats", "image_feats"):
            np.testing.assert_allclose(
                np.asarray(plain[k]), np.asarray(padded[k]), atol=2e-5,
                err_msg=f"{mode}:{k}")
        assert padded["image_feats"].shape == plain["image_feats"].shape


@pytest.mark.parametrize("mode", ["ufo", "all_moe"])
def test_segment_padded_fused_trunk_matches_unpadded(mode):
    """Fused (type_id=2) pass with per-segment sublane padding (text→16k,
    image→16k; block_forward's per-half recursion for split blocks) must
    equal the unpadded path — on CPU the kernels fall back to identical
    XLA math, so any difference is a padding/bias-layout bug."""
    import jax.numpy as jnp

    from vl_merging_tpu.models.mome import pallas_attention

    cfg = build_config(
        "task_test_vit_tiny_mlm_itm_ifm_square_randaug_base_vl", mode,
        overrides=dict(hidden_size=128, num_heads=2, num_layers=3,
                       image_size=256, patch_size=16, max_text_len=11,
                       max_text_len_of_initckpt=16,
                       vlffn_start_layer_index=2, precision="f32",
                       tasks=None, max_vl_text_len=None))
    spec = make_model_spec(cfg)   # text 11→16, image 257→272
    params = init_params(spec, 0)
    rng = np.random.RandomState(1)
    batch = {
        "text_ids": jnp.asarray(
            rng.randint(0, spec.vocab_size, (2, spec.max_text_len))),
        "text_masks": jnp.asarray(
            (np.arange(spec.max_text_len)[None, :]
             < np.array([7, 11])[:, None]).astype(np.int32)),
        "image": jnp.asarray(
            rng.randn(2, 3, 256, 256).astype(np.float32)),
    }

    plain = model.infer(params, spec, batch)
    with pallas_attention(True):
        padded = model.infer(params, spec, batch)
    for k in ("cls_feats", "raw_cls_feats", "text_feats", "image_feats"):
        assert padded[k].shape == plain[k].shape, k
        np.testing.assert_allclose(
            np.asarray(plain[k]), np.asarray(padded[k]), atol=2e-5,
            err_msg=f"{mode}: {k}")


def test_block_fast_wiring_all_fusion_variants_interpret(monkeypatch):
    """Drive the ACTUAL _block_fast kernel wiring (param-key plumbing,
    qkv-bias assembly, rel-bias/mask layout, 257→272 padding) end-to-end
    through the interpret-mode Pallas kernels on CPU, for all three
    fusion variants.  The variants must be EXACTLY equal to each other
    (bit-identity contract) and match the plain XLA path within f32
    tolerance.  On-chip this path was previously the only coverage."""
    import jax
    import jax.numpy as jnp

    from vl_merging_tpu.models.mome import pallas_attention
    from vl_merging_tpu.ops import attention as A
    from vl_merging_tpu.ops import fused_block as F

    cfg = build_config(
        "task_test_vit_tiny_mlm_itm_ifm_square_randaug_base_vl", "ufo",
        overrides=dict(hidden_size=128, num_heads=2, num_layers=2,
                       image_size=256, patch_size=16, max_text_len=8,
                       max_text_len_of_initckpt=16,
                       vlffn_start_layer_index=2, precision="f32"))
    spec = make_model_spec(cfg)     # 257 image tokens -> pads to 272
    params = init_params(spec, 0)
    rng = np.random.RandomState(0)
    img = jnp.asarray(rng.randn(2, 3, 256, 256).astype(np.float32))

    plain = model.infer_image_ft(params, spec, {"image": img})

    monkeypatch.setattr(A, "_INTERPRET", True)
    monkeypatch.setattr(F, "_INTERPRET", True)
    monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
    outs = {}
    for name, (mega, qkv, tail) in {
            "split": (False, False, True),
            "qkv": (False, True, True),
            "mega": (True, False, True)}.items():
        monkeypatch.setattr(F, "_FUSE_EVAL_BLOCK", mega)
        monkeypatch.setattr(A, "_FUSE_LN_QKV_ATTN", qkv)
        monkeypatch.setattr(F, "_FUSE_WHOLE_TAIL", tail)
        with pallas_attention(True):
            outs[name] = np.asarray(
                model.infer_image_ft(params, spec, {"image": img})
                ["cls_feats"])
    np.testing.assert_allclose(outs["split"],
                               np.asarray(plain["cls_feats"]),
                               atol=3e-5, rtol=3e-5)
    assert (outs["qkv"] == outs["split"]).all()
    assert (outs["mega"] == outs["split"]).all()
