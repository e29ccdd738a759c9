"""DistilledVisionTransformer dynamic-patch embedding tests.

The deterministic pieces (nearest mask downsample, per-image bilinear
align_corners=True pos-embed interpolation, MPP color-bin labels) are
pinned against torch oracles — the exact ops the reference uses
(vision_transformer.py:1029-1141, 918-950).  The stochastic patch
selection is checked behaviorally (all-valid-kept / uniform-subset),
since torch and JAX RNGs cannot be bit-matched.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from vl_merging_tpu.config import build_config
from vl_merging_tpu.models import make_model_spec, init_params
from vl_merging_tpu.models.distilled import (
    _bilinear_pos, _nearest_mask, distilled_visual_embed, mpp_mask_tokens)

torch = pytest.importorskip("torch")


def _tiny_spec(image_size=64, patch=16):
    cfg = build_config(
        "task_test_vit_tiny_mlm_itm_ifm_square_randaug_base_vl",
        overrides=dict(hidden_size=32, num_heads=2, num_layers=2,
                       image_size=image_size, patch_size=patch,
                       max_text_len=8, max_text_len_of_initckpt=16,
                       vlffn_start_layer_index=1, precision="f32",
                       vit=f"vit_deit_tiny_distilled_patch16_{image_size}"
                       if image_size in (224, 384) else "vit_tiny_patch16_224",
                       ))
    return make_model_spec(cfg)


def _params_with_distilled(spec, seed=0):
    rng = np.random.RandomState(seed)
    params = dict(init_params(spec, seed))
    hs = spec.hidden_size
    params.setdefault(
        "transformer.dist_token",
        jnp.asarray(rng.randn(1, 1, hs).astype(np.float32) * 0.02))
    params.setdefault(
        "transformer.pos_embed",
        jnp.asarray(rng.randn(1, spec.num_patches + 2, hs)
                    .astype(np.float32) * 0.02))
    return params


@pytest.mark.parametrize("hin,hp", [(64, 4), (48, 3), (37, 4)])
def test_nearest_mask_matches_torch(hin, hp):
    rng = np.random.RandomState(0)
    m = (rng.rand(2, hin, hin) > 0.4).astype(np.float32)
    want = torch.nn.functional.interpolate(
        torch.from_numpy(m)[:, None], size=(hp, hp)).long()[:, 0].numpy()
    got = np.asarray(_nearest_mask(jnp.asarray(m), hp, hp))
    np.testing.assert_array_equal(got, want)


@pytest.mark.parametrize("p,h,w,hp,wp", [
    (4, 4, 4, 4, 4), (4, 3, 2, 4, 4), (6, 5, 6, 8, 8), (4, 1, 3, 4, 4)])
def test_bilinear_pos_matches_torch(p, h, w, hp, wp):
    """Per-image pos-embed interpolation == F.interpolate(bilinear,
    align_corners=True) + right/bottom zero pad
    (vision_transformer.py:1038-1046)."""
    rng = np.random.RandomState(1)
    c = 8
    grid = rng.randn(p, p, c).astype(np.float32)
    spatial = torch.from_numpy(grid.transpose(2, 0, 1))[None]   # 1,C,P,P
    want = torch.nn.functional.pad(
        torch.nn.functional.interpolate(
            spatial, size=(h, w), mode="bilinear", align_corners=True),
        (0, wp - w, 0, hp - h))[0].permute(1, 2, 0).numpy()
    got = np.asarray(_bilinear_pos(
        jnp.asarray(grid), jnp.int32(h), jnp.int32(w), hp, wp))
    np.testing.assert_allclose(got, want, atol=2e-6)


def test_mpp_labels_match_torch_binning():
    """MPP labels = 255-binned per-patch mean colors
    (vision_transformer.py:924-940); masking positions are RNG-dependent,
    but every non-(-100) label must equal the torch bin value."""
    spec = _tiny_spec(image_size=64, patch=16)
    params = _params_with_distilled(spec)
    rng = np.random.RandomState(2)
    img = rng.randn(2, 3, 64, 64).astype(np.float32).clip(-1, 1)

    img_t = torch.from_numpy(img)
    unnorm = img_t * 0.5 + 0.5
    ones = torch.ones(3, 1, 16, 16) / 256.0
    patch = torch.nn.functional.conv2d(
        unnorm, weight=ones, stride=(16, 16), groups=3)
    want = ((patch * 255).long().flatten(2)).permute(0, 2, 1).numpy()

    feats = jnp.zeros((2, 16, spec.hidden_size), jnp.float32)
    _, labels = mpp_mask_tokens(params, spec, jnp.asarray(img), feats,
                                jax.random.PRNGKey(0))
    got = np.asarray(labels)
    sel = got != -100
    assert sel.any()
    np.testing.assert_array_equal(got[sel], want[sel])


def test_embed_keeps_all_valid_patches_when_budget_allows():
    spec = _tiny_spec(image_size=64, patch=16)
    params = _params_with_distilled(spec)
    rng = np.random.RandomState(3)
    # image 0 fills 32x48 of the 64x64 canvas -> 2x3 = 6 valid patches
    img = np.zeros((2, 3, 64, 64), np.float32)
    img[0, :, :32, :48] = rng.rand(3, 32, 48) + 0.1
    img[1, :, :, :] = rng.rand(3, 64, 64) + 0.1          # full: 16 patches

    x, x_mask, (pidx, (hp, wp)), label = distilled_visual_embed(
        params, spec, jnp.asarray(img), max_image_len=16,
        rng=jax.random.PRNGKey(0))
    assert x.shape == (2, 18, spec.hidden_size)          # cls+dist+16
    assert (hp, wp) == (4, 4)
    m = np.asarray(x_mask)
    assert m[:, :2].all()                                # cls+dist valid
    assert m[0, 2:].sum() == 6 and m[1, 2:].sum() == 16
    # image 0's kept valid patches are exactly the 2x3 top-left block
    kept = np.asarray(pidx)[0][m[0, 2:] == 1]
    assert {tuple(r) for r in kept} == {(i, j) for i in range(2)
                                        for j in range(3)}
    assert label is None


def test_embed_subsamples_uniformly_when_over_budget():
    spec = _tiny_spec(image_size=64, patch=16)
    params = _params_with_distilled(spec)
    rng = np.random.RandomState(4)
    img = jnp.asarray(rng.rand(1, 3, 64, 64).astype(np.float32) + 0.1)

    x, x_mask, (pidx, _), _ = distilled_visual_embed(
        params, spec, img, max_image_len=9, rng=jax.random.PRNGKey(1))
    assert x.shape == (1, 11, spec.hidden_size)
    assert np.asarray(x_mask).sum() == 11                # all kept are valid
    a = {tuple(r) for r in np.asarray(pidx)[0]}
    assert len(a) == 9                                   # no replacement
    b_sel = distilled_visual_embed(params, spec, img, max_image_len=9,
                                   rng=jax.random.PRNGKey(2))[2][0]
    assert {tuple(r) for r in np.asarray(b_sel)[0]} != a  # rng-dependent


def test_embed_pos_embed_added_and_deterministic():
    spec = _tiny_spec(image_size=64, patch=16)
    params = _params_with_distilled(spec)
    rng = np.random.RandomState(5)
    img = jnp.asarray(rng.rand(2, 3, 64, 64).astype(np.float32) + 0.1)
    key = jax.random.PRNGKey(3)
    x1 = distilled_visual_embed(params, spec, img, max_image_len=16,
                                rng=key)[0]
    x2 = distilled_visual_embed(params, spec, img, max_image_len=16,
                                rng=key)[0]
    np.testing.assert_array_equal(np.asarray(x1), np.asarray(x2))
    # cls/dist rows = token + pos rows 0/1
    want_cls = (np.asarray(params["transformer.cls_token"])[0, 0]
                + np.asarray(params["transformer.pos_embed"])[0, 0])
    np.testing.assert_allclose(np.asarray(x1)[0, 0], want_cls, atol=1e-6)


def test_embed_mpp_labels_masked_outside_valid():
    spec = _tiny_spec(image_size=64, patch=16)
    params = _params_with_distilled(spec)
    rng = np.random.RandomState(6)
    img = np.zeros((1, 3, 64, 64), np.float32)
    img[0, :, :32, :32] = rng.rand(3, 32, 32) + 0.1      # 4 valid patches

    x, x_mask, _, label = distilled_visual_embed(
        params, spec, jnp.asarray(img), max_image_len=16, mask_it=True,
        rng=jax.random.PRNGKey(4))
    lab = np.asarray(label)
    assert lab.shape == (1, 17, 3)                       # +1 leading -100 row
    assert (lab[0, 0] == -100).all()
    m = np.asarray(x_mask)[0, 2:]
    assert (lab[0, 1:][m == 0] == -100).all()


def test_forward_features_runs_and_masks():
    """Distilled trunk: blocks consume the sampled tokens + mask; masked
    (padding) tokens do not influence valid outputs."""
    from vl_merging_tpu.models.distilled import distilled_forward_features

    spec = _tiny_spec(image_size=64, patch=16)
    params = _params_with_distilled(spec)
    rng = np.random.RandomState(7)
    img = np.zeros((1, 3, 64, 64), np.float32)
    img[0, :, :32, :32] = rng.rand(3, 32, 32) + 0.1

    x, m, label = distilled_forward_features(
        params, spec, jnp.asarray(img), max_image_len=8,
        rng=jax.random.PRNGKey(5))
    assert x.shape == (1, 10, spec.hidden_size)
    assert label is None
    x2 = distilled_forward_features(
        params, spec, jnp.asarray(img), max_image_len=8,
        rng=jax.random.PRNGKey(5))[0]
    np.testing.assert_array_equal(np.asarray(x), np.asarray(x2))


def test_spec_declares_distilled_params():
    from vl_merging_tpu.models.spec import param_shapes

    spec = _tiny_spec()
    assert not spec.distilled
    cfg = build_config(
        "task_test_vit_tiny_mlm_itm_ifm_square_randaug_base_vl",
        overrides=dict(hidden_size=192, num_heads=3, num_layers=2,
                       image_size=224, patch_size=16, max_text_len=8,
                       max_text_len_of_initckpt=16,
                       vlffn_start_layer_index=1, precision="f32",
                       vit="vit_deit_tiny_distilled_patch16_224"))
    dspec = make_model_spec(cfg)
    assert dspec.distilled
    shapes = param_shapes(dspec)
    assert shapes["transformer.dist_token"] == (1, 1, 192)
    assert shapes["transformer.pos_embed"] == (1, dspec.num_patches + 2, 192)
    p = init_params(dspec, 0)
    assert p["transformer.pos_embed"].shape == (1, dspec.num_patches + 2, 192)
