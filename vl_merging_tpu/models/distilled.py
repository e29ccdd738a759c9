"""DistilledVisionTransformer: DeiT dist-token + dynamic-patch embedding.

TPU-native re-design of the reference's legacy ViLT/pixelbert path
(reference: src/vilt/modules/vision_transformer.py:1011-1163).  The
reference feeds variable-resolution images (MinMaxResize "pixelbert"
transforms), marks real pixels with a mask, interpolates absolute position
embeddings per image to its true (h, w) patch grid, and samples/pads each
image's patch set to a fixed ``max_image_len`` so the batch is rectangular.

TPU adaptation (static shapes, no data-dependent control flow):

* Images arrive zero-padded to a fixed (S, S) canvas; the per-image true
  grid (h, w) is recovered from the pixel mask exactly like the reference
  (vision_transformer.py:1032-1035).
* Per-image pos-embed interpolation (bilinear, align_corners=True —
  :1038-1046) is a gather with traced source coordinates instead of a
  per-image ``F.interpolate`` call: same math, one fused kernel, static
  shapes.
* The reference's per-image Python loop over ``torch.multinomial`` draws
  (:1100-1116) becomes one random-key ranking: every patch gets a uniform
  key, invalid patches are offset by +2 so they sort last, and ``top_k``
  keeps ``max_image_len``.  Semantics match: when an image has more valid
  patches than the budget a uniform random subset is kept; otherwise all
  valid patches are kept and the remainder is padded with (masked-out)
  invalid patches.  Order differs from torch's draw order, which is
  irrelevant — attention is permutation-equivariant and each token carries
  its own position embedding.
* ``max_image_len=-1`` (reference: data-dependent ``eff.max()``, :1075-1086)
  uses the static grid bound H*W instead — the extra tokens are mask-zero
  and therefore inert; XLA requires static shapes.

The MPP ``mask_tokens`` path (:918-950, 80%-replace masked-patch-prediction
with 255-binned mean-color labels) is implemented in :func:`mpp_mask_tokens`.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from .spec import ModelSpec, Params


def _nearest_mask(pix_mask: jax.Array, hp: int, wp: int) -> jax.Array:
    """Downsample a (B, Hin, Win) pixel mask to the (hp, wp) patch grid with
    torch ``F.interpolate`` nearest semantics: src = floor(dst * in / out)
    (vision_transformer.py:1033)."""
    hin, win = pix_mask.shape[1], pix_mask.shape[2]
    ri = (jnp.arange(hp) * hin) // hp
    ci = (jnp.arange(wp) * win) // wp
    return pix_mask[:, ri][:, :, ci]


def _bilinear_pos(spatial_pos: jax.Array, h: jax.Array, w: jax.Array,
                  hp: int, wp: int) -> jax.Array:
    """Sample a (P, P, C) pos-embed grid at one image's (h, w) patch grid,
    bilinear with align_corners=True, zero-padded to (hp, wp)
    (vision_transformer.py:1038-1046).  h/w are traced scalars."""
    p = spatial_pos.shape[0]

    def axis_coords(n_out, size):
        # align_corners=True: src = dst * (P-1) / (out-1); out==1 → 0
        scale = jnp.where(size > 1, (p - 1) / jnp.maximum(size - 1, 1), 0.0)
        return jnp.arange(n_out, dtype=jnp.float32) * scale

    sy = axis_coords(hp, h)
    sx = axis_coords(wp, w)
    y0 = jnp.clip(jnp.floor(sy).astype(jnp.int32), 0, p - 1)
    x0 = jnp.clip(jnp.floor(sx).astype(jnp.int32), 0, p - 1)
    y1 = jnp.minimum(y0 + 1, p - 1)
    x1 = jnp.minimum(x0 + 1, p - 1)
    fy = (sy - y0.astype(jnp.float32))[:, None, None]    # hp,1,1
    fx = (sx - x0.astype(jnp.float32))[None, :, None]    # 1,wp,1

    g00 = spatial_pos[y0][:, x0]                         # hp,wp,C
    g01 = spatial_pos[y0][:, x1]
    g10 = spatial_pos[y1][:, x0]
    g11 = spatial_pos[y1][:, x1]
    out = (g00 * (1 - fy) * (1 - fx) + g01 * (1 - fy) * fx
           + g10 * fy * (1 - fx) + g11 * fy * fx)
    valid = ((jnp.arange(hp)[:, None, None] < h)
             & (jnp.arange(wp)[None, :, None] < w))
    return jnp.where(valid, out, 0.0)


def mpp_mask_tokens(params: Params, spec: ModelSpec, image: jax.Array,
                    feats: jax.Array, rng: jax.Array
                    ) -> Tuple[jax.Array, jax.Array]:
    """Masked-patch-prediction corruption (vision_transformer.py:918-950):
    labels are the 255-binned per-patch mean colors; 15% of patches are
    selected, of which 80% have their embedding replaced by mask_token."""
    ps = spec.patch_size
    img_unnorm = image * 0.5 + 0.5                       # B,3,S,S
    b, _, s, _ = image.shape
    hp = s // ps
    patch_mean = jnp.mean(
        img_unnorm.reshape(b, 3, hp, ps, hp, ps), axis=(3, 5))  # B,3,hp,hp
    labels = (patch_mean * 255).astype(jnp.int32)
    labels = labels.reshape(b, 3, hp * hp).transpose(0, 2, 1)   # B,N,3

    k1, k2 = jax.random.split(rng)
    masked = jax.random.bernoulli(k1, 0.15, labels.shape[:-1])
    labels = jnp.where(masked[..., None], labels, -100)
    replaced = jax.random.bernoulli(k2, 0.8, labels.shape[:-1]) & masked
    mask_token = params["transformer.mask_token"].astype(feats.dtype)
    feats = jnp.where(replaced[..., None], mask_token[0], feats)
    return feats, labels


def distilled_visual_embed(
    params: Params, spec: ModelSpec, image: jax.Array, *,
    max_image_len: int = 144, mask_it: bool = False,
    rng: Optional[jax.Array] = None,
):
    """DeiT visual embedding with dynamic patch sampling.

    image: (B, 3, S, S) float, zero-padded outside each image's true extent
    (top-left anchored, like the reference's pixelbert collate).  Returns
    ``(x, x_mask, (patch_index, (hp, wp)), label)`` where x is
    (B, max_image_len + 2, C) — [cls; dist; patches] — and x_mask marks the
    real tokens (vision_transformer.py:1029-1141).
    """
    if rng is None:
        rng = jax.random.PRNGKey(0)
    dtype = spec.jnp_compute_dtype
    ps = spec.patch_size
    b, _, s_h, s_w = image.shape
    hp, wp = s_h // ps, s_w // ps
    n = hp * wp
    if max_image_len is None or max_image_len < 0:
        max_image_len = n  # static bound for the reference's eff.max()
    max_image_len = min(max_image_len, n)

    # conv patchify (shared PatchEmbed weights)
    w_conv = params["transformer.patch_embed.proj.weight"].astype(dtype)
    x = jax.lax.conv_general_dilated(
        image.astype(dtype), w_conv, window_strides=(ps, ps),
        padding="VALID", dimension_numbers=("NCHW", "OIHW", "NCHW"))
    x = x + params["transformer.patch_embed.proj.bias"].astype(dtype)[
        None, :, None, None]                                     # B,C,hp,wp
    c = x.shape[1]

    pix_mask = (jnp.sum(image, axis=1) != 0)                     # B,S,S
    x_mask = _nearest_mask(pix_mask, hp, wp).astype(jnp.int32)   # B,hp,wp
    x_h = jnp.sum(x_mask, axis=1)[:, 0]                          # B (col 0)
    x_w = jnp.sum(x_mask, axis=2)[:, 0]                          # B (row 0)

    pos_table = params["transformer.pos_embed"].astype(jnp.float32)[0]
    p = spec.window
    spatial_pos = pos_table[2:].reshape(p, p, c)                 # P,P,C
    pos_embed = jax.vmap(
        lambda h, w: _bilinear_pos(spatial_pos, h, w, hp, wp))(x_h, x_w)
    pos_embed = pos_embed.reshape(b, n, c).astype(dtype)

    x = x.reshape(b, c, n).transpose(0, 2, 1)                    # B,N,C
    x_mask_flat = x_mask.reshape(b, n)
    patch_index = jnp.stack(
        jnp.meshgrid(jnp.arange(hp), jnp.arange(wp), indexing="ij"),
        axis=-1).reshape(n, 2)
    patch_index = jnp.broadcast_to(patch_index[None], (b, n, 2))

    label = None
    if mask_it:
        rng, mk = jax.random.split(rng)
        x, label = mpp_mask_tokens(params, spec, image, x, mk)

    # random-key ranking replaces the per-image multinomial loop
    # (vision_transformer.py:1091-1116); valid patches sort first
    keys = jax.random.uniform(rng, (b, n)) + 2.0 * (1 - x_mask_flat)
    _, sel = jax.lax.top_k(-keys, max_image_len)                 # B,K
    take = jax.vmap(lambda a, i: a[i])
    x = take(x, sel)
    x_mask_flat = take(x_mask_flat, sel)
    patch_index = take(patch_index, sel)
    pos_embed = take(pos_embed, sel)
    if label is not None:
        label = take(label, sel)
        label = jnp.where(x_mask_flat[..., None] == 0, -100, label)
        label = jnp.concatenate(
            [jnp.full((b, 1, 3), -100, label.dtype), label], axis=1)

    cls_tok = jnp.broadcast_to(
        params["transformer.cls_token"].astype(dtype), (b, 1, c))
    dist_tok = jnp.broadcast_to(
        params["transformer.dist_token"].astype(dtype), (b, 1, c))
    x = jnp.concatenate([cls_tok, dist_tok, x], axis=1)
    pos_embed = jnp.concatenate(
        [jnp.broadcast_to(pos_table[None, :2].astype(dtype), (b, 2, c)),
         pos_embed], axis=1)
    x = x + pos_embed
    x_mask_flat = jnp.concatenate(
        [jnp.ones((b, 2), x_mask_flat.dtype), x_mask_flat], axis=1)
    return x, x_mask_flat, (patch_index, (hp, wp)), label


def distilled_forward_features(
    params: Params, spec: ModelSpec, image: jax.Array, *,
    max_image_len: int = 144, mask_it: bool = False,
    rng: Optional[jax.Array] = None,
):
    """Trunk over the dynamically-sampled patches: blocks with key-padding
    mask, no relative bias (the DeiT path uses absolute pos embeds), final
    norm (vision_transformer.py:1148-1158).  Returns (x, x_mask, label)."""
    from .layers import layer_norm
    from .mome import LN_EPS, block_forward
    from .spec import V

    x, x_mask, _, label = distilled_visual_embed(
        params, spec, image, max_image_len=max_image_len, mask_it=mask_it,
        rng=rng)
    for b in spec.blocks:
        x, _ = block_forward(params, spec, b, x, x_mask, None, V)
    x = layer_norm(x, params["transformer.norm.weight"],
                   params["transformer.norm.bias"], eps=LN_EPS)
    return x, x_mask, label
