"""In-graph train-time image augmentation (XLA): RandomResizedCrop +
HFlip + RandAugment(2, 7), the whole train image path on device.

North-star item (BASELINE.json / SURVEY §7.5): "the image path (square
resize, RandAugment, patchify, normalize) compiles into the same XLA
graph".  The eval half lives in ops/image.py; this module is the TRAIN
half: the reference's ``square_transform_randaug`` pipeline
(square_transform.py:20-30 — RandomResizedCrop(scale 0.5-1.0, bicubic) →
RandomHorizontalFlip → RandomAugment(2,7) over a 10-op list →
inception normalize).

Design split: all SCALAR randomness stays on the host
(``sample_train_params`` — crop boxes via the torchvision rejection
loop, coin flips, op choices, signed magnitudes; a few bytes per image,
matching the reference's RNG semantics exactly), while every PIXEL
touches the device exactly once: decoded native-size uint8 canvases ride
the link, and crop-resize + flip + both augment stages + normalize run
as one jitted graph.  No data-dependent control flow: every image
computes all three op candidates per stage (a 256-entry LUT gather, a
3x3-smooth blend, one bilinear warp) and selects by op index — the
branchless form IS the fast form on TPU.

Numerics parity (pinned empirically against Pillow, tests/test_augment.py):
  - Equalize / Brightness / Sharpness: byte-EXACT.  Equalize is PIL's
    integer LUT ((step//2 + cumsum(hist))//step); Brightness/Sharpness
    blends replicate Blend.c's C-float truncation, and the SMOOTH
    pre-filter rounds half-up on the interior with borders copied
    (Pillow ImageFilter.c).
  - AutoContrast: the exact-rational LUT clip((ix-lo)*255 // (hi-lo));
    PIL evaluates the same quantity in double ((ix*scale+offset) then
    int()), which lands one ULP below an exact integer on some (lo, hi)
    pairs — max |Δ| 1 on ~7% of images, documented, arguably exacter.
  - Shear/Translate/Rotate: PIL's generic affine: source coords
    a·(x+0.5)+b·(y+0.5)+c, fill OUTSIDE [0, W)x[0, H) of the unshifted
    coordinate, 2x2 taps clamped to the image, final value truncated
    toward zero.  Rotate is the same warp with PIL's rotate-matrix
    formula (Image.rotate).  f32 coords (PIL: double) flip the odd
    truncation tie: >=99% bytes exact, max |Δ| small — bounded by tests.
  - Crop+resize: ops/image.py's PIL-parity bicubic with the crop folded
    into the resample-weight offsets (one weight matrix per axis).
  - KNOWN DEVIATION (oversized natives): images larger than the staging
    canvas are pre-downscaled host-side to fit (data/arrow_dataset.py
    get_image), so the crop is sampled and resampled from a canvas-max
    image, not the native one — a double-resample pixel deviation from
    the host train path for those images (crop-box distribution is near
    scale-invariant; pixels are not).  Natives at or under canvas_size
    match the host path's sampling base exactly.

Reference: src/vilt/transforms/square_transform.py:20-30,
src/vilt/transforms/randaugment.py:310-339 (cv2-based op semantics the
host pipeline data/transforms.py already mirrors with PIL ops — this
module pins against the HOST pipeline, the framework's train contract).
"""

from __future__ import annotations

import functools
import math
from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np

from .image import _clip8, _resample_weights

# Op vocabulary — indices are a stable contract between the host sampler
# and the device graph (order = reference square_transform.py:27-28).
OPS = ("Identity", "AutoContrast", "Equalize", "Brightness", "Sharpness",
       "ShearX", "ShearY", "TranslateX", "TranslateY", "Rotate")
_IDENTITY, _AUTOCONTRAST, _EQUALIZE, _BRIGHTNESS, _SHARPNESS = range(5)
_SHEAR_X, _SHEAR_Y, _TRANSLATE_X, _TRANSLATE_Y, _ROTATE = range(5, 10)

_MAX_LEVEL = 10
_TRANSLATE_CONST = 10.0  # absolute pixels (reference randaugment.py:286)


# --------------------------------------------------------------------------
# Host-side parameter sampling (scalar RNG only — no pixel work)
# --------------------------------------------------------------------------

def _rotate_coeffs(deg: float, w: int, h: int):
    """PIL Image.rotate(expand=False) inverse-affine matrix (rotation
    about the image center) — Pillow Image.py rotate()."""
    angle = -math.radians(deg)
    m = [math.cos(angle), math.sin(angle), 0.0,
         -math.sin(angle), math.cos(angle), 0.0]
    cx, cy = w / 2.0, h / 2.0
    m[2] = cx - (m[0] * cx + m[1] * cy)
    m[5] = cy - (m[3] * cx + m[4] * cy)
    return m


def sample_train_params(rng: np.random.RandomState, sizes, out_size: int,
                        n: int = 2, m: int = 7,
                        scale=(0.5, 1.0)) -> Dict[str, np.ndarray]:
    """Sample every random choice of the train pipeline for a batch.

    sizes: (B, 2) native (h, w) rows.  Returns arrays the jitted
    ``augment_train_batch`` consumes: crop boxes (torchvision
    RandomResizedCrop.get_params semantics incl. the 10-try rejection
    loop), flip flags, per-stage op ids / apply coins / enhance factors,
    and per-stage affine coefficients (identity rows for non-warp ops;
    signed magnitudes per reference randaugment.py level_to_args)."""
    from ..data.transforms import random_resized_crop_params

    B = len(sizes)
    S = out_size
    crop = np.zeros((B, 4), np.int32)                  # (y, x, ch, cw)
    for i, (h, w) in enumerate(np.asarray(sizes)):
        # torchvision samples with python's global `random`; use the
        # passed rng for determinism across hosts/workers instead
        x, y, cw, ch = random_resized_crop_params(
            int(w), int(h), scale=scale, rand=rng)
        crop[i] = (y, x, ch, cw)
    flip = rng.random_sample(B) < 0.5

    op_idx = rng.randint(0, len(OPS), (B, n)).astype(np.int32)
    op_apply = rng.random_sample((B, n)) <= 0.5
    enh = np.float32((m / _MAX_LEVEL) * 1.8 + 0.1)
    factor = np.full((B, n), enh, np.float32)

    affine = np.zeros((B, n, 6), np.float32)
    affine[..., 0] = 1.0
    affine[..., 4] = 1.0
    sign = np.where(rng.random_sample((B, n)) < 0.5, -1.0, 1.0)
    shear_v = (m / _MAX_LEVEL) * 0.3 * sign
    trans_v = (m / _MAX_LEVEL) * _TRANSLATE_CONST * sign
    rot_v = (m / _MAX_LEVEL) * 30.0 * sign
    for i in range(B):
        for s in range(n):
            op = op_idx[i, s]
            if op == _SHEAR_X:
                affine[i, s, 1] = shear_v[i, s]
            elif op == _SHEAR_Y:
                affine[i, s, 3] = shear_v[i, s]
            elif op == _TRANSLATE_X:
                affine[i, s, 2] = trans_v[i, s]
            elif op == _TRANSLATE_Y:
                affine[i, s, 5] = trans_v[i, s]
            elif op == _ROTATE:
                affine[i, s] = _rotate_coeffs(rot_v[i, s], S, S)
    return {
        "crop": crop,
        "flip": flip,
        "op_idx": op_idx,
        "op_apply": op_apply,
        "factor": factor,
        "affine": affine,
    }


# --------------------------------------------------------------------------
# Device ops — each takes/returns an (S, S, 3) f32 image holding exact
# integer values in [0, 255] (the in-graph stand-in for PIL's uint8)
# --------------------------------------------------------------------------

def _histogram_256(ch_i32: jax.Array) -> jax.Array:
    """(H*W,) int32 values -> (256,) int32 counts.

    One-hot compare + reduce, NOT ``.at[].add``: TPU serializes
    scatter-adds (measured ~55 ms/batch inside the train augment,
    tools/augment_attrib_probe.py) while XLA fuses the compare into the
    reduction loop — no (N, 256) array is ever materialized."""
    return jnp.sum(
        (ch_i32[:, None] == jnp.arange(256, dtype=jnp.int32)[None, :])
        .astype(jnp.int32), axis=0)


def _autocontrast_lut(img: jax.Array) -> jax.Array:
    """(3, 256) int32 LUT — PIL ImageOps.autocontrast(cutoff=0):
    clip((ix - lo) * 255 // (hi - lo)) with lo/hi the channel min/max
    (exact-rational form of PIL's double LUT; see module docstring)."""
    lo = jnp.min(img, axis=(0, 1)).astype(jnp.int32)   # (3,)
    hi = jnp.max(img, axis=(0, 1)).astype(jnp.int32)
    ix = jnp.arange(256, dtype=jnp.int32)[None, :]     # (1, 256)
    span = (hi - lo)[:, None]
    scaled = jnp.clip((ix - lo[:, None]) * 255
                      // jnp.maximum(span, 1), 0, 255)
    return jnp.where(span <= 0, ix, scaled)


def _equalize_lut(img: jax.Array) -> jax.Array:
    """(3, 256) int32 LUT — PIL ImageOps.equalize, byte-exact:
    step = (n - count(last nonzero bin)) // 255;
    lut[i] = (step//2 + cumsum_excl(h)[i]) // step  (identity if step==0
    or fewer than two nonzero bins)."""
    ix = jnp.arange(256, dtype=jnp.int32)

    def one(ch):
        h = _histogram_256(ch.astype(jnp.int32).ravel())
        nonzero = h > 0
        n_nonzero = jnp.sum(nonzero.astype(jnp.int32))
        # count of the LAST nonzero bin
        last_idx = 255 - jnp.argmax(nonzero[::-1].astype(jnp.int32))
        last_cnt = h[last_idx]
        step = (jnp.sum(h) - last_cnt) // 255
        csum = jnp.cumsum(h) - h                       # exclusive
        lut = jnp.clip((step // 2 + csum) // jnp.maximum(step, 1), 0, 255)
        return jnp.where((step == 0) | (n_nonzero <= 1), ix, lut)

    return jax.vmap(one, in_axes=2)(img)               # (3, 256)


def _brightness_lut(factor: jax.Array) -> jax.Array:
    """(3, 256) int32 LUT — PIL ImageEnhance.Brightness == blend(black,
    img, f): C-float truncation (Blend.c), byte-exact."""
    ix = jnp.arange(256, dtype=jnp.float32)
    lut = jnp.clip(jnp.trunc(ix * factor.astype(jnp.float32)),
                   0, 255).astype(jnp.int32)
    return jnp.broadcast_to(lut[None, :], (3, 256))


def _apply_lut(img: jax.Array, lut: jax.Array) -> jax.Array:
    """Apply a per-channel (3, 256) LUT through the image — as a one-hot
    matmul so the lookup rides the MXU, not TPU's serialized gather unit
    (the take_along_axis form measured ~142 ms/batch — the single
    largest augment cost, tools/augment_attrib_probe.py).

    Exactness: the one-hot rows are exactly {0, 1} in bf16, LUT entries
    are integers <= 255 (all exactly representable in bf16), and each
    output accumulates exactly one nonzero product in f32 — so the
    matmul reproduces the gather byte-for-byte (pinned by
    tests/test_augment.py)."""
    idx = img.astype(jnp.int32)                        # (H, W, 3)
    onehot = (idx[..., None]
              == jnp.arange(256, dtype=jnp.int32)).astype(jnp.bfloat16)
    return jnp.einsum("hwck,ck->hwc", onehot, lut.astype(jnp.bfloat16),
                      preferred_element_type=jnp.float32)


def _sharpness(img: jax.Array, factor: jax.Array) -> jax.Array:
    """PIL ImageEnhance.Sharpness, byte-exact: SMOOTH 3x3 (center 5,
    /13, rounded half-up) on the interior with borders copied, then the
    C-float truncating blend."""
    H, W, _ = img.shape
    x = img.astype(jnp.float32)
    k = jnp.asarray([1.0, 1.0, 1.0, 1.0, 5.0, 1.0, 1.0, 1.0, 1.0],
                    jnp.float32) / 13.0
    acc = jnp.zeros_like(x)
    i = 0
    for dy in (-1, 0, 1):
        for dx in (-1, 0, 1):
            acc = acc + k[i] * jnp.roll(x, (-dy, -dx), axis=(0, 1))
            i += 1
    deg = jnp.clip(jnp.trunc(acc + 0.5), 0.0, 255.0)
    ry, rx = jnp.arange(H), jnp.arange(W)
    interior = ((ry[:, None] > 0) & (ry[:, None] < H - 1)
                & (rx[None, :] > 0) & (rx[None, :] < W - 1))[..., None]
    deg = jnp.where(interior, deg, x)
    out = jnp.trunc(deg + factor.astype(jnp.float32) * (x - deg))
    return jnp.clip(out, 0.0, 255.0)


def _affine_bilinear(img: jax.Array, coeffs: jax.Array,
                     fill: float = 128.0) -> jax.Array:
    """PIL Image.transform(AFFINE, BILINEAR, fillcolor=128), f32:
    source coords at output-pixel centers, fill outside [0, W)x[0, H)
    of the UNSHIFTED coordinate, 2x2 taps clamped, truncated result."""
    H, W, _ = img.shape
    a, b, c, d, e, f = [coeffs[i] for i in range(6)]
    ys, xs = jnp.mgrid[0:H, 0:W]
    xs = xs.astype(jnp.float32) + 0.5
    ys = ys.astype(jnp.float32) + 0.5
    xs0 = a * xs + b * ys + c
    ys0 = d * xs + e * ys + f
    inside = (xs0 >= 0) & (xs0 < W) & (ys0 >= 0) & (ys0 < H)
    xin = xs0 - 0.5
    yin = ys0 - 0.5
    x0 = jnp.floor(xin)
    y0 = jnp.floor(yin)
    fx = (xin - x0)[..., None]
    fy = (yin - y0)[..., None]
    x0i = jnp.clip(x0.astype(jnp.int32), 0, W - 1)
    x1i = jnp.clip(x0.astype(jnp.int32) + 1, 0, W - 1)
    y0i = jnp.clip(y0.astype(jnp.int32), 0, H - 1)
    y1i = jnp.clip(y0.astype(jnp.int32) + 1, 0, H - 1)
    # Gather form chosen by measurement (tools/warp_variants_probe.py,
    # all variants bit-exact): f32 3-vector advanced-index taps, 77.7
    # ms/batch — int32 channel-packing LOSES (126.9), global-flat take
    # ties within tunnel noise (73.7), windowed lax.gather loses (93.3).
    p = img.astype(jnp.float32)
    v = (p[y0i, x0i] * (1 - fx) * (1 - fy) + p[y0i, x1i] * fx * (1 - fy)
         + p[y1i, x0i] * (1 - fx) * fy + p[y1i, x1i] * fx * fy)
    v = jnp.clip(jnp.trunc(v), 0.0, 255.0)
    return jnp.where(inside[..., None], v, jnp.float32(fill))


def _randaug_stage(img: jax.Array, op: jax.Array, apply: jax.Array,
                   coeffs: jax.Array, factor: jax.Array) -> jax.Array:
    """One RandAugment stage, branchless: LUT candidate (identity /
    autocontrast / equalize / brightness share one gather), sharpness
    candidate, affine candidate (identity coeffs reproduce the input
    bit-exactly), then select by op id and the p=0.5 coin."""
    ix = jnp.arange(256, dtype=jnp.int32)
    lut = jnp.broadcast_to(ix[None, :], (3, 256))
    lut = jnp.where(op == _AUTOCONTRAST, _autocontrast_lut(img), lut)
    lut = jnp.where(op == _EQUALIZE, _equalize_lut(img), lut)
    lut = jnp.where(op == _BRIGHTNESS, _brightness_lut(factor), lut)
    y_lut = _apply_lut(img, lut)

    y_sharp = _sharpness(img, factor)
    y_warp = _affine_bilinear(img, coeffs)

    out = jnp.where(op == _SHARPNESS, y_sharp,
                    jnp.where(op >= _SHEAR_X, y_warp, y_lut))
    return jnp.where(apply, out, img)


def _resized_crop_u8f(img: jax.Array, box: jax.Array,
                      out_size: int) -> jax.Array:
    """PIL crop+bicubic-resize on one (Hc, Wc, 3) canvas image; box =
    (y, x, h, w).  Same two-pass structure + uint8 intermediate as
    ops/image.pil_resize_bicubic_u8, crop folded into the weights."""
    Hc, Wc, _ = img.shape
    hp = jax.lax.Precision.HIGHEST
    y, x, ch, cw = box[0], box[1], box[2], box[3]
    wx = _resample_weights(cw, Wc, out_size, offset=x)   # (S, Wc)
    wy = _resample_weights(ch, Hc, out_size, offset=y)   # (S, Hc)
    xf = img.astype(jnp.float32)
    tmp = jnp.einsum("hwc,ow->hoc", xf, wx, precision=hp)
    tmp = _clip8(tmp)
    out = jnp.einsum("hoc,ph->poc", tmp, wy, precision=hp)
    return _clip8(out)                                   # f32 in [0,255]


# --------------------------------------------------------------------------
# Batch entry points
# --------------------------------------------------------------------------

@functools.partial(jax.jit, static_argnames=("out_size",))
def augment_train_batch(canvas: jax.Array, params: Dict[str, jax.Array],
                        out_size: int) -> jax.Array:
    """The full train image path in one graph: RandomResizedCrop (bicubic)
    → HFlip → n RandAugment stages → inception normalize → NCHW f32.

    canvas: (B, Hc, Wc, 3) uint8 native-size images on a zero-padded
    canvas; params: arrays from ``sample_train_params``.  Returns
    (B, 3, S, S) f32."""
    n_stages = params["op_idx"].shape[1]

    def one(img, crop, flip, op_idx, op_apply, affine, factor):
        x = _resized_crop_u8f(img, crop, out_size)       # (S, S, 3)
        x = jnp.where(flip, x[:, ::-1, :], x)
        for s in range(n_stages):
            x = _randaug_stage(x, op_idx[s], op_apply[s], affine[s],
                               factor[s])
        return x

    x = jax.vmap(one)(canvas, params["crop"], params["flip"],
                      params["op_idx"], params["op_apply"],
                      params["affine"], params["factor"])
    x = x / 255.0
    x = (x - 0.5) / 0.5
    return jnp.transpose(x, (0, 3, 1, 2))
