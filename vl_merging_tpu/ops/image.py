"""In-graph image preprocessing (XLA): PIL-parity bicubic square resize
and inception normalization.

North-star item (BASELINE.json / SURVEY §7.5): "the image path (square
resize, RandAugment, patchify, normalize) compiles into the same XLA
graph".  This module owns the resize: decoded NATIVE-size uint8 images
ride to the device on a padded canvas (roughly 2x less link traffic than
pre-resized 384^2 pixels) and the PIL algorithm runs as two dense matrix
contractions whose weights are computed IN-GRAPH from the per-image
(h, w) — one compiled graph covers every native size up to the canvas.

Algorithm parity (reference square_transform.py:10-17 → PIL
Image.resize(..., BICUBIC)): separable convolution resampling with the
a=-0.5 cubic kernel, support scaled by the downscale ratio (antialias),
per-output-pixel integer window [int(center-support+0.5),
int(center+support+0.5)), weights normalized over the window, and a
round+clip to uint8 BETWEEN the horizontal and vertical passes — the
same algorithm as the native C++ decoder (runtime/decode.cc:70-160),
which is byte-equal to PIL (tests/test_runtime.py).  The only deviation
is f32 (vs PIL's double) in the weight evaluation and accumulation:
scales that put kernel values exactly on the 2^22-quantization tie
(e.g. 320→384 = 5/6) resolve some ties the other way, so isolated
pixels differ by 1-2/255 — bounded by tests/test_jax_image.py (≥99.7%
bytes exact per image, max |Δ| ≤ 2, mean |Δ| < 0.005) and invisible
under the bf16 towers (bf16 alone moves every feature more: STATUS
"Full-size parity", max |Δ| 1.3e-3).  Anyone needing byte-exact PIL
output keeps the host paths (PIL, runtime/decode.cc).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


def _cubic_filter(x: jax.Array) -> jax.Array:
    """PIL bicubic kernel (a = -0.5), support 2 (decode.cc:70-77)."""
    a = -0.5
    x = jnp.abs(x)
    v1 = ((a + 2.0) * x - (a + 3.0)) * x * x + 1.0
    v2 = (((x - 5.0) * x + 8.0) * x - 4.0) * a
    return jnp.where(x < 1.0, v1, jnp.where(x < 2.0, v2, 0.0))


def _resample_weights(in_size: jax.Array, in_max: int, out_size: int,
                      offset=None):
    """(out_size, in_max) dense PIL resample matrix for a DYNAMIC input
    length ``in_size`` on a canvas of static width ``in_max``
    (decode.cc:85-112: per-output-pixel window + normalized kernel).
    ``offset`` (dynamic int, default 0) resamples the segment
    [offset, offset+in_size) of the canvas — crop-then-resize
    (torchvision F.resized_crop) as one weight matrix.

    PIL computes ``center = (xx+0.5)·in/out`` in double; a straight f32
    version loses ~ulp(center) ≈ 1.5e-5, which amplifies to ~100 units of
    the 2^22-quantized weights (measured: 0.8% of bytes off).  Every
    quantity here is instead an exact-int32 numerator over a small
    denominator, evaluated with ONE f32 division (error ≤ 0.5 ulp of the
    O(1)-magnitude result):

      arg  = (x - center + 0.5)/filterscale
           = [(2x+1)·out − (2xx+1)·in] / (2·max(in,out))
      center ∓ support + 0.5
           = [(2xx+1)·in ∓ 4·max(in,out) + out] / (2·out)

    with filterscale = max(in/out, 1), support = 2·filterscale.  Window
    bounds are trunc-safe: an exact-ratio value is either an exactly
    representable integer or ≥ 1/(2·out) away from one."""
    in_i = in_size.astype(jnp.int32)
    out_i = jnp.int32(out_size)
    mx = jnp.maximum(in_i, out_i)
    off = jnp.int32(0) if offset is None else offset.astype(jnp.int32)

    xx = jnp.arange(out_size, dtype=jnp.int32)            # output pixels
    x = jnp.arange(in_max, dtype=jnp.int32)               # canvas pixels

    # crop-local input coordinate x_c = x - off
    num = (2 * (x[None, :] - off) + 1) * out_i \
        - (2 * xx[:, None] + 1) * in_i
    arg = num.astype(jnp.float32) / (2 * mx).astype(jnp.float32)
    w = _cubic_filter(arg)                                # (O, in_max)

    lo_num = (2 * xx + 1) * in_i - 4 * mx + out_i
    hi_num = (2 * xx + 1) * in_i + 4 * mx + out_i
    den = (2 * out_i).astype(jnp.float32)
    # C-cast truncation like PIL: int(center ∓ support + 0.5); bounds are
    # crop-local, shifted onto the canvas by off
    xmin = off + jnp.maximum(
        0, jnp.trunc(lo_num.astype(jnp.float32) / den).astype(jnp.int32))
    xmax = off + jnp.minimum(
        in_size, jnp.trunc(hi_num.astype(jnp.float32) / den)
        .astype(jnp.int32))

    mask = (x[None, :] >= xmin[:, None]) & (x[None, :] < xmax[:, None])
    w = jnp.where(mask, w, 0.0)
    wsum = jnp.sum(w, axis=1, keepdims=True)
    w = w / jnp.where(wsum == 0.0, 1.0, wsum)
    # PIL's 8bpc path quantizes each normalized weight to an int32 at
    # PRECISION_BITS = 22, rounding half AWAY FROM ZERO (Pillow
    # Resample.c normalize_coeffs_8bpc: (int)(±0.5 + k·2^22)); replicate
    # it — the quantized values are exactly representable in f32, so only
    # accumulation rounding (f32 here vs exact ints in PIL) remains
    mul = jnp.float32(1 << 22)
    return jnp.trunc(w * mul + jnp.sign(w) * 0.5) / mul


def _clip8(acc: jax.Array) -> jax.Array:
    """PIL rounding: clip(floor(v + 0.5), 0, 255) (decode.cc:114-116)."""
    return jnp.clip(jnp.floor(acc + 0.5), 0.0, 255.0)


@functools.partial(jax.jit, static_argnames=("out_size",))
def pil_resize_bicubic_u8(canvas: jax.Array, sizes: jax.Array,
                          out_size: int) -> jax.Array:
    """PIL-parity bicubic square resize, fully in-graph.

    canvas: (B, Hc, Wc, 3) uint8 — native-size images top-left-anchored on
    a zero-padded canvas; sizes: (B, 2) int32 rows of (h, w).
    Returns (B, out_size, out_size, 3) uint8.

    Both passes are dense contractions (the per-image weight matrices are
    (S, Hc)/(S, Wc) — MXU work, ~0.3 ms for a B32 640-canvas batch), with
    the uint8 round+clip between passes exactly where PIL/decode.cc
    quantize their intermediate."""
    B, Hc, Wc, _ = canvas.shape

    # HIGHEST precision: TPU f32 dots default to one-pass bf16 — rounding
    # the 2^-22-quantized weights to bf16 costs ~20% of bytes (measured);
    # the resize is a trivial FLOP count, so pay the f32-precision passes
    hp = jax.lax.Precision.HIGHEST

    def one(img, hw):
        h, w = hw[0], hw[1]
        wx = _resample_weights(w, Wc, out_size)           # (S, Wc)
        wy = _resample_weights(h, Hc, out_size)           # (S, Hc)
        x = img.astype(jnp.float32)                       # (Hc, Wc, 3)
        # horizontal pass + PIL's intermediate uint8 quantization
        tmp = jnp.einsum("hwc,ow->hoc", x, wx, precision=hp)
        tmp = _clip8(tmp)                                 # (Hc, S, 3)
        out = jnp.einsum("hoc,ph->poc", tmp, wy, precision=hp)
        return _clip8(out).astype(jnp.uint8)              # (S, S, 3)

    return jax.vmap(one)(canvas, sizes)


@functools.partial(jax.jit, static_argnames=("out_size",))
def resize_normalize_nchw(canvas: jax.Array, sizes: jax.Array,
                          out_size: int) -> jax.Array:
    """Square resize + inception normalize + NCHW — the whole eval image
    path (square_transform.py:10-17) in one graph, uint8 in, f32 out."""
    u8 = pil_resize_bicubic_u8(canvas, sizes, out_size)
    x = u8.astype(jnp.float32) / 255.0
    x = (x - 0.5) / 0.5
    return jnp.transpose(x, (0, 3, 1, 2))


def pack_canvas(images, canvas_hw=None, round_to: int = 32):
    """Host-side helper: stack variable-size HWC uint8 arrays onto one
    zero-padded canvas.  Returns (canvas (B, Hc, Wc, 3) uint8,
    sizes (B, 2) int32).  ``round_to`` buckets the canvas dims so jit
    traces are shared across batches of similar native sizes."""
    import numpy as np

    hs = [im.shape[0] for im in images]
    ws = [im.shape[1] for im in images]
    if canvas_hw is None:
        rt = round_to
        canvas_hw = (-(-max(hs) // rt) * rt, -(-max(ws) // rt) * rt)
    Hc, Wc = canvas_hw
    canvas = np.zeros((len(images), Hc, Wc, 3), np.uint8)
    for i, im in enumerate(images):
        canvas[i, :im.shape[0], :im.shape[1]] = im
    sizes = np.stack([np.asarray(hs, np.int32),
                      np.asarray(ws, np.int32)], axis=1)
    return canvas, sizes
