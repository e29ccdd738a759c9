"""In-graph PIL-parity bicubic resize (ops/image.py) vs actual PIL.

The north-star eval image path (square resize + normalize) must compile
into the XLA graph (SURVEY §7.5); these tests pin the in-graph resize to
PIL's own bytes.  Contract: the algorithm (kernel, antialias windows,
PIL's int32 weight quantization, intermediate uint8 rounding) is exact;
only f32 (vs PIL's double) weight evaluation/accumulation differs, so
scales whose kernel values land exactly on the 2^22-quantization tie
flip isolated bytes by 1-2 — tolerated as >=99.7% exact per image,
max |Δ| <= 2, mean |Δ| < 0.005 (invisible under bf16 towers).
"""

import io

import numpy as np
import pytest

from PIL import Image

from vl_merging_tpu.ops.image import (
    pack_canvas, pil_resize_bicubic_u8, resize_normalize_nchw)


def _photo_like(rng, h, w):
    """Low-frequency content (upscaled noise) — compresses/filters like a
    real photo and exercises smooth gradients where rounding matters."""
    small = (rng.rand(max(2, h // 8), max(2, w // 8), 3) * 255) \
        .astype(np.uint8)
    return np.asarray(Image.fromarray(small).resize((w, h), Image.BILINEAR))


@pytest.mark.parametrize("h,w,out", [
    (240, 320, 384),   # upscale (the bench jpegs)
    (480, 640, 384),   # downscale (COCO-typical)
    (333, 500, 224),   # non-multiple odd sizes
    (64, 64, 32),      # small
    (500, 120, 160),   # extreme aspect, mixed up/down per axis
])
def test_resize_matches_pil(h, w, out):
    rng = np.random.RandomState(h + w)
    img = _photo_like(rng, h, w)
    want = np.asarray(Image.fromarray(img).resize((out, out), Image.BICUBIC))

    canvas, sizes = pack_canvas([img])
    got = np.asarray(pil_resize_bicubic_u8(canvas, sizes, out))[0]

    delta = np.abs(got.astype(np.int32) - want.astype(np.int32))
    exact = float((delta == 0).mean())
    assert delta.max() <= 2, delta.max()
    assert exact >= 0.997, exact
    assert float(delta.mean()) < 0.005


def test_batched_mixed_sizes_one_trace():
    """One canvas batch with different native sizes resizes each image by
    its own (h, w) — the whole point of in-graph dynamic weights."""
    rng = np.random.RandomState(0)
    imgs = [_photo_like(rng, 240, 320), _photo_like(rng, 180, 240),
            _photo_like(rng, 300, 200)]
    canvas, sizes = pack_canvas(imgs)
    got = np.asarray(pil_resize_bicubic_u8(canvas, sizes, 96))
    for i, img in enumerate(imgs):
        want = np.asarray(
            Image.fromarray(img).resize((96, 96), Image.BICUBIC))
        delta = np.abs(got[i].astype(np.int32) - want.astype(np.int32))
        assert delta.max() <= 1
        assert float((delta == 0).mean()) >= 0.999


def test_resize_normalize_nchw_matches_square_transform():
    """End-to-end eval math: uint8 canvas -> resize -> ((x/255)-.5)/.5 ->
    NCHW equals the host square_transform pipeline within the resize
    tolerance (1/255 * 2)."""
    rng = np.random.RandomState(3)
    img = _photo_like(rng, 480, 640)
    canvas, sizes = pack_canvas([img])
    got = np.asarray(resize_normalize_nchw(canvas, sizes, 128))[0]

    pil = np.asarray(
        Image.fromarray(img).resize((128, 128), Image.BICUBIC),
        np.float32) / 255.0
    want = np.transpose((pil - 0.5) / 0.5, (2, 0, 1))
    assert got.shape == want.shape == (3, 128, 128)
    assert np.abs(got - want).max() <= (1.0 / 255.0) / 0.5 + 1e-6


def test_jpeg_decode_native_feed_equivalence():
    """The e2e bench redesign: jpeg -> native-size decode -> canvas ->
    in-graph resize equals jpeg -> PIL host resize (the prior pipeline),
    byte-for-byte within the resize tolerance."""
    rng = np.random.RandomState(4)
    arr = _photo_like(rng, 240, 320)
    buf = io.BytesIO()
    Image.fromarray(arr).save(buf, format="JPEG", quality=85)
    native = np.asarray(Image.open(io.BytesIO(buf.getvalue())).convert("RGB"))

    host = np.asarray(Image.open(io.BytesIO(buf.getvalue()))
                      .convert("RGB").resize((384, 384), Image.BICUBIC))
    canvas, sizes = pack_canvas([native])
    got = np.asarray(pil_resize_bicubic_u8(canvas, sizes, 384))[0]
    delta = np.abs(got.astype(np.int32) - host.astype(np.int32))
    assert delta.max() <= 2
    assert float((delta == 0).mean()) >= 0.997
