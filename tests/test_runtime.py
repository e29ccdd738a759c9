"""Native decode pipeline: parity vs the PIL path + throughput sanity."""

import io
import time

import numpy as np
import pytest
from PIL import Image

from vl_merging_tpu import runtime
from vl_merging_tpu.data.transforms import SquareTransform


def _jpeg(seed, w=97, h=71, quality=90):
    arr = (np.random.RandomState(seed).rand(h, w, 3) * 255).astype(np.uint8)
    buf = io.BytesIO()
    Image.fromarray(arr).save(buf, format="JPEG", quality=quality)
    return buf.getvalue()


@pytest.mark.skipif(not runtime.available(), reason="no native lib")
def test_native_matches_pil():
    bufs = [_jpeg(i, w=64 + 7 * i, h=80 - 5 * i) for i in range(6)]
    out = runtime.decode_resize_batch(bufs, out_size=48)
    assert out.shape == (6, 3, 48, 48)

    pil = SquareTransform(48)
    for i, b in enumerate(bufs):
        img = Image.open(io.BytesIO(b)).convert("RGB")
        want = pil(img)
        # identical resampling math; differences only from uint8 rounding
        # of the intermediate float accumulation
        diff = np.abs(out[i] - want)
        assert diff.max() <= (2.0 / 255.0) / 0.5 + 1e-6, diff.max()
        assert (diff > 1e-6).mean() < 0.05  # ≥95% of pixels bit-equal


@pytest.mark.skipif(not runtime.available(), reason="no native lib")
def test_native_corrupt_input_zero_filled():
    bufs = [_jpeg(0), b"not a jpeg", _jpeg(1)]
    out = runtime.decode_resize_batch(bufs, out_size=32)
    assert np.all(out[1] == 0)
    assert not np.all(out[0] == 0)


@pytest.mark.skipif(not runtime.available(), reason="no native lib")
def test_native_throughput_sane():
    """On a single-core CI box threads can't help; just require the native
    path to be in PIL's ballpark per core (it scales with cores in prod)."""
    import os

    bufs = [_jpeg(i, w=480, h=360) for i in range(32)]
    runtime.decode_resize_batch(bufs, out_size=224)  # warm
    t0 = time.time()
    runtime.decode_resize_batch(bufs, out_size=224,
                                num_threads=os.cpu_count() or 1)
    t_native = time.time() - t0

    pil = SquareTransform(224)
    t0 = time.time()
    for b in bufs:
        pil(Image.open(io.BytesIO(b)).convert("RGB"))
    t_pil = time.time() - t0
    print(f"native {t_native * 1000:.1f} ms vs PIL {t_pil * 1000:.1f} ms")
    assert t_native < 1.5 * t_pil


def test_native_u8_matches_pil_resize():
    """decode_resize_batch_u8 == PIL decode + bicubic resize, byte-exact."""
    import io

    import numpy as np
    from PIL import Image

    from vl_merging_tpu import runtime

    if not runtime.available():
        import pytest

        pytest.skip("native decode unavailable")
    rng = np.random.RandomState(0)
    jpegs = []
    for _ in range(3):
        arr = (rng.rand(57, 83, 3) * 255).astype(np.uint8)
        buf = io.BytesIO()
        Image.fromarray(arr).save(buf, format="JPEG", quality=90)
        jpegs.append(buf.getvalue())
    got = runtime.decode_resize_batch_u8(jpegs, 64)
    for i, j in enumerate(jpegs):
        img = Image.open(io.BytesIO(j)).convert("RGB")
        want = np.asarray(img.resize((64, 64), Image.BICUBIC), np.uint8)
        np.testing.assert_array_equal(got[i], want)
