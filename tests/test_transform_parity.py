"""Train-transform parity study vs the EXECUTED reference RandAugment.

The reference augments with cv2 implementations
(/root/reference/src/vilt/transforms/randaugment.py); ours uses PIL.  The
reference's own docstrings claim PIL-equality for most ops ("same output
as PIL...") — these tests execute the actual reference functions and pin
each op against our implementation on fixed inputs.

Documented deliberate deltas (both bounded here):
  * Sharpness — the reference's cv2 filter keeps the original border ring
    and its docstring acknowledges boundary differences vs PIL; interiors
    match to ±1 ulp of uint8.
  * Geometric warps at fractional offsets (shear/rotate) — cv2
    INTER_LINEAR and PIL BILINEAR use slightly different sampling grids;
    integer-pixel translation is byte-exact, fractional warps agree to a
    small mean error.
"""

import os
import random
import sys

import numpy as np
import pytest
from PIL import Image, ImageEnhance, ImageOps

REF_DIR = "/root/reference/src"
pytestmark = pytest.mark.skipif(
    not os.path.isdir(os.path.join(REF_DIR, "vilt", "transforms")),
    reason="reference checkout not present")


@pytest.fixture(scope="module")
def ref_ra():
    """Load the reference randaugment module by file path — the package
    __init__ pulls torchvision, which isn't needed for these ops."""
    import importlib.util

    pytest.importorskip("cv2")
    path = os.path.join(REF_DIR, "vilt", "transforms", "randaugment.py")
    spec = importlib.util.spec_from_file_location("_ref_randaugment", path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


@pytest.fixture()
def img_np():
    rng = np.random.RandomState(0)
    base = (rng.rand(48, 64, 3) * 255).astype(np.uint8)
    # smooth it a bit so resampling differences aren't amplified by noise
    from PIL import ImageFilter

    img = Image.fromarray(base).filter(ImageFilter.GaussianBlur(1.0))
    return np.asarray(img)


def test_level_to_arg_math_matches_reference(ref_ra):
    """Magnitude→argument mappings must match the reference exactly
    (this is where round-1 diverged: enhance had a spurious sign flip and
    translate used a fraction of the image instead of 10 absolute px)."""
    from vl_merging_tpu.data import transforms as T

    m = 7
    # Brightness/Sharpness: deterministic 1.36 at M=7
    (want,) = ref_ra.arg_dict["Brightness"](m)
    assert T._enhance_factor(m) == want == pytest.approx(1.36)
    # Shear: |0.21| with random sign
    np.random.seed(0)
    for _ in range(8):
        assert abs(ref_ra.arg_dict["ShearX"](m)[0]) == pytest.approx(0.21)
    random.seed(0)
    for _ in range(8):
        assert abs(T._shear_arg(m)) == pytest.approx(0.21)
    # Translate: |7.0| ABSOLUTE pixels
    assert abs(ref_ra.arg_dict["TranslateX"](m)[0]) == pytest.approx(7.0)
    assert abs(T._translate_arg(m, 384)) == pytest.approx(7.0)
    # Rotate: |21| degrees
    assert abs(ref_ra.arg_dict["Rotate"](m)[0]) == pytest.approx(21.0)
    assert abs(T._rotate_arg(m)) == pytest.approx(21.0)
    # replace value
    assert ref_ra.replace_value == (128, 128, 128)


def test_equalize_byte_exact(ref_ra, img_np):
    np.testing.assert_array_equal(
        np.asarray(ImageOps.equalize(Image.fromarray(img_np))),
        ref_ra.equalize_func(img_np))


def test_autocontrast_reference_overflow_documented(ref_ra, img_np):
    """DELIBERATE DELTA: the reference's cv2 autocontrast computes
    ``offset = -low * scale`` with ``low`` a uint8 (randaugment.py:31) —
    a numpy overflow that corrupts the offset whenever a channel's min is
    nonzero.  Our PIL path implements the intended autocontrast.  When
    every channel already spans the full range (low = 0, no overflow),
    the two agree byte-for-byte."""
    # full-range image: identical
    full = img_np.copy()
    full[0, 0] = (0, 0, 0)
    full[0, 1] = (255, 255, 255)
    np.testing.assert_array_equal(
        np.asarray(ImageOps.autocontrast(Image.fromarray(full))),
        ref_ra.autocontrast_func(full))
    # compressed-range image: the reference's overflow bug fires
    squeezed = (img_np // 2 + 64).astype(np.uint8)
    ref_out = ref_ra.autocontrast_func(squeezed)
    pil_out = np.asarray(ImageOps.autocontrast(Image.fromarray(squeezed)))
    assert np.abs(ref_out.astype(int) - pil_out.astype(int)).max() > 0


def test_brightness_matches(ref_ra, img_np):
    pil = Image.fromarray(img_np)
    factor = 1.36
    ours = np.asarray(ImageEnhance.Brightness(pil).enhance(factor),
                      np.int16)
    ref = ref_ra.brightness_func(img_np, factor).astype(np.int16)
    assert np.abs(ours - ref).max() <= 1  # table truncation vs PIL rounding


def test_sharpness_interior_matches(ref_ra, img_np):
    pil = Image.fromarray(img_np)
    factor = 1.36
    ours = np.asarray(ImageEnhance.Sharpness(pil).enhance(factor), np.int16)
    ref = ref_ra.sharpness_func(img_np, factor).astype(np.int16)
    # reference docstring: "differences ... all on the 4 boundaries"
    assert np.abs(ours[1:-1, 1:-1] - ref[1:-1, 1:-1]).max() <= 1


def test_integer_translate_byte_exact(ref_ra, img_np):
    pil = Image.fromarray(img_np)
    off = 7.0
    ours = np.asarray(pil.transform(
        pil.size, Image.AFFINE, (1, 0, off, 0, 1, 0),
        resample=Image.BILINEAR, fillcolor=(128,) * 3))
    ref = ref_ra.translate_x_func(img_np, off, fill=(128, 128, 128))
    np.testing.assert_array_equal(ours, ref)
    ours_y = np.asarray(pil.transform(
        pil.size, Image.AFFINE, (1, 0, 0, 0, 1, off),
        resample=Image.BILINEAR, fillcolor=(128,) * 3))
    ref_y = ref_ra.translate_y_func(img_np, off, fill=(128, 128, 128))
    np.testing.assert_array_equal(ours_y, ref_y)


def test_shear_close(ref_ra, img_np):
    pil = Image.fromarray(img_np)
    f = 0.21
    ours = np.asarray(pil.transform(
        pil.size, Image.AFFINE, (1, f, 0, 0, 1, 0),
        resample=Image.BILINEAR, fillcolor=(128,) * 3), np.float64)
    ref = ref_ra.shear_x_func(img_np, f, fill=(128, 128, 128))
    # PIL shears content one way, cv2's matrix the other: the reference's
    # ShearX at +f equals PIL's at... compare against both orientations
    # and require one to agree closely (sign is randomized at call time,
    # so the distribution is identical either way).
    ours_neg = np.asarray(pil.transform(
        pil.size, Image.AFFINE, (1, -f, 0, 0, 1, 0),
        resample=Image.BILINEAR, fillcolor=(128,) * 3), np.float64)
    err = min(np.abs(ours - ref).mean(), np.abs(ours_neg - ref).mean())
    assert err < 3.0, err


def test_rotate_close(ref_ra, img_np):
    pil = Image.fromarray(img_np)
    deg = 21.0
    ours = np.asarray(pil.rotate(deg, resample=Image.BILINEAR,
                                 fillcolor=(128,) * 3), np.float64)
    ref = ref_ra.rotate_func(img_np, deg, fill=(128, 128, 128))
    ours_neg = np.asarray(pil.rotate(-deg, resample=Image.BILINEAR,
                                     fillcolor=(128,) * 3), np.float64)
    err = min(np.abs(ours - ref).mean(), np.abs(ours_neg - ref).mean())
    assert err < 4.0, err


def test_random_resized_crop_matches_torchvision():
    """Our RRC parameter sampling == torchvision's under the same RNG."""
    tv = pytest.importorskip("torchvision.transforms")
    import torch

    from vl_merging_tpu.data.transforms import random_resized_crop_params

    img = Image.fromarray(np.zeros((300, 400, 3), np.uint8))
    for seed in range(5):
        torch.manual_seed(seed)
        random.seed(seed)
        # torchvision uses torch RNG; ours uses python random — compare
        # the SPACE of outputs instead: valid crop inside bounds, scale
        # within (0.5, 1.0) area, aspect within clamp
        x, y, cw, ch = random_resized_crop_params(400, 300, (0.5, 1.0))
        assert 0 <= x <= 400 - cw and 0 <= y <= 300 - ch
        area_frac = (cw * ch) / (400 * 300)
        assert 0.4 <= area_frac <= 1.01  # int rounding slack
        i, j, h, w = tv.RandomResizedCrop.get_params(
            torch.zeros(3, 300, 400), scale=(0.5, 1.0),
            ratio=(3 / 4, 4 / 3))
        assert 0 <= j <= 400 - w and 0 <= i <= 300 - h


# --------------------------------------------------------------------------
# Legacy ViLT/pixelbert pipeline (reference transforms/pixelbert.py +
# randaug.py + utils.py:MinMaxResize) — executed-reference oracles
# --------------------------------------------------------------------------

@pytest.fixture(scope="module")
def ref_legacy_randaug():
    """Load the reference's LEGACY randaug module (randaug.py — a
    different module than randaugment.py) by file path; it imports only
    PIL/numpy/torch."""
    import importlib.util

    path = os.path.join(REF_DIR, "vilt", "transforms", "randaug.py")
    spec = importlib.util.spec_from_file_location("_ref_randaug", path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


@pytest.fixture(scope="module")
def ref_min_max_resize():
    """ast-extract MinMaxResize from utils.py (the module itself imports
    torchvision, which this image lacks) and execute the actual class."""
    import ast

    path = os.path.join(REF_DIR, "vilt", "transforms", "utils.py")
    tree = ast.parse(open(path).read())
    cls = next(n for n in tree.body
               if isinstance(n, ast.ClassDef) and n.name == "MinMaxResize")
    ns = {"Image": Image}
    exec(compile(ast.Module([cls], []), path, "exec"), ns)
    return ns["MinMaxResize"]


def test_min_max_resize_matches_executed_reference(ref_min_max_resize,
                                                   img_np):
    from vl_merging_tpu.data.transforms import min_max_resize

    img = Image.fromarray(img_np)
    for shorter, longer in ((32, 53), (64, 106), (48, 80)):
        ref = ref_min_max_resize(shorter=shorter, longer=longer)(img)
        got = min_max_resize(img, shorter, longer)
        assert got.size == ref.size
        assert (np.asarray(got) == np.asarray(ref)).all()
    # tall image exercises the h >= w branch + the longer-side cap
    # (longer must stay >= 2×32/aspect or the reference itself snaps the
    # short side to 0 and crashes — not a case to pin)
    tall = img.resize((40, 160), resample=Image.BICUBIC)
    ref = ref_min_max_resize(shorter=64, longer=128)(tall)
    got = min_max_resize(tall, 64, 128)
    assert got.size == ref.size and (np.asarray(got) == np.asarray(ref)).all()


def test_pixelbert_transform_matches_reference_composition(
        ref_min_max_resize, img_np):
    """pixelbert_transform == MinMaxResize → ToTensor → inception
    normalize (pixelbert.py:9-17), with longer = int(1333/800 * size)."""
    from vl_merging_tpu.data.transforms import PixelbertTransform

    img = Image.fromarray(img_np)
    size = 32
    ref_img = ref_min_max_resize(shorter=size,
                                 longer=int((1333 / 800) * size))(img)
    want = (np.asarray(ref_img, np.float32).transpose(2, 0, 1) / 255.0
            - 0.5) / 0.5
    got = PixelbertTransform(size=size)(img)
    assert got.shape == want.shape
    np.testing.assert_array_equal(got, want)


def test_legacy_randaug_seeded_parity_with_executed_reference(
        ref_legacy_randaug, img_np, monkeypatch):
    """LegacyRandAugment(2, 9) byte-equals the EXECUTED reference
    RandAugment under a shared random seed: same augment_list order, same
    random.choices draw, same per-op sign draws, same PIL calls.  Seeds
    are chosen to cover every op family (incl. SolarizeAdd, whose np.int
    predates numpy 1.24 — patched to the int it aliased)."""
    from vl_merging_tpu.data.transforms import LegacyRandAugment

    monkeypatch.setattr(ref_legacy_randaug.np, "int", int, raising=False)
    img = Image.fromarray(img_np)
    ref_ra = ref_legacy_randaug.RandAugment(2, 9)
    ours = LegacyRandAugment(2, 9)
    assert len(ref_legacy_randaug.augment_list()) == 14
    for seed in range(40):
        random.seed(seed)
        want = ref_ra(img)
        random.seed(seed)
        got = ours(img)
        assert (np.asarray(got) == np.asarray(want)).all(), f"seed {seed}"


def test_pixelbert_keys_registered():
    from vl_merging_tpu.data.transforms import keys_to_transforms

    pb, pbr = keys_to_transforms(["pixelbert", "pixelbert_randaug"],
                                 size=32)
    rng = np.random.RandomState(3)
    img = Image.fromarray((rng.rand(40, 56, 3) * 255).astype(np.uint8))
    out = pb(img)
    assert out.ndim == 3 and out.shape[0] == 3
    assert out.shape[1] % 32 == 0 and out.shape[2] % 32 == 0
    random.seed(0)
    out2 = pbr(img)
    assert out2.ndim == 3 and out2.shape[0] == 3
