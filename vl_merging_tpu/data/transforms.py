"""Image transforms: square resize, RandAugment, MIM two-view pipelines.

PIL + NumPy re-implementation of the reference's torchvision pipelines
(reference: src/vilt/transforms/square_transform.py:10-66,
src/vilt/transforms/randaugment.py:310-339).  Outputs are CHW float32
arrays, inception-normalized ((x-0.5)/0.5); the MIM second view is
logit-laplace mapped for the DALL-E dVAE
(reference: src/dall_e/utils.py:46-57).

Registry mirrors `_transforms` (reference src/vilt/transforms/__init__.py).
"""

from __future__ import annotations

import math
import random
from typing import List, Optional, Tuple

import numpy as np
from PIL import Image, ImageEnhance, ImageOps

DVAE_LOGIT_LAPLACE_EPS = 0.1


def to_chw_float(img: Image.Image) -> np.ndarray:
    arr = np.asarray(img, dtype=np.float32) / 255.0
    return arr.transpose(2, 0, 1)


def inception_normalize(chw: np.ndarray) -> np.ndarray:
    return (chw - 0.5) / 0.5


def map_pixels(chw: np.ndarray) -> np.ndarray:
    """Logit-laplace range mapping for the dVAE input."""
    return (1 - 2 * DVAE_LOGIT_LAPLACE_EPS) * chw + DVAE_LOGIT_LAPLACE_EPS


# --------------------------------------------------------------------------
# RandAugment (2 ops, magnitude 7, p=0.5 each) over the reference's 10-op list
# --------------------------------------------------------------------------

_MAX_LEVEL = 10
_TRANSLATE_CONST = 10  # ABSOLUTE pixels (reference randaugment.py:286)


def _enhance_factor(level: int) -> float:
    # brightness/sharpness strength: deterministic (level/10)·1.8 + 0.1
    # (reference enhance_level_to_args, randaugment.py:208-211 — no sign
    # flip; at M=7 this is always 1.36)
    return (level / _MAX_LEVEL) * 1.8 + 0.1


def _shear_arg(level: int) -> float:
    # (reference shear_level_to_args, randaugment.py:214-220)
    return (level / _MAX_LEVEL) * 0.3 * random.choice([-1, 1])


def _translate_arg(level: int, extent: int) -> float:
    # translate_const=10 ABSOLUTE pixels, not a fraction of the image
    # (reference translate_level_to_args + randaugment.py:286)
    del extent
    return (level / _MAX_LEVEL) * float(_TRANSLATE_CONST) * \
        random.choice([-1, 1])


def _rotate_arg(level: int) -> float:
    # (reference rotate_level_to_args, randaugment.py:258-265)
    return (level / _MAX_LEVEL) * 30.0 * random.choice([-1, 1])


def _apply_op(img: Image.Image, name: str, level: int) -> Image.Image:
    if name == "Identity":
        return img
    if name == "AutoContrast":
        return ImageOps.autocontrast(img)
    if name == "Equalize":
        return ImageOps.equalize(img)
    if name == "Brightness":
        return ImageEnhance.Brightness(img).enhance(_enhance_factor(level))
    if name == "Sharpness":
        return ImageEnhance.Sharpness(img).enhance(_enhance_factor(level))
    if name == "ShearX":
        return img.transform(img.size, Image.AFFINE,
                             (1, _shear_arg(level), 0, 0, 1, 0),
                             resample=Image.BILINEAR, fillcolor=(128,) * 3)
    if name == "ShearY":
        return img.transform(img.size, Image.AFFINE,
                             (1, 0, 0, _shear_arg(level), 1, 0),
                             resample=Image.BILINEAR, fillcolor=(128,) * 3)
    if name == "TranslateX":
        return img.transform(img.size, Image.AFFINE,
                             (1, 0, _translate_arg(level, img.size[0]),
                              0, 1, 0),
                             resample=Image.BILINEAR, fillcolor=(128,) * 3)
    if name == "TranslateY":
        return img.transform(img.size, Image.AFFINE,
                             (1, 0, 0, 0, 1,
                              _translate_arg(level, img.size[1])),
                             resample=Image.BILINEAR, fillcolor=(128,) * 3)
    if name == "Rotate":
        return img.rotate(_rotate_arg(level), resample=Image.BILINEAR,
                          fillcolor=(128,) * 3)
    raise ValueError(name)


RANDAUG_OPS = ("Identity", "AutoContrast", "Equalize", "Brightness",
               "Sharpness", "ShearX", "ShearY", "TranslateX", "TranslateY",
               "Rotate")


class RandomAugment:
    """N random ops at magnitude M, each applied with p=0.5
    (reference randaugment.py:310-333)."""

    def __init__(self, n: int = 2, m: int = 7, ops=RANDAUG_OPS):
        self.n, self.m, self.ops = n, m, ops

    def __call__(self, img: Image.Image) -> Image.Image:
        for name in np.random.choice(self.ops, self.n):
            if random.random() <= 0.5:
                img = _apply_op(img, str(name), self.m)
        return img


# --------------------------------------------------------------------------
# Geometric primitives
# --------------------------------------------------------------------------

def random_resized_crop_params(
    w: int, h: int, scale: Tuple[float, float],
    ratio: Tuple[float, float] = (3 / 4, 4 / 3),
) -> Tuple[int, int, int, int]:
    """torchvision RandomResizedCrop.get_params semantics."""
    area = w * h
    log_ratio = (math.log(ratio[0]), math.log(ratio[1]))
    for _ in range(10):
        target_area = area * random.uniform(*scale)
        aspect = math.exp(random.uniform(*log_ratio))
        cw = int(round(math.sqrt(target_area * aspect)))
        ch = int(round(math.sqrt(target_area / aspect)))
        if 0 < cw <= w and 0 < ch <= h:
            x = random.randint(0, w - cw)
            y = random.randint(0, h - ch)
            return x, y, cw, ch
    # fallback: center crop at clamped aspect
    in_ratio = w / h
    if in_ratio < ratio[0]:
        cw, ch = w, int(round(w / ratio[0]))
    elif in_ratio > ratio[1]:
        cw, ch = int(round(h * ratio[1])), h
    else:
        cw, ch = w, h
    return (w - cw) // 2, (h - ch) // 2, cw, ch


# --------------------------------------------------------------------------
# Pipelines
# --------------------------------------------------------------------------

class SquareTransform:
    """Deterministic eval transform: bicubic resize to (S,S) + normalize."""

    def __init__(self, size: int = 224):
        self.size = size

    def __call__(self, img: Image.Image) -> np.ndarray:
        img = img.resize((self.size, self.size), resample=Image.BICUBIC)
        return inception_normalize(to_chw_float(img))

    def transform_bytes(self, jpeg: bytes) -> Optional[np.ndarray]:
        """Fused native JPEG decode+resize+normalize (runtime/decode.cc);
        None when the buffer isn't JPEG or the native lib is unavailable."""
        if not (len(jpeg) > 3 and jpeg[:3] == b"\xff\xd8\xff"):
            return None
        from .. import runtime

        if not runtime.available():
            return None
        return runtime.decode_resize_batch([jpeg], self.size,
                                           num_threads=1)[0]


class SquareTransformRandaug:
    """Train transform: RandomResizedCrop(0.5-1.0) + HFlip + RandAugment(2,7)."""

    def __init__(self, size: int = 224):
        self.size = size
        self.randaug = RandomAugment(2, 7)

    def __call__(self, img: Image.Image) -> np.ndarray:
        x, y, cw, ch = random_resized_crop_params(*img.size, scale=(0.5, 1.0))
        img = img.crop((x, y, x + cw, y + ch)).resize(
            (self.size, self.size), resample=Image.BICUBIC)
        if random.random() < 0.5:
            img = img.transpose(Image.FLIP_LEFT_RIGHT)
        img = self.randaug(img)
        return inception_normalize(to_chw_float(img))


class _TwoPicBase:
    """Shared crop → (model view, dVAE view) logic
    (reference random_crop_two_pics.py via square_transform.py:45-66)."""

    def __init__(self, size: int, second_size: int,
                 scale: Tuple[float, float]):
        self.size, self.second_size, self.scale = size, second_size, scale

    def crop_two(self, img: Image.Image):
        x, y, cw, ch = random_resized_crop_params(*img.size, scale=self.scale)
        box = (x, y, x + cw, y + ch)
        v1 = img.crop(box).resize((self.size, self.size),
                                  resample=Image.BICUBIC)
        v2 = img.crop(box).resize((self.second_size, self.second_size),
                                  resample=Image.LANCZOS)
        return v1, v2

    def finish(self, v1, v2):
        return (inception_normalize(to_chw_float(v1)),
                map_pixels(to_chw_float(v2)))


class SquareTransformMim(_TwoPicBase):
    def __init__(self, size=224, second_size=112):
        super().__init__(size, second_size, scale=(1.0, 1.0))

    def __call__(self, img: Image.Image):
        return self.finish(*self.crop_two(img))


class SquareTransformRandaugMim(_TwoPicBase):
    def __init__(self, size=224, second_size=112):
        super().__init__(size, second_size, scale=(0.5, 1.0))
        self.randaug = RandomAugment(2, 7)

    def __call__(self, img: Image.Image):
        if random.random() < 0.5:
            img = img.transpose(Image.FLIP_LEFT_RIGHT)
        img = self.randaug(img)
        return self.finish(*self.crop_two(img))


_TRANSFORMS = {
    "square_transform": SquareTransform,
    "square_transform_randaug": SquareTransformRandaug,
}
_MIM_TRANSFORMS = {
    "square_transform_mim": SquareTransformMim,
    "square_transform_randaug_mim": SquareTransformRandaugMim,
}


def keys_to_transforms(keys: List[str], size: int):
    return [_TRANSFORMS[k](size=size) for k in keys]


def keys_to_transforms_for_mim(keys: List[str], size: int, second_size: int):
    return [_MIM_TRANSFORMS[k](size=size, second_size=second_size)
            for k in keys]
