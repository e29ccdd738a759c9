"""Bicubic 2-D resize matching torch ``F.interpolate(mode='bicubic')``.

Torch's bicubic (align_corners=False) uses the Keys cubic convolution kernel
with A = -0.75, half-pixel source coordinates, and border clamping.  The
reference uses it to rescale the image block of the shared relative-position
bias table when changing input resolution (reference:
src/vilt/modules/vilt_module.py:797-804, 863-866).

``bicubic_resize`` routes through torch CPU when torch is importable —
checkpoint surgery is offline host work, and bit-identity with the
reference's ``F.interpolate`` matters (surgery output feeds fine-tuning, and
merged-checkpoint parity is judged byte-for-byte).  The NumPy path below is
the dependency-free fallback; it implements the same kernel in float64 and
agrees with torch to f32 rounding (~1e-5), not bit-exactly, because torch
computes its tap weights in float32.
"""

from __future__ import annotations

import numpy as np

_A = -0.75


def _torch_bicubic(arr: np.ndarray, out_hw) -> "np.ndarray | None":
    try:
        import torch
    except ImportError:
        return None
    t = torch.from_numpy(np.ascontiguousarray(arr))
    squeeze = 0
    while t.ndim < 4:           # F.interpolate wants (N, C, H, W)
        t = t.unsqueeze(0)
        squeeze += 1
    out = torch.nn.functional.interpolate(
        t, size=tuple(out_hw), mode="bicubic")
    for _ in range(squeeze):
        out = out.squeeze(0)
    return out.numpy()


def _cubic_weights(t: np.ndarray) -> np.ndarray:
    """Keys cubic convolution weights for the 4 taps around fraction t∈[0,1).

    Returns shape t.shape + (4,) for taps at offsets (-1, 0, 1, 2).
    """
    def w1(x):  # |x| <= 1
        return ((_A + 2) * x - (_A + 3)) * x * x + 1

    def w2(x):  # 1 < |x| < 2
        return (((_A * x) - 5 * _A) * x + 8 * _A) * x - 4 * _A

    t = np.asarray(t, np.float64)
    return np.stack([w2(t + 1.0), w1(t), w1(1.0 - t), w2(2.0 - t)], axis=-1)


def _resize_axis(arr: np.ndarray, out_size: int, axis: int) -> np.ndarray:
    in_size = arr.shape[axis]
    if in_size == out_size:
        return arr
    scale = in_size / out_size
    # half-pixel (align_corners=False) source coordinates
    x = (np.arange(out_size) + 0.5) * scale - 0.5
    x0 = np.floor(x).astype(np.int64)
    t = x - x0
    weights = _cubic_weights(t)                        # (out, 4)
    taps = np.clip(x0[:, None] + np.arange(-1, 3)[None, :], 0, in_size - 1)

    arr_m = np.moveaxis(arr, axis, 0).astype(np.float64)
    gathered = arr_m[taps]                             # (out, 4, ...)
    w = weights.reshape(out_size, 4, *([1] * (arr_m.ndim - 1)))
    out = (gathered * w).sum(axis=1)
    return np.moveaxis(out, 0, axis)


def bicubic_resize(arr: np.ndarray, out_hw) -> np.ndarray:
    """Resize the last two axes of ``arr`` to ``out_hw``.

    Bit-identical to ``torch.nn.functional.interpolate(mode='bicubic')``
    when torch is available (always, in practice); NumPy f64 fallback
    matches within f32 rounding."""
    via_torch = _torch_bicubic(arr, out_hw)
    if via_torch is not None:
        return via_torch
    out_h, out_w = out_hw
    dtype = arr.dtype
    out = _resize_axis(arr, out_h, arr.ndim - 2)
    out = _resize_axis(out, out_w, arr.ndim - 1)
    return out.astype(dtype)
