"""Relative-position index buffers and per-layer bias lookup.

One bias table shared across all layers: shape
``(num_relative_distance + text_num_relative_distance + 2, heads * layers)``;
image tokens use BEiT 2-D window buckets, text tokens use clipped 1-D
distances offset past the image range, and the two cross-modal directions
get dedicated buckets (reference: src/vilt/modules/vilt_module.py:123-214).

Index buffers are static (pure functions of the spec), computed in NumPy at
trace time and baked into the compiled program as constants.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from .spec import ModelSpec


@functools.lru_cache(maxsize=None)
def image_relative_position_index(window: int) -> np.ndarray:
    """BEiT window index, (window²+1, window²+1); vilt_module.py:143-164."""
    num_relative_distance = (2 * window - 1) * (2 * window - 1) + 3
    coords = np.stack(np.meshgrid(np.arange(window), np.arange(window),
                                  indexing="ij"))           # 2, Wh, Ww
    coords_flat = coords.reshape(2, -1)                      # 2, Wh*Ww
    rel = coords_flat[:, :, None] - coords_flat[:, None, :]  # 2, N, N
    rel = rel.transpose(1, 2, 0).astype(np.int64)            # N, N, 2
    rel[:, :, 0] += window - 1
    rel[:, :, 1] += window - 1
    rel[:, :, 0] *= 2 * window - 1
    index = np.zeros((window * window + 1,) * 2, dtype=np.int64)
    index[1:, 1:] = rel.sum(-1)
    index[0, 0:] = num_relative_distance - 3   # cls → token
    index[0:, 0] = num_relative_distance - 2   # token → cls
    index[0, 0] = num_relative_distance - 1    # cls → cls
    return index


@functools.lru_cache(maxsize=None)
def text_relative_position_index(
    max_text_len: int, max_text_len_of_initckpt: int, window: int
) -> np.ndarray:
    """1-D clipped text distances offset past the image buckets;
    vilt_module.py:166-178."""
    num_relative_distance = (2 * window - 1) * (2 * window - 1) + 3
    text_num_relative_distance = 2 * max_text_len_of_initckpt
    all_num = num_relative_distance + text_num_relative_distance + 2

    ids = np.arange(max_text_len - 1)
    rel = ids[None, :] - ids[:, None]
    min_distance = 2 - max_text_len_of_initckpt
    rel = rel - min_distance + (num_relative_distance + 2)
    index = np.zeros((max_text_len,) * 2, dtype=np.int64)
    index[1:, 1:] = rel
    index[0, 0:] = all_num - 3
    index[0:, 0] = all_num - 2
    index[0, 0] = all_num - 1
    return index


@functools.lru_cache(maxsize=None)
def text_image_relative_position_index(
    max_text_len: int, max_text_len_of_initckpt: int, window: int,
    vl_text_len: Optional[int] = None,
) -> np.ndarray:
    """Fused [text; image] index; cross-modal entries use 2 dedicated buckets
    (vilt_module.py:180-208).  ``vl_text_len`` truncates the text rows/cols
    for mixed single/multi-modal training (max_vl_text_len)."""
    num_relative_distance = (2 * window - 1) * (2 * window - 1) + 3
    max_imag_len = window * window + 1
    t_index = text_relative_position_index(
        max_text_len, max_text_len_of_initckpt, window)
    i_index = image_relative_position_index(window)

    t = max_text_len if vl_text_len is None else min(vl_text_len, max_text_len)
    t2i = np.full((t, max_imag_len), num_relative_distance, dtype=np.int64)
    i2t = np.full((max_imag_len, t), num_relative_distance + 1, dtype=np.int64)

    top = np.concatenate([t_index[:t, :t], t2i], axis=1)
    bottom = np.concatenate([i2t, i_index], axis=1)
    return np.concatenate([top, bottom], axis=0)


def fused_index(spec: ModelSpec) -> np.ndarray:
    """Index used by `infer` (type_id=2); picks the vl-truncated variant when
    max_vl_text_len is set (vilt_module.py:1125)."""
    return text_image_relative_position_index(
        spec.max_text_len, spec.max_text_len_of_initckpt, spec.window,
        spec.max_vl_text_len)


@functools.lru_cache(maxsize=None)
def fused_index_padded(
    max_text_len: int, max_text_len_of_initckpt: int, window: int,
    text_len: int, pad_t: int, pad_i: int,
) -> np.ndarray:
    """Fused index with PER-SEGMENT padding: text rows occupy [0, text_len)
    of a pad_t slot, image rows occupy [pad_t, pad_t + image_len) of a
    pad_i slot.  Pad rows/cols use bucket 0 — they are attention-masked,
    so the value never matters.  This keeps both modality halves
    sublane-aligned for the packed Pallas kernels when split-per-modality
    blocks (separate_plain / self_attn_for_single_mode) slice the sequence
    at the padded text length.  ``text_len`` is the runtime text length
    (already vl-truncated by the caller when max_vl_text_len applies)."""
    num_relative_distance = (2 * window - 1) * (2 * window - 1) + 3
    image_len = window * window + 1
    t = text_len
    assert pad_t >= t and pad_i >= image_len
    t_idx = text_relative_position_index(
        max_text_len, max_text_len_of_initckpt, window)[:t, :t]
    i_idx = image_relative_position_index(window)

    n = pad_t + pad_i
    out = np.zeros((n, n), dtype=np.int64)
    out[:t, :t] = t_idx
    out[:t, pad_t:pad_t + image_len] = num_relative_distance          # t→i
    out[pad_t:pad_t + image_len, :t] = num_relative_distance + 1      # i→t
    out[pad_t:pad_t + image_len, pad_t:pad_t + image_len] = i_idx
    return out


def text_index(spec: ModelSpec, true_length: Optional[int] = None) -> np.ndarray:
    idx = text_relative_position_index(
        spec.max_text_len, spec.max_text_len_of_initckpt, spec.window)
    if true_length is not None:
        idx = idx[:true_length, :true_length]
    return idx


def image_index(spec: ModelSpec) -> np.ndarray:
    return image_relative_position_index(spec.window)


@functools.lru_cache(maxsize=None)
def video_relative_position_index(window: int, num_frames: int) -> np.ndarray:
    """Image index tiled across frames (vilt_module.py:222):
    ``relative_position_index.repeat(F, F)`` (torch repeat = tile)."""
    return np.tile(image_relative_position_index(window),
                   (num_frames, num_frames))


@functools.lru_cache(maxsize=None)
def text_video_relative_position_index(
    max_text_len: int, max_text_len_of_initckpt: int, window: int,
    num_frames: int, vl_text_len: Optional[int] = None,
) -> np.ndarray:
    """Fused [text; F frames] index (vilt_module.py:219-229, 251-261).

    Cross-modal entries use the same two dedicated buckets as the
    single-frame fused index; the image block is the frame-tiled video
    index."""
    num_relative_distance = (2 * window - 1) * (2 * window - 1) + 3
    vid_len = (window * window + 1) * num_frames
    t_index = text_relative_position_index(
        max_text_len, max_text_len_of_initckpt, window)
    v_index = video_relative_position_index(window, num_frames)

    t = max_text_len if vl_text_len is None else min(vl_text_len, max_text_len)
    t2i = np.full((t, vid_len), num_relative_distance, dtype=np.int64)
    i2t = np.full((vid_len, t), num_relative_distance + 1, dtype=np.int64)

    top = np.concatenate([t_index[:t, :t], t2i], axis=1)
    bottom = np.concatenate([i2t, v_index], axis=1)
    return np.concatenate([top, bottom], axis=0)


@functools.lru_cache(maxsize=None)
def temporal_relative_position_index(window: int, num_frames: int) -> np.ndarray:
    """Frame-distance buckets tiled over patch positions
    (vilt_module.py:233-240): ids in [0, 2F); torch ``.repeat`` = tile."""
    ids = np.arange(num_frames)
    rel = ids[None, :] - ids[:, None]
    rel = rel - rel.min()
    max_imag_len = window * window + 1
    return np.tile(rel, (max_imag_len, max_imag_len)).astype(np.int64)


@functools.lru_cache(maxsize=None)
def mask_for_combining_temporal(window: int, num_frames: int) -> np.ndarray:
    """Block-diagonal same-frame mask, (1, F·N_img, F·N_img)
    (vilt_module.py:244-248): eye(F) repeat_interleaved by N_img both ways."""
    n = window * window + 1
    return np.kron(np.eye(num_frames), np.ones((n, n)))[None]


def per_layer_bias(
    table: jax.Array, index: np.ndarray, num_layers: int, num_heads: int
) -> jax.Array:
    """Gather the shared table into per-layer (heads, N, N) biases.

    Matches ``F.embedding(index, table).permute(2,0,1)`` then
    ``torch.chunk(num_layers, dim=0)`` (vilt_module.py:1061-1064, 1128):
    the (heads*layers) trailing dim is chunked into layer-major groups.
    Returns (layers, heads, N, N), always float32.
    """
    n = index.shape[0]
    gathered = jnp.take(table.astype(jnp.float32),
                        jnp.asarray(index, jnp.int32), axis=0)  # N, N, H*L
    bias = jnp.transpose(gathered, (2, 0, 1))                    # H*L, N, N
    return bias.reshape(num_layers, num_heads, n, n)
