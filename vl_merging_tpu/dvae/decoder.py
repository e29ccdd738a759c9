"""DALL-E discrete VAE decoder, JAX re-implementation.

Unused at runtime by reference training (the dVAE is only an MIM
tokenizer), but part of the reference inventory — enables decoding
codebook indices back to pixels (reference: src/dall_e/decoder.py).

Architecture (reference decoder.py:42-86): 1×1 input conv vocab→n_init;
4 groups × n DecoderBlocks with nearest ×2 upsampling after groups 1–3;
ReLU + 1×1 conv to 2·output_channels (means + log-scales of the
logit-laplace distribution).  DecoderBlock (decoder.py:13-39):
ReLU→1×1→ReLU→3×3→ReLU→3×3→ReLU→3×3 residual path scaled by
1/(group_count·n_blk_per_group)², 1×1 identity conv when channels change.

Weights load from the released ``decoder.pkl`` with torch param names
(``blocks.group_1.block_1.res_path.conv_1.w`` …); the conv helper reads
kernel size from the weight shape, so the encoder's (3,3,3,1) and the
decoder's (1,3,3,3) residual stacks share the same code.
"""

from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np

from .encoder import GROUP_COUNT, _block, _conv

Params = Dict[str, jax.Array]

DEFAULT_N_BLK = 2
VOCAB_SIZE = 8192

# logit-laplace epsilon (reference dall_e/utils.py:46-57)
LOGIT_LAPLACE_EPS = 0.1


def decoder_output(params: Params, z: jax.Array,
                   n_blk_per_group: int = DEFAULT_N_BLK) -> jax.Array:
    """z: (B, vocab, H, W) one-hot/float codes → (B, 2·C, 8H, 8W) raw
    decoder output (reference decoder.py:88-96)."""
    n_layers = GROUP_COUNT * n_blk_per_group
    post_gain = 1.0 / (n_layers ** 2)

    h = _conv(z, params["blocks.input.w"], params["blocks.input.b"])
    for g in range(1, GROUP_COUNT + 1):
        for i in range(1, n_blk_per_group + 1):
            h = _block(params, f"blocks.group_{g}.block_{i}", h, post_gain)
        if g < GROUP_COUNT:
            # nearest ×2 upsample (reference nn.Upsample(scale_factor=2))
            h = jnp.repeat(jnp.repeat(h, 2, axis=2), 2, axis=3)
    h = jax.nn.relu(h)
    return _conv(h, params["blocks.output.conv.w"],
                 params["blocks.output.conv.b"])


def unmap_pixels(x: jax.Array) -> jax.Array:
    """Invert the logit-laplace range mapping (dall_e/utils.py:54-57)."""
    return jnp.clip((x - LOGIT_LAPLACE_EPS) / (1 - 2 * LOGIT_LAPLACE_EPS),
                    0.0, 1.0)


def decode_indices(params: Params, indices: jax.Array, *,
                   vocab_size: int = VOCAB_SIZE,
                   n_blk_per_group: int = DEFAULT_N_BLK) -> jax.Array:
    """Codebook ids (B, H, W) or (B, H·W) → RGB pixels in [0, 1]
    (B, 3, 8H, 8W) — the reference usage pattern
    (modeling_discrete_vae.py:217-221: one-hot → decoder → sigmoid of the
    first 3 channels → unmap_pixels)."""
    if indices.ndim == 2:
        side = int(round(indices.shape[1] ** 0.5))
        indices = indices.reshape(indices.shape[0], side, side)
    z = jax.nn.one_hot(indices, vocab_size, axis=1, dtype=jnp.float32)
    out = decoder_output(params, z, n_blk_per_group=n_blk_per_group)
    return unmap_pixels(jax.nn.sigmoid(out[:, :3]))


def load_decoder_params(weight_path: str) -> Dict[str, np.ndarray]:
    """Convert OpenAI's pickled torch decoder to a flat numpy dict
    (mirrors encoder.load_encoder_params)."""
    import os

    import torch

    path = weight_path
    if os.path.isdir(path):
        path = os.path.join(path, "decoder.pkl")
    with open(path, "rb") as f:
        module = torch.load(f, map_location="cpu", weights_only=False)
    return {name: p.detach().numpy() for name, p in
            module.named_parameters()}
