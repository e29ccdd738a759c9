"""DALL-E discrete VAE encoder (MIM tokenizer), JAX re-implementation.

Produces codebook indices for masked-image-modeling targets: the reference
wraps OpenAI's released dVAE and takes argmax over encoder logits
(reference: src/vilt/modules/modeling_discrete_vae.py:206-253,
src/dall_e/encoder.py).  Architecture: 7×7 input conv; 4 groups × n
bottleneck blocks (ReLU→3×3→ReLU→3×3→ReLU→3×3→ReLU→1×1, residual scaled
by 1/(num_layers)²; 1×1 identity conv when channels change); max-pool /2
between groups 1–3; ReLU + 1×1 conv to the 8192-way vocabulary.

Weights load from the released ``encoder.pkl`` (a pickled torch module) —
converted once into a flat {name: array} dict with the torch param names
(``blocks.group_1.block_1.res_path.conv_1.w`` …).
"""

from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np

Params = Dict[str, jax.Array]

GROUP_COUNT = 4
DEFAULT_N_HID = 256
DEFAULT_N_BLK = 2
VOCAB_SIZE = 8192


def _conv(x: jax.Array, w: jax.Array, b: jax.Array) -> jax.Array:
    kw = w.shape[-1]
    pad = (kw - 1) // 2
    y = jax.lax.conv_general_dilated(
        x, w.astype(x.dtype), window_strides=(1, 1),
        padding=[(pad, pad), (pad, pad)],
        dimension_numbers=("NCHW", "OIHW", "NCHW"))
    return y + b.astype(x.dtype)[None, :, None, None]


def _max_pool2(x: jax.Array) -> jax.Array:
    return jax.lax.reduce_window(
        x, -jnp.inf, jax.lax.max, (1, 1, 2, 2), (1, 1, 2, 2), "VALID")


def _block(params: Params, prefix: str, x: jax.Array,
           post_gain: float) -> jax.Array:
    if f"{prefix}.id_path.w" in params:
        idp = _conv(x, params[f"{prefix}.id_path.w"],
                    params[f"{prefix}.id_path.b"])
    else:
        idp = x
    h = x
    for i in (1, 2, 3, 4):
        h = jax.nn.relu(h)
        h = _conv(h, params[f"{prefix}.res_path.conv_{i}.w"],
                  params[f"{prefix}.res_path.conv_{i}.b"])
    return idp + post_gain * h


def encoder_logits(params: Params, x: jax.Array,
                   n_blk_per_group: int = DEFAULT_N_BLK) -> jax.Array:
    """x: (B, 3, S, S) in the logit-laplace range → (B, 8192, S/8, S/8)."""
    n_layers = GROUP_COUNT * n_blk_per_group
    post_gain = 1.0 / (n_layers ** 2)

    h = _conv(x, params["blocks.input.w"], params["blocks.input.b"])
    for g in range(1, GROUP_COUNT + 1):
        for i in range(1, n_blk_per_group + 1):
            h = _block(params, f"blocks.group_{g}.block_{i}", h, post_gain)
        if g < GROUP_COUNT:
            h = _max_pool2(h)
    h = jax.nn.relu(h)
    return _conv(h, params["blocks.output.conv.w"],
                 params["blocks.output.conv.b"])


def get_codebook_indices(params: Params, x: jax.Array,
                         n_blk_per_group: int = DEFAULT_N_BLK) -> jax.Array:
    """argmax over vocabulary logits, flattened to (B, tokens)
    (modeling_discrete_vae.py:223-225)."""
    logits = encoder_logits(params, x, n_blk_per_group=n_blk_per_group)
    idx = jnp.argmax(logits, axis=1)            # B, S/8, S/8
    return idx.reshape(idx.shape[0], -1)


def load_encoder_params(weight_path: str) -> Dict[str, np.ndarray]:
    """Convert OpenAI's pickled torch encoder to a flat numpy dict.

    ``weight_path`` is the directory holding ``encoder.pkl`` (the
    reference's discrete_vae_weight_path) or the file itself."""
    import os

    import torch

    path = weight_path
    if os.path.isdir(path):
        path = os.path.join(path, "encoder.pkl")
    with open(path, "rb") as f:
        module = torch.load(f, map_location="cpu", weights_only=False)
    out = {}
    for name, p in module.named_parameters():
        out[name] = p.detach().numpy()
    return out


def make_mim_label_fn(weight_path: str):
    """Returns batch → (B, tokens) dVAE codebook ids of image_target."""
    raw = load_encoder_params(weight_path)
    params = {k: jnp.asarray(v) for k, v in raw.items()}

    def fn(batch):
        return get_codebook_indices(params, batch["image_target"])

    return fn
