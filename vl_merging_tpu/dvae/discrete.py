"""From-scratch gumbel-softmax DiscreteVAE (BEiT/DALLE-pytorch lineage).

JAX re-implementation of the reference's trainable discrete VAE
(reference: src/vilt/modules/modeling_discrete_vae.py:79-203) — unused at
reference runtime (the released OpenAI dVAE wrapper serves MIM labels) but
part of the model-core inventory (SURVEY §2.3).  Pure functions over a flat
param dict keyed EXACTLY like the reference module's ``state_dict()``
(torch layouts: Conv2d ``(out,in,kh,kw)``, ConvTranspose2d
``(in,out,kh,kw)``), so reference checkpoints load verbatim.

Encoder: ``num_layers`` × [Conv(4,s2,p1)+ReLU, ResBlock] then 1×1 conv to
``num_tokens`` logits.  Decoder mirrors it with ConvTranspose(4,s2,p1).
``forward`` draws Gumbel noise, mixes the codebook with the (optionally
straight-through) soft one-hot, decodes, and adds the reference's exact
loss: MSE (or smooth-L1) reconstruction + ``kl_div_loss_weight`` × the
reference's ``F.kl_div(log_uniform, log_qy, 'batchmean', log_target=True)``
— whose ``batchmean`` divides by ``log_uniform.size(0) == 1``, i.e. a SUM
over batch·positions (modeling_discrete_vae.py:195-198; quirk preserved).
"""

from __future__ import annotations

import dataclasses
import math
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

Params = Dict[str, jax.Array]


@dataclasses.dataclass(frozen=True)
class DiscreteVAEConfig:
    """Constructor args of the reference DiscreteVAE
    (modeling_discrete_vae.py:80-92)."""
    image_size: int = 256
    num_tokens: int = 512
    codebook_dim: int = 512
    num_layers: int = 3
    hidden_dim: int = 64
    channels: int = 3
    smooth_l1_loss: bool = False
    temperature: float = 0.9
    straight_through: bool = False
    kl_div_loss_weight: float = 0.0

    def get_image_size(self) -> int:
        return self.image_size

    def get_image_tokens_size(self) -> int:
        # reference hardcodes //8 (= 2**3 for its default 3 layers)
        return self.image_size // 8


# -- param init (torch Conv2d default: kaiming-uniform / U(±1/√fan_in)) ----

def init_discrete_vae_params(cfg: DiscreteVAEConfig, seed: int = 0) -> Params:
    rng = np.random.RandomState(seed)
    params: Dict[str, np.ndarray] = {}

    def conv(name, cin, cout, k, transpose=False):
        fan_in = cin * k * k
        bound = 1.0 / math.sqrt(fan_in)
        shape = (cin, cout, k, k) if transpose else (cout, cin, k, k)
        gain = math.sqrt(2.0)  # kaiming a=√5 → gain²=2/(1+5)=1/3 → √(1/3)
        w_bound = math.sqrt(3.0) * math.sqrt(1.0 / 3.0) / math.sqrt(fan_in)
        del gain
        params[f"{name}.weight"] = rng.uniform(
            -w_bound, w_bound, shape).astype(np.float32)
        params[f"{name}.bias"] = rng.uniform(
            -bound, bound, (cout,)).astype(np.float32)

    params["codebook.weight"] = rng.randn(
        cfg.num_tokens, cfg.codebook_dim).astype(np.float32)

    enc_in, dec_in = cfg.channels, cfg.codebook_dim
    for l in range(cfg.num_layers):
        conv(f"encoder.{2 * l}.0", enc_in, cfg.hidden_dim, 4)
        conv(f"decoder.{2 * l}.0", dec_in, cfg.hidden_dim, 4, transpose=True)
        for name in (f"encoder.{2 * l + 1}", f"decoder.{2 * l + 1}"):
            conv(f"{name}.net.0", cfg.hidden_dim, cfg.hidden_dim, 3)
            conv(f"{name}.net.2", cfg.hidden_dim, cfg.hidden_dim, 3)
            conv(f"{name}.net.4", cfg.hidden_dim, cfg.hidden_dim, 1)
        enc_in = dec_in = cfg.hidden_dim
    conv(f"encoder.{2 * cfg.num_layers}", cfg.hidden_dim, cfg.num_tokens, 1)
    conv(f"decoder.{2 * cfg.num_layers}", cfg.hidden_dim, cfg.channels, 1)
    return {k: jnp.asarray(v) for k, v in params.items()}


# -- conv primitives (torch layouts) ---------------------------------------

def _conv(x, w, b, stride=1, pad=0):
    y = jax.lax.conv_general_dilated(
        x, w.astype(x.dtype), window_strides=(stride, stride),
        padding=[(pad, pad), (pad, pad)],
        dimension_numbers=("NCHW", "OIHW", "NCHW"))
    return y + b.astype(x.dtype)[None, :, None, None]


def _conv_transpose(x, w, b):
    """torch ConvTranspose2d(k=4, stride=2, padding=1): (H)→(2H).

    Built explicitly as the gradient-of-conv (torch's definition):
    lhs-dilate by the stride, pad k-1-p, correlate with the spatially
    flipped kernel transposed to (out, in, kh, kw) — torch stores
    ConvTranspose2d weights as (in, out, kh, kw).  (jax.lax.conv_transpose
    with transpose_kernel=True mis-centers even kernels.)"""
    k = w.shape[-1]
    pad = k - 1 - 1  # k-1-p, p=1
    wt = jnp.flip(jnp.transpose(w, (1, 0, 2, 3)), (2, 3))
    y = jax.lax.conv_general_dilated(
        x, wt.astype(x.dtype), window_strides=(1, 1),
        padding=[(pad, pad), (pad, pad)], lhs_dilation=(2, 2),
        dimension_numbers=("NCHW", "OIHW", "NCHW"))
    return y + b.astype(x.dtype)[None, :, None, None]


def _res_block(params: Params, prefix: str, x: jax.Array) -> jax.Array:
    """Conv3→ReLU→Conv3→ReLU→Conv1, residual (modeling_discrete_vae.py:64-76)."""
    h = _conv(x, params[f"{prefix}.net.0.weight"],
              params[f"{prefix}.net.0.bias"], pad=1)
    h = jax.nn.relu(h)
    h = _conv(h, params[f"{prefix}.net.2.weight"],
              params[f"{prefix}.net.2.bias"], pad=1)
    h = jax.nn.relu(h)
    h = _conv(h, params[f"{prefix}.net.4.weight"],
              params[f"{prefix}.net.4.bias"])
    return h + x


def encoder_logits(params: Params, img: jax.Array,
                   cfg: DiscreteVAEConfig) -> jax.Array:
    """(B, C, S, S) → (B, num_tokens, S/2^L, S/2^L) codebook logits."""
    h = img
    for l in range(cfg.num_layers):
        h = jax.nn.relu(_conv(h, params[f"encoder.{2 * l}.0.weight"],
                              params[f"encoder.{2 * l}.0.bias"],
                              stride=2, pad=1))
        h = _res_block(params, f"encoder.{2 * l + 1}", h)
    n = 2 * cfg.num_layers
    return _conv(h, params[f"encoder.{n}.weight"], params[f"encoder.{n}.bias"])


def _decoder(params: Params, h: jax.Array,
             cfg: DiscreteVAEConfig) -> jax.Array:
    for l in range(cfg.num_layers):
        h = jax.nn.relu(_conv_transpose(
            h, params[f"decoder.{2 * l}.0.weight"],
            params[f"decoder.{2 * l}.0.bias"]))
        h = _res_block(params, f"decoder.{2 * l + 1}", h)
    n = 2 * cfg.num_layers
    return _conv(h, params[f"decoder.{n}.weight"], params[f"decoder.{n}.bias"])


def get_codebook_indices(params: Params, img: jax.Array,
                         cfg: DiscreteVAEConfig) -> jax.Array:
    """argmax over the logit channel (modeling_discrete_vae.py:135-139)."""
    return jnp.argmax(encoder_logits(params, img, cfg), axis=1)


def get_codebook_probs(params: Params, img: jax.Array,
                       cfg: DiscreteVAEConfig) -> jax.Array:
    return jax.nn.softmax(encoder_logits(params, img, cfg), axis=1)


def decode(params: Params, img_seq: jax.Array,
           cfg: DiscreteVAEConfig) -> jax.Array:
    """(B, N) codebook ids → (B, C, 8√N, 8√N) images
    (modeling_discrete_vae.py:141-152)."""
    emb = params["codebook.weight"][img_seq]          # (B, N, D)
    b, n, d = emb.shape
    hw = int(math.isqrt(n))
    h = jnp.transpose(emb.reshape(b, hw, hw, d), (0, 3, 1, 2))
    return _decoder(params, h, cfg)


def _smooth_l1(x, y):
    d = jnp.abs(x - y)
    return jnp.mean(jnp.where(d < 1.0, 0.5 * d * d, d - 0.5))


def forward(
    params: Params, img: jax.Array, cfg: DiscreteVAEConfig, *,
    rng: Optional[jax.Array] = None, noise: Optional[jax.Array] = None,
    return_loss: bool = False, return_recons: bool = False,
    return_logits: bool = False, temp: Optional[float] = None,
):
    """Reference forward (modeling_discrete_vae.py:154-203).

    Gumbel noise comes from ``rng`` (jax.random.gumbel) or an explicit
    ``noise`` array (tests inject the oracle's noise for determinism)."""
    assert img.shape[-1] == cfg.image_size and \
        img.shape[-2] == cfg.image_size, img.shape

    logits = encoder_logits(params, img, cfg)
    if return_logits:
        return logits

    tau = cfg.temperature if temp is None else temp
    if noise is None:
        if rng is None:
            raise ValueError("forward needs rng or noise for gumbel sampling")
        noise = jax.random.gumbel(rng, logits.shape, logits.dtype)
    soft_one_hot = jax.nn.softmax((logits + noise) / tau, axis=1)
    if cfg.straight_through:
        idx = jnp.argmax(soft_one_hot, axis=1, keepdims=True)
        hard = jnp.zeros_like(soft_one_hot).at[
            jnp.arange(img.shape[0])[:, None, None, None],
            idx,
            jnp.arange(logits.shape[2])[None, None, :, None],
            jnp.arange(logits.shape[3])[None, None, None, :]].set(1.0)
        soft_one_hot = (hard - jax.lax.stop_gradient(soft_one_hot)
                        + soft_one_hot)
    # einsum('b n h w, n d -> b d h w', soft_one_hot, codebook)
    sampled = jnp.einsum("bnhw,nd->bdhw", soft_one_hot,
                         params["codebook.weight"].astype(soft_one_hot.dtype))
    out = _decoder(params, sampled, cfg)
    if not return_loss:
        return out

    recon = (_smooth_l1(img, out) if cfg.smooth_l1_loss
             else jnp.mean((img - out) ** 2))

    # kl term: reference's F.kl_div(log_uniform, log_qy, 'batchmean',
    # log_target=True) — batchmean divides by log_uniform.size(0)==1,
    # so this is a SUM over batch·positions·vocab (quirk preserved)
    lg = jnp.transpose(logits, (0, 2, 3, 1)).reshape(
        img.shape[0], -1, cfg.num_tokens)
    qy = jax.nn.softmax(lg, axis=-1)
    log_qy = jnp.log(qy + 1e-10)
    log_uniform = math.log(1.0 / cfg.num_tokens)
    kl = jnp.sum(qy * (log_qy - log_uniform))

    loss = recon + kl * cfg.kl_div_loss_weight
    if not return_recons:
        return loss
    return loss, out
