"""Fused multi-head attention kernel (Pallas/TPU).

The reference computes attention as separate fp32 matmuls + bias add +
masked softmax in eager torch (reference:
src/vilt/modules/vision_transformer.py:346-358), materializing (B,H,N,N)
logits in HBM twice.  Here the whole per-(batch, head) attention row —
fp32 logits with additive relative-position bias, key-padding mask,
softmax, and the value contraction — happens in one VMEM-resident Pallas
kernel: logits never touch HBM.

Sequence lengths in this model are small (197 @224, 577 @384, 901 @480
image tokens + ≤40 text), so a whole-row kernel (one (N,N) tile per grid
cell) fits comfortably in VMEM (577² f32 ≈ 1.3 MB) and avoids online-
softmax bookkeeping.  N is padded to the lane multiple with masked keys.

`fused_attention` dispatches: Pallas on TPU for N ≥ MIN_PALLAS_N, else a
jnp reference path (identical math; used on CPU and for tiny splits).
"""

from __future__ import annotations

import functools
import os
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

MIN_PALLAS_N = 128
_INTERPRET = False  # tests flip this to run the packed kernels off-TPU

# Minimum sequence length for the packed-qkv kernel path.  @224 training
# (N=237→240) was long excluded by a hard-coded 256, which meant the fused
# Pallas backward — the combo that wins 1.78× at @384 — had never actually
# been measured at the pretrain shape (the old "packed loses at @224"
# numbers were the split whole-row kernel with the XLA-recompute backward).
# Env-tunable for probing: VLM_TPU_PACKED_MIN_N.
PACKED_MIN_N = int(os.environ.get("VLM_TPU_PACKED_MIN_N", "256"))

# The single-kernel LN+qkv+attention fusion (ln_qkv_attention): interpret-
# parity-pinned but NOT yet measured on-chip, so default OFF; flip with
# VLM_TPU_FUSE_LN_QKV_ATTN=1 (tools/block_fusion_probe.py measures it).
_FUSE_LN_QKV_ATTN = os.environ.get("VLM_TPU_FUSE_LN_QKV_ATTN", "0") == "1"


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


def reference_attention(
    q: jax.Array, k: jax.Array, v: jax.Array,
    bias: Optional[jax.Array], mask: Optional[jax.Array],
    scale: float,
    logits_dtype=jnp.float32,
) -> jax.Array:
    """Pure-XLA path; q,k,v: (B,H,N,d); bias: (H,N,N) f32; mask: (B,N).

    logits_dtype=f32 matches the reference's q.float() @ k.float()
    (vision_transformer.py:346-355).  bf16 logits (softmax still f32)
    halve the (B,H,N,N) HBM traffic — measured +14% eval throughput on
    the bandwidth-bound dev chip — and are opt-in via config
    ``attention_logits_dtype="bf16"``.  ACCURACY CAVEAT: the bf16-logit
    score drift (max |Δ| ~1.2e-3) measurably flips retrieval top-k sets
    when scores are tightly spaced (tools/bf16_logits_probe.py) — not for
    reported R@k."""
    from jax.ad_checkpoint import checkpoint_name

    s = jax.lax.dot_general(
        q * scale, k,
        dimension_numbers=(((3,), (3,)), ((0, 1), (0, 1))),
        preferred_element_type=logits_dtype)
    if bias is not None:
        s = s + bias[None].astype(logits_dtype)
    if mask is not None:
        s = jnp.where(mask[:, None, None, :] > 0, s,
                      jnp.asarray(-jnp.inf, s.dtype))
    # named for the surgical remat policy (model._block_apply): under
    # use_remat only these O(N²) tensors are recomputed in the backward
    # pass — everything else is saved as usual
    s = checkpoint_name(s, "attn_logits")
    p = jax.nn.softmax(s.astype(jnp.float32), axis=-1).astype(q.dtype)
    p = checkpoint_name(p, "attn_probs")
    return jax.lax.dot_general(
        p, v, dimension_numbers=(((3,), (2,)), ((0, 1), (0, 1))),
        preferred_element_type=q.dtype)


def _mha_kernel(q_ref, k_ref, v_ref, bias_ref, mask_ref, o_ref, *,
                scale: float):
    """One (batch, head) cell: full-row fused attention in VMEM.

    q/k stay in input dtype so the MXU runs its native bf16×bf16→f32 path;
    logits, bias add, mask, and softmax are fp32 (reference parity with
    q.float() @ k.float())."""
    q = q_ref[0, 0] * jnp.asarray(scale, q_ref.dtype)    # N, d
    s = jax.lax.dot_general(
        q, k_ref[0, 0], dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)              # N, N
    s = s + bias_ref[0]
    valid = mask_ref[0, 0] > 0                           # N (keys)
    s = jnp.where(valid[None, :], s, jnp.asarray(-jnp.inf, jnp.float32))
    p = jax.nn.softmax(s, axis=-1)
    o = jax.lax.dot_general(
        p.astype(v_ref.dtype), v_ref[0, 0],
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    o_ref[0, 0] = o.astype(o_ref.dtype)


def _mha_kernel_bb(q_ref, k_ref, v_ref, bias_ref, mask_ref, o_ref, *,
                   scale: float):
    """Batch-blocked cell: bb batches × one head per grid step.

    Amortizes grid-step latency and keeps the head's bias block resident
    while the MXU sees batched (bb, N, d) contractions."""
    q = q_ref[:, 0] * jnp.asarray(scale, q_ref.dtype)    # bb, N, d
    s = jax.lax.dot_general(
        q, k_ref[:, 0],
        dimension_numbers=(((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.float32)              # bb, N, N
    s = s + bias_ref[0][None]
    valid = mask_ref[:, 0] > 0                           # bb, N
    s = jnp.where(valid[:, None, :], s, jnp.asarray(-jnp.inf, jnp.float32))
    p = jax.nn.softmax(s, axis=-1)
    o = jax.lax.dot_general(
        p.astype(v_ref.dtype), v_ref[:, 0],
        dimension_numbers=(((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32)
    o_ref[:, 0] = o.astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("scale", "block_b"))
def _pallas_attention_bb(q, k, v, bias, mask, scale: float, block_b: int = 4):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    B, H, N, d = q.shape
    Np = _round_up(N, 128)
    pad_n = Np - N
    pad_b = (-B) % block_b
    if pad_n or pad_b:
        padded = [jnp.pad(x, ((0, pad_b), (0, 0), (0, pad_n), (0, 0)))
                  for x in (q, k, v)]
        q, k, v = padded
        bias = jnp.pad(bias, ((0, 0), (0, pad_n), (0, pad_n)))
        mask = jnp.pad(mask, ((0, pad_b), (0, pad_n)))
    Bp = B + pad_b
    mask = mask[:, None, :]

    grid = (H, Bp // block_b)
    out = pl.pallas_call(
        functools.partial(_mha_kernel_bb, scale=scale),
        out_shape=jax.ShapeDtypeStruct((Bp, H, Np, d), q.dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec((block_b, 1, Np, d), lambda h, b: (b, h, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block_b, 1, Np, d), lambda h, b: (b, h, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block_b, 1, Np, d), lambda h, b: (b, h, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Np, Np), lambda h, b: (h, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block_b, 1, Np), lambda h, b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((block_b, 1, Np, d), lambda h, b: (b, h, 0, 0),
                               memory_space=pltpu.VMEM),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        cost_estimate=pl.CostEstimate(
            flops=4 * block_b * Np * Np * d,
            transcendentals=block_b * Np * Np,
            bytes_accessed=(3 * block_b * Np * d + Np * Np) * 4),
    )(q, k, v, bias, mask)
    if pad_n or pad_b:
        out = out[:B, :, :N, :]
    return out


@functools.partial(jax.jit, static_argnames=("scale",))
def _pallas_attention(q, k, v, bias, mask, scale: float):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    B, H, N, d = q.shape
    Np = _round_up(N, 128)
    pad_n = Np - N
    if pad_n:
        padded = [jnp.pad(x, ((0, 0), (0, 0), (0, pad_n), (0, 0)))
                  for x in (q, k, v)]
        q, k, v = padded
        bias = jnp.pad(bias, ((0, 0), (0, pad_n), (0, pad_n)))
        mask = jnp.pad(mask, ((0, 0), (0, pad_n)))
    mask = mask[:, None, :]  # (B, 1, Np): TPU-tileable layout

    # Grid (H, B): batch is the fast axis, so the (Np, Np) bias block for
    # head h stays VMEM-resident across all B cells instead of being
    # re-DMA'd per cell.  Head dim d (64) is left unpadded — blocks that
    # span the full trailing array dim are tile-legal.
    grid = (H, B)
    out = pl.pallas_call(
        functools.partial(_mha_kernel, scale=scale),
        out_shape=jax.ShapeDtypeStruct((B, H, Np, d), q.dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, 1, Np, d), lambda h, b: (b, h, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, Np, d), lambda h, b: (b, h, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, Np, d), lambda h, b: (b, h, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Np, Np), lambda h, b: (h, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, Np), lambda h, b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 1, Np, d), lambda h, b: (b, h, 0, 0),
                               memory_space=pltpu.VMEM),
        # the whole-row tile at N=1024 (VQA @480 split halves) needs ~20 MB
        # of scoped VMEM; the default 18.25 MB limit rejects it
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        cost_estimate=pl.CostEstimate(
            flops=4 * Np * Np * d, transcendentals=Np * Np,
            bytes_accessed=(3 * Np * d + Np * Np + Np * d) * 4),
    )(q, k, v, bias, mask)
    if pad_n:
        out = out[:, :, :N, :]
    return out


def _packed_kernel(qkv_q, qkv_k, qkv_v, bias_ref, mask_ref, o_ref, *,
                   scale: float):
    """One (head-pair, batch-block) cell over PACKED qkv.

    q/k/v refs are (bb, Np, 128) lane-aligned blocks holding two adjacent
    heads' columns straight out of the qkv projection (head-major torch
    layout); the two heads are processed sequentially against an f32
    (bb, Np, Np) logits tile, avoiding any HBM-level transpose of the
    (B, N, 3, H, d) tensor."""
    bb, Np, _ = qkv_q.shape
    valid = mask_ref[:, 0] > 0                             # bb, Np
    for h in (0, 1):
        sl = slice(h * 64, (h + 1) * 64)
        q = qkv_q[:, :, sl] * jnp.asarray(scale, qkv_q.dtype)
        s = jax.lax.dot_general(
            q, qkv_k[:, :, sl],
            dimension_numbers=(((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)            # bb, Np, Np
        s = s + bias_ref[h][None]
        s = jnp.where(valid[:, None, :], s,
                      jnp.asarray(-jnp.inf, jnp.float32))
        p = jax.nn.softmax(s, axis=-1)
        o = jax.lax.dot_general(
            p.astype(qkv_v.dtype), qkv_v[:, :, sl],
            dimension_numbers=(((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)
        o_ref[:, :, sl] = o.astype(o_ref.dtype)


def _quant_last_i8(t32):
    """Per-row symmetric int8 over the trailing dim (f32 in, int8 +
    f32 scale out) — the attention twin of int8._quant_rows."""
    amax = jnp.max(jnp.abs(t32), axis=-1, keepdims=True)
    s = jnp.maximum(amax, 1e-8) / 127.0
    return jnp.round(t32 * (1.0 / s)).astype(jnp.int8), s


def _packed_kernel_i8qk(qkv_q, qkv_k, qkv_v, bias_ref, mask_ref, o_ref, *,
                        scale: float):
    """_packed_kernel with the QK^T contraction int8×int8→int32.

    Per-token symmetric quantization of q and k (64-dim rows) in VMEM;
    the logits dequantize through the row/column scale outer product
    (the row scale also absorbs the 1/√d softmax scale).  d=64 half-fills
    the MXU in any dtype, so int8's 2× per-pass rate halves the QK term.
    Softmax and the value contraction are unchanged (f32 / bf16).  This
    is an opt-in numerics mode for the int8 eval tower ONLY — parity
    paths keep bf16 QK with f32 accumulation (reference numerics).

    MEASURED AND REFUTED on the dev v5e (r5, tools/logs/
    int8_qk_poly11_probe.log, @384 ViT-B headline tower, 512 imgs):
    1416.4 img/s vs 1652.6 for the bf16-QK int8 tower (1449.6 vs 1735.3
    with the poly11 gelu) — the two dequant broadcast multiplies over
    the (bb, Np, Np) logits tile plus the q/k quant chain cost more VPU
    time than int8 saves on the half-filled MXU contraction.  Kept as a
    reproducible opt-in (VLM_TPU_I8_QK=1) with interpret-parity tests;
    do NOT adopt without a shape where the QK term dominates."""
    bb, Np, _ = qkv_q.shape
    valid = mask_ref[:, 0] > 0                             # bb, Np
    for h in (0, 1):
        sl = slice(h * 64, (h + 1) * 64)
        q32 = qkv_q[:, :, sl].astype(jnp.float32)
        k32 = qkv_k[:, :, sl].astype(jnp.float32)
        sq = jnp.maximum(jnp.max(jnp.abs(q32), -1, keepdims=True),
                         1e-8) / 127.0
        sk = jnp.maximum(jnp.max(jnp.abs(k32), -1, keepdims=True),
                         1e-8) / 127.0
        # zero-pad the contraction depth 64→128 BEFORE the int8 cast:
        # int8 arrays keep full 128-lane tiles (Mosaic-friendly) and a
        # 64-deep contraction costs the same MXU passes as 128-deep, so
        # the pad is free while int8's 2× per-pass rate halves QK time
        pad = ((0, 0), (0, 0), (0, 64))
        qi = jnp.round(jnp.pad(q32 * (1.0 / sq), pad)).astype(jnp.int8)
        ki = jnp.round(jnp.pad(k32 * (1.0 / sk), pad)).astype(jnp.int8)
        si = jax.lax.dot_general(
            qi, ki, dimension_numbers=(((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.int32)              # bb, Np, Np
        s = si.astype(jnp.float32) * (sq * scale) \
            * sk[:, :, 0][:, None, :]
        s = s + bias_ref[h][None]
        s = jnp.where(valid[:, None, :], s,
                      jnp.asarray(-jnp.inf, jnp.float32))
        p = jax.nn.softmax(s, axis=-1)
        o = jax.lax.dot_general(
            p.astype(qkv_v.dtype), qkv_v[:, :, sl],
            dimension_numbers=(((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)
        o_ref[:, :, sl] = o.astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("scale", "num_heads",
                                             "block_b", "qk_int8"))
def _pallas_packed_attention(qkv, bias, mask, scale: float, num_heads: int,
                             block_b: int = 4, qk_int8: bool = False):
    """Fused attention over packed qkv (B, Np, 3C) → context (B, Np, C).

    Requires Np % 16 == 0 (sublane alignment; callers pre-pad the sequence
    once per forward — see model._seq_pad) and head_dim == 64.  Np need
    not be lane-aligned: the (bb, Np, Np) logits tile's trailing dim is
    padded by Mosaic internally, and shaving query/key rows (577→592
    instead of →640 at ViT-B @384) cuts real MXU work.  Eliminates the
    reshape/transpose of qkv to (3, B, H, N, d) and the context transpose
    back — ~1.4 ms/layer of pure HBM shuffle at B64 N640 on v5e."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    B, Np, threeC = qkv.shape
    C = threeC // 3
    H2 = num_heads // 2
    pad_b = (-B) % block_b
    if pad_b:
        qkv = jnp.pad(qkv, ((0, pad_b), (0, 0), (0, 0)))
        mask = jnp.pad(mask, ((0, pad_b), (0, 0)))
    Bp = B + pad_b
    mask = mask[:, None, :]  # (B, 1, Np): TPU-tileable block layout

    grid = (H2, Bp // block_b)
    qkv_spec = lambda off: pl.BlockSpec(                  # noqa: E731
        (block_b, Np, 128), lambda j, b, off=off: (b, 0, off + j),
        memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        functools.partial(
            _packed_kernel_i8qk if qk_int8 else _packed_kernel,
            scale=scale),
        out_shape=jax.ShapeDtypeStruct((Bp, Np, C), qkv.dtype),
        grid=grid,
        in_specs=[
            qkv_spec(0),            # q columns [j*128, (j+1)*128)
            qkv_spec(H2),           # k columns [C + j*128, ...)
            qkv_spec(2 * H2),       # v columns [2C + j*128, ...)
            pl.BlockSpec((2, Np, Np), lambda j, b: (j, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block_b, 1, Np), lambda j, b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((block_b, Np, 128), lambda j, b: (b, 0, j),
                               memory_space=pltpu.VMEM),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        cost_estimate=pl.CostEstimate(
            flops=8 * block_b * Np * Np * 64,
            transcendentals=2 * block_b * Np * Np,
            bytes_accessed=(3 * block_b * Np * 128 + 2 * Np * Np) * 4),
        interpret=_INTERPRET,
    )(qkv, qkv, qkv, bias, mask)
    if pad_b:
        out = out[:B]
    return out


def _ln_qkv_attn_kernel(x_ref, lnw_ref, lnb_ref, w3_ref, b3_ref, bias_ref,
                        mask_ref, o_ref, xn_ref, *, scale: float, h2: int):
    """One (batch-block, head-pair) cell: LN + this pair's qkv projection
    + fused attention, with the packed qkv tensor never existing in HBM.

    Grid is (B/bb, H2) with the HEAD-PAIR axis fastest, so the x block
    stays VMEM-resident across all head pairs of a batch block; LN runs
    once per batch block into the ``xn_ref`` scratch (j == 0) and is
    reused by the other pairs.  The full (H, Np, Np) rel-pos bias rides
    in VMEM as a constant block (fetched once for the whole grid) —
    per-pair bias blocks would re-DMA ~H/2× per batch block.  Each cell
    contracts LN(x) with only its OWN 128 qkv columns (w3 is the qkv
    weight reshaped (3C/128, 128, C)), so no projection FLOPs are
    duplicated.  Numerics are bit-identical to the ln_linear →
    _packed_kernel pair: qkv slices are rounded to the block dtype
    exactly where the split pipeline stores them to HBM."""
    from jax.experimental import pallas as pl

    from .fused_block import _ln_f32, _qkv_pair_ctx

    j = pl.program_id(1)

    @pl.when(j == 0)
    def _ln():
        xn_ref[...] = _ln_f32(x_ref[...], lnw_ref, lnb_ref) \
            .astype(x_ref.dtype)

    valid = mask_ref[:, 0] > 0                             # bb, Np
    o_ref[...] = _qkv_pair_ctx(xn_ref[...], x_ref.dtype, w3_ref, b3_ref,
                               bias_ref, valid, j, h2, scale)


@functools.partial(jax.jit, static_argnames=("scale", "num_heads",
                                             "block_b"))
def _pallas_ln_qkv_attention(x, ln_w, ln_b, w_qkv, qkv_bias, bias, mask,
                             scale: float, num_heads: int, block_b: int = 8):
    """LN + qkv projection + fused attention over (B, Np, C) x →
    context (B, Np, C), with qkv never materialized in HBM (~2 × B·Np·3C
    bytes of traffic per layer removed vs the ln_linear → packed pair).
    Requires Np % 16 == 0, head_dim 64, C % 128 == 0."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    B, Np, C = x.shape
    H2 = num_heads // 2
    pad_b = (-B) % block_b
    if pad_b:
        x = jnp.pad(x, ((0, pad_b), (0, 0), (0, 0)))
        mask = jnp.pad(mask, ((0, pad_b), (0, 0)))
    Bp = B + pad_b
    mask = mask[:, None, :]
    w3 = w_qkv.astype(x.dtype).reshape(3 * C // 128, 128, C)
    b3 = qkv_bias.astype(jnp.float32).reshape(3 * C // 128, 1, 128)

    def const(c):
        nd = c.ndim
        return pl.BlockSpec(c.shape, lambda b, j, nd=nd: (0,) * nd,
                            memory_space=pltpu.VMEM)

    grid = (Bp // block_b, H2)
    out = pl.pallas_call(
        functools.partial(_ln_qkv_attn_kernel, scale=scale, h2=H2),
        out_shape=jax.ShapeDtypeStruct((Bp, Np, C), x.dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec((block_b, Np, C), lambda b, j: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            const(ln_w), const(ln_b), const(w3), const(b3),
            const(bias),
            pl.BlockSpec((block_b, 1, Np), lambda b, j: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((block_b, Np, 128), lambda b, j: (b, 0, j),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((block_b, Np, C), x.dtype)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        cost_estimate=pl.CostEstimate(
            # per cell: 3 column projections + 2 heads of attention
            flops=6 * block_b * Np * C * 128 + 8 * block_b * Np * Np * 64,
            transcendentals=2 * block_b * Np * Np,
            bytes_accessed=block_b * Np * (C + 128) * 2 + 2 * Np * Np * 4),
        interpret=_INTERPRET,
    )(x, ln_w, ln_b, w3, b3, bias, mask)
    if pad_b:
        out = out[:B]
    return out


def ln_qkv_attention(x, ln_w, ln_b, w_qkv, qkv_bias, bias, mask,
                     scale: float, num_heads: int, *,
                     use_pallas: bool = False):
    """Dispatcher: the single-kernel LN+qkv+attention fusion when
    eligible and enabled (``VLM_TPU_FUSE_LN_QKV_ATTN=1``; default OFF
    until measured on-chip), else the measured ln_linear →
    packed_fused_attention pair (bit-identical numerics)."""
    B, Np, C = x.shape
    head_dim = C // num_heads
    # shrink the batch block until the cell fits: resident bias
    # (H, Np, Np) f32 + x block and LN scratch (+ x double buffer) +
    # logits tile + qkv slices + out band
    bb = 8 if B % 8 == 0 else (4 if B % 4 == 0 else
                               (2 if B % 2 == 0 else 1))
    def vmem_est(bb):
        return (num_heads * Np * Np * 4 + 3 * bb * Np * C * 2
                + bb * Np * Np * 4 + 3 * bb * Np * 128 * 2
                + 2 * bb * Np * 128 * 2 + 3 * C * C * 2)
    while bb > 1 and vmem_est(bb) >= 90 * 1024 * 1024:
        bb //= 2
    ok = (use_pallas and _FUSE_LN_QKV_ATTN
          and (jax.default_backend() == "tpu" or _INTERPRET)
          and bias is not None and mask is not None
          and C % 128 == 0 and num_heads % 2 == 0 and head_dim == 64
          and Np % 16 == 0 and 256 <= Np <= 1024
          and w_qkv.shape == (3 * C, C)
          and vmem_est(bb) < 90 * 1024 * 1024)
    if not ok:
        from .fused_block import ln_linear

        qkv = ln_linear(x, ln_w, ln_b, w_qkv, qkv_bias,
                        use_pallas=use_pallas)
        return packed_fused_attention(qkv, bias, mask, scale, num_heads)
    return _pallas_ln_qkv_attention(
        x, ln_w, ln_b, w_qkv, qkv_bias, bias.astype(jnp.float32),
        mask.astype(jnp.int32), scale, num_heads, block_b=bb)


def _packed_bwd_kernel(qkv_q, qkv_k, qkv_v, bias_ref, mask_ref, g_ref,
                       dq_ref, dk_ref, dv_ref, dbias_ref, *, scale: float):
    """Fused attention backward for one (head-pair, batch-block) cell.

    Recomputes s/p in VMEM (like the fwd kernel) and produces dq/dk/dv
    plus the bias gradient — none of the O(N²) tensors (p, dp, ds) ever
    touch HBM, unlike the XLA backward which materializes each.  dbias is
    accumulated across batch blocks via output revisiting (the TPU grid is
    sequential; the batch axis is the fastest-varying grid dim)."""
    from jax.experimental import pallas as pl

    b = pl.program_id(1)

    valid = mask_ref[:, 0] > 0                             # bb, Np
    for h in (0, 1):
        sl = slice(h * 64, (h + 1) * 64)
        q = qkv_q[:, :, sl] * jnp.asarray(scale, qkv_q.dtype)
        k = qkv_k[:, :, sl]
        v = qkv_v[:, :, sl]
        g = g_ref[:, :, sl]
        s = jax.lax.dot_general(
            q, k, dimension_numbers=(((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)            # bb, Nq, Nk
        s = s + bias_ref[h][None]
        s = jnp.where(valid[:, None, :], s, jnp.asarray(-jnp.inf, jnp.float32))
        p = jax.nn.softmax(s, axis=-1)
        # batch-padding rows have zero valid keys → softmax is NaN; their
        # upstream g is zero, but NaN·0 = NaN would poison the dbias sum
        anyvalid = jnp.any(valid, axis=-1)                 # bb
        p = jnp.where(anyvalid[:, None, None], p, 0.0)

        # dv = pᵀ g  (contract over queries)
        dv = jax.lax.dot_general(
            p.astype(g.dtype), g,
            dimension_numbers=(((1,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)            # bb, Nk, 64
        # dp = g vᵀ
        dp = jax.lax.dot_general(
            g, v, dimension_numbers=(((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)            # bb, Nq, Nk
        # softmax vjp: ds = p ⊙ (dp − Σ_k dp⊙p)
        ds = p * (dp - jnp.sum(dp * p, axis=-1, keepdims=True))
        ds16 = ds.astype(qkv_q.dtype)
        # dq = ds k · scale ; dk = dsᵀ q (q pre-scaled)
        dq = jax.lax.dot_general(
            ds16, k, dimension_numbers=(((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)
        dk = jax.lax.dot_general(
            ds16, q, dimension_numbers=(((1,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)
        dq_ref[:, :, sl] = (dq * scale).astype(dq_ref.dtype)
        dk_ref[:, :, sl] = dk.astype(dk_ref.dtype)
        dv_ref[:, :, sl] = dv.astype(dv_ref.dtype)

        # bias grad: accumulate Σ_batch ds across the bb grid steps
        db = jnp.sum(ds, axis=0)                           # Nq, Nk

        @pl.when(b == 0)
        def _init():
            dbias_ref[h] = db

        @pl.when(b != 0)
        def _acc():
            dbias_ref[h] += db


@functools.partial(jax.jit, static_argnames=("scale", "num_heads",
                                             "block_b"))
def _pallas_packed_attention_bwd(qkv, bias, mask, g, scale: float,
                                 num_heads: int, block_b: int = 4):
    """Backward companion of ``_pallas_packed_attention``: returns
    (dqkv, dbias)."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    B, Np, threeC = qkv.shape
    C = threeC // 3
    H2 = num_heads // 2
    pad_b = (-B) % block_b
    if pad_b:
        qkv = jnp.pad(qkv, ((0, pad_b), (0, 0), (0, 0)))
        mask = jnp.pad(mask, ((0, pad_b), (0, 0)))
        g = jnp.pad(g, ((0, pad_b), (0, 0), (0, 0)))
    Bp = B + pad_b
    mask = mask[:, None, :]

    grid = (H2, Bp // block_b)
    qkv_spec = lambda off: pl.BlockSpec(                  # noqa: E731
        (block_b, Np, 128), lambda j, b, off=off: (b, 0, off + j),
        memory_space=pltpu.VMEM)
    band_spec = pl.BlockSpec((block_b, Np, 128), lambda j, b: (b, 0, j),
                             memory_space=pltpu.VMEM)
    dq_c, dk_c, dv_c, dbias = pl.pallas_call(
        functools.partial(_packed_bwd_kernel, scale=scale),
        out_shape=(jax.ShapeDtypeStruct((Bp, Np, C), qkv.dtype),
                   jax.ShapeDtypeStruct((Bp, Np, C), qkv.dtype),
                   jax.ShapeDtypeStruct((Bp, Np, C), qkv.dtype),
                   jax.ShapeDtypeStruct((num_heads, Np, Np), jnp.float32)),
        grid=grid,
        in_specs=[
            qkv_spec(0), qkv_spec(H2), qkv_spec(2 * H2),
            pl.BlockSpec((2, Np, Np), lambda j, b: (j, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block_b, 1, Np), lambda j, b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            band_spec,                                    # g columns
        ],
        out_specs=(band_spec, band_spec, band_spec,
                   pl.BlockSpec((2, Np, Np), lambda j, b: (j, 0, 0),
                                memory_space=pltpu.VMEM)),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        cost_estimate=pl.CostEstimate(
            flops=24 * block_b * Np * Np * 64,
            transcendentals=2 * block_b * Np * Np,
            bytes_accessed=(5 * block_b * Np * 128 + 4 * Np * Np) * 4),
        interpret=_INTERPRET,
    )(qkv, qkv, qkv, bias, mask, g)
    dqkv = jnp.concatenate([dq_c, dk_c, dv_c], axis=-1)
    if pad_b:
        dqkv = dqkv[:B]
    return dqkv, dbias


def _packed_reference(qkv, bias, mask, scale: float, num_heads: int):
    """XLA composition with identical math to the packed kernel (used for
    the backward pass and as the off-TPU fallback)."""
    B, N, threeC = qkv.shape
    C = threeC // 3
    head_dim = C // num_heads
    q, k, v = jnp.split(qkv, 3, axis=-1)

    def heads(t):
        return jnp.transpose(
            t.reshape(B, N, num_heads, head_dim), (0, 2, 1, 3))

    out = reference_attention(heads(q), heads(k), heads(v), bias, mask,
                              scale)
    return jnp.transpose(out, (0, 2, 1, 3)).reshape(B, N, C)


def _packed_reference_i8qk(qkv, bias, mask, scale: float, num_heads: int):
    """jnp twin of _packed_kernel_i8qk (identical math; off-TPU fallback
    and the interpret-parity oracle for the int8-QK eval mode)."""
    B, N, threeC = qkv.shape
    C = threeC // 3
    head_dim = C // num_heads
    q, k, v = jnp.split(qkv, 3, axis=-1)

    def heads(t):
        return jnp.transpose(
            t.reshape(B, N, num_heads, head_dim), (0, 2, 1, 3))

    qi, sq = _quant_last_i8(heads(q).astype(jnp.float32))  # B,H,N,d
    ki, sk = _quant_last_i8(heads(k).astype(jnp.float32))
    si = jax.lax.dot_general(
        qi, ki, dimension_numbers=(((3,), (3,)), ((0, 1), (0, 1))),
        preferred_element_type=jnp.int32)                  # B,H,N,N
    s = si.astype(jnp.float32) * (sq * scale) \
        * jnp.swapaxes(sk, -1, -2)
    if bias is not None:
        s = s + bias[None].astype(jnp.float32)
    if mask is not None:
        s = jnp.where(mask[:, None, None, :] > 0, s,
                      jnp.asarray(-jnp.inf, s.dtype))
    p = jax.nn.softmax(s, axis=-1)
    out = jax.lax.dot_general(
        p.astype(v.dtype), heads(v),
        dimension_numbers=(((3,), (2,)), ((0, 1), (0, 1))),
        preferred_element_type=jnp.float32).astype(qkv.dtype)
    return jnp.transpose(out, (0, 2, 1, 3)).reshape(B, N, C)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
def _packed_attention_diff(qkv, bias, mask, scale: float, num_heads: int,
                           block_b: int):
    return _pallas_packed_attention(qkv, bias.astype(jnp.float32),
                                    mask.astype(jnp.int32), scale,
                                    num_heads, block_b=block_b)


def _packed_fwd(qkv, bias, mask, scale, num_heads, block_b):
    out = _packed_attention_diff(qkv, bias, mask, scale, num_heads, block_b)
    return out, (qkv, bias, mask)


def _packed_bwd(scale, num_heads, block_b, res, g):
    """Backward: fused Pallas kernel on TPU — recomputes s/p in VMEM and
    emits dqkv + dbias without materializing any (N,N) tensor in HBM;
    falls back to the VJP of the XLA reference composition elsewhere."""
    qkv, bias, mask = res
    if jax.default_backend() == "tpu":
        dqkv, dbias = _pallas_packed_attention_bwd(
            qkv, bias.astype(jnp.float32), mask.astype(jnp.int32),
            g.astype(qkv.dtype), scale, num_heads, block_b=block_b)
        return dqkv, dbias.astype(bias.dtype), jnp.zeros_like(mask)
    _, vjp = jax.vjp(
        lambda qkv_, bias_: _packed_reference(qkv_, bias_, mask, scale,
                                              num_heads),
        qkv, bias)
    dqkv, dbias = vjp(g)
    return dqkv, dbias, jnp.zeros_like(mask)


_packed_attention_diff.defvjp(_packed_fwd, _packed_bwd)


def packed_fused_attention(qkv, bias, mask, scale: float, num_heads: int,
                           qk_int8: bool = False):
    """Packed-layout dispatcher; falls back to the split path off-TPU or
    for shapes the kernel does not cover.  ``qk_int8`` selects the
    eval-only int8-QK kernel (no backward; callers on the train path
    must leave it False)."""
    B, N, threeC = qkv.shape
    C = threeC // 3
    head_dim = C // num_heads
    ok = ((jax.default_backend() == "tpu" or (_INTERPRET and qk_int8))
          and N % 16 == 0
          and N >= (128 if _INTERPRET else PACKED_MIN_N)
          and head_dim == 64 and num_heads % 2 == 0
          and bias is not None)
    if not ok:
        if qk_int8:
            return _packed_reference_i8qk(qkv, bias, mask, scale,
                                          num_heads)
        return _packed_reference(qkv, bias, mask, scale, num_heads)
    if qk_int8:
        bb = 8 if (N <= 640 and B % 8 == 0) else \
            (4 if B % 4 == 0 else (2 if B % 2 == 0 else 1))
        return _pallas_packed_attention(
            qkv, bias.astype(jnp.float32), mask.astype(jnp.int32), scale,
            num_heads, block_b=bb, qk_int8=True)
    # VMEM: s tile (bb,Np,Np) f32 + bias pair + 3 input blocks; bb=8 fits
    # through Np=640, bb=2 through Np=1024 (VQA @480); larger N uses the
    # split path.
    bb_env = os.environ.get("VLM_TPU_PACKED_BB")
    if bb_env and B % int(bb_env) == 0:
        bb = int(bb_env)
    elif N <= 320:
        # short rows (@224 pretrain N=240): per-cell work is tiny, so take
        # the largest batch block that divides B — at B=22 that's the whole
        # batch (grid = H/2 cells); the (bb,Np,Np) f32 logits tile stays
        # well under VMEM (22·240·240 f32 ≈ 5 MB)
        bb = next(d for d in (32, 24, 22, 16, 12, 11, 8, 4, 2, 1)
                  if B % d == 0)
    elif N <= 640:
        bb = 8 if B % 8 == 0 else (4 if B % 4 == 0 else
                                   (2 if B % 2 == 0 else 1))
    elif N <= 1024:
        bb = 2 if B % 2 == 0 else 1
    else:
        q, k, v = jnp.split(qkv, 3, axis=-1)
        def heads(t):
            return jnp.transpose(
                t.reshape(B, N, num_heads, head_dim), (0, 2, 1, 3))
        out = _pallas_attention_diff(
            heads(q), heads(k), heads(v), bias.astype(jnp.float32),
            mask.astype(jnp.float32), scale)
        return jnp.transpose(out, (0, 2, 1, 3)).reshape(B, N, C)
    return _packed_attention_diff(qkv, bias, mask, scale, num_heads, bb)


def _pallas_dispatch(q, k, v, bias, mask, scale):
    """block_b=4 fits VMEM for N≤640 (s-tile 6.5 MB f32); fall back to the
    single-cell kernel for longer rows (e.g. 901+40 @480)."""
    Np = _round_up(q.shape[2], 128)
    block_b = 4 if (q.shape[0] % 4 == 0 and Np <= 640) else 1
    if block_b > 1:
        return _pallas_attention_bb(q, k, v, bias, mask.astype(jnp.int32),
                                    scale, block_b=block_b)
    return _pallas_attention(q, k, v, bias, mask.astype(jnp.int32), scale)


@functools.partial(jax.custom_vjp, nondiff_argnums=(5,))
def _pallas_attention_diff(q, k, v, bias, mask, scale: float):
    return _pallas_dispatch(q, k, v, bias, mask, scale)


def _pad_fwd(q, k, v, bias, mask, scale):
    out = _pallas_dispatch(q, k, v, bias, mask, scale)
    return out, (q, k, v, bias, mask)


def _pad_bwd(scale, res, g):
    """Backward = VJP of the XLA reference path (recomputes logits; the
    Pallas forward saved only q/k/v/bias, never the (N,N) probs)."""
    q, k, v, bias, mask = res
    _, vjp = jax.vjp(
        lambda q_, k_, v_, b_: reference_attention(q_, k_, v_, b_, mask,
                                                   scale),
        q, k, v, bias)
    dq, dk, dv, dbias = vjp(g)
    return dq, dk, dv, dbias, jnp.zeros_like(mask)


_pallas_attention_diff.defvjp(_pad_fwd, _pad_bwd)


def fused_attention(
    q: jax.Array, k: jax.Array, v: jax.Array,
    bias: Optional[jax.Array], mask: Optional[jax.Array],
    scale: float,
    use_pallas: bool = False,
    logits_dtype=jnp.float32,
) -> jax.Array:
    """Dispatching entry.

    The Pallas whole-row kernel beats the XLA path per-op in isolation
    (12.9 vs 18.8 ms/layer at B64 N640 on v5e) but loses end-to-end today
    (XLA overlaps/fuses attention with the surrounding matmuls better), so
    it is opt-in via config ``pallas_attention=True`` pending a
    batched-cell flash variant."""
    B, H, N, d = q.shape
    on_tpu = jax.default_backend() == "tpu"
    # the Pallas kernels compute f32 logits (parity mode); the bf16-logits
    # fast mode routes through the XLA path
    if not (use_pallas and on_tpu) or N < MIN_PALLAS_N or \
            logits_dtype != jnp.float32:
        return reference_attention(q, k, v, bias, mask, scale,
                                   logits_dtype=logits_dtype)
    if bias is None:
        bias = jnp.zeros((H, N, N), jnp.float32)
    else:
        bias = bias.astype(jnp.float32)
    if mask is None:
        mask = jnp.ones((B, N), jnp.float32)
    return _pallas_attention_diff(q, k, v, bias,
                                  mask.astype(jnp.float32), scale)
