"""Fused block-glue kernels (Pallas/TPU) for the eval fast path.

Between the big matmuls, a transformer block materializes several
full-size (B, N, C) tensors in HBM: LayerNorm outputs, the projection
output, LayerScale products, and residual sums.  At ViT-B/16 @384 B64
that is ~0.7 ms/layer of pure bandwidth.  These kernels fold the glue
into the adjacent matmul so each block stage reads x once and writes one
tensor:

  * ``ln_linear``        — y = LN(x) @ Wᵀ + b           (pre-norm + qkv)
  * ``linear_residual``  — y = res + γ ⊙ (x @ Wᵀ + b)   (proj + LayerScale
                           + residual)
  * ``mlp_tail``         — y = x + γ ⊙ fc2(GELU(fc1(LN(x))))

Semantics match the unfused path bit-for-bf16: LN statistics in f32
(layers.layer_norm), matmuls bf16×bf16→f32 on the MXU, GELU exact-erf
(ops/mlp._erf_gelu).  Weights use torch layout (out, in).  All three fall
back to the identical XLA composition off-TPU or for non-tiling shapes.

Reference semantics: vision_transformer.py:489-530 (LayerScale residuals),
:272-296 (Mlp), :831 (eps=1e-6).
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp

from .mlp import _erf_gelu, _round_up

BLOCK_M = 512
LN_EPS = 1e-6
_VMEM_LIMIT = 100 * 1024 * 1024
_INTERPRET = False  # tests flip this to run the kernels off-TPU

# Escape hatch for the whole-tail fusion (proj_mlp_tail's single-kernel
# path): set VLM_TPU_FUSE_PROJ_MLP=0 (or flip this global before tracing)
# to route through the measured linear_residual -> mlp_tail pair instead.
# The pair is bit-identical (the fused kernel rounds its intermediate to
# the block dtype exactly where the pair stores it to HBM), so this only
# trades the intermediate's HBM round-trip back for compile-path safety.
_FUSE_WHOLE_TAIL = os.environ.get("VLM_TPU_FUSE_PROJ_MLP", "1") != "0"

# The whole-BLOCK megakernel (fused_eval_block's single-kernel path:
# LN+qkv+attention+proj+MLP, per-layer HBM traffic = x-read + out-write
# only).  Interpret-parity-pinned but NOT yet measured on-chip → default
# OFF; flip with VLM_TPU_FUSE_EVAL_BLOCK=1 (tools/block_fusion_probe.py).
_FUSE_EVAL_BLOCK = os.environ.get("VLM_TPU_FUSE_EVAL_BLOCK", "0") == "1"

# Training-forward fusion (VERDICT r3 #4 adopt-or-refute): route the
# train-time block through ln_linear_train → packed attention (fused
# Pallas VJP) → proj_mlp_tail_train, with stochastic-depth scales folded
# into the tail kernel's epilogues and an XLA-recompute backward
# (jax.vjp of the bit-matching reference composition).  Levels:
#   "0" (default) — off, the measured XLA(+remat) train path
#   "tail"        — fuse only the post-attention half (proj_mlp_tail_train)
#   "full"        — also fuse LN1+qkv (ln_linear_train)
# Default OFF pending on-chip measurement (tools/train_fusion_probe.py).
_TRAIN_FUSION = os.environ.get("VLM_TPU_TRAIN_FUSION", "0")
if _TRAIN_FUSION not in ("0", "tail", "full"):
    raise ValueError(
        f"VLM_TPU_TRAIN_FUSION={_TRAIN_FUSION!r}: want 0|tail|full")


def fusion_gates():
    """Current eval-fusion gate states — jit traces bake these in, so any
    cache of traced functions must key on them (evaluation/retrieval.py's
    lru-cached tower factories do)."""
    from . import attention

    return (_FUSE_WHOLE_TAIL, _FUSE_EVAL_BLOCK,
            attention._FUSE_LN_QKV_ATTN)


def _ln_f32(x, w_ref, b_ref):
    x32 = x.astype(jnp.float32)
    mean = jnp.mean(x32, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(x32 - mean), axis=-1, keepdims=True)
    y = (x32 - mean) * jax.lax.rsqrt(var + LN_EPS)
    return y * w_ref[...].astype(jnp.float32) + b_ref[...].astype(jnp.float32)


def _ln_linear_kernel(x_ref, lnw_ref, lnb_ref, w_ref, b_ref, o_ref):
    xn = _ln_f32(x_ref[...], lnw_ref, lnb_ref).astype(x_ref.dtype)
    y = jax.lax.dot_general(
        xn, w_ref[...], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)
    o_ref[...] = (y + b_ref[...].astype(jnp.float32)).astype(o_ref.dtype)


def _linear_residual_kernel(x_ref, w_ref, b_ref, g_ref, res_ref, o_ref):
    y = jax.lax.dot_general(
        x_ref[...], w_ref[...], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)
    y = (y + b_ref[...].astype(jnp.float32)) * g_ref[...].astype(jnp.float32)
    o_ref[...] = (res_ref[...].astype(jnp.float32) + y).astype(o_ref.dtype)


def _mlp_tail_kernel(x_ref, lnw_ref, lnb_ref, w1_ref, b1_ref, w2_ref,
                     b2_ref, g_ref, o_ref):
    xn = _ln_f32(x_ref[...], lnw_ref, lnb_ref).astype(x_ref.dtype)
    h = jax.lax.dot_general(
        xn, w1_ref[...], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)
    h = _erf_gelu(h + b1_ref[...].astype(jnp.float32))
    y = jax.lax.dot_general(
        h.astype(x_ref.dtype), w2_ref[...], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)
    y = (y + b2_ref[...].astype(jnp.float32)) * g_ref[...].astype(jnp.float32)
    o_ref[...] = (x_ref[...].astype(jnp.float32) + y).astype(o_ref.dtype)


def _proj_mlp_kernel(x_ref, wp_ref, bp_ref, g1_ref, lnw_ref, lnb_ref,
                     w1_ref, b1_ref, w2_ref, b2_ref, g2_ref, res_ref,
                     o_ref):
    """proj + LayerScale + residual + LN + MLP + LayerScale + residual —
    the entire post-attention half of a block in one row-blocked kernel.

    Bit-identical to the linear_residual → mlp_tail pair: the
    intermediate x' = res + γ1⊙proj(ctx) is rounded to the block dtype
    before the LN (exactly what the split pipeline stores to HBM), it
    just never leaves VMEM (~0.7 GB/layer of HBM at ViT-B @384 B384)."""
    y = jax.lax.dot_general(
        x_ref[...], wp_ref[...], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)
    y = (y + bp_ref[...].astype(jnp.float32)) * g1_ref[...].astype(
        jnp.float32)
    x1 = (res_ref[...].astype(jnp.float32) + y).astype(x_ref.dtype)

    xn = _ln_f32(x1, lnw_ref, lnb_ref).astype(x_ref.dtype)
    h = jax.lax.dot_general(
        xn, w1_ref[...], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)
    h = _erf_gelu(h + b1_ref[...].astype(jnp.float32))
    y2 = jax.lax.dot_general(
        h.astype(x_ref.dtype), w2_ref[...], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)
    y2 = (y2 + b2_ref[...].astype(jnp.float32)) * g2_ref[...].astype(
        jnp.float32)
    o_ref[...] = (x1.astype(jnp.float32) + y2).astype(o_ref.dtype)


def _row_call(kernel, x2d, consts, out_dim, extra_row_inputs=()):
    """Common grid plumbing: row blocks of x (+ optional row-aligned
    inputs), VMEM-resident constants."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    M, C = x2d.shape
    Mp = _round_up(M, BLOCK_M)
    if Mp != M:
        x2d = jnp.pad(x2d, ((0, Mp - M), (0, 0)))
        extra_row_inputs = tuple(jnp.pad(e, ((0, Mp - M), (0, 0)))
                                 for e in extra_row_inputs)

    def const_spec(c):
        nd = c.ndim
        return pl.BlockSpec(c.shape, lambda m, nd=nd: (0,) * nd,
                            memory_space=pltpu.VMEM)

    def row_of(width):
        return pl.BlockSpec((BLOCK_M, width), lambda m: (m, 0),
                            memory_space=pltpu.VMEM)

    row_spec = row_of(C)
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((Mp, out_dim), x2d.dtype),
        grid=(Mp // BLOCK_M,),
        in_specs=[row_spec] + [const_spec(c) for c in consts]
                 + [row_of(e.shape[1]) for e in extra_row_inputs],
        out_specs=pl.BlockSpec((BLOCK_M, out_dim), lambda m: (m, 0),
                               memory_space=pltpu.VMEM),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=_VMEM_LIMIT),
        interpret=_INTERPRET,
    )(x2d, *consts, *extra_row_inputs)
    return out[:M] if Mp != M else out


def _shapes_ok(C: int, out_dim: int, M: int) -> bool:
    return (C % 128 == 0 and out_dim % 128 == 0 and M >= BLOCK_M)


def ln_linear(x, ln_w, ln_b, w, b, *, use_pallas: bool = False):
    """y = LN(x) @ Wᵀ + b; x: (B, N, C), w: (O, C) torch layout."""
    B, N, C = x.shape
    O = w.shape[0]
    if not (use_pallas and jax.default_backend() == "tpu"
            and _shapes_ok(C, O, B * N)):
        from ..models.layers import layer_norm, linear

        xn = layer_norm(x, ln_w, ln_b, eps=LN_EPS)
        return linear(xn, w, b, dtype=x.dtype)
    out = _row_call(_ln_linear_kernel, x.reshape(B * N, C),
                    (ln_w, ln_b, w.astype(x.dtype), b), O)
    return out.reshape(B, N, O)


def linear_residual(x, w, b, gamma, res, *, use_pallas: bool = False):
    """y = res + γ ⊙ (x @ Wᵀ + b); all (B, N, C) except w (O, C)."""
    B, N, C = x.shape
    O = w.shape[0]
    if not (use_pallas and jax.default_backend() == "tpu"
            and _shapes_ok(C, O, B * N)):
        from ..models.layers import linear

        y = linear(x, w, b, dtype=x.dtype)
        return res + (gamma.astype(y.dtype) * y)
    out = _row_call(_linear_residual_kernel, x.reshape(B * N, C),
                    (w.astype(x.dtype), b, gamma),
                    O, extra_row_inputs=(res.reshape(B * N, O),))
    return out.reshape(B, N, O)


def mlp_tail(x, ln_w, ln_b, w1, b1, w2, b2, gamma, *,
             use_pallas: bool = False):
    """y = x + γ ⊙ fc2(GELU(fc1(LN(x)))); the whole post-attention half of
    a block in one kernel."""
    B, N, C = x.shape
    H = w1.shape[0]
    if not (use_pallas and jax.default_backend() == "tpu"
            and _shapes_ok(C, H, B * N)
            # both weight matrices + the (BLOCK_M, H) f32 hidden must fit
            and 2 * H * C * 2 + BLOCK_M * H * 4 < 24 * 1024 * 1024):
        from ..models.layers import layer_norm, linear

        xn = layer_norm(x, ln_w, ln_b, eps=LN_EPS)
        h = linear(xn, w1, b1, dtype=x.dtype)
        h = jax.nn.gelu(h, approximate=False)
        y = linear(h, w2, b2, dtype=x.dtype)
        return x + gamma.astype(y.dtype) * y
    out = _row_call(_mlp_tail_kernel, x.reshape(B * N, C),
                    (ln_w, ln_b, w1.astype(x.dtype), b1,
                     w2.astype(x.dtype), b2, gamma), C)
    return out.reshape(B, N, C)


def proj_mlp_tail(ctx, wp, bp, gamma1, res, ln_w, ln_b, w1, b1, w2, b2,
                  gamma2, *, use_pallas: bool = False):
    """y = x' + γ2 ⊙ fc2(GELU(fc1(LN(x')))) with
    x' = res + γ1 ⊙ (ctx @ Wpᵀ + bp): the whole post-attention half of a
    block fused so x' never touches HBM.  Falls back to the
    linear_residual → mlp_tail pair (identical numerics)."""
    B, N, C = ctx.shape
    H = w1.shape[0]
    if not (use_pallas and _FUSE_WHOLE_TAIL
            and jax.default_backend() == "tpu"
            and _shapes_ok(C, H, B * N) and wp.shape[0] % 128 == 0
            # weights (proj + fc1 + fc2) + the (BLOCK_M, H) f32 hidden
            and (2 * H * C + C * C) * 2 + BLOCK_M * H * 4
            < 24 * 1024 * 1024):
        x1 = linear_residual(ctx, wp, bp, gamma1, res,
                             use_pallas=use_pallas)
        return mlp_tail(x1, ln_w, ln_b, w1, b1, w2, b2, gamma2,
                        use_pallas=use_pallas)
    out = _row_call(_proj_mlp_kernel, ctx.reshape(B * N, C),
                    (wp.astype(ctx.dtype), bp, gamma1, ln_w, ln_b,
                     w1.astype(ctx.dtype), b1, w2.astype(ctx.dtype), b2,
                     gamma2),
                    C, extra_row_inputs=(res.reshape(B * N, C),))
    return out.reshape(B, N, C)


# --------------------------------------------------------------------------
# Training-path fused ops (VERDICT r3 #4): Pallas forward, XLA-recompute
# backward via custom_vjp — the same pairing ops/mlp.fused_mlp ships in
# production.  The backward's vjp target is the exact unfused train
# composition (mome._attn_part proj + residual + _mlp_part + residual),
# so gradients equal the unfused path's bit-for-bit off-TPU and to the
# kernels' bf16 rounding deltas on-chip.
# --------------------------------------------------------------------------


def _ln_linear_ref(x, ln_w, ln_b, w, b):
    """Unfused LN→linear exactly as mome's train path computes it."""
    from ..models.layers import layer_norm, linear

    return linear(layer_norm(x, ln_w, ln_b, eps=LN_EPS), w, b,
                  dtype=x.dtype)


@jax.custom_vjp
def ln_linear_train(x, ln_w, ln_b, w, b):
    """Differentiable LN1+qkv fusion for the training forward.

    Forward = the eval ``ln_linear`` Pallas kernel (LN output never
    touches HBM); backward = VJP of the unfused composition (recomputes
    LN+matmul in XLA — matching the surgical-remat policy's
    recompute-the-glue behavior)."""
    if jax.default_backend() == "tpu" or _INTERPRET:
        return ln_linear(x, ln_w, ln_b, w, b, use_pallas=True)
    return _ln_linear_ref(x, ln_w, ln_b, w, b)


def _ln_linear_train_fwd(x, ln_w, ln_b, w, b):
    return ln_linear_train(x, ln_w, ln_b, w, b), (x, ln_w, ln_b, w, b)


def _ln_linear_train_bwd(res, g):
    _, vjp = jax.vjp(_ln_linear_ref, *res)
    return vjp(g)


ln_linear_train.defvjp(_ln_linear_train_fwd, _ln_linear_train_bwd)


def _tail_reference(ctx, wp, bp, g1, res, ln_w, ln_b, w1, b1, w2, b2, g2):
    """XLA composition of the post-attention block half exactly as the
    unfused train path computes it (mome.block_forward's residual():
    proj output rounds to the block dtype before the per-batch
    effective-γ multiply; MLP via ops.mlp.reference_mlp).  g1/g2 are the
    (B, 1, C) effective gammas (γ ⊙ stochastic-depth scale)."""
    from ..models.layers import layer_norm, linear
    from .mlp import reference_mlp

    y = linear(ctx, wp, bp, dtype=ctx.dtype)
    x1 = res + y * g1.astype(y.dtype)
    xn = layer_norm(x1, ln_w, ln_b, eps=LN_EPS)
    y2 = reference_mlp(xn, w1, b1, w2, b2)
    return x1 + y2 * g2.astype(y2.dtype)


def _tail_train_kernel(x_ref, wp_ref, bp_ref, lnw_ref, lnb_ref, w1_ref,
                       b1_ref, w2_ref, b2_ref, g1_ref, g2_ref, res_ref,
                       o_ref):
    """Per-batch-element cell of the train tail: identical math to
    `_proj_mlp_kernel` but γ1/γ2 arrive as this element's (1, 1, C)
    effective scales (stochastic depth folded in)."""
    y = jax.lax.dot_general(
        x_ref[0], wp_ref[...], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)
    y = (y + bp_ref[...].astype(jnp.float32)) * g1_ref[0].astype(jnp.float32)
    x1 = (res_ref[0].astype(jnp.float32) + y).astype(x_ref.dtype)

    xn = _ln_f32(x1, lnw_ref, lnb_ref).astype(x_ref.dtype)
    h = jax.lax.dot_general(
        xn, w1_ref[...], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)
    h = _erf_gelu(h + b1_ref[...].astype(jnp.float32))
    y2 = jax.lax.dot_general(
        h.astype(x_ref.dtype), w2_ref[...], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)
    y2 = (y2 + b2_ref[...].astype(jnp.float32)) * g2_ref[0].astype(
        jnp.float32)
    o_ref[0] = (x1.astype(jnp.float32) + y2).astype(o_ref.dtype)


def _tail_train_pallas(ctx, wp, bp, g1, res, ln_w, ln_b, w1, b1, w2, b2,
                       g2):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    B, N, C = ctx.shape
    H1 = w1.shape[0]
    Np = _round_up(N, 16)
    if Np != N:
        ctx = jnp.pad(ctx, ((0, 0), (0, Np - N), (0, 0)))
        res = jnp.pad(res, ((0, 0), (0, Np - N), (0, 0)))

    def const(c):
        nd = c.ndim
        return pl.BlockSpec(c.shape, lambda bi, nd=nd: (0,) * nd,
                            memory_space=pltpu.VMEM)

    row = pl.BlockSpec((1, Np, C), lambda bi: (bi, 0, 0),
                       memory_space=pltpu.VMEM)
    gspec = pl.BlockSpec((1, 1, C), lambda bi: (bi, 0, 0),
                         memory_space=pltpu.VMEM)
    consts = (wp.astype(ctx.dtype), bp, ln_w, ln_b, w1.astype(ctx.dtype),
              b1, w2.astype(ctx.dtype), b2)
    out = pl.pallas_call(
        _tail_train_kernel,
        out_shape=jax.ShapeDtypeStruct((B, Np, C), ctx.dtype),
        grid=(B,),
        in_specs=[row] + [const(c) for c in consts] + [gspec, gspec, row],
        out_specs=row,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=_VMEM_LIMIT),
        cost_estimate=pl.CostEstimate(
            flops=2 * Np * C * (C + 2 * H1),
            transcendentals=Np * H1,
            bytes_accessed=3 * Np * C * 2 + (C * C + 2 * H1 * C) * 2),
        interpret=_INTERPRET,
    )(ctx, *consts, g1.astype(ctx.dtype), g2.astype(ctx.dtype), res)
    return out[:, :N] if Np != N else out


@jax.custom_vjp
def proj_mlp_tail_train(ctx, wp, bp, g1, res, ln_w, ln_b, w1, b1, w2, b2,
                        g2):
    """Differentiable post-attention block half for the training forward:
    proj + γ1·dp residual + LN2 + MLP + γ2·dp residual in one
    batch-gridded Pallas kernel (the intermediate x' and the (N, 4C)
    hidden never touch HBM).  g1/g2: (B, 1, C) effective gammas.
    Backward = VJP of `_tail_reference` (XLA recompute)."""
    B, N, C = ctx.shape
    H1 = w1.shape[0]
    ok = ((jax.default_backend() == "tpu" or _INTERPRET)
          and C % 128 == 0 and H1 % 128 == 0 and wp.shape[0] == C
          # per-cell VMEM: weights + (Np, H1) f32 hidden + 3 row blocks
          and (2 * H1 * C + C * C) * 2 + _round_up(N, 16) * H1 * 4
          + 6 * _round_up(N, 16) * C * 2 < 70 * 1024 * 1024)
    if not ok:
        return _tail_reference(ctx, wp, bp, g1, res, ln_w, ln_b, w1, b1,
                               w2, b2, g2)
    return _tail_train_pallas(ctx, wp, bp, g1, res, ln_w, ln_b, w1, b1,
                              w2, b2, g2)


def _tail_train_fwd(ctx, wp, bp, g1, res, ln_w, ln_b, w1, b1, w2, b2, g2):
    out = proj_mlp_tail_train(ctx, wp, bp, g1, res, ln_w, ln_b, w1, b1,
                              w2, b2, g2)
    return out, (ctx, wp, bp, g1, res, ln_w, ln_b, w1, b1, w2, b2, g2)


def _tail_train_bwd(saved, g):
    _, vjp = jax.vjp(_tail_reference, *saved)
    return vjp(g)


proj_mlp_tail_train.defvjp(_tail_train_fwd, _tail_train_bwd)


# --------------------------------------------------------------------------
# Whole-block megakernel: LN1+qkv+attention+proj+LN2+MLP in ONE kernel
# --------------------------------------------------------------------------

def _qkv_pair_ctx(xn, x_dtype, w3_ref, b3_ref, bias_ref, valid, j, h2,
                  scale):
    """Head-pair context band (bb, Np, 128) from VMEM-resident LN(x):
    project the pair's own 128 qkv columns (w3 is the qkv weight reshaped
    (3C/128, 128, C); b3 (3C/128, 1, 128) keeps the dynamically-indexed
    dim untiled) and run fused f32-logit attention.  SHARED by the staged
    LN+qkv+attention kernel (attention._ln_qkv_attn_kernel) and the
    whole-block megakernel — the rounding points here ARE the
    bit-equality contract between them and the split pipeline: qkv slices
    round to the block dtype exactly where ln_linear stores them to HBM,
    q scales in that dtype, logits/bias/mask/softmax are f32, and the
    context rounds like the packed kernel's output."""
    def proj(idx):
        y = jax.lax.dot_general(
            xn, w3_ref[idx], (((2,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)            # bb, Np, 128
        return (y + b3_ref[idx].astype(jnp.float32)).astype(x_dtype)

    q3, k3, v3 = proj(j), proj(h2 + j), proj(2 * h2 + j)
    outs = []
    for h in (0, 1):
        sl = slice(h * 64, (h + 1) * 64)
        q = q3[:, :, sl] * jnp.asarray(scale, q3.dtype)
        s = jax.lax.dot_general(
            q, k3[:, :, sl],
            dimension_numbers=(((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)            # bb, Np, Np
        s = s + bias_ref[2 * j + h][None]
        s = jnp.where(valid[:, None, :], s,
                      jnp.asarray(-jnp.inf, jnp.float32))
        p = jax.nn.softmax(s, axis=-1)
        o = jax.lax.dot_general(
            p.astype(v3.dtype), v3[:, :, sl],
            dimension_numbers=(((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)
        outs.append(o.astype(x_dtype))
    return jnp.concatenate(outs, axis=-1)


def _block_eval_kernel(x_ref, ln1w_ref, ln1b_ref, w3_ref, b3_ref, bias_ref,
                       mask_ref, wp_ref, bp_ref, g1_ref, ln2w_ref, ln2b_ref,
                       w1_ref, b1_ref, w2_ref, b2_ref, g2_ref,
                       o_ref, xn_ref, ctx_ref, *, scale: float, h2: int):
    """One batch-block cell computing an ENTIRE eval transformer block.

    Grid is (B/bb,): per cell, LN1(x) lands in the ``xn_ref`` scratch,
    a static loop over head pairs projects each pair's own 128 qkv
    columns from it (no FLOP duplication) and writes fused attention
    into the ``ctx_ref`` scratch, then the post-attention half
    (proj+LayerScale+residual+LN2+MLP+LayerScale+residual) runs per
    batch element.  The only HBM traffic per layer is the x read and
    the output write — qkv, ctx, x', and the MLP hidden all live and
    die in VMEM.  Rounding points are bit-identical to the
    ln_qkv_attention → proj_mlp_tail pipeline (and hence to the fully
    split kernels): qkv slices, ctx, x', and the fc1 output are rounded
    to the block dtype exactly where the split kernels store them."""
    x = x_ref[...]
    xn_ref[...] = _ln_f32(x, ln1w_ref, ln1b_ref).astype(x.dtype)
    xn = xn_ref[...]
    valid = mask_ref[:, 0] > 0                             # bb, Np

    for j in range(h2):                                    # static unroll
        ctx_ref[:, :, j * 128:(j + 1) * 128] = _qkv_pair_ctx(
            xn, x.dtype, w3_ref, b3_ref, bias_ref, valid, j, h2, scale)

    bb = x.shape[0]
    for i in range(bb):                                    # static unroll
        y = jax.lax.dot_general(
            ctx_ref[i], wp_ref[...], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)            # Np, C
        y = (y + bp_ref[...].astype(jnp.float32)) * g1_ref[...].astype(
            jnp.float32)
        x1 = (x_ref[i].astype(jnp.float32) + y).astype(x.dtype)
        xn2 = _ln_f32(x1, ln2w_ref, ln2b_ref).astype(x.dtype)
        hid = jax.lax.dot_general(
            xn2, w1_ref[...], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)            # Np, 4C
        hid = _erf_gelu(hid + b1_ref[...].astype(jnp.float32))
        y2 = jax.lax.dot_general(
            hid.astype(x.dtype), w2_ref[...], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)
        y2 = (y2 + b2_ref[...].astype(jnp.float32)) * g2_ref[...].astype(
            jnp.float32)
        o_ref[i] = (x1.astype(jnp.float32) + y2).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("scale", "num_heads",
                                             "block_b"))
def _pallas_block_eval(x, ln1_w, ln1_b, w_qkv, qkv_bias, bias, mask,
                       wp, bp, gamma1, ln2_w, ln2_b, w1, b1, w2, b2,
                       gamma2, scale: float, num_heads: int,
                       block_b: int = 4):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    B, Np, C = x.shape
    H2 = num_heads // 2
    H1 = w1.shape[0]
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
        return pl.BlockSpec(c.shape, lambda b, nd=nd: (0,) * nd,
                            memory_space=pltpu.VMEM)

    row = lambda shp: pl.BlockSpec(shp, lambda b: (b, 0, 0),  # noqa: E731
                                   memory_space=pltpu.VMEM)
    consts = (ln1_w, ln1_b, w3, b3, bias,)
    consts2 = (wp.astype(x.dtype), bp, gamma1, ln2_w, ln2_b,
               w1.astype(x.dtype), b1, w2.astype(x.dtype), b2, gamma2)
    out = pl.pallas_call(
        functools.partial(_block_eval_kernel, scale=scale, h2=H2),
        out_shape=jax.ShapeDtypeStruct((Bp, Np, C), x.dtype),
        grid=(Bp // block_b,),
        in_specs=[row((block_b, Np, C))]
                 + [const(c) for c in consts]
                 + [pl.BlockSpec((block_b, 1, Np), lambda b: (b, 0, 0),
                                 memory_space=pltpu.VMEM)]
                 + [const(c) for c in consts2],
        out_specs=row((block_b, Np, C)),
        scratch_shapes=[pltpu.VMEM((block_b, Np, C), x.dtype),
                        pltpu.VMEM((block_b, Np, C), x.dtype)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=110 * 1024 * 1024),
        cost_estimate=pl.CostEstimate(
            flops=2 * block_b * Np * C * (3 * C + C + 2 * H1)
            + 8 * block_b * Np * Np * (C // 128) * 64,
            transcendentals=block_b * Np * (Np * (C // 128) + H1),
            bytes_accessed=2 * block_b * Np * C * 2),
        interpret=_INTERPRET,
    )(x, *consts, mask, *consts2)
    if pad_b:
        out = out[:B]
    return out


def fused_eval_block(x, ln1_w, ln1_b, w_qkv, qkv_bias, bias, mask, scale,
                     num_heads, wp, bp, gamma1, ln2_w, ln2_b, w1, b1, w2,
                     b2, gamma2, *, use_pallas: bool = False):
    """One whole eval transformer block.  Routes to the single megakernel
    when ``VLM_TPU_FUSE_EVAL_BLOCK=1`` and the shapes fit, else to the
    staged pipeline (ln_qkv_attention → proj_mlp_tail), all three
    bit-identical."""
    from .attention import ln_qkv_attention

    B, Np, C = x.shape
    head_dim = C // num_heads
    H1 = w1.shape[0]
    # VMEM: 2 scratches + x + out (double-buffered) + logits tile + one
    # (Np, H1) f32 hidden + bias + weights must fit
    # (VLM_TPU_EVAL_BLOCK_BB lets the probe sweep the block size; an
    # unusable override raises instead of silently rerouting — a probe
    # labeling staged-pipeline timings as "mega bb=N" would corrupt the
    # perf record)
    def vmem_est(bb):
        return (6 * bb * Np * C * 2 + bb * Np * Np * 4 + Np * H1 * 4
                + num_heads * Np * Np * 4
                + (3 * C * C + C * C + 2 * H1 * C) * 2)

    # shrink the batch block until the cell fits (@384 lands on bb=4,
    # the VQA @480 image half Np=912 on bb=1).  Threshold calibrated
    # on-chip: at bb=8/Np=592 the estimator said 93 MB but Mosaic's real
    # scoped allocation was 118.3 MB (compile-time VMEM OOM at the 110 MB
    # cap) — the est undercounts double-buffering, so gate ~27% below
    # the budget.  bb=4 (est 66 MB) compiles and runs.
    bb = 4 if B % 4 == 0 else (2 if B % 2 == 0 else 1)
    while bb > 1 and vmem_est(bb) >= 70 * 1024 * 1024:
        bb //= 2
    bb_env = os.environ.get("VLM_TPU_EVAL_BLOCK_BB", "")
    if _FUSE_EVAL_BLOCK and bb_env:
        if not bb_env.isdigit() or B % int(bb_env):
            raise ValueError(
                f"VLM_TPU_EVAL_BLOCK_BB={bb_env!r} unusable: batch {B} "
                f"must be divisible by it")
        bb = int(bb_env)
    ok = (use_pallas and _FUSE_EVAL_BLOCK
          and (jax.default_backend() == "tpu" or _INTERPRET)
          and bias is not None and mask is not None
          and C % 128 == 0 and num_heads % 2 == 0 and head_dim == 64
          and Np % 16 == 0 and 256 <= Np <= 1024
          and w_qkv.shape == (3 * C, C) and H1 % 128 == 0
          and vmem_est(bb) < 70 * 1024 * 1024)
    if _FUSE_EVAL_BLOCK and bb_env and not ok \
            and vmem_est(bb) >= 70 * 1024 * 1024:
        raise ValueError(
            f"VLM_TPU_EVAL_BLOCK_BB={bb_env!r}: ~{vmem_est(bb) >> 20} MB "
            f"VMEM at bb={bb}, Np={Np} exceeds the budget")
    if not ok:
        ctx = ln_qkv_attention(x, ln1_w, ln1_b, w_qkv, qkv_bias, bias,
                               mask, scale, num_heads,
                               use_pallas=use_pallas)
        return proj_mlp_tail(ctx, wp, bp, gamma1, x, ln2_w, ln2_b, w1, b1,
                             w2, b2, gamma2, use_pallas=use_pallas)
    return _pallas_block_eval(
        x, ln1_w, ln1_b, w_qkv, qkv_bias, bias.astype(jnp.float32),
        mask.astype(jnp.int32), wp, bp, gamma1, ln2_w, ln2_b, w1, b1,
        w2, b2, gamma2, scale, num_heads, block_b=bb)
