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

    row_spec = pl.BlockSpec((BLOCK_M, C), lambda m: (m, 0),
                            memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((Mp, out_dim), x2d.dtype),
        grid=(Mp // BLOCK_M,),
        in_specs=[row_spec] + [const_spec(c) for c in consts]
                 + [row_spec] * len(extra_row_inputs),
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
