"""Int8 (W8A8) eval kernels — the measured 2x MXU lever.

MEASURED on the dev v5e (tools/int8_probe.py, r4): int8 x int8 -> int32
matmuls run at 373 TOP/s vs the 190 TF/s bf16 peak — a true 1.97x — but
an XLA-composed dynamic-quant linear LOSES to bf16 (9.68 vs 8.34 ms: the
(M, C) f32 quantization round-trips through HBM).  So quantization lives
INSIDE the Pallas kernels: the LN output (already VMEM-resident) is
per-token abs-max-quantized in VMEM, contracted int8xint8->int32 on the
MXU against VMEM-resident per-output-channel int8 weights, and
dequantized in the epilogue.  Extra HBM traffic: zero.  Weight reads
HALVE (int8 vs bf16).

Scheme: symmetric per-output-channel int8 weights (absmax/127, exact
over the bf16 master), symmetric per-token dynamic int8 activations.
Attention is untouched (f32 logits, reference parity); only the
qkv/proj/fc1/fc2 projections — 536 of ~684 GF/layer — quantize.  The
MLP activation is the fma-only polynomial gelu (``ops.mlp._poly_gelu``,
max |Δ| 4.7e-5 vs exact erf): the hidden is int8-quantized immediately
after, so the deviation is two orders below the quantization step while
skipping the VPU exp+divide (tail kernel 11.3 → 9.4 ms measured).

This is an OPT-IN eval numerics mode (config ``eval_int8``), subject to
the same adopt-or-refute accuracy methodology as bf16-logits
(tools/int8_parity_probe.py: feature cosine, top-k rank flips at COCO
aspect).  The reference computes these matmuls in fp16/fp32
(reference: src/vilt/modules/vision_transformer.py:346-358) — BASELINE.md's
contract is ACCURACY parity (<=0.1 pt), not numerics parity.
"""

from __future__ import annotations

import functools
import os
import re
from typing import Dict, Tuple

import jax
import jax.numpy as jnp

from .fused_block import _VMEM_LIMIT, _ln_f32
from .mlp import (_erf_gelu, _poly11_gelu, _poly13_gelu, _poly_gelu,
                  _round_up)

_INTERPRET = False  # tests flip this to run the kernels off-TPU

# Row-block size for the int8 kernels (sweepable: tools/int8_kernel_probe)
BLOCK_M = int(os.environ.get("VLM_TPU_I8_BLOCK_M", "512"))

# GELU for the int8 MLP: the hidden is per-token quantized to int8 right
# after the activation, so the fma-only polynomial gelu (max |Δ| 4.7e-5
# vs exact erf — two orders below the quantization step) is numerically
# invisible here while skipping the VPU exp+divide that costs ~4 of the
# tail kernel's 11.7 ms (tools/logs/int8_tail_variants.log; A/B with
# VLM_TPU_I8_GELU=erf).  ref_* compositions use the SAME activation so
# the kernel-vs-composition tests and the CPU fallback stay exact twins.
# "poly11" (5-fma, max |Δ| 8.2e-4) measures 1735 vs 1653 img/s on the
# headline tower but its trained-margin gate shows 1/512 ir top-1 flips
# (−0.195 pts at probe scale, tools/logs/int8_trained_margin_poly11.log)
# vs deg-19's 0/512 — so it stays OPT-IN, not the default.
_GELU = {"erf": _erf_gelu, "poly11": _poly11_gelu,
         "poly13": _poly13_gelu}.get(
    os.environ.get("VLM_TPU_I8_GELU", "poly"), _poly_gelu)

# params-dict key suffixes for quantized companions of a ".weight" key
# ("::" cannot collide with reference state_dict names)
INT8_SUFFIX = "::int8"
SCALE_SUFFIX = "::scale8"

_QUANT_KEY_RE = re.compile(
    r"transformer\.blocks\.\d+\."
    r"(attn(\.(v|l|vl))?\.(qkv|proj)|mlp(\.(v|l|vl))?\.fc[12])\.weight$")


def quantize_weight(w) -> Tuple[jax.Array, jax.Array]:
    """Symmetric per-output-channel int8: w (O, C) torch layout ->
    (int8 (O, C), f32 scale (O,)).  Computed from the f32/bf16 master in
    f32; exact round-to-nearest."""
    w32 = jnp.asarray(w, jnp.float32)
    amax = jnp.max(jnp.abs(w32), axis=1)
    scale = jnp.maximum(amax, 1e-12) / 127.0
    q = jnp.clip(jnp.round(w32 / scale[:, None]), -127, 127) \
        .astype(jnp.int8)
    return q, scale


def quantize_eval_params(params: Dict, keys=None) -> Dict:
    """Add int8 companions for every block projection weight (or the
    explicit ``keys``).  Originals stay — checkpoint interop and the
    non-int8 paths are untouched."""
    out = dict(params)
    for k in (keys if keys is not None else list(params)):
        if keys is None and not _QUANT_KEY_RE.match(k):
            continue
        q, s = quantize_weight(params[k])
        out[k + INT8_SUFFIX] = q
        out[k + SCALE_SUFFIX] = s
    return out


def _quant_rows(x32: jax.Array) -> Tuple[jax.Array, jax.Array]:
    """Per-token symmetric int8: f32 (M, C) -> (int8 (M, C), f32 (M, 1)).

    No clip: scale = amax/127 bounds |x/scale| <= 127 by construction
    (round cannot push past 127.5), so the int8 cast is exact — the clip
    was pure VPU tax on the (M, 4C) hidden."""
    amax = jnp.max(jnp.abs(x32), axis=-1, keepdims=True)
    scale = jnp.maximum(amax, 1e-8) / 127.0
    q = jnp.round(x32 * (1.0 / scale)).astype(jnp.int8)
    return q, scale


def _dot_i8(q: jax.Array, wq: jax.Array) -> jax.Array:
    """(..., C) int8 @ (O, C) int8 -> (..., O) int32 on the MXU."""
    return jax.lax.dot_general(q, wq, (((q.ndim - 1,), (1,)), ((), ())),
                               preferred_element_type=jnp.int32)


# --------------------------------------------------------------------------
# jnp reference compositions (identical math; CPU fallback + kernel oracle)
# --------------------------------------------------------------------------

def ref_ln_linear_i8(x, ln_w, ln_b, wq, wscale, b):
    # LN stays f32 into the quantizer (no HBM boundary in the fused
    # kernel, so no bf16 rounding point — _ln_f32 in BOTH compositions)
    xn = _ln_f32(x, ln_w, ln_b)
    q, s = _quant_rows(xn)
    y = _dot_i8(q, wq).astype(jnp.float32)
    y = y * s * wscale[None, :].astype(jnp.float32) \
        + b.astype(jnp.float32)
    return y.astype(x.dtype)


def ref_proj_mlp_tail_i8(ctx, pq, ps, bp, gamma1, res, ln_w, ln_b,
                         w1q, w1s, b1, w2q, w2s, b2, gamma2):
    q, s = _quant_rows(ctx.astype(jnp.float32))
    y = _dot_i8(q, pq).astype(jnp.float32) * s * ps[None, :]
    y = (y + bp.astype(jnp.float32)) * gamma1.astype(jnp.float32)
    x1 = (res.astype(jnp.float32) + y).astype(ctx.dtype)

    xn = _ln_f32(x1, ln_w, ln_b)
    q1, s1 = _quant_rows(xn)
    h = _dot_i8(q1, w1q).astype(jnp.float32) * s1 * w1s[None, :]
    h = _GELU(h + b1.astype(jnp.float32))
    q2, s2 = _quant_rows(h)
    y2 = _dot_i8(q2, w2q).astype(jnp.float32) * s2 * w2s[None, :]
    y2 = (y2 + b2.astype(jnp.float32)) * gamma2.astype(jnp.float32)
    return (x1.astype(jnp.float32) + y2).astype(ctx.dtype)


# --------------------------------------------------------------------------
# Pallas kernels (row-blocked like fused_block's bf16 versions)
# --------------------------------------------------------------------------

def _ln_linear_i8_kernel(x_ref, lnw_ref, lnb_ref, wq_ref, ws_ref, b_ref,
                         o_ref):
    xn = _ln_f32(x_ref[...], lnw_ref, lnb_ref)            # f32, in VMEM
    q, s = _quant_rows(xn)
    y = _dot_i8(q, wq_ref[...]).astype(jnp.float32)
    y = y * s * ws_ref[...].astype(jnp.float32) \
        + b_ref[...].astype(jnp.float32)
    o_ref[...] = y.astype(o_ref.dtype)


def _proj_mlp_i8_kernel(x_ref, pq_ref, ps_ref, bp_ref, g1_ref, lnw_ref,
                        lnb_ref, w1q_ref, w1s_ref, b1_ref, w2q_ref,
                        w2s_ref, b2_ref, g2_ref, res_ref, o_ref):
    q, s = _quant_rows(x_ref[...].astype(jnp.float32))
    y = _dot_i8(q, pq_ref[...]).astype(jnp.float32) * s \
        * ps_ref[...].astype(jnp.float32)
    y = (y + bp_ref[...].astype(jnp.float32)) * g1_ref[...].astype(
        jnp.float32)
    x1 = (res_ref[...].astype(jnp.float32) + y).astype(x_ref.dtype)

    xn = _ln_f32(x1, lnw_ref, lnb_ref)
    q1, s1 = _quant_rows(xn)
    h = _dot_i8(q1, w1q_ref[...]).astype(jnp.float32) * s1 \
        * w1s_ref[...].astype(jnp.float32)
    h = _GELU(h + b1_ref[...].astype(jnp.float32))
    q2, s2 = _quant_rows(h)
    y2 = _dot_i8(q2, w2q_ref[...]).astype(jnp.float32) * s2 \
        * w2s_ref[...].astype(jnp.float32)
    y2 = (y2 + b2_ref[...].astype(jnp.float32)) * g2_ref[...].astype(
        jnp.float32)
    o_ref[...] = (x1.astype(jnp.float32) + y2).astype(o_ref.dtype)


def _row_call_i8(kernel, x2d, consts, out_dim, extra_row_inputs=()):
    """fused_block._row_call twin (int8 consts are fine there too, but the
    interpret flag lives here)."""
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


def ln_linear_i8(x, ln_w, ln_b, wq, wscale, b, *, use_pallas: bool = False):
    """y = dequant(quant(LN(x)) @ wqᵀ) + b; wq int8 (O, C), wscale (O,)."""
    B, N, C = x.shape
    O = wq.shape[0]
    if not ((use_pallas or _INTERPRET)
            and (jax.default_backend() == "tpu" or _INTERPRET)
            and _shapes_ok(C, O, B * N)):
        return ref_ln_linear_i8(x, ln_w, ln_b, wq, wscale, b)
    out = _row_call_i8(_ln_linear_i8_kernel, x.reshape(B * N, C),
                       (ln_w, ln_b, wq, wscale.astype(jnp.float32), b), O)
    return out.reshape(B, N, O)


def proj_mlp_tail_i8(ctx, pq, ps, bp, gamma1, res, ln_w, ln_b, w1q, w1s,
                     b1, w2q, w2s, b2, gamma2, *, use_pallas: bool = False):
    """Int8 twin of fused_block.proj_mlp_tail: the whole post-attention
    half with all three matmuls int8 and every intermediate in VMEM."""
    B, N, C = ctx.shape
    H = w1q.shape[0]
    if not ((use_pallas or _INTERPRET)
            and (jax.default_backend() == "tpu" or _INTERPRET)
            and _shapes_ok(C, H, B * N) and pq.shape[0] % 128 == 0
            # int8 weights + the (BLOCK_M, H) f32 hidden + quant copies
            and (2 * H * C + C * C) + BLOCK_M * H * 4 + BLOCK_M * H
            < 24 * 1024 * 1024):
        return ref_proj_mlp_tail_i8(ctx, pq, ps, bp, gamma1, res, ln_w,
                                    ln_b, w1q, w1s, b1, w2q, w2s, b2,
                                    gamma2)
    out = _row_call_i8(
        _proj_mlp_i8_kernel, ctx.reshape(B * N, C),
        (pq, ps.astype(jnp.float32), bp, gamma1, ln_w, ln_b,
         w1q, w1s.astype(jnp.float32), b1,
         w2q, w2s.astype(jnp.float32), b2, gamma2),
        C, extra_row_inputs=(res.reshape(B * N, C),))
    return out.reshape(B, N, C)


def fused_eval_block_i8(x, ln1_w, ln1_b, qkv_q, qkv_s, qkv_bias, bias,
                        mask, scale, num_heads, pq, ps, bp, gamma1,
                        ln2_w, ln2_b, w1q, w1s, b1, w2q, w2s, b2, gamma2,
                        *, use_pallas: bool = False, qk_int8=None):
    """One eval transformer block with int8 projections: ln_linear_i8
    (qkv) → packed attention → proj_mlp_tail_i8.  Attention logits are
    f32 (reference-parity numerics) unless the opt-in int8-QK mode is
    on (``qk_int8`` arg, default from VLM_TPU_I8_QK) — per-token int8
    q/k with a dequantizing scale outer product; softmax and the value
    contraction stay f32/bf16 (see attention._packed_kernel_i8qk)."""
    from .attention import packed_fused_attention

    if qk_int8 is None:
        qk_int8 = os.environ.get("VLM_TPU_I8_QK", "0") == "1"
    qkv = ln_linear_i8(x, ln1_w, ln1_b, qkv_q, qkv_s, qkv_bias,
                       use_pallas=use_pallas)
    ctx = packed_fused_attention(qkv, bias, mask, scale, num_heads,
                                 qk_int8=qk_int8)
    return proj_mlp_tail_i8(ctx, pq, ps, bp, gamma1, x, ln2_w, ln2_b,
                            w1q, w1s, b1, w2q, w2s, b2, gamma2,
                            use_pallas=use_pallas)
