"""MoME (Mixture-of-Modality-Experts) transformer block.

Reimplements the three routing strategies of the reference ``Block``
(reference: src/vilt/modules/vision_transformer.py:366-691) as statically
specialized pure functions: ``type_id`` and the block's expert structure are
Python-level constants, so each (mode, type_id) pair compiles to its own
branch-free XLA graph.

Numerics follow the reference exactly: BEiT-style qkv bias (learnable q/v
bias, frozen zero k bias; vision_transformer.py:332-337), fp32 attention
logits with additive relative-position bias and -inf padding mask
(vision_transformer.py:346-355), LayerScale residuals (gamma_1/gamma_2),
and stochastic depth on both residual branches.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from .layers import drop_path, gelu, layer_norm, linear
from .spec import BlockSpec, ModelSpec, Params, V, L, VL
from .taps import tap_add

LN_EPS = 1e-6  # partial(nn.LayerNorm, eps=1e-6); vision_transformer.py:831

# Opt-in switch for the Pallas attention kernel (see ops/attention.py).
import contextlib as _contextlib
import contextvars as _contextvars

_USE_PALLAS = _contextvars.ContextVar("vlm_tpu_pallas_attn", default=False)


@_contextlib.contextmanager
def pallas_attention(enabled: bool = True):
    token = _USE_PALLAS.set(enabled)
    try:
        yield
    finally:
        _USE_PALLAS.reset(token)


def attention(
    params: Params,
    prefix: str,
    x: jax.Array,
    mask: Optional[jax.Array],
    rel_bias: Optional[jax.Array],
    num_heads: int,
    logits_dtype=jnp.float32,
) -> Tuple[jax.Array, Optional[jax.Array]]:
    """Multi-head self-attention with fp32 logits.

    x: (B, N, C); mask: (B, N) 1=valid; rel_bias: (heads, N, N) fp32.
    Returns (out (B,N,C), attn probs or None when the fused kernel ran).
    reference: vision_transformer.py:329-363.  The fused Pallas path
    (ops/attention.py) keeps the (N,N) logits in VMEM.
    """
    from ..ops.attention import (
        PACKED_MIN_N, fused_attention, packed_fused_attention)

    tap_add(prefix, x)  # gram tap: attention-module input (post-LN)
    B, N, C = x.shape
    head_dim = C // num_heads
    scale = head_dim ** -0.5

    q_bias = params[f"{prefix}.q_bias"]
    v_bias = params[f"{prefix}.v_bias"]
    qkv_bias = jnp.concatenate([q_bias, jnp.zeros_like(v_bias), v_bias])
    qkv = linear(x, params[f"{prefix}.qkv.weight"], qkv_bias, dtype=x.dtype)

    packed_ok = (
        _USE_PALLAS.get()
        and jax.default_backend() == "tpu"
        and N % 16 == 0 and N >= PACKED_MIN_N
        and head_dim == 64 and num_heads % 2 == 0
        and rel_bias is not None and mask is not None
        and logits_dtype == jnp.float32
    )
    if packed_ok:
        # packed kernel: no (B,N,3,H,d) transpose, context lands directly
        # in (B,N,C); callers pre-pad the sequence once (model._pad_seq)
        out = packed_fused_attention(qkv, rel_bias, mask, scale, num_heads)
        attn = None
    else:
        qkv = qkv.reshape(B, N, 3, num_heads, head_dim)
        qkv = jnp.transpose(qkv, (2, 0, 3, 1, 4))    # 3, B, H, N, hd
        q, k, v = qkv[0], qkv[1], qkv[2]
        out = fused_attention(q, k, v, rel_bias, mask, scale,
                              use_pallas=_USE_PALLAS.get(),
                              logits_dtype=logits_dtype)  # B, H, N, hd
        attn = None  # probs stay in VMEM; nothing consumes them numerically
        out = jnp.transpose(out, (0, 2, 1, 3)).reshape(B, N, C)

    tap_add(f"{prefix}.proj", out)  # gram tap: proj input (attn context)
    out = linear(out, params[f"{prefix}.proj.weight"],
                 params[f"{prefix}.proj.bias"], dtype=x.dtype)
    return out, attn


def mlp(params: Params, prefix: str, x: jax.Array) -> jax.Array:
    """fc1 → GELU → fc2 (dropout rate is 0 in all reference configs).

    Under the Pallas flag the fused kernel keeps the (M, 4C) hidden
    activations in VMEM (ops/mlp.py); gram taps force the unfused path
    since they need the fc2 input."""
    from ..ops.mlp import fused_mlp
    from .taps import _ACTIVE_TAP

    if _ACTIVE_TAP.get() is None:
        return fused_mlp(
            x, params[f"{prefix}.fc1.weight"], params[f"{prefix}.fc1.bias"],
            params[f"{prefix}.fc2.weight"], params[f"{prefix}.fc2.bias"],
            use_pallas=_USE_PALLAS.get())
    tap_add(f"{prefix}.fc1", x)
    h = gelu(linear(x, params[f"{prefix}.fc1.weight"],
                    params[f"{prefix}.fc1.bias"], dtype=x.dtype))
    tap_add(f"{prefix}.fc2", h)
    return linear(h, params[f"{prefix}.fc2.weight"],
                  params[f"{prefix}.fc2.bias"], dtype=x.dtype)


_TASK_OF_TYPE = {V: "v", L: "l", VL: "vl"}


def _ln(params: Params, p: str, name: str, x: jax.Array) -> jax.Array:
    tap_add(f"{p}.{name}", x)  # gram tap: norm input (ufo RegMean path)
    return layer_norm(x, params[f"{p}.{name}.weight"],
                      params[f"{p}.{name}.bias"], eps=LN_EPS)


def apply_ln(
    params: Params, p: str, base: str, expert: bool, b: BlockSpec,
    type_id: int, x: jax.Array, text_len: int,
) -> jax.Array:
    """Per-modality or shared LayerNorm (vision_transformer.py:495-523)."""
    if not expert:
        return _ln(params, p, base, x)
    if type_id in (V, L) or (type_id == VL and b.has_vl):
        return _ln(params, p, f"{base}.{_TASK_OF_TYPE[type_id]}", x)
    # fused input without a vl expert: per-modality LN on each half
    x_text = _ln(params, p, f"{base}.l", x[:, :text_len])
    x_imag = _ln(params, p, f"{base}.v", x[:, text_len:])
    return jnp.concatenate([x_text, x_imag], axis=1)


def _attn_part(
    params: Params, p: str, b: BlockSpec, x: jax.Array,
    mask: Optional[jax.Array], rel_bias: Optional[jax.Array],
    type_id: int, spec: ModelSpec, text_len: int,
) -> Tuple[jax.Array, jax.Array]:
    """Pre-norm + attention, returning the un-residualed branch output.

    Covers plain (:525-530), separate_plain (:560-584) and moe (:607-654)
    attention routing.
    """
    H = spec.num_heads
    ldt = jnp.bfloat16 if spec.attention_logits_dtype == "bf16" \
        else jnp.float32

    def attn(prefix, x_, m_, b_):
        return attention(params, prefix, x_, m_, b_, H, logits_dtype=ldt)

    def ln1(v):
        return apply_ln(params, p, "norm1", b.norm1_experts, b, type_id, v,
                        text_len)

    # NOTE: the split-per-modality cases (separate_plain :560-605, moe
    # self_attn_for_single_mode :619-637) never reach here — block_forward
    # recurses on the two halves as type-L/type-V blocks instead.
    if b.kind == "moe" and b.attn_experts:
        if type_id in (V, L) or (type_id == VL and b.has_vl):
            t = _TASK_OF_TYPE[type_id]
            return attn(f"{p}.attn.{t}", ln1(x), mask, rel_bias)
        # both experts over all tokens, re-concat each modality's half (:639-649)
        _x = ln1(x)
        ot, at = attn(f"{p}.attn.l", _x, mask, rel_bias)
        oi, ai = attn(f"{p}.attn.v", _x, mask, rel_bias)
        out = jnp.concatenate([ot[:, :text_len], oi[:, text_len:]], axis=1)
        probs = None if at is None or ai is None else (at + ai) / 2
        return out, probs

    # shared attention weights, joint attention
    return attn(f"{p}.attn", ln1(x), mask, rel_bias)


def _mlp_part(
    params: Params, p: str, b: BlockSpec, x: jax.Array, type_id: int,
    text_len: int,
) -> jax.Array:
    def ln2(v):
        return apply_ln(params, p, "norm2", b.norm2_experts, b, type_id, v,
                        text_len)

    if b.kind == "moe" and b.mlp_experts:
        if type_id in (V, L) or (type_id == VL and b.has_vl):
            t = _TASK_OF_TYPE[type_id]
            return mlp(params, f"{p}.mlp.{t}", ln2(x))
        _x = ln2(x)
        ht = mlp(params, f"{p}.mlp.l", _x[:, :text_len])
        hi = mlp(params, f"{p}.mlp.v", _x[:, text_len:])
        return jnp.concatenate([ht, hi], axis=1)

    # (sep_plain VL-without-vl is handled by block_forward's per-half
    # recursion; the reference's split shared MLP :588-601 is numerically
    # identical to running the halves separately)
    return mlp(params, f"{p}.mlp", ln2(x))


def _single_expert_suffix(b: BlockSpec, type_id: int, which: str):
    """Expert-name suffix when this (block, type_id) routes through exactly
    one attention/mlp/LN call; None when the sequence must be split."""
    experts = {"attn": b.attn_experts, "mlp": b.mlp_experts,
               "norm1": b.norm1_experts, "norm2": b.norm2_experts}[which]
    if not experts:
        return ""
    if type_id in (V, L) or (type_id == VL and b.has_vl):
        return f".{_TASK_OF_TYPE[type_id]}"
    return None


def _block_fast(params, spec, b, x, mask, rel_bias, type_id, *, train):
    """Whole eval block through the fused kernels (ops/fused_block.py):
    LN1+qkv → packed attention → proj+LayerScale+residual+LN2+MLP+
    LayerScale+residual (one proj_mlp_tail kernel — the post-attention
    intermediate never touches HBM).  Returns None when any stage needs
    the split/expert-pair routing, a gram tap is active, training wants
    drop-path RNG, or the Pallas shapes don't apply."""
    from ..ops.fused_block import fused_eval_block
    from .taps import _ACTIVE_TAP

    N = x.shape[1]
    if (not _USE_PALLAS.get() or train or _ACTIVE_TAP.get() is not None
            or jax.default_backend() != "tpu"
            or N % 16 != 0 or N < 256 or rel_bias is None or mask is None
            or spec.attention_logits_dtype != "f32"
            or spec.num_heads % 2 != 0
            or spec.hidden_size // spec.num_heads != 64):
        return None
    sfx = {w: _single_expert_suffix(b, type_id, w)
           for w in ("attn", "mlp", "norm1", "norm2")}
    if any(v is None for v in sfx.values()):
        return None

    p = f"transformer.blocks.{b.index}"
    ap = f"{p}.attn{sfx['attn']}"
    mp = f"{p}.mlp{sfx['mlp']}"
    n1 = f"{p}.norm1{sfx['norm1']}"
    n2 = f"{p}.norm2{sfx['norm2']}"

    q_bias = params[f"{ap}.q_bias"]
    qkv_bias = jnp.concatenate(
        [q_bias, jnp.zeros_like(q_bias), params[f"{ap}.v_bias"]])
    scale = (spec.hidden_size // spec.num_heads) ** -0.5

    if spec.eval_int8 and f"{ap}.qkv.weight::int8" in params:
        # W8A8 eval mode (ops/int8.py): quantized companions were added
        # by quantize_eval_params; projections run int8 on the MXU at
        # ~2x the bf16 rate, attention keeps f32 logits
        from ..ops.int8 import fused_eval_block_i8

        def qw(name):
            return (params[f"{name}::int8"], params[f"{name}::scale8"])

        return fused_eval_block_i8(
            x, params[f"{n1}.weight"], params[f"{n1}.bias"],
            *qw(f"{ap}.qkv.weight"), qkv_bias, rel_bias, mask, scale,
            spec.num_heads, *qw(f"{ap}.proj.weight"),
            params[f"{ap}.proj.bias"], params[f"{p}.gamma_1"],
            params[f"{n2}.weight"], params[f"{n2}.bias"],
            *qw(f"{mp}.fc1.weight"), params[f"{mp}.fc1.bias"],
            *qw(f"{mp}.fc2.weight"), params[f"{mp}.fc2.bias"],
            params[f"{p}.gamma_2"], use_pallas=True)

    # One entry for the whole block; routes by env gate (bit-identical
    # everywhere): VLM_TPU_FUSE_EVAL_BLOCK=1 -> single megakernel,
    # VLM_TPU_FUSE_LN_QKV_ATTN=1 -> LN+qkv folded into attention, default
    # -> the measured ln_linear -> packed attention -> proj_mlp_tail.
    return fused_eval_block(
        x, params[f"{n1}.weight"], params[f"{n1}.bias"],
        params[f"{ap}.qkv.weight"], qkv_bias, rel_bias, mask, scale,
        spec.num_heads, params[f"{ap}.proj.weight"],
        params[f"{ap}.proj.bias"], params[f"{p}.gamma_1"],
        params[f"{n2}.weight"], params[f"{n2}.bias"],
        params[f"{mp}.fc1.weight"], params[f"{mp}.fc1.bias"],
        params[f"{mp}.fc2.weight"], params[f"{mp}.fc2.bias"],
        params[f"{p}.gamma_2"], use_pallas=True)


def _block_fast_train(params, spec, b, x, mask, rel_bias, type_id,
                      dp_scale, text_len, drop_path_rate, rng):
    """Training-forward fusion (opt-in via VLM_TPU_TRAIN_FUSION, VERDICT
    r3 #4): LN1+qkv through the differentiable `ln_linear_train` kernel
    ("full" level), attention through the production train dispatch
    (packed Pallas + fused VJP at N≥PACKED_MIN_N, XLA elsewhere), and the
    whole post-attention half through one `proj_mlp_tail_train` kernel
    with stochastic-depth scales folded into per-batch effective gammas.
    Backwards are XLA-recompute VJPs of the bit-matching unfused
    composition, so gradients equal the unfused path's.  Returns None
    when the routing/shape gates don't apply."""
    from ..ops import fused_block as fb
    from ..ops.attention import PACKED_MIN_N, fused_attention, \
        packed_fused_attention
    from .taps import _ACTIVE_TAP

    on_tpu = jax.default_backend() == "tpu" or fb._INTERPRET
    if (fb._TRAIN_FUSION == "0" or not on_tpu
            or _ACTIVE_TAP.get() is not None):
        return None
    if dp_scale is None:
        if drop_path_rate > 0.0 and rng is not None:
            return None  # legacy per-block drop-path RNG: keep unfused
        dp_scale = jnp.ones((2, x.shape[0]), jnp.float32)
    sfx = {w: _single_expert_suffix(b, type_id, w)
           for w in ("attn", "mlp", "norm1", "norm2")}
    if any(v is None for v in sfx.values()):
        return None

    B, N, C = x.shape
    H = spec.num_heads
    head_dim = C // H
    scale = head_dim ** -0.5
    ldt = jnp.bfloat16 if spec.attention_logits_dtype == "bf16" \
        else jnp.float32
    p = f"transformer.blocks.{b.index}"
    ap = f"{p}.attn{sfx['attn']}"
    mp = f"{p}.mlp{sfx['mlp']}"
    n1 = f"{p}.norm1{sfx['norm1']}"
    n2 = f"{p}.norm2{sfx['norm2']}"

    q_bias = params[f"{ap}.q_bias"]
    qkv_bias = jnp.concatenate(
        [q_bias, jnp.zeros_like(q_bias), params[f"{ap}.v_bias"]])
    if fb._TRAIN_FUSION == "full":
        qkv = fb.ln_linear_train(
            x, params[f"{n1}.weight"], params[f"{n1}.bias"],
            params[f"{ap}.qkv.weight"], qkv_bias)
    else:
        qkv = linear(
            layer_norm(x, params[f"{n1}.weight"], params[f"{n1}.bias"],
                       eps=LN_EPS),
            params[f"{ap}.qkv.weight"], qkv_bias, dtype=x.dtype)

    packed_ok = (
        _USE_PALLAS.get() and jax.default_backend() == "tpu"
        and N % 16 == 0 and N >= PACKED_MIN_N
        and head_dim == 64 and H % 2 == 0
        and rel_bias is not None and mask is not None
        and ldt == jnp.float32)
    if packed_ok:
        ctx = packed_fused_attention(qkv, rel_bias, mask, scale, H)
    else:
        qkv5 = jnp.transpose(qkv.reshape(B, N, 3, H, head_dim),
                             (2, 0, 3, 1, 4))
        out = fused_attention(qkv5[0], qkv5[1], qkv5[2], rel_bias, mask,
                              scale, use_pallas=_USE_PALLAS.get(),
                              logits_dtype=ldt)
        ctx = jnp.transpose(out, (0, 2, 1, 3)).reshape(B, N, C)

    def g_eff(s, gamma):
        g = params[gamma].astype(x.dtype)
        return dp_scale[s][:, None, None].astype(x.dtype) * g

    return fb.proj_mlp_tail_train(
        ctx, params[f"{ap}.proj.weight"], params[f"{ap}.proj.bias"],
        g_eff(0, f"{p}.gamma_1"), x,
        params[f"{n2}.weight"], params[f"{n2}.bias"],
        params[f"{mp}.fc1.weight"], params[f"{mp}.fc1.bias"],
        params[f"{mp}.fc2.weight"], params[f"{mp}.fc2.bias"],
        g_eff(1, f"{p}.gamma_2"))


def block_forward(
    params: Params,
    spec: ModelSpec,
    b: BlockSpec,
    x: jax.Array,
    mask: Optional[jax.Array],
    rel_bias: Optional[jax.Array],
    type_id: int,
    *,
    drop_path_rate: float = 0.0,
    rng: Optional[jax.Array] = None,
    train: bool = False,
    text_len: Optional[int] = None,
    dp_scale: Optional[jax.Array] = None,
) -> Tuple[jax.Array, jax.Array]:
    """One MoME block (vision_transformer.py:683-691 dispatch).

    ``dp_scale`` — optional precomputed (2, B) stochastic-depth scales
    (model._dp_scale_table); when given, the per-block drop_path rng is
    skipped entirely (the ~180 tiny RNG ops cost ~15 ms/step otherwise)."""
    p = f"transformer.blocks.{b.index}"
    # Fused sequences split at Block.max_text_len == config max_text_len
    # (vision_transformer.py:493, 510, 542); when the fused batch was built
    # with vl-truncated text (max_vl_text_len), infer the split from shape.
    # Callers running VL blocks on non-fused sequences (the image trunk's
    # vlffn re-run, possibly lane-padded) pass text_len explicitly.
    if text_len is None:
        text_len = spec.max_text_len
        if type_id == VL and x.shape[1] != text_len + spec.image_len:
            text_len = x.shape[1] - spec.image_len

    if type_id == VL and not b.has_vl and b.self_attn_single:
        # Split-per-modality block (separate_plain_forward :560-605, moe
        # self_attn_for_single_mode :619-637, moe-without-attn-experts
        # separate_inference :651-654): the computation is EXACTLY the
        # text half as a type-L block plus the image half as a type-V
        # block — same expert/LN routing, modality-local attention, shared
        # gamma/drop-path (same rng ⇒ identical per-sample masks).  The
        # recursion lets each half hit the fused Pallas fast path when its
        # (per-segment padded) length qualifies.
        xt, at = block_forward(
            params, spec, b, x[:, :text_len], None if mask is None
            else mask[:, :text_len], None if rel_bias is None
            else rel_bias[:, :text_len, :text_len], L,
            drop_path_rate=drop_path_rate, rng=rng, train=train,
            dp_scale=dp_scale)
        xi, ai = block_forward(
            params, spec, b, x[:, text_len:], None if mask is None
            else mask[:, text_len:], None if rel_bias is None
            else rel_bias[:, text_len:, text_len:], V,
            drop_path_rate=drop_path_rate, rng=rng, train=train,
            dp_scale=dp_scale)
        return jnp.concatenate([xt, xi], axis=1), ai

    r1 = r2 = None
    if train and rng is not None and dp_scale is None:
        r1, r2 = jax.random.split(rng)

    fast = _block_fast(params, spec, b, x, mask, rel_bias, type_id,
                       train=train)
    if fast is not None:
        return fast, None
    if train:
        fast = _block_fast_train(params, spec, b, x, mask, rel_bias,
                                 type_id, dp_scale, text_len,
                                 drop_path_rate, rng)
        if fast is not None:
            # same schedule-stability pin as the unfused train exit below
            return jax.lax.optimization_barrier(fast), None

    def residual(x, branch, gamma, s, r):
        g = params[gamma].astype(branch.dtype)
        if dp_scale is not None and train:
            # fold γ and the per-sample stochastic-depth scale into one
            # tiny (B, 1, C) operand so the big (B, N, C) tensor sees a
            # single broadcast multiply
            gs = dp_scale[s][:, None, None].astype(branch.dtype) * g
            return x + branch * gs
        return x + drop_path(g * branch, drop_path_rate, r, train)

    branch, attn_probs = _attn_part(params, p, b, x, mask, rel_bias, type_id,
                                    spec, text_len)
    x = residual(x, branch, f"{p}.gamma_1", 0, r1)

    branch2 = _mlp_part(params, p, b, x, type_id, text_len)
    x = residual(x, branch2, f"{p}.gamma_2", 1, r2)
    if train and (dp_scale is not None
                  or (rng is not None and drop_path_rate > 0.0)):
        # With stochastic depth active, XLA duplicates the scaled-residual
        # chains into multiple consumer fusions and the schedule
        # serializes — +15 ms/fwd at @224 B22.  Pinning the block output
        # once recovers it (62.4 vs 75.5 ms fwd, same cost-model flops;
        # tools/fwd224d/e probes).  Eval graphs fuse fine without it.
        x = jax.lax.optimization_barrier(x)
    return x, attn_probs
