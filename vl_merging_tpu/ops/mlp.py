"""Fused MLP kernel (fc1 → GELU → fc2) for TPU.

The transformer MLP writes its (M, 4C) hidden activations to HBM and reads
them back for fc2 — ~500 MB per ViT-B layer at B64 N640, the single
largest traffic term in the forward pass.  This kernel keeps both weight
matrices VMEM-resident across row-block grid steps and the hidden
activations entirely in VMEM: HBM traffic drops to x-in + out + weights.

Weights stay in torch layout ((out, in)); contraction indices avoid any
transpose.  GELU is exact (erf), matching torch nn.GELU
(reference: src/vilt/modules/vision_transformer.py:272-296).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

BLOCK_M = 256


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


def reference_mlp(x, w1, b1, w2, b2):
    """XLA path; x: (..., C); w1: (H, C); w2: (C, H) (torch layout)."""
    h = jax.nn.gelu(
        jax.lax.dot_general(x, w1.astype(x.dtype),
                            (((x.ndim - 1,), (1,)), ((), ())),
                            preferred_element_type=x.dtype)
        + b1.astype(x.dtype), approximate=False)
    return jax.lax.dot_general(h, w2.astype(x.dtype),
                               (((x.ndim - 1,), (1,)), ((), ())),
                               preferred_element_type=x.dtype) \
        + b2.astype(x.dtype)


def _erf_approx(x):
    """Abramowitz–Stegun 7.1.26 rational erf (|err| ≤ 1.5e-7 — far below
    bf16 activation resolution); Pallas TPU has no erf/erfc lowering."""
    p = 0.3275911
    a1, a2, a3, a4, a5 = (0.254829592, -0.284496736, 1.421413741,
                          -1.453152027, 1.061405429)
    ax = jnp.abs(x)
    t = 1.0 / (1.0 + p * ax)
    poly = ((((a5 * t + a4) * t + a3) * t + a2) * t + a1) * t
    y = 1.0 - poly * jnp.exp(-ax * ax)
    return jnp.sign(x) * y


def _erf_gelu(x):
    return 0.5 * x * (1.0 + _erf_approx(x * (2.0 ** -0.5)))


# Clip-saturated odd-polynomial gelu: erf(x/√2) ≈ u·P(u²) with
# u = clip(x, −T, T)/T, T = 4.5, P of degree 9 in u² (19 in x).  Fitted
# by LSQ on Chebyshev nodes with the endpoint eliminated so Σcₖ = 1
# EXACTLY — the saturated tails are gelu(x) = x (resp. 0) whose true
# error 0.5·|x|·erfc(|x|/√2) ≤ 1.5e-5 peaks at |x| = T and decays.
# Measured max |gelu_poly − gelu_erf| = 4.7e-5 over [−40, 40] with f32
# Horner evaluation (fit recipe: tools/int8_tail_variants_probe.py
# lineage; regenerate with numpy lstsq on 16001 Chebyshev nodes).
_GELU_POLY_T = 4.5
_GELU_POLY_COEF = (  # c₀..c₉, ascending odd powers of u
    3.590282846823918, -12.10273623182234, 36.461995337755816,
    -85.03475787176419, 152.33199218079585, -204.54489822051983,
    196.73375743149893, -126.45531926658512, 48.21324671368246,
    -8.1935629198655)


def _poly_gelu(x):
    """fma-only gelu for quantized/bf16 consumers: no exp, no divide —
    ~2.5× cheaper than _erf_gelu on the VPU (the erf tail kernel spends
    ~4 of 11.7 ms in the transcendental; tools/logs/int8_tail_variants
    .log).  Max abs deviation from exact erf-gelu 4.7e-5 — two orders
    below the int8 per-token quantization step (amax/127) and below one
    bf16 ulp of typical hidden magnitudes, so downstream int8/bf16
    rounding absorbs it."""
    u = jnp.clip(x, -_GELU_POLY_T, _GELU_POLY_T) * (1.0 / _GELU_POLY_T)
    u2 = u * u
    p = _GELU_POLY_COEF[-1]
    for c in _GELU_POLY_COEF[-2::-1]:
        p = p * u2 + c
    return 0.5 * x * (1.0 + u * p)


# Shorter variant for the int8 kernels: degree 11 in x (6 coefficients,
# 5 Horner fmas vs 9 above), T = 3.5.  Max |Δ| vs exact erf-gelu
# 8.2e-4 over [−8, 8] — still well under the int8 per-token quantization
# step of the hidden (amax/127), which immediately re-rounds the
# activation.  Same Σcₖ = 1 endpoint constraint ⇒ exact saturation.
_GELU_POLY11_T = 3.5
_GELU_POLY11_COEF = (  # c₀..c₅, ascending odd powers of u
    2.781156562, -5.458430753, 8.694525338, -8.887355099,
    5.116006695, -1.245902743)


def _poly11_gelu(x):
    """5-fma gelu (see _poly_gelu); max |Δ| 8.2e-4 vs exact erf-gelu.
    Opt-in for the int8 MLP via VLM_TPU_I8_GELU=poly11 (the hidden is
    int8-requantized right after, so the deviation stays below its
    rounding step); adopt-or-refute via tools/int8_trained_margin_probe."""
    u = jnp.clip(x, -_GELU_POLY11_T, _GELU_POLY11_T) \
        * (1.0 / _GELU_POLY11_T)
    u2 = u * u
    p = _GELU_POLY11_COEF[-1]
    for c in _GELU_POLY11_COEF[-2::-1]:
        p = p * u2 + c
    return 0.5 * x * (1.0 + u * p)


# Middle rung: degree 13 in x (7 coefficients, 6 Horner fmas), T = 3.95.
# poly11's 8.2e-4 error is DOMINATED by its clip point (the saturated
# tail's true error 0.5·|x|·erfc(|x|/√2) is 8.1e-4 at T = 3.5); one more
# coefficient affords T = 3.95 where the tail term is 1.5e-4 and an
# x-weighted LSQ (equalizing GELU error, not erf error) holds the
# polynomial ripple at the same level.  Max |Δ| vs exact erf-gelu
# 1.75e-4 over [−12, 12] in f32 Horner — 4.7× tighter than poly11 at
# one extra fma.  Same Σcₖ = 1 constraint ⇒ exact saturation.
_GELU_POLY13_T = 3.95
_GELU_POLY13_COEF = (  # c₀..c₆, ascending odd powers of u
    3.144041517, -7.974838082, 16.980673852, -24.785977463,
    23.048449174, -12.161256715, 2.748907717)


def _poly13_gelu(x):
    """6-fma gelu (see _poly_gelu); max |Δ| 1.75e-4 vs exact erf-gelu.
    Opt-in for the int8 MLP via VLM_TPU_I8_GELU=poly13;
    adopt-or-refute via tools/int8_trained_margin_probe."""
    u = jnp.clip(x, -_GELU_POLY13_T, _GELU_POLY13_T) \
        * (1.0 / _GELU_POLY13_T)
    u2 = u * u
    p = _GELU_POLY13_COEF[-1]
    for c in _GELU_POLY13_COEF[-2::-1]:
        p = p * u2 + c
    return 0.5 * x * (1.0 + u * p)


def _mlp_kernel(x_ref, w1_ref, b1_ref, w2_ref, b2_ref, o_ref):
    x = x_ref[...]                                       # bm, C
    h = jax.lax.dot_general(
        x, w1_ref[...], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)              # bm, H
    h = _erf_gelu(h + b1_ref[...].astype(jnp.float32))
    o = jax.lax.dot_general(
        h.astype(x.dtype), w2_ref[...], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)              # bm, C
    o_ref[...] = (o + b2_ref[...].astype(jnp.float32)).astype(o_ref.dtype)


@jax.jit
def _pallas_mlp(x2d, w1, b1, w2, b2):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    M, C = x2d.shape
    H = w1.shape[0]
    Mp = _round_up(M, BLOCK_M)
    if Mp != M:
        x2d = jnp.pad(x2d, ((0, Mp - M), (0, 0)))

    out = pl.pallas_call(
        _mlp_kernel,
        out_shape=jax.ShapeDtypeStruct((Mp, C), x2d.dtype),
        grid=(Mp // BLOCK_M,),
        in_specs=[
            pl.BlockSpec((BLOCK_M, C), lambda m: (m, 0),
                         memory_space=pltpu.VMEM),
            # weights/biases: constant index map → VMEM-resident across steps
            pl.BlockSpec((H, C), lambda m: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((H,), lambda m: (0,), memory_space=pltpu.VMEM),
            pl.BlockSpec((C, H), lambda m: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((C,), lambda m: (0,), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((BLOCK_M, C), lambda m: (m, 0),
                               memory_space=pltpu.VMEM),
        cost_estimate=pl.CostEstimate(
            flops=4 * BLOCK_M * C * H, transcendentals=BLOCK_M * H,
            bytes_accessed=(BLOCK_M * C * 2 + (H * C * 2 + H + C) * 2) * 2),
    )(x2d, w1, b1, w2, b2)
    return out[:M] if Mp != M else out


def _pallas_mlp_3d(x, w1, b1, w2, b2):
    B, N, C = x.shape
    out = _pallas_mlp(x.reshape(B * N, C), w1, b1, w2, b2)
    return out.reshape(B, N, C)


@jax.custom_vjp
def _pallas_mlp_diff(x, w1, b1, w2, b2):
    return _pallas_mlp_3d(x, w1, b1, w2, b2)


def _fwd(x, w1, b1, w2, b2):
    return _pallas_mlp_3d(x, w1, b1, w2, b2), (x, w1, b1, w2, b2)


def _bwd(res, g):
    x, w1, b1, w2, b2 = res
    _, vjp = jax.vjp(reference_mlp, x, w1, b1, w2, b2)
    return vjp(g)


_pallas_mlp_diff.defvjp(_fwd, _bwd)


def _kernel_ok(C: int, H: int, M: int) -> bool:
    # weights must tile cleanly and fit VMEM (2·H·C bf16 + hidden block)
    if C % 128 or H % 128 or M < BLOCK_M:
        return False
    vmem = 2 * H * C * 2 + BLOCK_M * (H * 4 + 4 * C * 2)
    return vmem < 14 * 1024 * 1024


def fused_mlp(x, w1, b1, w2, b2, use_pallas: bool = False):
    """x: (B, N, C); weights torch layout.  Pallas on TPU when shapes fit."""
    B, N, C = x.shape
    H = w1.shape[0]
    on_tpu = jax.default_backend() == "tpu"
    if not (use_pallas and on_tpu) or not _kernel_ok(C, H, B * N):
        return reference_mlp(x, w1, b1, w2, b2)
    return _pallas_mlp_diff(x, w1.astype(x.dtype), b1, w2.astype(x.dtype),
                            b2)
