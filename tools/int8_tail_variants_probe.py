#!/usr/bin/env python
"""Attribute the int8 proj_mlp_tail kernel's gap to MXU speed-of-light.

MXU floor at (B=384, N=592) ViT-B shapes: 2.41 TFLOP @ 373 TOP/s =
6.5 ms; production kernel measured 10.7 ms (226 T/s).  Suspects: the
erf-gelu transcendental on the (bm, 3072) hidden (exp + recip + ~15
flops/elt), the three per-row quantization passes, and the f32 LN.

Variants (kernel copies with one knob each — probe-only code):
  prod        — ops/int8._proj_mlp_i8_kernel as shipped
  relu        — erf-gelu -> relu (isolates the transcendental cost)
  poly        — erf-gelu -> degree-8 even-polynomial gelu (no exp/recip)
  noquant     — activations NOT quantized (int8 weights vs f32 acts is
                invalid math; times the quant passes by their absence:
                dot runs bf16xint8->f32 on the MXU)

Run: python tools/int8_tail_variants_probe.py [variant ...]
"""
import functools
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

B, N, C, H = 384, 592, 768, 3072


def slope(fn, x0, iters=6):
    x = fn(x0)
    np.asarray(x.ravel()[:1])

    def run(k):
        t0 = time.time()
        y = x0
        for _ in range(k):
            y = fn(y)
        np.asarray(y.ravel()[:1])
        return time.time() - t0

    t1 = run(iters)
    t3 = run(3 * iters)
    return (t3 - t1) / (2 * iters)


def main():
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from vl_merging_tpu.ops import int8 as i8
    from vl_merging_tpu.ops.fused_block import _VMEM_LIMIT, _ln_f32
    from vl_merging_tpu.ops.mlp import _erf_gelu

    rng = np.random.RandomState(0)
    f = lambda *s: jnp.asarray(rng.randn(*s).astype(np.float32))  # noqa
    x0 = f(B, N, C).astype(jnp.bfloat16)
    ln_w, ln_b = f(C), f(C) * 0.1
    wp = f(C, C) * 0.05
    pq, ps = i8.quantize_weight(wp)
    bp = f(C) * 0.1
    g1, g2 = f(C) * 0.1, f(C) * 0.1
    w1 = f(H, C) * 0.05
    w1q, w1s = i8.quantize_weight(w1)
    b1 = f(H) * 0.1
    w2 = f(C, H) * 0.05
    w2q, w2s = i8.quantize_weight(w2)
    b2 = f(C) * 0.1

    # degree-8 even polynomial for gelu(x)/x - 0.5 = 0.5*erf(x/sqrt2)/x,
    # i.e. gelu(x) = x*(0.5 + x*P(x^2)) with P fitted on |x|<=6 (probe
    # quality only — a production fit would be minimax)
    xs = np.linspace(-6, 6, 4001)
    import math
    ref = np.array([0.5 * math.erf(v / math.sqrt(2)) for v in xs])
    # fit odd function erf(x/sqrt2)*0.5 ~ x*P(x^2): LSQ on powers 0..3
    A = np.stack([xs * (xs ** 2) ** k for k in range(4)], axis=1)
    coef, *_ = np.linalg.lstsq(A, ref, rcond=None)

    def poly_gelu(x):
        xc = jnp.clip(x, -6.0, 6.0)
        x2 = xc * xc
        p = ((coef[3] * x2 + coef[2]) * x2 + coef[1]) * x2 + coef[0]
        return x * (0.5 + xc * p) + 0.5 * (x - xc) * jnp.sign(x)

    def make_kernel(act, quantize):
        def kernel(x_ref, pq_ref, ps_ref, bp_ref, g1_ref, lnw_ref,
                   lnb_ref, w1q_ref, w1s_ref, b1_ref, w2q_ref, w2s_ref,
                   b2_ref, g2_ref, res_ref, o_ref):
            def dot(a, w):
                if quantize:
                    q, s = i8._quant_rows(a.astype(jnp.float32))
                    y = i8._dot_i8(q, w[...]).astype(jnp.float32) * s
                else:
                    y = jax.lax.dot_general(
                        a.astype(jnp.bfloat16), w[...],
                        (((a.ndim - 1,), (1,)), ((), ())),
                        preferred_element_type=jnp.float32)
                return y

            y = dot(x_ref[...], pq_ref) * ps_ref[...].astype(jnp.float32)
            y = (y + bp_ref[...].astype(jnp.float32)) \
                * g1_ref[...].astype(jnp.float32)
            x1 = (res_ref[...].astype(jnp.float32) + y).astype(x_ref.dtype)
            xn = _ln_f32(x1, lnw_ref, lnb_ref)
            h = dot(xn, w1q_ref) * w1s_ref[...].astype(jnp.float32)
            h = act(h + b1_ref[...].astype(jnp.float32))
            y2 = dot(h, w2q_ref) * w2s_ref[...].astype(jnp.float32)
            y2 = (y2 + b2_ref[...].astype(jnp.float32)) \
                * g2_ref[...].astype(jnp.float32)
            o_ref[...] = (x1.astype(jnp.float32) + y2).astype(o_ref.dtype)
        return kernel

    def call(kernel, x):
        x2d = x.reshape(B * N, C)
        consts = (pq, ps, bp, g1, ln_w, ln_b, w1q, w1s, b1, w2q, w2s,
                  b2, g2)

        def const_spec(c):
            nd = c.ndim
            return pl.BlockSpec(c.shape, lambda m, nd=nd: (0,) * nd,
                                memory_space=pltpu.VMEM)

        bm = i8.BLOCK_M
        row_spec = pl.BlockSpec((bm, C), lambda m: (m, 0),
                                memory_space=pltpu.VMEM)
        out = pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((B * N, C), x2d.dtype),
            grid=(B * N // bm,),
            in_specs=[row_spec] + [const_spec(c) for c in consts]
                     + [row_spec],
            out_specs=row_spec,
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=_VMEM_LIMIT),
        )(x2d, *consts, x2d)
        return out.reshape(B, N, C)

    @jax.jit
    def prod(x):
        return i8.proj_mlp_tail_i8(x, pq, ps, bp, g1, x, ln_w, ln_b,
                                   w1q, w1s, b1, w2q, w2s, b2, g2,
                                   use_pallas=True)

    variants = {
        "prod": prod,
        "relu": jax.jit(functools.partial(
            call, make_kernel(lambda v: jnp.maximum(v, 0.0), True))),
        "poly": jax.jit(functools.partial(
            call, make_kernel(poly_gelu, True))),
        "gelu_noquant": jax.jit(functools.partial(
            call, make_kernel(_erf_gelu, False))),
        "relu_noquant": jax.jit(functools.partial(
            call, make_kernel(lambda v: jnp.maximum(v, 0.0), False))),
    }
    only = sys.argv[1:] or None
    fl = 2 * B * N * (C * C + 2 * C * H)
    for name, fn in variants.items():
        if only and not any(o in name for o in only):
            continue
        dt = slope(fn, x0)
        print(f"tail {name} [bm={i8.BLOCK_M}]: {dt*1e3:.2f} ms "
              f"({fl/dt/1e12:.1f} T/s)", flush=True)

    # poly-gelu accuracy vs erf-gelu at representative scales
    h = np.random.RandomState(1).randn(4096).astype(np.float32) * 3
    a = np.asarray(_erf_gelu(jnp.asarray(h)))
    b = np.asarray(poly_gelu(jnp.asarray(h)))
    print(f"poly_gelu max|err| {np.abs(a-b).max():.2e} "
          f"mean {np.abs(a-b).mean():.2e}")


if __name__ == "__main__":
    main()
