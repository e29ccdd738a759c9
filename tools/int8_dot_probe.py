#!/usr/bin/env python
"""Bare int8 dot in a Pallas kernel: is the 53%-of-peak int8 kernel rate
(tools/int8_kernel_probe.py) MXU-limited or VPU-serialization-limited?

Times three row-blocked kernels over (M=227328, C=768) x (O, C):
  a) int8 dot only (pre-quantized inputs, int32 out)       — MXU ceiling
  b) int8 dot + f32 dequant epilogue (what the i8 kernels do)
  c) quant + int8 dot + dequant (the full in-kernel pipeline)
and the bf16 dot for scale.  All chained on the previous output.

Run: python tools/int8_dot_probe.py [block_m]
"""
import functools
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

M, C, O = 384 * 592, 768, 3072


def main(block_m=512):
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    rng = np.random.RandomState(0)
    xq0 = jnp.asarray(rng.randint(-127, 128, (M, C), np.int8))
    x0 = jnp.asarray(rng.randn(M, C), jnp.bfloat16)
    wq = jnp.asarray(rng.randint(-127, 128, (O, C), np.int8))
    w = jnp.asarray(rng.randn(O, C) * 0.05, jnp.bfloat16)
    ws = jnp.asarray(rng.rand(O).astype(np.float32) * 1e-3)

    def call(kernel, x, out_dtype, *consts):
        def const_spec(c):
            nd = c.ndim
            return pl.BlockSpec(c.shape, lambda m, nd=nd: (0,) * nd,
                                memory_space=pltpu.VMEM)

        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((M, O), out_dtype),
            grid=(M // block_m,),
            in_specs=[pl.BlockSpec((block_m, C), lambda m: (m, 0),
                                   memory_space=pltpu.VMEM)]
                     + [const_spec(c) for c in consts],
            out_specs=pl.BlockSpec((block_m, O), lambda m: (m, 0),
                                   memory_space=pltpu.VMEM),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024),
        )(x, *consts)

    def k_dot_i8(x_ref, w_ref, o_ref):
        o_ref[...] = jax.lax.dot_general(
            x_ref[...], w_ref[...], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.int32)

    def k_dot_i8_deq(x_ref, w_ref, ws_ref, o_ref):
        y = jax.lax.dot_general(
            x_ref[...], w_ref[...], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.int32)
        o_ref[...] = (y.astype(jnp.float32)
                      * ws_ref[...].astype(jnp.float32)).astype(o_ref.dtype)

    def k_full(x_ref, w_ref, ws_ref, o_ref):
        from vl_merging_tpu.ops.int8 import _quant_rows

        q, s = _quant_rows(x_ref[...].astype(jnp.float32))
        y = jax.lax.dot_general(
            q, w_ref[...], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.int32)
        o_ref[...] = (y.astype(jnp.float32) * s
                      * ws_ref[...].astype(jnp.float32)).astype(o_ref.dtype)

    def k_dot_bf16(x_ref, w_ref, o_ref):
        o_ref[...] = jax.lax.dot_general(
            x_ref[...], w_ref[...], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32).astype(o_ref.dtype)

    # chains: output (M, O) -> next input (M, C) via a band slice +
    # nonlinear squeeze (the pallas_call is opaque to XLA, so slicing
    # cannot shrink the kernel's dot)
    @jax.jit
    def step_i8(xq):
        y = call(k_dot_i8, xq, jnp.int32, wq)
        return ((y[:, :C] >> 8) % 127).astype(jnp.int8)

    @jax.jit
    def step_i8_deq(xq):
        y = call(k_dot_i8_deq, xq, jnp.bfloat16, wq, ws)
        return jnp.clip(y[:, :C] * 64.0, -127, 127).astype(jnp.int8)

    @jax.jit
    def step_full(x):
        y = call(k_full, x, jnp.bfloat16, wq, ws)
        return jnp.tanh(y[:, :C] * 8.0).astype(jnp.bfloat16)

    @jax.jit
    def step_bf16(x):
        y = call(k_dot_bf16, x, jnp.bfloat16, w)
        return jnp.tanh(y[:, :C]).astype(jnp.bfloat16)

    fl = 2 * M * C * O

    def slope(fn, x0, iters=6):
        y = fn(x0)
        np.asarray(y.ravel()[:1])

        def run(k):
            t0 = time.time()
            z = x0
            for _ in range(k):
                z = fn(z)
            np.asarray(z.ravel()[:1])
            return time.time() - t0

        t1 = run(iters)
        t3 = run(3 * iters)
        return (t3 - t1) / (2 * iters)

    for name, fn, x in (("bf16 dot", step_bf16, x0),
                        ("int8 dot", step_i8, xq0),
                        ("int8 dot+dequant", step_i8_deq, xq0),
                        ("quant+int8+dequant", step_full, x0)):
        dt = slope(fn, x)
        print(f"{name} bm={block_m}: {dt*1e3:.2f} ms ({fl/dt/1e12:.1f} T/s)",
              flush=True)


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 512)
