#!/usr/bin/env python
"""Isolated int8-vs-bf16 kernel timings at tower shapes.

Attributes the end-to-end int8 gap (probe: 1520 img/s measured vs ~1770
expected from pure MXU arithmetic): times ln_linear / proj_mlp_tail and
their _i8 twins on (B=384, N=592) ViT-B shapes, chained + slope-timed.

Run: python tools/int8_kernel_probe.py
"""
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

B, N, C, H = 384, 592, 768, 3072


def slope(fn, x0, iters=6):
    x = fn(x0)
    np.asarray(x.ravel()[:1])            # compile+warm

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

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from vl_merging_tpu.ops import int8 as i8
    from vl_merging_tpu.ops.fused_block import ln_linear, proj_mlp_tail

    rng = np.random.RandomState(0)
    f = lambda *s: jnp.asarray(rng.randn(*s).astype(np.float32))  # noqa
    x0 = f(B, N, C).astype(jnp.bfloat16)
    ln_w, ln_b = f(C), f(C) * 0.1
    wq3 = f(3 * C, C) * 0.05
    q3, s3 = i8.quantize_weight(wq3)
    b3 = f(3 * C) * 0.1
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

    # chain: feed the (B, N, C)-shaped output back as x (qkv output is
    # (B, N, 3C) — slice a C band to keep the chain)
    @jax.jit
    def lnlin_bf16(x):
        y = ln_linear(x, ln_w, ln_b, wp.astype(jnp.bfloat16), bp,
                      use_pallas=True)
        return ln_linear(x, ln_w, ln_b, wq3.astype(jnp.bfloat16), b3,
                         use_pallas=True)[:, :, :C] + y * 0

    @jax.jit
    def lnlin_i8(x):
        y = i8.ln_linear_i8(x, ln_w, ln_b, pq, ps, bp, use_pallas=True)
        return i8.ln_linear_i8(x, ln_w, ln_b, q3, s3, b3,
                               use_pallas=True)[:, :, :C] + y * 0

    @jax.jit
    def tail_bf16(x):
        return proj_mlp_tail(x, wp.astype(jnp.bfloat16), bp, g1, x, ln_w,
                             ln_b, w1.astype(jnp.bfloat16), b1,
                             w2.astype(jnp.bfloat16), b2, g2,
                             use_pallas=True)

    @jax.jit
    def tail_i8(x):
        return i8.proj_mlp_tail_i8(x, pq, ps, bp, g1, x, ln_w, ln_b,
                                   w1q, w1s, b1, w2q, w2s, b2, g2,
                                   use_pallas=True)

    @jax.jit
    def lnqkv_bf16(x):
        return ln_linear(x, ln_w, ln_b, wq3.astype(jnp.bfloat16), b3,
                         use_pallas=True)[:, :, :C]

    @jax.jit
    def lnqkv_i8(x):
        return i8.ln_linear_i8(x, ln_w, ln_b, q3, s3, b3,
                               use_pallas=True)[:, :, :C]

    # FLOP counts per call (MACs*2)
    fl_lnlin = 2 * B * N * C * (3 * C + C)
    fl_qkv = 2 * B * N * C * 3 * C
    fl_tail = 2 * B * N * (C * C + 2 * C * H)
    cases = [("ln_qkv bf16", lnqkv_bf16, fl_qkv),
             ("ln_qkv int8", lnqkv_i8, fl_qkv),
             ("ln_linear(qkv+proj) bf16", lnlin_bf16, fl_lnlin),
             ("ln_linear(qkv+proj) int8", lnlin_i8, fl_lnlin),
             ("proj_mlp_tail bf16", tail_bf16, fl_tail),
             ("proj_mlp_tail int8", tail_i8, fl_tail)]
    only = sys.argv[1:] or None
    for name, fn, fl in cases:
        if only and not any(o in name for o in only):
            continue
        dt = slope(fn, x0)
        print(f"{name} [i8_bm={i8.BLOCK_M}]: {dt*1e3:.2f} ms "
              f"({fl/dt/1e12:.1f} T/s)", flush=True)


if __name__ == "__main__":
    main()
