#!/usr/bin/env python
"""Int8 MXU rate + W8A8 linear viability probe (VERDICT r3 #1b).

v5e datasheet: int8 MXU ~2x the bf16 rate (394 vs 197 TOPS).  The eval
tower spends ~536 of ~684 GF/layer in the qkv/proj/fc1/fc2 matmuls
(STATUS roofline), so a 2x on those is the only remaining
accuracy-parity-gated lever toward the 10x judge line.  This probe
answers, ON THIS CHIP:

  1. ``raw``: int8 x int8 -> int32 matmul rate vs bf16 at 4096^2.  The
     chain consumes the FULL output via a sum (a sliced chain lets XLA's
     slice-of-dot rewrite shrink the matmul — the first version of this
     probe "measured" 320 TF/s bf16 that way); operands are passed as
     donated args (closed-over device arrays ship as constants in the
     tunnel's remote-compile request — HTTP 413 at 8192^2).
  2. ``mlp``: an eval-shaped fc1/GELU/fc2 pair (C -> 4C -> C) where each
     iteration's output IS the next input (nothing sliceable, nothing
     dedupable): bf16 vs W8A8 (dynamic per-row activation quant +
     per-channel weight scales, XLA-only).  This is the decision number:
     does the 2x survive quant/dequant overhead without a custom kernel?

Methodology per CLAUDE.md: chained dispatches + slope timing
(t(3n)-t(n))/2n to cancel the fetch RTT.

MEASURED (r4, tools/logs/raw2.log; m=8192 is the trustworthy row — at
m=4096 the bf16 chain scalar CONVERGES in bf16 rounding, the steps become
bit-identical, and the tunnel dedupes them, "measuring" an impossible
296 TF/s):

    raw bf16 8192: 189.8 TF/s   (confirms the r2 191 TF/s peak)
    raw int8 8192: 373.1 TOP/s  (1.97x bf16 — REAL and available)
    raw f32  8192: 188.1 TF/s   (default-precision f32 dots run bf16)
    mlp-pair bf16 vs XLA-composed W8A8: 8.34 vs 9.68 ms — XLA-level
    dynamic quant LOSES; int8 must happen inside the Pallas kernels.

``scan`` is kept as a cautionary tale: same-input repeated runs get
elided by the tunnel (its "f32 388 TF/s" is fiction).

Run: python tools/int8_probe.py [raw] [mlp] [scan]
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def _chained(step, state, iters):
    t0 = time.time()
    for _ in range(iters):
        state = step(state)
    np.asarray(state[-1].ravel()[:1])
    return time.time() - t0, state


def slope_time(step, state, iters=8):
    """Chained slope timing; step: state -> state (last leaf syncs)."""
    _, state = _chained(step, state, 2)          # warm (post-compile)
    t1, state = _chained(step, state, iters)
    t3, state = _chained(step, state, 3 * iters)
    return (t3 - t1) / (2 * iters)


def probe_raw(jax, jnp, sizes=(4096,)):
    import functools

    from jax import lax

    for m in sizes:
        _probe_raw_m(jax, jnp, m)


def _probe_raw_m(jax, jnp, m):
    import functools

    from jax import lax

    for name, dt_acc in (("bf16", jnp.float32), ("int8", jnp.int32),
                         ("f32", jnp.float32)):
        rng = np.random.RandomState(0)
        if name == "int8":
            a = jnp.asarray(rng.randint(-127, 128, (m, m), np.int8))
            b = jnp.asarray(rng.randint(-127, 128, (m, m), np.int8))
        elif name == "f32":
            a = jnp.asarray(rng.randn(m, m), jnp.float32)
            b = jnp.asarray(rng.randn(m, m), jnp.float32)
        else:
            a = jnp.asarray(rng.randn(m, m), jnp.bfloat16)
            b = jnp.asarray(rng.randn(m, m), jnp.bfloat16)

        @functools.partial(jax.jit, donate_argnums=(1,))
        def step(a, b, s, dt_acc=dt_acc):
            # fold the chain scalar into one element of (donated) b —
            # in-place DUS, no copy; the sum consumes the FULL product so
            # nothing is sliceable
            b2 = b.at[0, 0].set(s.astype(b.dtype))
            y = lax.dot_general(a, b2, (((1,), (0,)), ((), ())),
                                preferred_element_type=dt_acc)
            # abs-sum: XLA distributes a LINEAR sum through the dot
            # (sum(ab) -> dot(sum a, sum b), O(m^2)) — abs blocks that
            if dt_acc == jnp.int32:
                nxt = (jnp.sum(jnp.abs(y), dtype=jnp.int32) % 113) \
                    .astype(jnp.int8)
            else:
                nxt = (jnp.sum(jnp.abs(y.astype(jnp.float32))) * 1e-9) \
                    .astype(b.dtype)
            return b2, nxt

        state = (b, a[0, 0])
        dt = slope_time(lambda st: step(a, *st), state, iters=16)
        unit = "TOP/s" if name == "int8" else "TF/s"
        print(f"raw {name} {m}x{m}: {2*m**3/dt/1e12:.1f} {unit}"
              f" ({dt*1e3:.3f} ms)", flush=True)


def probe_mlp(jax, jnp):
    """fc1 -> GELU -> fc2 pair at tower shapes; output chains to the next
    input, so every byte of every matmul output is consumed."""
    import functools

    from jax import lax

    M = 384 * 592 // 2           # half a B384 @384 token block
    C, H = 768, 3072
    rng = np.random.RandomState(1)
    x0 = jnp.asarray(rng.randn(M, C), jnp.bfloat16)
    w1 = jnp.asarray(rng.randn(H, C) * 0.03, jnp.bfloat16)
    w2 = jnp.asarray(rng.randn(C, H) * 0.03, jnp.bfloat16)
    w1q = jnp.asarray(np.clip(np.round(rng.randn(H, C) * 40), -127, 127),
                      jnp.int8)
    w2q = jnp.asarray(np.clip(np.round(rng.randn(C, H) * 40), -127, 127),
                      jnp.int8)
    s1 = jnp.asarray(rng.rand(H).astype(np.float32) * 1e-3)
    s2 = jnp.asarray(rng.rand(C).astype(np.float32) * 1e-3)

    def mm_bf16(x, w):
        return lax.dot_general(x, w, (((1,), (1,)), ((), ())),
                               preferred_element_type=jnp.float32)

    def mm_w8a8(x, wq, wscale):
        amax = jnp.max(jnp.abs(x.astype(jnp.float32)), axis=1,
                       keepdims=True)
        xscale = jnp.maximum(amax, 1e-6) / 127.0
        xq = jnp.clip(jnp.round(x.astype(jnp.float32) / xscale),
                      -127, 127).astype(jnp.int8)
        acc = lax.dot_general(xq, wq, (((1,), (1,)), ((), ())),
                              preferred_element_type=jnp.int32)
        return acc.astype(jnp.float32) * xscale * wscale[None, :]

    @functools.partial(jax.jit, donate_argnums=(0,))
    def step_bf16(x, w1, w2):
        h = jax.nn.gelu(mm_bf16(x, w1), approximate=False)
        y = mm_bf16(h.astype(jnp.bfloat16), w2)
        # keep values bounded so the chain never overflows
        return jnp.tanh(y * 1e-2).astype(jnp.bfloat16)

    @functools.partial(jax.jit, donate_argnums=(0,))
    def step_w8a8(x, w1q, s1, w2q, s2):
        h = jax.nn.gelu(mm_w8a8(x, w1q, s1), approximate=False)
        y = mm_w8a8(h.astype(jnp.bfloat16), w2q, s2)
        return jnp.tanh(y * 1e-2).astype(jnp.bfloat16)

    x0_np = np.asarray(x0)       # donated per variant — re-stage each
    flops = 2 * M * C * H * 2
    for name, step in (("bf16", lambda st: (step_bf16(st[0], w1, w2),)),
                       ("w8a8", lambda st: (step_w8a8(st[0], w1q, s1,
                                                      w2q, s2),))):
        dt = slope_time(step, (jnp.asarray(x0_np, jnp.bfloat16),), iters=6)
        print(f"mlp-pair {name} M={M}: {dt*1e3:.2f} ms "
              f"({flops/dt/1e12:.1f} T/s)", flush=True)


def probe_scan(jax, jnp):
    """Peak via an IN-GRAPH scan of K dependent matmuls: no dispatch, no
    host chain plumbing — iteration i+1's input is iteration i's output
    (cast in the matmul epilogue), so the MXU time is the only per-step
    cost.  Slope over K (t(K2)-t(K1))/(K2-K1) cancels even the in-graph
    fixed costs.  This arbitrates the raw-probe result (316 TF/s bf16)
    against the r2 perf_probe figure (191 TF/s) that the roofline story
    rests on."""
    import functools

    from jax import lax

    m = 4096
    rng = np.random.RandomState(0)
    for name in ("bf16", "int8", "f32"):
        if name == "int8":
            x0 = jnp.asarray(rng.randint(-127, 128, (m, m), np.int8))
            b = jnp.asarray(rng.randint(-127, 128, (m, m), np.int8))
        elif name == "f32":
            x0 = jnp.asarray(rng.randn(m, m), jnp.float32)
            b = jnp.asarray(rng.randn(m, m) * 0.01, jnp.float32)
        else:
            x0 = jnp.asarray(rng.randn(m, m), jnp.bfloat16)
            b = jnp.asarray(rng.randn(m, m) * 0.01, jnp.bfloat16)

        @functools.partial(jax.jit, static_argnames=("k",))
        def chain(x, b, k, name=name):
            def body(x, _):
                if name == "int8":
                    y = lax.dot_general(x, b, (((1,), (0,)), ((), ())),
                                        preferred_element_type=jnp.int32)
                    x2 = (y >> 7).astype(jnp.int8)
                else:
                    y = lax.dot_general(x, b, (((1,), (0,)), ((), ())),
                                        preferred_element_type=jnp.float32)
                    x2 = (y * 0.01).astype(x.dtype)
                return x2, ()
            x, _ = lax.scan(body, x, None, length=k)
            return x

        def run(k):
            t0 = time.time()
            out = chain(x0, b, k)
            np.asarray(out.ravel()[:1])
            return time.time() - t0

        run(4), run(12)                      # compile both signatures
        run(4)                               # warm
        t4 = min(run(4) for _ in range(3))
        t12 = min(run(12) for _ in range(3))
        dt = (t12 - t4) / 8
        unit = "TOP/s" if name == "int8" else "TF/s"
        print(f"scan-chain {name} {m}x{m}: {2*m**3/dt/1e12:.1f} {unit}"
              f" ({dt*1e3:.3f} ms/matmul)", flush=True)


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    probes = sys.argv[1:] or ["raw", "mlp"]
    print(f"devices: {jax.devices()}", flush=True)
    if "raw" in probes:
        probe_raw(jax, jnp)
    if "scan" in probes:
        probe_scan(jax, jnp)
    if "mlp" in probes:
        probe_mlp(jax, jnp)


if __name__ == "__main__":
    main()
