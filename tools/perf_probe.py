"""TPU perf probes for the retrieval-eval tower (scratch tool).

Run: python tools/perf_probe.py [probe ...]
Probes: roofline dispatch tower tower_noppallas tower_bf16params
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def _sync(r):
    # block_until_ready does not flush the axon tunnel; a tiny fetch does
    import jax
    leaf = jax.tree_util.tree_leaves(r)[0]
    np.asarray(leaf.ravel()[:1])


def _run(fn, iters):
    t0 = time.time()
    r = None
    for _ in range(iters):
        r = fn()
    _sync(r)
    return time.time() - t0


def timeit(fn, iters=8, warmup=2):
    """Slope timing: (t(3n) - t(n)) / 2n cancels the tunnel's fixed
    sync-fetch RTT that would otherwise inflate short runs."""
    for _ in range(warmup):
        r = fn()
    _sync(r)
    t1 = _run(fn, iters)
    t3 = _run(fn, 3 * iters)
    return (t3 - t1) / (2 * iters)


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    probes = sys.argv[1:] or ["roofline", "dispatch", "tower"]

    if "roofline" in probes:
        for m in (4096, 8192):
            a = jnp.zeros((m, m), jnp.bfloat16)
            b = jnp.zeros((m, m), jnp.bfloat16)
            f = jax.jit(lambda a, b: a @ b)
            dt = timeit(lambda: f(a, b), iters=16)
            print(f"roofline bf16 {m}x{m}: {2*m**3/dt/1e12:.1f} TF/s ({dt*1e3:.2f} ms)")
        a = jnp.zeros((4096, 4096), jnp.float32)
        f = jax.jit(lambda a, b: a @ b)
        dt = timeit(lambda: f(a, a), iters=16)
        print(f"roofline f32 4096: {2*4096**3/dt/1e12:.1f} TF/s")
        # HBM BW probe: big copy
        x = jnp.zeros((512, 1024, 1024), jnp.float32)  # 2 GB
        g = jax.jit(lambda x: x + 1.0)
        dt = timeit(lambda: g(x), iters=4)
        print(f"hbm rw 2GiB+2GiB: {2*x.nbytes/dt/1e9:.0f} GB/s ({dt*1e3:.1f} ms)")

    if "dispatch" in probes:
        x = jnp.zeros((8, 8), jnp.float32)
        f = jax.jit(lambda x: x + 1.0)
        f(x).block_until_ready()
        t0 = time.time()
        n = 50
        r = x
        for _ in range(n):
            r = f(r)
        r.block_until_ready()
        print(f"dispatch chained x{n}: {(time.time()-t0)/n*1e3:.2f} ms/call")
        t0 = time.time()
        outs = [f(x) for _ in range(n)]
        jax.block_until_ready(outs)
        print(f"dispatch parallel x{n}: {(time.time()-t0)/n*1e3:.2f} ms/call")

    if any(p.startswith("tower") for p in probes):
        from vl_merging_tpu.config import build_config
        from vl_merging_tpu.models import make_model_spec, init_params, model
        from vl_merging_tpu.models.mome import pallas_attention

        cfg = build_config(
            "task_finetune_irtr_coco_square_randaug_base_image384", "ufo",
            overrides={"precision": "bf16"})
        spec = make_model_spec(cfg)
        params = init_params(spec, seed=0)
        rng = np.random.RandomState(0)

        def make_tower(use_pallas, bs):
            @jax.jit
            def tower(p, image):
                with pallas_attention(use_pallas):
                    return model.infer_image_ft(p, spec, {"image": image})["cls_feats"]
            img = jnp.asarray(rng.randn(bs, 3, 384, 384).astype(np.float32))
            return tower, img

        for probe in probes:
            if probe == "tower":
                for bs in (64, 128):
                    f, img = make_tower(True, bs)
                    dt = timeit(lambda: f(params, img), iters=8)
                    print(f"tower pallas B{bs}: {bs/dt:.0f} img/s  ({dt*1e3:.1f} ms)")
            elif probe == "tower_nopallas":
                f, img = make_tower(False, 64)
                dt = timeit(lambda: f(params, img), iters=8)
                print(f"tower XLA B64: {64/dt:.0f} img/s  ({dt*1e3:.1f} ms)")
            elif probe == "tower_bf16params":
                p16 = {k: (v.astype(jnp.bfloat16)
                           if v.dtype == jnp.float32 and v.ndim >= 2 else v)
                       for k, v in params.items()}
                f, img = make_tower(True, 64)
                dt = timeit(lambda: f(p16, img), iters=8)
                print(f"tower pallas B64 bf16 params: {64/dt:.0f} img/s  ({dt*1e3:.1f} ms)")

    print("done")


if __name__ == "__main__":
    main()


def components():
    """Per-op timings at the tower's shapes (B64, N640 padded, bf16).

    Every probe CHAINS iterations (output feeds the next input) — the
    tunnel elides or dedupes repeated identical computations whose
    results are never fetched, so independent same-input loops measure
    fantasy numbers."""
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    from vl_merging_tpu.ops.attention import _pallas_attention_bb, reference_attention
    from vl_merging_tpu.ops.mlp import fused_mlp

    B, H, N, d, C = 64, 12, 640, 64, 768
    rng = np.random.RandomState(0)
    q0 = jnp.asarray(rng.randn(B, H, N, d), jnp.bfloat16)
    bias = jnp.asarray(rng.randn(H, N, N), jnp.float32)
    mask = jnp.ones((B, N), jnp.int32)
    x0 = jnp.asarray(rng.randn(B, N, C), jnp.bfloat16)
    w1 = jnp.asarray(rng.randn(4 * C, C) * 0.02, jnp.bfloat16)
    b1 = jnp.zeros((4 * C,), jnp.bfloat16)
    w2 = jnp.asarray(rng.randn(C, 4 * C) * 0.02, jnp.bfloat16)
    b2 = jnp.zeros((C,), jnp.bfloat16)
    wqkv = jnp.asarray(rng.randn(3 * C, C) * 0.02, jnp.bfloat16)

    def chain_time(step, x_init, iters=30):
        x = x_init
        for _ in range(2):
            x = step(x)
        _sync(x)
        t0 = time.time()
        x1 = x
        for _ in range(iters):
            x1 = step(x1)
        _sync(x1)
        t1 = time.time() - t0
        x2 = x
        t0 = time.time()
        for _ in range(3 * iters):
            x2 = step(x2)
        _sync(x2)
        t3 = time.time() - t0
        return (t3 - t1) / (2 * iters)

    pa = jax.jit(lambda q: _pallas_attention_bb(
        q, q, q, bias, mask, 0.125, block_b=4).astype(jnp.bfloat16))
    dt = chain_time(pa, q0)
    print(f"pallas attn (B64,N640): {dt*1e3:.2f} ms/layer -> x12 = {dt*12e3:.1f} ms")

    ra = jax.jit(lambda q: reference_attention(
        q, q, q, bias, mask, 0.125).astype(jnp.bfloat16))
    dt = chain_time(ra, q0)
    print(f"XLA attn    (B64,N640): {dt*1e3:.2f} ms/layer -> x12 = {dt*12e3:.1f} ms")

    fm = jax.jit(lambda x: fused_mlp(x, w1, b1, w2, b2, use_pallas=True))
    dt = chain_time(fm, x0)
    print(f"fused mlp pallas:       {dt*1e3:.2f} ms/layer")
    fx = jax.jit(lambda x: fused_mlp(x, w1, b1, w2, b2, use_pallas=False))
    dt = chain_time(fx, x0)
    print(f"mlp XLA:                {dt*1e3:.2f} ms/layer")

    qk = jax.jit(lambda x: jnp.einsum("bnc,oc->bno", x, wqkv)[..., :C])
    dt = chain_time(qk, x0)
    gf = 2 * B * N * C * 3 * C / 1e9
    print(f"qkv matmul:             {dt*1e3:.2f} ms ({gf/dt/1e3:.0f} TF/s)")

    table0 = jnp.asarray(rng.randn(3000, H * 12), jnp.float32)
    idx = jnp.asarray(rng.randint(0, 3000, (N, N)))
    gather = jax.jit(
        lambda t: t + jnp.transpose(t[idx], (2, 0, 1))[0, :3000 // N + 1, :].sum() * 0)
    dt = chain_time(gather, table0)
    print(f"bias gather (12L worth): {dt*1e3:.2f} ms")

    ln = jax.jit(lambda x: (x + 0.1 * (x * 2)).astype(jnp.bfloat16))
    dt = chain_time(ln, x0)
    print(f"elementwise resid:      {dt*1e3:.2f} ms")


if "components" in sys.argv:
    components()


def attn_composite():
    """Where do the 9.6 ms/layer go? Time attention composites in context."""
    import functools

    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    from vl_merging_tpu.ops.attention import _pallas_attention_bb

    B, H, N, C, d = 64, 12, 577, 768, 64
    Np = 640
    rng = np.random.RandomState(0)
    x0 = jnp.asarray(rng.randn(B, N, C), jnp.bfloat16)
    xp0 = jnp.asarray(rng.randn(B, Np, C), jnp.bfloat16)
    wqkv = jnp.asarray(rng.randn(3 * C, C) * 0.02, jnp.bfloat16)
    wproj = jnp.asarray(rng.randn(C, C) * 0.02, jnp.bfloat16)
    bias = jnp.asarray(rng.randn(H, Np, Np), jnp.float32)
    maskp = jnp.asarray(np.arange(Np)[None, :] < N, jnp.int32) * jnp.ones((B, 1), jnp.int32)

    def chain_time(step, x_init, iters=30):
        x = x_init
        for _ in range(2):
            x = step(x)
        _sync(x)
        t0 = time.time(); x1 = x
        for _ in range(iters):
            x1 = step(x1)
        _sync(x1); t1 = time.time() - t0
        t0 = time.time(); x2 = x
        for _ in range(3 * iters):
            x2 = step(x2)
        _sync(x2); t3 = time.time() - t0
        return (t3 - t1) / (2 * iters)

    def composite(x, padded):
        n = x.shape[1]
        qkv = jax.lax.dot_general(x, wqkv, (((2,), (1,)), ((), ())),
                                  preferred_element_type=x.dtype)
        qkv = qkv.reshape(x.shape[0], n, 3, H, d)
        qkv = jnp.transpose(qkv, (2, 0, 3, 1, 4))
        q, k, v = qkv[0], qkv[1], qkv[2]
        b_ = bias if padded else bias[:, :n, :n]
        m_ = maskp if padded else maskp[:, :n]
        o = _pallas_attention_bb(q, k, v, b_, m_, 0.125, block_b=4)
        o = jnp.transpose(o, (0, 2, 1, 3)).reshape(x.shape[0], n, C)
        return jax.lax.dot_general(o, wproj, (((2,), (1,)), ((), ())),
                                   preferred_element_type=x.dtype)

    f577 = jax.jit(functools.partial(composite, padded=False))
    dt = chain_time(f577, x0)
    print(f"attn composite N=577 (pad in op): {dt*1e3:.2f} ms/layer")

    f640 = jax.jit(functools.partial(composite, padded=True))
    dt = chain_time(f640, xp0)
    print(f"attn composite N=640 (prepadded): {dt*1e3:.2f} ms/layer")

    # matmuls only (qkv + proj at N=640), no attention/transposes
    def mm_only(x):
        qkv = jax.lax.dot_general(x, wqkv, (((2,), (1,)), ((), ())),
                                  preferred_element_type=x.dtype)
        return jax.lax.dot_general(
            qkv[..., :C] + qkv[..., C:2*C] + qkv[..., 2*C:], wproj,
            (((2,), (1,)), ((), ())), preferred_element_type=x.dtype)
    fmm = jax.jit(mm_only)
    dt = chain_time(fmm, xp0)
    print(f"qkv+proj matmuls only N=640:      {dt*1e3:.2f} ms/layer")

    # transposes only
    def tr_only(x):
        qkv = jnp.concatenate([x, x, x], -1).reshape(x.shape[0], x.shape[1], 3, H, d)
        qkv = jnp.transpose(qkv, (2, 0, 3, 1, 4))
        o = jnp.transpose(qkv[0], (0, 2, 1, 3)).reshape(x.shape)
        return o + qkv[1].sum() * 0
    ftr = jax.jit(tr_only)
    dt = chain_time(ftr, xp0)
    print(f"qkv transposes only N=640:        {dt*1e3:.2f} ms/layer")


if "attn_composite" in sys.argv:
    attn_composite()
