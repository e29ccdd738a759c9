#!/usr/bin/env python
"""Parity + tower perf for the fused proj_mlp_tail kernel.

The split eval pipeline stores the post-attention residual x' to HBM and
re-reads it for the MLP half (2 × (B,N,C) ≈ 0.7 GB/layer at ViT-B @384
B384).  proj_mlp_tail fuses proj+LayerScale+residual+LN+MLP+LayerScale+
residual into one row-blocked kernel; x' (rounded to bf16 exactly like
the split pair stores it) never leaves VMEM.

1. parity: proj_mlp_tail fused vs the linear_residual→mlp_tail pair.
2. tower: infer_image_ft at B384 (house chained timing); baseline at
   the same config: 1190 img/s (BENCH r3 run, tools/eval_attrib3).
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

IMAGE_SIZE = 384
NB_KEY = "transformer.norm.bias"
BATCH = 384
ITERS = 6


def parity():
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from vl_merging_tpu.ops import fused_block as F

    B, Np, C = 16, 592, 768
    rng = np.random.RandomState(0)

    def t(shape, s=0.05, dtype=jnp.bfloat16):
        return jnp.asarray((rng.randn(*shape) * s).astype(np.float32)) \
            .astype(dtype)

    ctx = t((B, Np, C), 1.0)
    res = t((B, Np, C), 1.0)
    wp = t((C, C))
    bp = t((C,), 0.05, jnp.float32)
    g1 = t((C,), 0.1, jnp.float32)
    lnw = t((C,), 1.0, jnp.float32)
    lnb = t((C,), 0.05, jnp.float32)
    w1 = t((4 * C, C))
    b1 = t((4 * C,), 0.05, jnp.float32)
    w2 = t((C, 4 * C))
    b2 = t((C,), 0.05, jnp.float32)
    g2 = t((C,), 0.1, jnp.float32)

    fused = F.proj_mlp_tail(ctx, wp, bp, g1, res, lnw, lnb, w1, b1, w2,
                            b2, g2, use_pallas=True)
    x1 = F.linear_residual(ctx, wp, bp, g1, res, use_pallas=True)
    ref = F.mlp_tail(x1, lnw, lnb, w1, b1, w2, b2, g2, use_pallas=True)

    a = np.asarray(fused, np.float32)
    b = np.asarray(ref, np.float32)
    d = np.abs(a - b)
    bits = (a != b).mean()
    print(f"parity: max|Δ|={d.max():.6f} mismatch_frac={bits:.2e}",
          flush=True)
    assert d.max() <= 0.05, "fused proj_mlp_tail diverges"


def tower():
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from vl_merging_tpu.config import build_config
    from vl_merging_tpu.models import make_model_spec, init_params, model
    from vl_merging_tpu.models.mome import pallas_attention
    from vl_merging_tpu.train.loop import eval_cast_params

    cfg = build_config(
        "task_finetune_irtr_coco_square_randaug_base_image384", "ufo",
        overrides={"precision": "bf16"})
    spec = make_model_spec(cfg)
    params = eval_cast_params(init_params(spec, seed=0), spec, cfg)

    @jax.jit
    def tower_fn(p, image, norm_bias):
        p = dict(p)
        p[NB_KEY] = norm_bias
        with pallas_attention(True):
            return model.infer_image_ft(p, spec, {"image": image})[
                "cls_feats"]

    rng = np.random.RandomState(0)
    image = jnp.asarray(
        rng.randn(BATCH, 3, IMAGE_SIZE, IMAGE_SIZE)
        .astype(np.float32)).astype(jnp.bfloat16)

    def chained_bias(feats):
        return params[NB_KEY] + (feats[0, 0] * 0).astype(
            params[NB_KEY].dtype)

    t0 = time.time()
    feats = tower_fn(params, image, params[NB_KEY])
    np.asarray(feats[:1, :1])
    print(f"compile {time.time() - t0:.0f}s", flush=True)
    feats = tower_fn(params, image, chained_bias(feats))
    np.asarray(feats[:1, :1])
    t0 = time.time()
    for _ in range(ITERS):
        feats = tower_fn(params, image, chained_bias(feats))
    np.asarray(feats[:1, :1])
    dt = time.time() - t0
    print(f"tower B{BATCH}: {dt / ITERS * 1e3:.1f} ms/dispatch "
          f"{BATCH * ITERS / dt:.1f} img/s", flush=True)


if __name__ == "__main__":
    which = sys.argv[1:] or ["parity", "tower"]
    if "parity" in which:
        parity()
    if "tower" in which:
        tower()
