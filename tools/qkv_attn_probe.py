#!/usr/bin/env python
"""On-chip parity + tower perf for the fused LN+qkv+attention kernel
(ops/attention._pallas_ln_qkv_attention, gate VLM_TPU_FUSE_LN_QKV_ATTN).

The split eval pipeline materializes the packed qkv tensor in HBM
(write by ln_linear + read by the attention kernel ≈ 2 × B·Np·3C bytes
per layer ≈ 5 MB/img/layer at ViT-B @384 — the largest remaining
intermediate).  The fused kernel computes each head-pair's 128 qkv
columns in-cell from a VMEM-scratch LN(x), with the full rel-pos bias
VMEM-resident.

1. parity: fused kernel vs the ln_linear→packed pair ON CHIP (real
   Mosaic lowering, not interpret) — must be bit-equal.
2. tower: infer_image_ft B384 with the fusion OFF then ON (house
   chained timing; OFF ≈ the bench baseline at HEAD).
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


def _cfg_jax():
    import jax

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    return jax


def parity():
    jax = _cfg_jax()
    import jax.numpy as jnp

    from vl_merging_tpu.ops import attention as A

    B, Np, C, H = 16, 592, 768, 12
    scale = 64 ** -0.5
    rng = np.random.RandomState(0)

    def t(shape, s=0.5, dtype=jnp.bfloat16):
        return jnp.asarray((rng.randn(*shape) * s).astype(np.float32)) \
            .astype(dtype)

    x = t((B, Np, C), 1.0)
    lnw, lnb = t((C,), 1.0, jnp.float32), t((C,), 0.05, jnp.float32)
    wqkv = t((3 * C, C), 0.05)
    qkvb = t((3 * C,), 0.05, jnp.float32)
    bias = t((H, Np, Np), 0.5, jnp.float32)
    mask = np.ones((B, Np), np.int32)
    mask[:, 577:] = 0
    mask = jnp.asarray(mask)
    args = (x, lnw, lnb, wqkv, qkvb, bias, mask, scale, H)

    A._FUSE_LN_QKV_ATTN = True
    fused = np.asarray(A.ln_qkv_attention(*args, use_pallas=True),
                       np.float32)
    A._FUSE_LN_QKV_ATTN = False
    pair = np.asarray(A.ln_qkv_attention(*args, use_pallas=True),
                      np.float32)
    d = np.abs(fused[:, :577] - pair[:, :577])
    print(f"parity: max|Δ|={d.max():.6f} "
          f"bit_equal={bool((fused[:, :577] == pair[:, :577]).all())}",
          flush=True)
    assert d.max() <= 0.05, "fused ln_qkv_attention diverges"


def tower():
    jax = _cfg_jax()
    import jax.numpy as jnp

    from vl_merging_tpu.config import build_config
    from vl_merging_tpu.models import make_model_spec, init_params, model
    from vl_merging_tpu.models.mome import pallas_attention
    from vl_merging_tpu.ops import attention as A
    from vl_merging_tpu.train.loop import eval_cast_params

    cfg = build_config(
        "task_finetune_irtr_coco_square_randaug_base_image384", "ufo",
        overrides={"precision": "bf16"})
    spec = make_model_spec(cfg)
    params = eval_cast_params(init_params(spec, seed=0), spec, cfg)

    rng = np.random.RandomState(0)
    image = jnp.asarray(
        rng.randn(BATCH, 3, IMAGE_SIZE, IMAGE_SIZE)
        .astype(np.float32)).astype(jnp.bfloat16)

    def chained_bias(feats):
        return params[NB_KEY] + (feats[0, 0] * 0).astype(
            params[NB_KEY].dtype)

    for fuse in (False, True):
        A._FUSE_LN_QKV_ATTN = fuse

        # fresh function object per flag value => fresh jit trace (the
        # flag is read at trace time inside ln_qkv_attention)
        @jax.jit
        def tower_fn(p, image, norm_bias):
            p = dict(p)
            p[NB_KEY] = norm_bias
            with pallas_attention(True):
                return model.infer_image_ft(p, spec, {"image": image})[
                    "cls_feats"]

        t0 = time.time()
        feats = tower_fn(params, image, params[NB_KEY])
        np.asarray(feats[:1, :1])
        print(f"fuse={fuse} compile {time.time() - t0:.0f}s", flush=True)
        feats = tower_fn(params, image, chained_bias(feats))
        np.asarray(feats[:1, :1])
        t0 = time.time()
        for _ in range(ITERS):
            feats = tower_fn(params, image, chained_bias(feats))
        np.asarray(feats[:1, :1])
        dt = time.time() - t0
        print(f"fuse={fuse} tower B{BATCH}: {dt / ITERS * 1e3:.1f} "
              f"ms/dispatch {BATCH * ITERS / dt:.1f} img/s", flush=True)


if __name__ == "__main__":
    which = sys.argv[1:] or ["parity", "tower"]
    if "parity" in which:
        parity()
    if "tower" in which:
        tower()
