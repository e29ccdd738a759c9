#!/usr/bin/env python
"""eval_attrib round 2: settle the bench headline config (VERDICT r2 #5).

    dispatch    trivial jit fn taking the SAME ~300-leaf params dict —
                the per-call tunnel/arg-marshal floor
    noblk_b256  identity blocks at B256 — how the non-block floor scales
    combo       B256 + params pre-cast bf16 + bf16 image feed — the
                candidate new bench headline config
    combo_b384  same at B384
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

IMAGE_SIZE = 384
NB_KEY = "transformer.norm.bias"


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from vl_merging_tpu.config import build_config
    from vl_merging_tpu.models import make_model_spec, init_params, model
    from vl_merging_tpu.models.mome import pallas_attention

    cfg = build_config(
        "task_finetune_irtr_coco_square_randaug_base_image384", "ufo",
        overrides={"precision": "bf16"})
    spec = make_model_spec(cfg)
    params = init_params(spec, seed=0)
    params16 = jax.tree.map(
        lambda x: x.astype(jnp.bfloat16)
        if isinstance(x, jax.Array) and x.dtype == jnp.float32 else x, params)

    def chained(ps, fn, feats0_fn, batch, iters):
        def chained_bias(feats):
            return ps[NB_KEY] + (feats[0, 0] * 0).astype(ps[NB_KEY].dtype)

        feats = fn(ps, batch, ps[NB_KEY])
        np.asarray(feats[:1, :1])
        feats = fn(ps, batch, chained_bias(feats))
        np.asarray(feats[:1, :1])
        t0 = time.time()
        for _ in range(iters):
            feats = fn(ps, batch, chained_bias(feats))
        np.asarray(feats[:1, :1])
        return (time.time() - t0) / iters * 1e3

    # 1. dispatch floor: same arg pytree, near-zero compute
    @jax.jit
    def trivial(p, image, norm_bias):
        return (norm_bias + image[0, 0, 0, 0] * 0)[None, :]

    rng = np.random.RandomState(0)
    img128 = jnp.asarray(
        rng.randn(128, 3, IMAGE_SIZE, IMAGE_SIZE).astype(np.float32))
    ms = chained(params, trivial, None, img128, 32)
    print(f"dispatch      {ms:8.2f} ms/call", flush=True)

    # 2. identity blocks at B256
    real_block = model._block_apply
    model._block_apply = (lambda p, s, b, x, mask, bias_i, t, dp, rng_,
                          train, text_len=None: x)
    try:
        @jax.jit
        def tower_nb(p, image, norm_bias):
            p = dict(p)
            p[NB_KEY] = norm_bias
            with pallas_attention(True):
                return model.infer_image_ft(p, spec,
                                            {"image": image})["cls_feats"]
        img256 = jnp.asarray(
            rng.randn(256, 3, IMAGE_SIZE, IMAGE_SIZE).astype(np.float32))
        ms = chained(params, tower_nb, None, img256, 16)
        print(f"noblk_b256    {ms:8.2f} ms/pass  ({256 / ms * 1e3:7.1f} img/s)",
              flush=True)
    finally:
        model._block_apply = real_block

    # 3/4. combo: bf16 params + bf16 image feed
    @jax.jit
    def tower16(p, image, norm_bias):
        p = dict(p)
        p[NB_KEY] = norm_bias
        with pallas_attention(True):
            return model.infer_image_ft(p, spec,
                                        {"image": image})["cls_feats"]

    for B in (256, 384):
        img = jnp.asarray(rng.randn(B, 3, IMAGE_SIZE, IMAGE_SIZE)
                          .astype(np.float32)).astype(jnp.bfloat16)
        iters = max(4, 2048 // B)
        ms = chained(params16, tower16, None, img, iters)
        print(f"combo_b{B:<4d}   {ms:8.2f} ms/pass  ({B / ms * 1e3:7.1f} img/s)",
              flush=True)


if __name__ == "__main__":
    main()
