#!/usr/bin/env python
"""eval_attrib round 3: amortize the 7.26 ms/call dispatch floor.

One jit call per batch pays ~7.3 ms of tunnel arg-marshalling for the
~300-leaf params dict (tools/eval_attrib2_probe.py) — 6.5% of a B128
pass that a real PCIe-attached host would not pay.  A serving loop
processes the whole eval shard per dispatch: lax.scan over K
device-resident sub-batches inside ONE jit call.

    scan8_b128    scan over 8×B128  (1024 images/dispatch)
    scan4_b256    scan over 4×B256
    scan16_b128   scan over 16×B128
All with bf16 pre-cast params + bf16 image feed (measured wins).
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
    params = jax.tree.map(
        lambda x: x.astype(jnp.bfloat16)
        if isinstance(x, jax.Array) and x.dtype == jnp.float32 else x, params)

    def run(name, K, B, iters=3):
        @jax.jit
        def tower_scan(p, images, norm_bias):
            p = dict(p)
            p[NB_KEY] = norm_bias

            def body(carry, img):
                with pallas_attention(True):
                    f = model.infer_image_ft(p, spec,
                                             {"image": img})["cls_feats"]
                return carry, f

            _, feats = jax.lax.scan(body, 0, images)
            return feats.reshape(K * B, -1)

        rng = np.random.RandomState(0)
        images = jnp.asarray(
            rng.randn(K, B, 3, IMAGE_SIZE, IMAGE_SIZE)
            .astype(np.float32)).astype(jnp.bfloat16)

        def chained_bias(feats):
            return params[NB_KEY] + (feats[0, 0] * 0).astype(
                params[NB_KEY].dtype)

        t0 = time.time()
        feats = tower_scan(params, images, params[NB_KEY])
        np.asarray(feats[:1, :1])
        compile_s = time.time() - t0
        feats = tower_scan(params, images, chained_bias(feats))
        np.asarray(feats[:1, :1])
        t0 = time.time()
        for _ in range(iters):
            feats = tower_scan(params, images, chained_bias(feats))
        np.asarray(feats[:1, :1])
        dt = time.time() - t0
        ips = K * B * iters / dt
        print(f"{name:14s} {dt / iters * 1e3:8.1f} ms/dispatch "
              f"{ips:8.1f} img/s   (compile {compile_s:.0f}s)", flush=True)

    run("scan8_b128", 8, 128)
    run("scan4_b256", 4, 256)
    run("scan16_b128", 16, 128, iters=2)


if __name__ == "__main__":
    main()
