#!/usr/bin/env python
"""@384 headline serving-loop probe: scan K sub-batches per dispatch.

The bench headline times ONE B384 image-tower pass per dispatch
(bench.py:time_tower).  Each dispatch pays (a) the tunnel/runtime
arg-marshalling floor (~7 ms measured for a ~300-leaf params dict,
tools/eval_attrib2_probe.py) and (b) the rel-pos bias gather (~4 ms),
which is loop-INVARIANT: scanning K device-resident sub-batches inside
one jit call lets XLA hoist it out of the while loop and pays the
dispatch floor once per K*B images.  At 317 ms (parity) / 255 ms (int8)
per B384 pass that bounds the win at ~3-4%.

    python tools/headline_scan_probe.py [variants]   # default: parity,int8

Timing follows CLAUDE.md tunnel methodology: every dispatch chains on
the previous output (norm-bias perturbation) so the tunnel cannot elide
repeats.  Prints scan-K img/s next to the K=1 (bench-style) control from
the same process/day so the comparison is weather-proof.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

NB_KEY = "transformer.norm.bias"
ITERS = int(os.environ.get("ITERS", "4"))


def main(variants=("parity", "int8")):
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from vl_merging_tpu.config import build_config
    from vl_merging_tpu.models import make_model_spec, init_params, model
    from vl_merging_tpu.models.mome import pallas_attention
    from vl_merging_tpu.train.loop import eval_cast_params

    B = int(os.environ.get("HS_B", "384"))
    K = int(os.environ.get("HS_K", "4"))

    params32 = None
    rng = np.random.RandomState(0)
    # one resident image pool reused by every variant (K*B @384 bf16
    # ~ 1.4 GB); sub-batch k = images[k]
    images = None

    for name in variants:
        cfg = build_config(
            "task_finetune_irtr_coco_square_randaug_base_image384",
            "ufo",
            overrides={"precision": "bf16", "eval_int8": name == "int8"})
        spec = make_model_spec(cfg)
        if params32 is None:
            params32 = init_params(spec, seed=0)
        params = eval_cast_params(params32, spec, cfg)
        if images is None:
            images = jnp.asarray(
                rng.randn(K, B, 3, 384, 384).astype(np.float32)
            ).astype(jnp.bfloat16)

        @jax.jit
        def tower_scan(p, images, norm_bias, spec=spec):
            p = dict(p)
            p[NB_KEY] = norm_bias

            def body(carry, img):
                with pallas_attention(True):
                    feats = model.infer_image_ft(
                        p, spec, {"image": img})["cls_feats"]
                return carry + feats[0, :8].astype(jnp.float32), None

            s, _ = jax.lax.scan(body, jnp.zeros((8,), jnp.float32), images)
            return s

        @jax.jit
        def tower_one(p, img, norm_bias, spec=spec):
            p = dict(p)
            p[NB_KEY] = norm_bias
            with pallas_attention(True):
                feats = model.infer_image_ft(
                    p, spec, {"image": img})["cls_feats"]
            return feats[0, :8].astype(jnp.float32)

        def chained_bias(s, p=params):
            return p[NB_KEY] + (s[0] * 0).astype(p[NB_KEY].dtype)

        # K=1 control (bench-style: one B384 pass per dispatch)
        t0 = time.time()
        s = tower_one(params, images[0], params[NB_KEY])
        np.asarray(s[:1])
        print(f"headline {name} K1 compile {time.time() - t0:.0f}s",
              flush=True)
        s = tower_one(params, images[0], chained_bias(s))
        np.asarray(s[:1])
        t0 = time.time()
        for i in range(ITERS * K):
            s = tower_one(params, images[i % K], chained_bias(s))
        np.asarray(s[:1])
        dt = time.time() - t0
        print(f"headline {name} K1xB{B}: {dt / (ITERS * K) * 1e3:.1f} "
              f"ms/dispatch {ITERS * K * B / dt:.1f} img/s", flush=True)

        # scan-K serving loop
        t0 = time.time()
        s = tower_scan(params, images, params[NB_KEY])
        np.asarray(s[:1])
        print(f"headline {name} scan compile {time.time() - t0:.0f}s",
              flush=True)
        s = tower_scan(params, images, chained_bias(s))
        np.asarray(s[:1])
        t0 = time.time()
        for _ in range(ITERS):
            s = tower_scan(params, images, chained_bias(s))
        np.asarray(s[:1])
        dt = time.time() - t0
        n = K * B * ITERS
        print(f"headline {name} scanK{K}xB{B}: {dt / ITERS * 1e3:.1f} "
              f"ms/dispatch {n / dt:.1f} img/s", flush=True)


if __name__ == "__main__":
    main(sys.argv[1].split(",") if len(sys.argv) > 1
         else ("parity", "int8"))
