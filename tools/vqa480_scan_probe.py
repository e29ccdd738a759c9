#!/usr/bin/env python
"""VQA @480 serving-loop probe: amortize the tunnel dispatch floor.

tools/eval_attrib2_probe.py measured ~7.3 ms/call of arg-marshalling for
the ~300-leaf params dict on the axon tunnel — 13% of the 54 ms B32 VQA
pass (tools/logs/vqa480_int8.log).  Like the @384 headline
(eval_attrib3), a serving loop scans K device-resident sub-batches
inside ONE jit call, so the floor is paid once per K·B images:

    python tools/vqa480_scan_probe.py [variants]   # default: split,int8

Timing follows CLAUDE.md tunnel methodology: every dispatch chains on
the previous output (norm-bias perturbation) so the tunnel cannot elide
repeats, and the reported rate divides by the full wall-clock of ITERS
chained dispatches.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

NB_KEY = "transformer.norm.bias"
ITERS = int(os.environ.get("ITERS", "4"))


def main(variants=("split", "int8")):
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from vl_merging_tpu.config import build_config
    from vl_merging_tpu.models import make_model_spec, init_params, model
    from vl_merging_tpu.models.mome import pallas_attention
    from vl_merging_tpu.train.loop import eval_cast_params

    B = int(os.environ.get("VQA_B", "32"))
    K = int(os.environ.get("VQA_K", "8"))

    params32 = None
    rng = np.random.RandomState(0)

    for name in variants:
        cfg = build_config(
            "task_finetune_vqa_square_randaug_base_image384_ufo",
            overrides={"precision": "bf16", "image_size": 480,
                       "eval_int8": name == "int8"})
        spec = make_model_spec(cfg)
        if params32 is None:
            params32 = init_params(spec, seed=0)
        params = eval_cast_params(params32, spec, cfg)

        batch = {
            "text_ids": jnp.asarray(
                rng.randint(0, spec.vocab_size, (B, spec.max_text_len))),
            "text_masks": jnp.asarray(
                (np.arange(spec.max_text_len)[None]
                 < rng.randint(5, spec.max_text_len, (B, 1)))
                .astype(np.int32)),
        }
        images = jnp.asarray(
            rng.randn(K, B, 3, 480, 480).astype(np.float32)
        ).astype(jnp.bfloat16)

        @jax.jit
        def vqa_scan(p, images, norm_bias, spec=spec, batch=batch):
            p = dict(p)
            p[NB_KEY] = norm_bias

            def body(carry, img):
                with pallas_attention(True):
                    feats = model.infer(p, spec,
                                        dict(batch, image=img))["cls_feats"]
                return carry + feats[0, :8].astype(jnp.float32), None

            s, _ = jax.lax.scan(body, jnp.zeros((8,), jnp.float32), images)
            return s

        def chained_bias(s, p=params):
            return p[NB_KEY] + (s[0] * 0).astype(p[NB_KEY].dtype)

        t0 = time.time()
        s = vqa_scan(params, images, params[NB_KEY])
        np.asarray(s[:1])
        print(f"vqa scan {name} compile {time.time() - t0:.0f}s", flush=True)
        s = vqa_scan(params, images, chained_bias(s))
        np.asarray(s[:1])
        t0 = time.time()
        for _ in range(ITERS):
            s = vqa_scan(params, images, chained_bias(s))
        np.asarray(s[:1])
        dt = time.time() - t0
        n = K * B * ITERS
        print(f"vqa scan {name} K{K}xB{B}: {dt / ITERS * 1e3:.1f} "
              f"ms/dispatch {n / dt:.1f} img/s", flush=True)


if __name__ == "__main__":
    main(sys.argv[1].split(",") if len(sys.argv) > 1 else ("split", "int8"))
