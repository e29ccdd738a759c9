#!/usr/bin/env python
"""Shake out the r5 bench additions on-chip without a full bench run:
run_f30k_itr (Flickr30k-protocol ITC + rerank) and run_nlvr2 @384.

Run: python tools/r5_bench_shakeout.py [f30k|nlvr2|both]
"""

import json
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")


def main(which="both"):
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    import bench
    from vl_merging_tpu.config import build_config
    from vl_merging_tpu.models import make_model_spec, init_params, model
    from vl_merging_tpu.models.mome import pallas_attention
    from vl_merging_tpu.train.loop import eval_cast_params

    if which in ("nlvr2", "both"):
        t0 = time.time()
        eps = bench.run_nlvr2(jax, jnp, image_size=384)
        print(json.dumps({"nlvr2_384_ex_per_s": round(eps, 2),
                          "wall_s": round(time.time() - t0, 1)}),
              flush=True)

    if which in ("f30k", "both"):
        bench._set_fusion("tail")
        cfg = build_config(
            "task_finetune_irtr_coco_square_randaug_base_image384", "ufo",
            overrides={"precision": "bf16"})
        spec = make_model_spec(cfg)
        params = eval_cast_params(init_params(spec, seed=0), spec, cfg)
        np.asarray(jax.tree_util.tree_leaves(params)[-1].ravel()[0])
        t0 = time.time()
        ips, pairs, phases = bench.run_f30k_itr(
            params, spec, model, pallas_attention, jax, jnp)
        print(json.dumps({"f30k_itc_img_per_s": round(ips, 2),
                          "f30k_rerank_pairs_per_s": round(pairs, 2),
                          "phases": phases,
                          "wall_s": round(time.time() - t0, 1)}),
              flush=True)


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "both")
