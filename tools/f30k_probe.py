"""Probe: run only bench.run_f30k_itr (validate the IB=250->200 fix).

B=250 image dispatches picked bb=2 in the packed kernels' batch-blocking
heuristic (250 % 8 != 0) — the blocking measured to underutilize the MXU —
and the first full r5 bench recorded itc at 147.8 img/s vs the ~550+
expected from the COCO compute-only rate.  IB=200 keeps bb=8.
"""
import json
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np  # noqa: E402
import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import bench  # noqa: E402
from vl_merging_tpu.config import build_config  # noqa: E402
from vl_merging_tpu.models import (  # noqa: E402
    make_model_spec, init_params, model)
from vl_merging_tpu.models.mome import pallas_attention  # noqa: E402
from vl_merging_tpu.train.loop import eval_cast_params  # noqa: E402

cfg = build_config(
    "task_finetune_irtr_coco_square_randaug_base_image384", "ufo",
    overrides={"precision": "bf16"})
spec = make_model_spec(cfg)
params = eval_cast_params(init_params(spec, seed=0), spec, cfg)
np.asarray(jax.tree_util.tree_leaves(params)[-1].ravel()[0])

t0 = time.time()
ips, pairs, phases = bench.run_f30k_itr(
    params, spec, model, pallas_attention, jax, jnp)
print(json.dumps({
    "f30k_itc_images_per_sec": round(ips, 2),
    "f30k_rerank_pairs_per_sec": round(pairs, 2),
    "phases": phases,
    "wall_s": round(time.time() - t0, 1),
}))
