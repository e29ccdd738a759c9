"""Probe: time the f30k-scale ITM rerank dispatch repeatedly.

The first f30k bench section measured rerank_s=67.98 (consistent with the
independently-measured 890 ITM pair passes/s), but tools/f30k_probe.py
measured 1686 s for the SAME shapes an hour later — a 25x spread that is
either a tunnel pathology or an elision artifact in one of the runs.
This probe times N consecutive rerank rounds where every round's score
input differs NUMERICALLY (scores + i*1e-6 on a changing row), so the
tunnel cannot dedupe any round against another, and prints per-round
wall time with timestamps.
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
from vl_merging_tpu.train.loop import eval_cast_params  # noqa: E402
from vl_merging_tpu.evaluation.retrieval import itm_rerank_scores  # noqa: E402

N_IMG = int(sys.argv[1]) if len(sys.argv) > 1 else 250
ROUNDS = int(sys.argv[2]) if len(sys.argv) > 2 else 3
TOPK = 10


def ts(msg):
    print(f"[{time.strftime('%H:%M:%S')}] {msg}", flush=True)


cfg = build_config(
    "task_finetune_irtr_coco_square_randaug_base_image384", "ufo",
    overrides={"precision": "bf16"})
spec = make_model_spec(cfg)
params = eval_cast_params(init_params(spec, seed=0), spec, cfg)
p = bench._with_itm_head(params, spec, jnp)
np.asarray(jax.tree_util.tree_leaves(p)[-1].ravel()[0])
ts("params ready")

n_txt = N_IMG * 5
rng = np.random.RandomState(5)
images = jnp.asarray(
    rng.randn(N_IMG, 3, spec.image_size, spec.image_size)
    .astype(np.float32)).astype(jnp.bfloat16)
text_ids = jnp.asarray(rng.randint(0, spec.vocab_size, (n_txt, spec.max_text_len)))
text_masks = jnp.ones((n_txt, spec.max_text_len), jnp.int32)
scores0 = jnp.asarray(rng.randn(N_IMG, n_txt).astype(np.float32))
np.asarray(images[0, 0, 0, 0])
ts(f"staged {N_IMG} images x {n_txt} texts")


def both(sc):
    tr = itm_rerank_scores(p, spec, text_ids, text_masks, images, sc,
                           TOPK, axis=1)
    ir = itm_rerank_scores(p, spec, text_ids, text_masks, images, sc,
                           TOPK, axis=0)
    return float(tr[0, 0]) + float(ir[0, 0])

t0 = time.time()
acc = both(scores0)                       # compile + warm
ts(f"warm (incl. compile): {time.time() - t0:.1f}s")

pairs = (N_IMG + n_txt) * TOPK
times = []
for i in range(ROUNDS):
    # numerically DISTINCT input each round: fold the previous fetch in
    # and bump one row, so no round repeats any earlier computation
    sc = scores0.at[i % N_IMG].add(1e-6 * (i + 1) + 1e-9 * acc)
    t0 = time.time()
    acc = both(sc)
    dt = time.time() - t0
    times.append(round(dt, 2))
    ts(f"round {i}: {dt:.2f}s = {pairs / dt:.1f} pairs/s")

print(json.dumps({"n_img": N_IMG, "rounds": times,
                  "pairs_per_s": [round(pairs / t, 1) for t in times]}))
