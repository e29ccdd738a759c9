"""Adopt-or-refute probe for the training-forward fusion (VERDICT r3 #4).

Sweeps VLM_TPU_TRAIN_FUSION ∈ {0, tail, full} × use_remat at the two
production training shapes:

  * @224 pretrain (all_moe mlm+ifm+itm, B22) — current best 160.4 ms/step
    (XLA + nocse surgical remat); the eval fusions' HBM-traffic argument
    (proj_mlp_tail keeps x' and the MLP hidden in VMEM) was never tried
    in the train forward before.
  * @384 COCO irtr fine-tune (ufo, B20, N=617) — current best 91.7
    ms/step (packed Pallas attention + fused bwd, no remat).

The fused train ops pair Pallas forwards with XLA-recompute backwards
(custom_vjp), so under remat the forward kernels replay at bwd time AND
the bwd recomputes in XLA — expect remat+fusion to lose; the interesting
cell is fusion × no-remat.

Timing: chained steps (state feeds state via donation) + slope
((t(3n)-t(n))/2n) per CLAUDE.md's tunnel methodology.

Run: python tools/train_fusion_probe.py [pretrain|irtr] ...
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def _make_batch(spec, bsz, seed=0):
    import jax.numpy as jnp

    rng = np.random.RandomState(seed)
    ids = rng.randint(0, spec.vocab_size, (bsz, spec.max_text_len))
    labels = np.where(rng.rand(bsz, spec.max_text_len) < 0.15, ids, -100)
    return {
        "text_ids": jnp.asarray(ids),
        "text_ids_mlm": jnp.asarray(ids),
        "text_labels_mlm": jnp.asarray(labels, dtype=jnp.int32),
        "text_masks": jnp.ones((bsz, spec.max_text_len), jnp.int32),
        "image": jnp.asarray(
            rng.randn(bsz, 3, spec.image_size, spec.image_size)
            .astype(np.float32)),
    }


def run_cell(label, task, mode, fusion, bsz, overrides, iters):
    import jax  # noqa: F401

    from vl_merging_tpu.config import build_config
    from vl_merging_tpu.models import make_model_spec, init_params
    from vl_merging_tpu.ops import fused_block as fb
    from vl_merging_tpu.train import (
        make_optimizer, make_schedule, make_train_step, init_train_state)

    fb._TRAIN_FUSION = fusion
    try:
        cfg = build_config(
            task, mode,
            overrides=dict(dict(precision="bf16", max_steps=1000,
                                warmup_steps=0), **overrides))
        spec = make_model_spec(cfg)
        params = init_params(spec, seed=0)
        sched = make_schedule(cfg, cfg["max_steps"])
        opt = make_optimizer(params, cfg, cfg["max_steps"], sched)
        state = init_train_state(params, opt, seed=0)
        step_fn = make_train_step(cfg, spec, opt, donate=True)
        batch = _make_batch(spec, bsz)

        t0 = time.time()
        state, m = step_fn(state, batch)
        np.asarray(m["total_loss"])
        t_first = time.time() - t0

        def run(n):
            nonlocal state
            t0 = time.time()
            m = None
            for _ in range(n):
                state, m = step_fn(state, batch)
            np.asarray(m["total_loss"])
            return time.time() - t0

        t1 = run(iters)
        t3 = run(3 * iters)
        dt = (t3 - t1) / (2 * iters)
        loss = float(np.asarray(m["total_loss"]))
        print(f"{label}: {dt*1e3:.1f} ms/step  {bsz/dt:.1f} ex/s/chip  "
              f"loss={loss:.4f}  (first {t_first:.0f}s)", flush=True)
        del state, batch, step_fn
    finally:
        fb._TRAIN_FUSION = os.environ.get("VLM_TPU_TRAIN_FUSION", "0")


def main():
    which = set(sys.argv[1:]) or {"pretrain", "irtr"}
    cells = []
    if "pretrain" in which:
        for remat in (True, False):
            for fusion in ("0", "tail", "full"):
                cells.append((
                    f"pretrain224 remat={int(remat)} fusion={fusion}",
                    "task_mlm_itm_ifm_square_randaug_base", "all_moe",
                    fusion, 22, dict(use_remat=remat), 8))
    if "irtr" in which:
        for fusion in ("0", "tail", "full"):
            cells.append((
                f"irtr384 noremat fusion={fusion}",
                "task_finetune_irtr_coco_square_randaug_base_image384",
                "ufo", fusion, 20, dict(use_remat=False), 6))
    for cell in cells:
        run_cell(*cell)


if __name__ == "__main__":
    main()
