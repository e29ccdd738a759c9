"""Train-step perf probe: ViT-B/16 @224 full pretrain step on the chip.

Measures steady-state ms/step for the reference's VL pretrain workload
(mlm + dual-ifm + itm hard negatives, per-chip batch 22 — the reference's
per-GPU batch, reference README.md:81-103) and reports achieved TF/s +
MFU from the compiled graph's own cost analysis.

Run: python tools/train_probe.py [variant ...]
Variants: base pallas bf16logits remat b44
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

PEAK_TF = 191.0  # measured bf16 matmul peak on this chip (tools/perf_probe.py)


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


def run_irtr384(name: str, overrides: dict, bsz: int = 20, iters: int = 8):
    """COCO irtr fine-tune step (ufo @384, reference per-GPU batch 20):
    irtr contrastive over infer_*_ft towers at N=617 — the shape regime
    where the packed Pallas kernels win in eval."""
    import jax

    from vl_merging_tpu.config import build_config
    from vl_merging_tpu.models import make_model_spec, init_params
    from vl_merging_tpu.train import (
        make_optimizer, make_schedule, make_train_step, init_train_state)

    cfg = build_config(
        "task_finetune_irtr_coco_square_randaug_base_image384", "ufo",
        overrides=dict(dict(precision="bf16", max_steps=1000,
                            warmup_steps=0), **overrides))
    spec = make_model_spec(cfg)
    params = init_params(spec, seed=0)
    sched = make_schedule(cfg, cfg["max_steps"])
    opt = make_optimizer(params, cfg, cfg["max_steps"], sched)
    state = init_train_state(params, opt, seed=0)
    step_fn = make_train_step(cfg, spec, opt, donate=True)
    batch = _make_batch(spec, bsz)

    state, m = step_fn(state, batch)
    np.asarray(m["total_loss"])
    t0 = time.time()
    for _ in range(iters):
        state, m = step_fn(state, batch)
    np.asarray(m["total_loss"])
    dt = (time.time() - t0) / iters
    print(f"{name}: {dt*1e3:.1f} ms/step  {bsz/dt:.1f} ex/s/chip")


def run_variant(name: str, overrides: dict, bsz: int = 22, iters: int = 10):
    import jax

    from vl_merging_tpu.config import build_config
    from vl_merging_tpu.models import make_model_spec, init_params
    from vl_merging_tpu.train import (
        make_optimizer, make_schedule, make_train_step, init_train_state)

    from vl_merging_tpu.config import _loss_names

    overrides = dict(overrides)
    if "loss_names" in overrides:
        overrides["loss_names"] = _loss_names(overrides["loss_names"])
    cfg = build_config(
        "task_mlm_itm_ifm_square_randaug_base", "all_moe",
        overrides=dict(dict(precision="bf16", max_steps=1000,
                            warmup_steps=0), **overrides))
    spec = make_model_spec(cfg)
    params = init_params(spec, seed=0)
    sched = make_schedule(cfg, cfg["max_steps"])
    opt = make_optimizer(params, cfg, cfg["max_steps"], sched)
    state = init_train_state(params, opt, seed=0)
    step_fn = make_train_step(cfg, spec, opt, donate=True)
    batch = _make_batch(spec, bsz)

    lowered = step_fn.lower(state, batch)
    compiled = lowered.compile()
    cost = compiled.cost_analysis()
    flops = float(cost.get("flops", 0.0))

    t0 = time.time()
    state, metrics = step_fn(state, batch)
    np.asarray(metrics["total_loss"])
    t_first = time.time() - t0

    # steady state: chain states; donation keeps buffers device-resident
    def run(n):
        nonlocal state
        t0 = time.time()
        m = None
        for _ in range(n):
            state, m = step_fn(state, batch)
        np.asarray(m["total_loss"])  # flush the tunnel
        return time.time() - t0

    t1 = run(iters)
    t3 = run(3 * iters)
    dt = (t3 - t1) / (2 * iters)
    tf = flops / dt / 1e12
    print(f"{name}: {dt*1e3:.1f} ms/step  {bsz/dt:.1f} ex/s/chip  "
          f"{tf:.1f} TF/s  MFU={tf/PEAK_TF*100:.0f}%  "
          f"(graph {flops/1e12:.2f} TF/step; first call {t_first:.1f}s)")
    return dt


def main():
    import jax

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    variants = sys.argv[1:] or ["base"]
    table = {
        "base": {},
        "pallas": {"pallas_attention": True},
        "bf16logits": {"attention_logits_dtype": "bf16"},
        "pallas_bf16": {"pallas_attention": True,
                        "attention_logits_dtype": "bf16"},
        "remat": {"use_remat": True},
        "pallas_remat": {"pallas_attention": True, "use_remat": True},
        "pallas_noremat": {"pallas_attention": True, "use_remat": False},
    }
    table.update({
        "bf16_remat": {"attention_logits_dtype": "bf16", "use_remat": True},
        # task ablations (all with the remat default) — where the step
        # time goes: mlm = 1 fused pass, ifm = text+image towers with
        # vlffn re-runs, itm = global hard-negative pool + 3 fused passes
        "only_mlm": {"loss_names": {"mlm": 1}},
        "only_ifm": {"loss_names": {"ifm": 1}},
        "only_itm": {"loss_names": {"itm": 1, "ifm": 1}},
    })
    for v in variants:
        if v.startswith("irtr384"):
            over = {}
            if "pallas" in v:
                over["pallas_attention"] = True
            if "noremat" in v:
                over["use_remat"] = False
            run_irtr384(v, over)
        elif v[0] == "b" and v[1:].partition("_")[0].isdigit():
            b, _, rest = v.partition("_")  # bNN[_key], e.g. b44_remat
            run_variant(v, table.get(rest, {}), bsz=int(b[1:]))
        else:
            run_variant(v, table[v])


if __name__ == "__main__":
    main()
