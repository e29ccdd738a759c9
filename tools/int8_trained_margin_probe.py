#!/usr/bin/env python
"""Int8 top-k flip measurement at TRAINED-scale score margins
(VERDICT r4 "Next round" #1).

Round 4 measured int8 (W8A8) eval drift at RANDOM-INIT weights: feature
drift tiny (min-cos 0.99992), but ir-top1 picked a different image on
1017/2560 queries because random-init score gaps are ~1e-4 — far below
any trained model's margins.  The ≤0.1-pt contract is on reported R@k
(reference src/vilt/modules/objectives.py:688-710), so what decides
whether int8 may carry the headline is whether flips persist at
trained-scale margins.  Released checkpoints are unreachable
(zero-egress), so this probe MAKES a trained checkpoint:

  1. Fine-tune the @384 ufo irtr tower (ViT-B/16, the headline config)
     from random init with the PRODUCTION train step math (compute_irtr
     InfoNCE + the configured AdamW) on synthetic-but-STRUCTURED paired
     data: image i is a smooth upsampled low-dim code + per-step noise,
     text i a fixed token sequence.  The per-step noise forces the model
     to key on the code structure rather than memorizing pixels; margins
     under InfoNCE open quickly (logit_scale is learnable, as in the
     reference).
  2. Evaluate with FRESH noise draws (never seen in training) at the
     final checkpoint: extract features with the production eval towers
     (bf16 parity vs int8 W8A8), and report
       - the bf16 margin distribution (GT score − best non-GT), the
         quantity that decides flip susceptibility,
       - int8-vs-bf16 top-k SET mismatches (both directions),
       - the reported-metric R@k deltas (GT on the diagonal),
     at several training checkpoints so the flip count can be read AS A
     FUNCTION OF margin scale.

Run: python tools/int8_trained_margin_probe.py [steps] [n_pairs] [logits]
Defaults: 900 steps, 512 pairs, batch 20 (reference per-GPU batch),
eval every 300 steps.  All training dispatches chain through the donated
TrainState (the tunnel cannot elide them, CLAUDE.md).

``logits=bf16`` additionally applies the same gate to the TRAINING
numerics question (VERDICT r4 Weak #2's "new idea"): it trains with
``attention_logits_dtype="bf16"`` — the measured 147.5-vs-160.4 ms/step
opt-in — on the SAME data/seeds as the f32 control run, so the training
trajectories (loss, i2t accuracy) and final trained R@k/margins are
directly comparable between the two logs.  Eval towers stay at their
own numerics (parity/int8) either way.
"""

import json
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

BATCH = 20            # reference per-GPU fine-tune batch (README.md)
CODE = 12             # low-dim image code grid (12x12x3 -> x32 = 384)
NOISE = 0.05          # per-step pixel noise (structured signal is O(1))
EVAL_B = 64
LR = 1e-4             # from-random-init probe LR (config's 2e-5 is for a
                      # pretrained init; margins are the target, not BLEU)


def main(steps=900, n_pairs=512, eval_every=300, train_logits="f32"):
    import jax
    import jax.numpy as jnp
    import optax

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from vl_merging_tpu.config import build_config
    from vl_merging_tpu.models import make_model_spec, init_params, model
    from vl_merging_tpu.models.mome import pallas_attention
    from vl_merging_tpu.train import (
        make_optimizer, make_schedule, init_train_state)
    from vl_merging_tpu.train.loop import eval_cast_params
    from vl_merging_tpu.train.train_step import (
        TrainState, _fast_rng, _resolve_pallas, compute_losses,
        scalar_metrics, total_loss)

    cfgs, specs = {}, {}
    for name, flag in (("bf16", False), ("int8", True)):
        c = build_config(
            "task_finetune_irtr_coco_square_randaug_base_image384", "ufo",
            overrides={"precision": "bf16", "eval_int8": flag,
                       "learning_rate": LR, "warmup_steps": 0,
                       "max_steps": steps})
        cfgs[name], specs[name] = c, make_model_spec(c)
    # the TRAIN graph may run the opt-in bf16-logit attention; the eval
    # towers above always keep their own (parity/int8, f32-logit) numerics
    cfg = build_config(
        "task_finetune_irtr_coco_square_randaug_base_image384", "ufo",
        overrides={"precision": "bf16", "learning_rate": LR,
                   "warmup_steps": 0, "max_steps": steps,
                   "attention_logits_dtype": train_logits})
    spec = make_model_spec(cfg)
    S = spec.image_size

    # ---- structured paired data, device-resident ----
    rng = np.random.RandomState(0)
    codes = jnp.asarray(rng.randn(n_pairs, 3, CODE, CODE)
                        .astype(np.float32))
    text_ids = jnp.asarray(rng.randint(
        0, spec.vocab_size, (n_pairs, spec.max_text_len)))
    text_masks = jnp.ones((n_pairs, spec.max_text_len), jnp.int32)

    def images_from_codes(c, key):
        # smooth x32 upsample (nearest is fine: patch16 sees 2x2 blocks
        # of constant code per patch — a distinctive, learnable signal)
        up = jnp.repeat(jnp.repeat(c, S // CODE, -2), S // CODE, -1)
        noise = NOISE * jax.random.normal(key, up.shape, jnp.float32)
        return (up + noise).astype(jnp.bfloat16)

    # ---- production train-step math + in-graph batch gather ----
    params = init_params(spec, seed=0)
    sched = make_schedule(cfg, steps)
    opt = make_optimizer(params, cfg, steps, sched)
    state = init_train_state(params, opt, seed=0)

    def loss_fn(p, batch, key):
        with pallas_attention(_resolve_pallas(cfg, spec)):
            out = compute_losses(p, spec, cfg, batch, _fast_rng(cfg, key),
                                 train=True)
        return total_loss(out, 1.0), scalar_metrics(out)

    grad_fn = jax.value_and_grad(loss_fn, has_aux=True)

    def step_fn(state, idx):
        rng_next, k_noise, k_step = jax.random.split(state.rng, 3)
        batch = {
            "image": images_from_codes(jnp.take(codes, idx, 0), k_noise),
            "text_ids": jnp.take(text_ids, idx, 0),
            "text_masks": jnp.take(text_masks, idx, 0),
        }
        (loss, metrics), grads = grad_fn(state.params, batch, k_step)
        updates, opt_state = opt.update(grads, state.opt_state,
                                        state.params)
        p = optax.apply_updates(state.params, updates)
        # (the *_count companion is a python int and scalar_metrics drops
        # non-arrays, so divide by the static batch size)
        acc = metrics["irtr_i2t_correct"] / BATCH
        return (TrainState(p, opt_state, state.step + 1, rng_next),
                loss, acc)

    step_fn = jax.jit(step_fn, donate_argnums=(0,))

    # ---- eval: parity vs int8 feature extraction + flip analysis ----
    def make_towers(name):
        sp = specs[name]

        @jax.jit
        def img_fn(p, image):
            with pallas_attention(True):
                return model.infer_image_ft(p, sp,
                                            {"image": image})["cls_feats"]

        @jax.jit
        def txt_fn(p, ids, masks):
            with pallas_attention(True):
                return model.infer_text_ft(
                    p, sp, {"text_ids": ids,
                            "text_masks": masks})["cls_feats"]
        return img_fn, txt_fn

    towers = {n: make_towers(n) for n in ("bf16", "int8")}

    def norm(x):
        return x / np.linalg.norm(x, axis=-1, keepdims=True)

    def evaluate(masters, tag):
        """Fresh-noise eval images; bf16 vs int8 feature + flip report."""
        k_eval = jax.random.PRNGKey(777)   # never used in training
        feats = {}
        for name in ("bf16", "int8"):
            p = eval_cast_params(masters, specs[name], cfgs[name])
            img_fn, txt_fn = towers[name]
            fi, ft = [], []
            for s in range(0, n_pairs, EVAL_B):
                imgs = images_from_codes(
                    codes[s:s + EVAL_B],
                    jax.random.fold_in(k_eval, s))
                fi.append(img_fn(p, imgs))
                ft.append(txt_fn(p, text_ids[s:s + EVAL_B],
                                 text_masks[s:s + EVAL_B]))
            feats[name] = (np.asarray(jnp.concatenate(fi), np.float32),
                           np.asarray(jnp.concatenate(ft), np.float32))
        s_a = norm(feats["bf16"][0]) @ norm(feats["bf16"][1]).T  # (img, txt)
        s_b = norm(feats["int8"][0]) @ norm(feats["int8"][1]).T

        out = {"tag": tag, "n_pairs": n_pairs}
        # margin distribution (the flip-susceptibility quantity): GT score
        # minus best impostor, per text (ir) and per image (tr), at parity
        eye = np.eye(n_pairs, dtype=bool)
        imp_ir = np.where(eye, -np.inf, s_a).max(0)      # per text
        imp_tr = np.where(eye, -np.inf, s_a).max(1)      # per image
        m_ir = np.diag(s_a) - imp_ir
        m_tr = np.diag(s_a) - imp_tr
        for nm, m in (("ir", m_ir), ("tr", m_tr)):
            out[f"margin_{nm}_p10"] = round(float(np.percentile(m, 10)), 5)
            out[f"margin_{nm}_median"] = round(float(np.median(m)), 5)
            out[f"margin_{nm}_frac_pos"] = round(float((m > 0).mean()), 4)
        out["score_max_abs_delta"] = round(float(np.abs(s_a - s_b).max()), 6)

        for k in (1, 5, 10):
            tr_a = np.argsort(-s_a, 1)[:, :k]
            tr_b = np.argsort(-s_b, 1)[:, :k]
            ir_a = np.argsort(-s_a.T, 1)[:, :k]
            ir_b = np.argsort(-s_b.T, 1)[:, :k]
            out[f"top{k}_set_mismatch_tr"] = int(sum(
                bool(set(x) ^ set(y)) for x, y in zip(tr_a, tr_b)))
            out[f"top{k}_set_mismatch_ir"] = int(sum(
                bool(set(x) ^ set(y)) for x, y in zip(ir_a, ir_b)))
            for name, s in (("bf16", s_a), ("int8", s_b)):
                out[f"tr_r{k}_{name}"] = round(float(np.mean([
                    i in row for i, row in
                    enumerate(np.argsort(-s, 1)[:, :k])])), 5)
                out[f"ir_r{k}_{name}"] = round(float(np.mean([
                    t in row for t, row in
                    enumerate(np.argsort(-s.T, 1)[:, :k])])), 5)
            out[f"tr_r{k}_delta_pts"] = round(
                100 * (out[f"tr_r{k}_int8"] - out[f"tr_r{k}_bf16"]), 3)
            out[f"ir_r{k}_delta_pts"] = round(
                100 * (out[f"ir_r{k}_int8"] - out[f"ir_r{k}_bf16"]), 3)
        print(json.dumps(out), flush=True)
        return out

    # baseline: random init (should reproduce the r4 flip story)
    evaluate(state.params, "step0")

    idx_rng = np.random.RandomState(1)
    t0 = time.time()
    reports = []
    for i in range(1, steps + 1):
        idx = jnp.asarray(idx_rng.randint(0, n_pairs, (BATCH,)))
        state, loss, acc = step_fn(state, idx)
        if i % 50 == 0:
            print(f"step {i}: loss {float(loss):.4f} "
                  f"i2t_acc {float(acc):.3f} "
                  f"({(time.time() - t0):.0f}s)", flush=True)
        if i % eval_every == 0 or i == steps:
            reports.append(evaluate(state.params, f"step{i}"))

    final = dict(reports[-1])
    final["probe"] = "int8_trained_margin"
    final["steps"] = steps
    final["train_logits"] = train_logits
    final["wall_s"] = round(time.time() - t0, 1)
    print(json.dumps(final), flush=True)


if __name__ == "__main__":
    args = sys.argv[1:]
    main(int(args[0]) if len(args) > 0 else 900,
         int(args[1]) if len(args) > 1 else 512,
         int(args[2]) if len(args) > 2 else 300,
         args[3] if len(args) > 3 else "f32")
