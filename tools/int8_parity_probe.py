#!/usr/bin/env python
"""Int8 (W8A8) eval tower: on-chip throughput + accuracy drift
(VERDICT r3 #1b adopt-or-refute).

Times the @384 image tower driver-style (chained B384 dispatches, slope-
free steady loop like bench.py's headline) with ``eval_int8`` on vs off,
then bounds the accuracy impact with the full_dim_parity_probe
methodology: same weights, features extracted both ways at COCO aspect
(1:5 captions), reporting per-feature drift (max |Δ|, min cosine) and
top-k rank flips on the score matrix — the quantity R@k is computed
from.  Zero rank flips ⇒ R@{1,5,10} cannot move.

Run: python tools/int8_parity_probe.py [n_images]
"""

import json
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

BATCH = 384
ITERS = 6
IMAGE_SIZE = 384


def main(n_images=512):
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from vl_merging_tpu.config import build_config
    from vl_merging_tpu.models import make_model_spec, init_params, model
    from vl_merging_tpu.models.mome import pallas_attention
    from vl_merging_tpu.train.loop import eval_cast_params

    specs, cast = {}, {}
    for name, flag in (("bf16", False), ("int8", True)):
        cfg = build_config(
            "task_finetune_irtr_coco_square_randaug_base_image384", "ufo",
            overrides={"precision": "bf16", "eval_int8": flag})
        specs[name] = make_model_spec(cfg)
        cast[name] = cfg

    params32 = init_params(specs["bf16"], seed=0)
    params = {name: eval_cast_params(params32, specs[name], {})
              for name in specs}
    # sanity: the int8 cast added quantized companions
    n_q = sum(1 for k in params["int8"] if k.endswith("::int8"))
    print(f"quantized weights: {n_q}", flush=True)

    nb_key = "transformer.norm.bias"

    def tower_fn(spec):
        @jax.jit
        def image_tower(p, image, norm_bias):
            p = dict(p)
            p[nb_key] = norm_bias
            with pallas_attention(True):
                return model.infer_image_ft(p, spec,
                                            {"image": image})["cls_feats"]
        return image_tower

    rng = np.random.RandomState(0)
    image = jnp.asarray(
        rng.randn(BATCH, 3, IMAGE_SIZE, IMAGE_SIZE)
        .astype(np.float32)).astype(jnp.bfloat16)

    out = {"probe": "int8_eval_tower"}
    for name in ("bf16", "int8"):
        spec, p = specs[name], params[name]
        tower = tower_fn(spec)
        feats = tower(p, image, p[nb_key])
        np.asarray(feats[:1, :1])            # compile + warm
        chain = p[nb_key] + (feats[0, 0] * 0).astype(p[nb_key].dtype)
        feats = tower(p, image, chain)
        np.asarray(feats[:1, :1])
        t0 = time.time()
        for _ in range(ITERS):
            chain = p[nb_key] + (feats[0, 0] * 0).astype(p[nb_key].dtype)
            feats = tower(p, image, chain)
        np.asarray(feats[:1, :1])
        dt = time.time() - t0
        ips = BATCH * ITERS / dt
        out[f"{name}_images_per_sec"] = round(ips, 2)
        print(f"{name}: {ips:.1f} img/s ({dt/ITERS*1e3:.1f} ms/iter)",
              flush=True)

    # ---- accuracy drift at COCO aspect ----
    n_texts = n_images * 5
    B = 64
    imgs = rng.randn(n_images, 3, IMAGE_SIZE, IMAGE_SIZE) \
        .astype(np.float32)
    ids = rng.randint(0, specs["bf16"].vocab_size,
                      (n_texts, specs["bf16"].max_text_len))
    masks = (np.arange(specs["bf16"].max_text_len)[None]
             < rng.randint(8, specs["bf16"].max_text_len + 1,
                           (n_texts, 1))).astype(np.int64)

    feats = {}
    for name in ("bf16", "int8"):
        spec, p = specs[name], params[name]

        @jax.jit
        def img_fn(pp, image, spec=spec):
            with pallas_attention(True):
                return model.infer_image_ft(pp, spec,
                                            {"image": image})["cls_feats"]

        @jax.jit
        def txt_fn(pp, ids, masks, spec=spec):
            with pallas_attention(True):
                return model.infer_text_ft(
                    pp, spec,
                    {"text_ids": ids, "text_masks": masks})["cls_feats"]

        fi = [img_fn(p, jnp.asarray(imgs[s:s + B]).astype(jnp.bfloat16))
              for s in range(0, n_images, B)]
        ft = [txt_fn(p, jnp.asarray(ids[s:s + 320]),
                     jnp.asarray(masks[s:s + 320]))
              for s in range(0, n_texts, 320)]
        feats[name] = (np.asarray(jnp.concatenate(fi), np.float32),
                       np.asarray(jnp.concatenate(ft), np.float32))
        print(f"{name}: features extracted", flush=True)

    def norm(x):
        return x / np.linalg.norm(x, axis=-1, keepdims=True)

    out.update({"n_images": n_images, "n_texts": n_texts})
    for tower in (0, 1):
        a, b = feats["bf16"][tower], feats["int8"][tower]
        cos = np.sum(norm(a) * norm(b), -1)
        out[("image_tower", "text_tower")[tower]] = dict(
            max_abs=float(np.abs(a - b).max()),
            min_cosine=float(cos.min()))

    s_a = norm(feats["bf16"][0]) @ norm(feats["bf16"][1]).T
    s_b = norm(feats["int8"][0]) @ norm(feats["int8"][1]).T
    for k in (1, 5, 10):
        tr_a = np.argsort(-s_a, axis=1)[:, :k]
        tr_b = np.argsort(-s_b, axis=1)[:, :k]
        ir_a = np.argsort(-s_a.T, axis=1)[:, :k]
        ir_b = np.argsort(-s_b.T, axis=1)[:, :k]
        out[f"top{k}_set_mismatch_tr"] = int(sum(
            len(set(x) ^ set(y)) > 0 for x, y in zip(tr_a, tr_b)))
        out[f"top{k}_set_mismatch_ir"] = int(sum(
            len(set(x) ^ set(y)) > 0 for x, y in zip(ir_a, ir_b)))
    out["score_max_abs_delta"] = float(np.abs(s_a - s_b).max())

    # ---- the REPORTED metric: R@k deltas under the COCO protocol ----
    # GT pairing: image i ↔ texts 5i..5i+4 (the e2e bench's layout).
    # Top-k set flips above count ANY reordering; R@k only moves when a
    # GT item crosses the k boundary — this is the quantity BASELINE.md's
    # ≤0.1 pt contract is about.
    gt_img_of_txt = np.arange(n_texts) // 5
    for k in (1, 5, 10):
        for name, s in (("bf16", s_a), ("int8", s_b)):
            # tr: does any of the image's 5 GT texts rank in its top-k?
            tr_top = np.argsort(-s, axis=1)[:, :k]
            tr_hit = np.mean([
                any(gt_img_of_txt[t] == i for t in row)
                for i, row in enumerate(tr_top)])
            # ir: does the text's GT image rank in its top-k?
            ir_top = np.argsort(-s.T, axis=1)[:, :k]
            ir_hit = np.mean([
                gt_img_of_txt[t] in row for t, row in enumerate(ir_top)])
            out[f"tr_r{k}_{name}"] = round(float(tr_hit), 5)
            out[f"ir_r{k}_{name}"] = round(float(ir_hit), 5)
        out[f"tr_r{k}_delta_pts"] = round(
            100 * (out[f"tr_r{k}_int8"] - out[f"tr_r{k}_bf16"]), 3)
        out[f"ir_r{k}_delta_pts"] = round(
            100 * (out[f"ir_r{k}_int8"] - out[f"ir_r{k}_bf16"]), 3)
    print(json.dumps(out))


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 512)
