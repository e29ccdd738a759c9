#!/usr/bin/env python
"""Accuracy impact of ``attention_logits_dtype="bf16"`` (VERDICT r2 #6).

The fast-eval mode keeps attention LOGITS in bf16 (softmax still f32),
halving the (B,H,N,N) HBM traffic (+14% measured eval throughput).  This
probe bounds what it does to retrieval: same bf16 params, COCO-shaped
towers (@384, ViT-B/16), features extracted with f32 logits vs bf16
logits, then

  * per-feature drift (max |Δ|, min cosine),
  * top-k rank agreement over an (images × texts) score matrix at COCO
    aspect (1:5 captions) — the quantity R@k is computed from.

Zero-egress env: released checkpoints (and hence true R@k deltas) are
unreachable; rank-flip counts on the SAME features are the strongest
available bound — if no top-10 ranks flip, R@{1,5,10} cannot move.

Run: python tools/bf16_logits_probe.py [n_images]
"""

import json
import sys

import numpy as np

sys.path.insert(0, "/root/repo")


def main(n_images=512):
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from vl_merging_tpu.config import build_config
    from vl_merging_tpu.models import make_model_spec, init_params, model
    from vl_merging_tpu.models.mome import pallas_attention

    n_texts = n_images * 5
    B = 64

    specs = {}
    for name, ldt in (("f32", "f32"), ("bf16", "bf16")):
        cfg = build_config(
            "task_finetune_irtr_coco_square_randaug_base_image384", "ufo",
            overrides={"precision": "bf16", "attention_logits_dtype": ldt})
        specs[name] = make_model_spec(cfg)

    params = init_params(specs["f32"], seed=0)
    rng = np.random.RandomState(0)

    def towers(spec, use_pallas):
        @jax.jit
        def img_fn(p, image):
            with pallas_attention(use_pallas):
                return model.infer_image_ft(p, spec,
                                            {"image": image})["cls_feats"]

        @jax.jit
        def txt_fn(p, ids, masks):
            with pallas_attention(use_pallas):
                return model.infer_text_ft(
                    p, spec,
                    {"text_ids": ids, "text_masks": masks})["cls_feats"]
        return img_fn, txt_fn

    imgs = rng.randn(n_images, 3, 384, 384).astype(np.float32)
    ids = rng.randint(0, specs["f32"].vocab_size,
                      (n_texts, specs["f32"].max_text_len))
    masks = (np.arange(specs["f32"].max_text_len)[None]
             < rng.randint(8, specs["f32"].max_text_len + 1, (n_texts, 1))
             ).astype(np.int64)

    feats = {}
    for name, spec in specs.items():
        # the Pallas kernels are f32-logit only; bf16 mode routes through
        # the XLA path (ops/attention.py:561-564) — exactly what the fast
        # mode ships
        img_fn, txt_fn = towers(spec, use_pallas=(name == "f32"))
        fi = [img_fn(params, jnp.asarray(imgs[s:s + B]))
              for s in range(0, n_images, B)]
        ft = [txt_fn(params, jnp.asarray(ids[s:s + 320]),
                     jnp.asarray(masks[s:s + 320]))
              for s in range(0, n_texts, 320)]
        feats[name] = (np.asarray(jnp.concatenate(fi), np.float32),
                       np.asarray(jnp.concatenate(ft), np.float32))

    def norm(x):
        return x / np.linalg.norm(x, axis=-1, keepdims=True)

    out = {"probe": "attention_logits_bf16_vs_f32",
           "n_images": n_images, "n_texts": n_texts}
    for tower in (0, 1):
        a, b = feats["f32"][tower], feats["bf16"][tower]
        cos = np.sum(norm(a) * norm(b), -1)
        out[("image_tower", "text_tower")[tower]] = dict(
            max_abs=float(np.abs(a - b).max()),
            min_cosine=float(cos.min()))

    s_f32 = norm(feats["f32"][0]) @ norm(feats["f32"][1]).T
    s_bf16 = norm(feats["bf16"][0]) @ norm(feats["bf16"][1]).T
    for k in (1, 5, 10):
        tr_f = np.argsort(-s_f32, axis=1)[:, :k]
        tr_b = np.argsort(-s_bf16, axis=1)[:, :k]
        ir_f = np.argsort(-s_f32.T, axis=1)[:, :k]
        ir_b = np.argsort(-s_bf16.T, axis=1)[:, :k]
        out[f"top{k}_set_mismatch_tr"] = int(sum(
            len(set(x) ^ set(y)) > 0 for x, y in zip(tr_f, tr_b)))
        out[f"top{k}_set_mismatch_ir"] = int(sum(
            len(set(x) ^ set(y)) > 0 for x, y in zip(ir_f, ir_b)))
    out["score_max_abs_delta"] = float(np.abs(s_f32 - s_bf16).max())
    print(json.dumps(out))


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 512)
