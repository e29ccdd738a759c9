#!/usr/bin/env python
"""Full-dim bf16 drift probe: ViT-B/16 @384 packed-kernel tower on the TPU
vs the same tower in f32 on CPU (whose parity with the executed reference
is pinned by tests/test_reference_parity.py::test_full_size_vitb_infer_parity
at @224 and the toy-dim tower tests).

Bounds what production eval actually runs — bf16 params + packed Pallas
kernels + the 577→592 sublane pad — against the parity-exact f32 path at
real dims (VERDICT r2 weak #5).  Prints one JSON line with the feature
drift and its effect on retrieval-style cosine rankings.

Run on the dev box (axon TPU + cpu both registered):
    python tools/full_dim_parity_probe.py
"""

import json
import sys

import numpy as np

sys.path.insert(0, "/root/repo")


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from vl_merging_tpu.config import build_config
    from vl_merging_tpu.models import make_model_spec, init_params, model
    from vl_merging_tpu.models.mome import pallas_attention

    B = 8
    cfg_bf16 = build_config(
        "task_finetune_irtr_coco_square_randaug_base_image384", "ufo",
        overrides={"precision": "bf16"})
    spec_bf16 = make_model_spec(cfg_bf16)
    cfg_f32 = build_config(
        "task_finetune_irtr_coco_square_randaug_base_image384", "ufo",
        overrides={"precision": "f32"})
    spec_f32 = make_model_spec(cfg_f32)

    params = init_params(spec_f32, seed=0)  # f32 master weights
    rng = np.random.RandomState(42)
    img = rng.randn(B, 3, 384, 384).astype(np.float32)
    ids = rng.randint(0, spec_f32.vocab_size, (B, spec_f32.max_text_len))
    masks = (np.arange(spec_f32.max_text_len)[None]
             < rng.randint(8, spec_f32.max_text_len + 1, (B, 1))
             ).astype(np.int64)

    # --- production path: bf16 params, packed Pallas kernels, on the TPU
    tpu = jax.devices("tpu")[0]
    params_tpu = {k: jax.device_put(v, tpu) for k, v in params.items()}
    img_tpu = jax.device_put(jnp.asarray(img), tpu)
    ids_tpu = jax.device_put(jnp.asarray(ids), tpu)
    masks_tpu = jax.device_put(jnp.asarray(masks), tpu)

    @jax.jit
    def tower_tpu(p, image, tids, tmasks):
        with pallas_attention(True):
            fi = model.infer_image_ft(p, spec_bf16,
                                      {"image": image})["cls_feats"]
            ft = model.infer_text_ft(
                p, spec_bf16,
                {"text_ids": tids, "text_masks": tmasks})["cls_feats"]
        return fi, ft

    got_i, got_t = jax.device_get(
        tower_tpu(params_tpu, img_tpu, ids_tpu, masks_tpu))

    # --- parity-exact path: f32, XLA reference attention, on host CPU
    cpu = jax.devices("cpu")[0]
    params_cpu = {k: jax.device_put(np.asarray(v), cpu)
                  for k, v in params.items()}

    @jax.jit
    def tower_cpu(p, image, tids, tmasks):
        fi = model.infer_image_ft(p, spec_f32, {"image": image})["cls_feats"]
        ft = model.infer_text_ft(
            p, spec_f32,
            {"text_ids": tids, "text_masks": tmasks})["cls_feats"]
        return fi, ft

    with jax.default_device(cpu):
        want_i, want_t = jax.device_get(tower_cpu(
            params_cpu, jax.device_put(jnp.asarray(img), cpu),
            jax.device_put(jnp.asarray(ids), cpu),
            jax.device_put(jnp.asarray(masks), cpu)))

    def drift(got, want):
        g = got.astype(np.float64)
        w = want.astype(np.float64)
        denom = np.maximum(np.abs(w), 1e-6)
        cos = np.sum(g * w, -1) / (np.linalg.norm(g, axis=-1) *
                                   np.linalg.norm(w, axis=-1))
        return dict(max_abs=float(np.abs(g - w).max()),
                    median_rel=float(np.median(np.abs(g - w) / denom)),
                    min_cosine=float(cos.min()))

    # ranking impact: do bf16 features reorder a cosine score matrix?
    s_ref = (want_i / np.linalg.norm(want_i, axis=-1, keepdims=True)) @ \
        (want_t / np.linalg.norm(want_t, axis=-1, keepdims=True)).T
    s_got = (got_i / np.linalg.norm(got_i, axis=-1, keepdims=True)) @ \
        (got_t / np.linalg.norm(got_t, axis=-1, keepdims=True)).T
    rank_flips = int((np.argsort(-s_ref, axis=1) !=
                      np.argsort(-s_got, axis=1)).sum())

    print(json.dumps({
        "probe": "vitb_384_bf16_packed_vs_f32_cpu",
        "batch": B,
        "image_tower": drift(got_i, want_i),
        "text_tower": drift(got_t, want_t),
        "score_rank_flips": rank_flips,
        "score_max_abs_delta": float(np.abs(s_ref - s_got).max()),
    }))


if __name__ == "__main__":
    main()
