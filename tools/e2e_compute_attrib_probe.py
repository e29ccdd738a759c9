#!/usr/bin/env python
"""Attribute the compute-only e2e number (VERDICT r4 #3).

r4 measured ``coco_itr_eval_e2e_compute_images_per_sec`` at 689-710 img/s
vs the 1204 img/s parity tower — a ~40% residual with no phase split.
Hypothesis set, each timed here on pre-staged device data at the bench's
256-image scale:

  a. IMAGE-TOWER DISPATCH GRANULARITY — the e2e path dispatches B32
     canvas batches (the link-bound pipeline's decode granularity);
     the headline runs B384.  Time the identical in-graph-resize tower
     at B32x8 / B128x2 / B256x1.
  b. in-graph resize cost — resize-only graph at the same batches.
  c. text tower — 1280 captions at 256/dispatch vs one 1280 dispatch.
  d. score matrix + topk.

Every timed loop chains on the previous output (CLAUDE.md: the tunnel
elides repeated identical unfetched computations) and a fetch closes
each phase.  Output: one JSON line with ms per phase + derived img/s.

Run: python tools/e2e_compute_attrib_probe.py
"""

import json
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

N_IMAGES = 256
CAPS = 5
IMAGE_SIZE = 384


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from vl_merging_tpu.config import build_config
    from vl_merging_tpu.models import make_model_spec, init_params, model
    from vl_merging_tpu.models.mome import pallas_attention
    from vl_merging_tpu.ops.image import pack_canvas, resize_normalize_nchw
    from vl_merging_tpu.train.loop import eval_cast_params
    from vl_merging_tpu.evaluation.retrieval import _topk_ids

    cfg = build_config(
        "task_finetune_irtr_coco_square_randaug_base_image384", "ufo",
        overrides={"precision": "bf16"})
    spec = make_model_spec(cfg)
    params = eval_cast_params(init_params(spec, seed=0), spec, cfg)
    np.asarray(jax.tree_util.tree_leaves(params)[-1].ravel()[0])

    # staged data: 256 distinct native-size uint8 canvases (240x320 like
    # the bench jpegs) + 1280 texts
    rng = np.random.RandomState(3)
    imgs = [rng.randint(0, 256, (240, 320, 3), np.uint8)
            for _ in range(N_IMAGES)]
    canvas_all, sizes_all = pack_canvas(imgs)
    n_txt = N_IMAGES * CAPS
    text_ids = rng.randint(0, spec.vocab_size, (n_txt, spec.max_text_len))
    text_masks = np.ones((n_txt, spec.max_text_len), np.int64)
    d_canvas = jax.device_put(canvas_all)
    d_sizes = jax.device_put(sizes_all)
    d_tids = jax.device_put(text_ids)
    d_tmask = jax.device_put(text_masks)
    np.asarray(d_canvas[0, 0, 0, 0])

    nb_key = "transformer.norm.bias"

    @jax.jit
    def tower_u8(p, canvas, sizes, nb):
        p = dict(p)
        p[nb_key] = nb
        x = resize_normalize_nchw(canvas, sizes, IMAGE_SIZE)
        with pallas_attention(True):
            return model.infer_image_ft(p, spec, {"image": x})["cls_feats"]

    @jax.jit
    def resize_only(canvas, sizes, nb):
        x = resize_normalize_nchw(canvas, sizes, IMAGE_SIZE)
        return x.mean((1, 2, 3)) + nb[0]       # tiny reduce: fetchable

    @jax.jit
    def text_tower(p, ids, masks, nb):
        p = dict(p)
        p[nb_key] = nb
        with pallas_attention(True):
            return model.infer_text_ft(
                p, spec, {"text_ids": ids, "text_masks": masks})["cls_feats"]

    out = {"probe": "e2e_compute_attrib", "n_images": N_IMAGES}
    nb0 = params[nb_key]

    def timed(label, fn, iters=4):
        # warm (compile) + chained timed loop
        r = fn(nb0)
        np.asarray(r[:1])
        chain = nb0 + (r.ravel()[0] * 0).astype(nb0.dtype)
        r = fn(chain)
        np.asarray(r[:1])
        t0 = time.time()
        for _ in range(iters):
            chain = nb0 + (r.ravel()[0] * 0).astype(nb0.dtype)
            r = fn(chain)
        np.asarray(r[:1])
        ms = (time.time() - t0) / iters * 1e3
        out[label + "_ms"] = round(ms, 1)
        print(f"{label}: {ms:.1f} ms", flush=True)
        return ms

    # a. image tower at three dispatch granularities
    for B in (32, 128, 256):
        nb = N_IMAGES // B

        def img_phase(nbias, B=B, nb=nb):
            feats = [tower_u8(params, d_canvas[i * B:(i + 1) * B],
                              d_sizes[i * B:(i + 1) * B], nbias)
                     for i in range(nb)]
            return jnp.concatenate(feats) if nb > 1 else feats[0]

        ms = timed(f"image_tower_B{B}", img_phase)
        out[f"image_tower_B{B}_img_per_s"] = round(N_IMAGES / ms * 1e3, 1)

    # b. in-graph resize alone (B256)
    timed("resize_only_B256",
          lambda nbias: resize_only(d_canvas, d_sizes, nbias))

    # c. text tower: 5 dispatches of 256 vs one 1280
    timed("text_tower_256x5",
          lambda nbias: jnp.concatenate(
              [text_tower(params, d_tids[s:s + 256], d_tmask[s:s + 256],
                          nbias) for s in range(0, n_txt, 256)]))
    timed("text_tower_1280x1",
          lambda nbias: text_tower(params, d_tids, d_tmask, nbias))

    # d. score + topk (on fixed random features; cost is shape-only)
    fi = jnp.asarray(rng.randn(N_IMAGES, spec.hidden_size), jnp.float32)
    ft = jnp.asarray(rng.randn(n_txt, spec.hidden_size), jnp.float32)
    iids = jnp.asarray(np.arange(N_IMAGES))
    tiids = jnp.asarray(np.repeat(np.arange(N_IMAGES), CAPS))

    def score_topk(nbias):
        s = (fi + nbias[:1].astype(jnp.float32) * 0) @ ft.T
        r = _topk_ids(s, iids, tiids)
        return r["tr_r1"].reshape(1)

    timed("score_topk", score_topk)

    # derived roofline: best image phase + text + score
    best_img = min(out[f"image_tower_B{B}_ms"] for B in (32, 128, 256))
    total = (best_img + min(out["text_tower_256x5_ms"],
                            out["text_tower_1280x1_ms"])
             + out["score_topk_ms"])
    out["best_composite_img_per_s"] = round(N_IMAGES / total * 1e3, 1)
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
