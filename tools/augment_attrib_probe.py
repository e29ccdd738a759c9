#!/usr/bin/env python
"""Attribute the in-graph train augmentation cost (device_augment).

tools/train_pipeline_probe.py device mode measured ~427 ms/step vs the
160 ms device-only baseline — ~270 ms of in-graph augment for B22
canvas-512 images, far above any roofline.  The augment graph is
branchless (every image computes ALL candidate ops), so the suspects
are the per-candidate primitives, not op routing:

  - _equalize_lut: 256-bin histogram via scatter-add (TPU serializes
    scatters) per channel x image x stage
  - _apply_lut / _affine_bilinear: per-pixel gathers
  - _sharpness: 9 rolls + blend
  - _resized_crop_u8f: two HIGHEST-precision f32 einsums on (512,512,3)

This probe times the batch augment with candidates knocked out one at a
time (trace-time monkeypatch).  Chained timing per CLAUDE.md: every
dispatch carries a f32 perturbation derived from the previous output so
the tunnel cannot elide repeats.

Run: python tools/augment_attrib_probe.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

ITERS = int(os.environ.get("ITERS", "8"))
B = int(os.environ.get("AUG_B", "22"))
CANVAS = int(os.environ.get("AUG_CANVAS", "512"))
S = int(os.environ.get("AUG_S", "224"))


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from vl_merging_tpu.ops import augment as aug

    rng = np.random.RandomState(0)
    sizes = np.stack([np.full(B, 448), np.full(B, CANVAS)], axis=1)
    params_np = aug.sample_train_params(rng, sizes, S)
    canvas_np = rng.randint(0, 256, (B, CANVAS, CANVAS, 3)).astype(np.uint8)

    canvas = jnp.asarray(canvas_np)
    params = {k: jnp.asarray(v) for k, v in params_np.items()}

    identity_lut = None

    def no_equalize(img):
        return jnp.broadcast_to(
            jnp.arange(256, dtype=jnp.int32)[None, :], (3, 256))

    def no_autocontrast(img):
        return no_equalize(img)

    def no_warp(img, coeffs, fill=128.0):
        return img

    def no_sharp(img, factor):
        return img

    def no_lut_gather(img, lut):
        return img

    def no_hist(ch):
        # histogram via one-hot compare+reduce instead of scatter-add
        v = ch.astype(jnp.int32).ravel()
        return jnp.sum(
            (v[:, None] == jnp.arange(256, dtype=jnp.int32)[None, :])
            .astype(jnp.int32), axis=0)

    VARIANTS = [
        ("full", {}),
        ("no_equalize", {"_equalize_lut": no_equalize}),
        ("no_autocontrast", {"_autocontrast_lut": no_autocontrast}),
        ("no_warp", {"_affine_bilinear": no_warp}),
        ("no_sharp", {"_sharpness": no_sharp}),
        ("no_lut_gather", {"_apply_lut": no_lut_gather}),
        ("hist_onehot", {"_histogram_256": no_hist}),
        ("crop_flip_only", {"_randaug_stage":
                            lambda img, op, apply, coeffs, factor: img}),
    ]

    for name, patches in VARIANTS:
        saved = {k: getattr(aug, k) for k in patches}
        for k, v in patches.items():
            setattr(aug, k, v)
        try:
            @jax.jit
            def run(canvas, params, chain):
                p = dict(params)
                p["factor"] = p["factor"] + chain  # f32, not folded
                out = aug.augment_train_batch.__wrapped__(canvas, p, S)
                return jnp.sum(out[:, :, ::64, ::64], axis=(0, 2, 3))

            t0 = time.time()
            s = run(canvas, params, jnp.float32(0))
            np.asarray(s[:1])
            compile_s = time.time() - t0
            s = run(canvas, params, s[0] * 0)
            np.asarray(s[:1])
            t0 = time.time()
            for _ in range(ITERS):
                s = run(canvas, params, s[0] * 0)
            np.asarray(s[:1])
            dt = (time.time() - t0) / ITERS
            print(f"augment {name}: {dt * 1e3:.1f} ms/batch(B{B}) "
                  f"compile {compile_s:.0f}s", flush=True)
        finally:
            for k, v in saved.items():
                setattr(aug, k, v)


if __name__ == "__main__":
    main()
