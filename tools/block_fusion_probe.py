#!/usr/bin/env python
"""On-chip parity + tower perf for ALL eval-block fusion variants.

Variants (bit-identical numerics, interpret-pinned in
tests/test_fused_block.py / tests/test_ops.py):

  split — ln_linear → packed attention → proj_mlp_tail (bench default
          at HEAD; proj_mlp_tail itself pending its first measurement)
  qkv   — LN+qkv folded INTO the attention kernel
          (VLM_TPU_FUSE_LN_QKV_ATTN=1): the packed qkv tensor never
          exists in HBM (~5 MB/img/layer at ViT-B @384)
  mega  — the whole block in ONE kernel (VLM_TPU_FUSE_EVAL_BLOCK=1):
          per-layer HBM traffic = x read + out write only

1. parity: each variant vs split on one block's inputs, ON CHIP.
2. tower: infer_image_ft B384 per variant (house chained timing).
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

IMAGE_SIZE = 384
NB_KEY = "transformer.norm.bias"
BATCH = 384
ITERS = 6


def _cfg_jax():
    import jax

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    return jax


def _set_variant(name):
    from vl_merging_tpu.ops import attention as A
    from vl_merging_tpu.ops import fused_block as F

    A._FUSE_LN_QKV_ATTN = name == "qkv"
    F._FUSE_EVAL_BLOCK = name == "mega"


def parity():
    _cfg_jax()
    import jax.numpy as jnp

    from vl_merging_tpu.ops import fused_block as F

    B, Np, C, H = 16, 592, 768, 12
    H1 = 4 * C
    scale = 64 ** -0.5
    rng = np.random.RandomState(0)

    def t(shape, s=0.5, dtype=jnp.bfloat16):
        return jnp.asarray((rng.randn(*shape) * s).astype(np.float32)) \
            .astype(dtype)

    mask = np.ones((B, Np), np.int32)
    mask[:, 577:] = 0
    args = (t((B, Np, C), 1.0), t((C,), 1.0, jnp.float32),
            t((C,), 0.05, jnp.float32), t((3 * C, C), 0.05),
            t((3 * C,), 0.05, jnp.float32), t((H, Np, Np), 0.5, jnp.float32),
            jnp.asarray(mask), scale, H,
            t((C, C), 0.05), t((C,), 0.05, jnp.float32),
            t((C,), 0.1, jnp.float32), t((C,), 1.0, jnp.float32),
            t((C,), 0.05, jnp.float32), t((H1, C), 0.05),
            t((H1,), 0.05, jnp.float32), t((C, H1), 0.05),
            t((C,), 0.05, jnp.float32), t((C,), 0.1, jnp.float32))

    outs = {}
    for name in ("split", "qkv", "mega"):
        _set_variant(name)
        outs[name] = np.asarray(
            F.fused_eval_block(*args, use_pallas=True), np.float32)[:, :577]
    for name in ("qkv", "mega"):
        d = np.abs(outs[name] - outs["split"])
        print(f"parity {name} vs split: max|Δ|={d.max():.6f} "
              f"bit_equal={bool((outs[name] == outs['split']).all())}",
              flush=True)
        assert d.max() <= 0.05, f"{name} diverges"


def tower(variants=("split", "qkv", "mega")):
    jax = _cfg_jax()
    import jax.numpy as jnp

    from vl_merging_tpu.config import build_config
    from vl_merging_tpu.models import make_model_spec, init_params, model
    from vl_merging_tpu.models.mome import pallas_attention
    from vl_merging_tpu.train.loop import eval_cast_params

    cfg = build_config(
        "task_finetune_irtr_coco_square_randaug_base_image384", "ufo",
        overrides={"precision": "bf16"})
    spec = make_model_spec(cfg)
    params = eval_cast_params(init_params(spec, seed=0), spec, cfg)

    rng = np.random.RandomState(0)
    image = jnp.asarray(
        rng.randn(BATCH, 3, IMAGE_SIZE, IMAGE_SIZE)
        .astype(np.float32)).astype(jnp.bfloat16)

    def chained_bias(feats):
        return params[NB_KEY] + (feats[0, 0] * 0).astype(
            params[NB_KEY].dtype)

    for name in variants:
        _set_variant(name)

        # fresh function object per variant => fresh jit trace (the
        # gates are read at trace time inside fused_eval_block)
        @jax.jit
        def tower_fn(p, image, norm_bias):
            p = dict(p)
            p[NB_KEY] = norm_bias
            with pallas_attention(True):
                return model.infer_image_ft(p, spec, {"image": image})[
                    "cls_feats"]

        t0 = time.time()
        feats = tower_fn(params, image, params[NB_KEY])
        np.asarray(feats[:1, :1])
        print(f"{name} compile {time.time() - t0:.0f}s", flush=True)
        feats = tower_fn(params, image, chained_bias(feats))
        np.asarray(feats[:1, :1])
        t0 = time.time()
        for _ in range(ITERS):
            feats = tower_fn(params, image, chained_bias(feats))
        np.asarray(feats[:1, :1])
        dt = time.time() - t0
        print(f"{name} tower B{BATCH}: {dt / ITERS * 1e3:.1f} ms/dispatch "
              f"{BATCH * ITERS / dt:.1f} img/s", flush=True)


def tower_vqa(variants=("split", "qkv", "mega")):
    """VQA @480 prediction tower (fused VL infer, per-half recursion:
    text→48, image 901→912) per variant.  r2 baseline at this config:
    561 img/s B32 (split path, 53% MFU) — the Np=912 halves newly
    qualify for the fused kernels under the VMEM-driven gates."""
    jax = _cfg_jax()
    import jax.numpy as jnp

    from vl_merging_tpu.config import build_config
    from vl_merging_tpu.models import make_model_spec, init_params, model
    from vl_merging_tpu.models.mome import pallas_attention
    from vl_merging_tpu.train.loop import eval_cast_params

    cfg = build_config(
        "task_finetune_vqa_square_randaug_base_image384_ufo",
        overrides={"precision": "bf16", "image_size": 480})
    spec = make_model_spec(cfg)
    params32 = init_params(spec, seed=0)
    params = eval_cast_params(params32, spec, cfg)

    # "int8" variant: W8A8 projections (VERDICT r3 #3 — the @480 MFU
    # lift); same split fusion routing, quantized companions added
    cfg8 = build_config(
        "task_finetune_vqa_square_randaug_base_image384_ufo",
        overrides={"precision": "bf16", "image_size": 480,
                   "eval_int8": True})
    spec8 = make_model_spec(cfg8)

    B = int(os.environ.get("VQA_B", "32"))
    rng = np.random.RandomState(0)
    batch = {
        "text_ids": jnp.asarray(
            rng.randint(0, spec.vocab_size, (B, spec.max_text_len))),
        "text_masks": jnp.asarray(
            (np.arange(spec.max_text_len)[None]
             < rng.randint(5, spec.max_text_len, (B, 1))).astype(np.int32)),
    }
    image = jnp.asarray(rng.randn(B, 3, 480, 480)
                        .astype(np.float32)).astype(jnp.bfloat16)

    for name in variants:
        if name == "int8":
            _set_variant("split")
            run_spec, run_params = spec8, eval_cast_params(params32, spec8,
                                                           cfg8)
        else:
            _set_variant(name)
            run_spec, run_params = spec, params

        def chained_bias(feats, p=run_params):
            return p[NB_KEY] + (feats[0, 0] * 0).astype(p[NB_KEY].dtype)

        @jax.jit
        def vqa_fn(p, image, norm_bias, run_spec=run_spec):
            p = dict(p)
            p[NB_KEY] = norm_bias
            with pallas_attention(True):
                return model.infer(p, run_spec, dict(batch, image=image))[
                    "cls_feats"]

        t0 = time.time()
        feats = vqa_fn(run_params, image, run_params[NB_KEY])
        np.asarray(feats[:1, :1])
        print(f"vqa {name} compile {time.time() - t0:.0f}s", flush=True)
        feats = vqa_fn(run_params, image, chained_bias(feats))
        np.asarray(feats[:1, :1])
        t0 = time.time()
        for _ in range(ITERS):
            feats = vqa_fn(run_params, image, chained_bias(feats))
        np.asarray(feats[:1, :1])
        dt = time.time() - t0
        print(f"vqa {name} tower B{B}: {dt / ITERS * 1e3:.1f} ms/dispatch "
              f"{B * ITERS / dt:.1f} img/s", flush=True)


if __name__ == "__main__":
    # args: "parity", "tower" (all variants), "tower:mega,qkv" for a
    # subset, or "vqa" / "vqa:split,mega" for the @480 VL tower — combine
    # with VLM_TPU_EVAL_BLOCK_BB to sweep the mega block size
    which = sys.argv[1:] or ["parity", "tower"]
    if "parity" in which:
        parity()
    for a in which:
        if a == "tower":
            tower()
        elif a.startswith("tower:"):
            tower(tuple(a.split(":", 1)[1].split(",")))
        elif a == "vqa":
            tower_vqa()
        elif a.startswith("vqa:"):
            tower_vqa(tuple(a.split(":", 1)[1].split(",")))
