#!/usr/bin/env python
"""@384 eval-tower residual attribution (VERDICT r2 #5).

The headline tower (infer_image_ft, ViT-B/16 @384 B128, fused Pallas
path) runs at ~111-112 ms/pass (1146 img/s) against a ~98.5 ms/pass
(1300 img/s) roofline.  Attribute the ~13 ms residual by ablating one
cost at a time — end-to-end tower timings only (sub-ms microbenchmarks
are tunnel noise, CLAUDE.md):

    full          baseline (bench.py headline config)
    params_bf16   master params pre-cast to bf16 (halves weight reads;
                  numerically identical — linear() casts per-use anyway)
    b192/b256     larger batch (amortizes per-pass constants: bias
                  gather, pad/unpad, patch embed grid setup)
    no_bias       precompute_bias patched to zeros — isolates the
                  rel-pos gather's compute (traffic stays)
    no_attn       packed attention patched to identity — the whole
                  attention cost (kernel + softmax)
    approx_recip  probe-local packed kernel: softmax division replaced
                  by pl.reciprocal(approx=True) multiply (candidate win;
                  error ~2^-14 ≪ bf16's 2^-8 output precision)
    no_blocks     _block_apply patched to identity — embed + pad +
                  final-norm + pooler + dispatch overhead floor
"""

import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

BATCH = 128
ITERS = 8
IMAGE_SIZE = 384
NB_KEY = "transformer.norm.bias"


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from vl_merging_tpu.config import build_config
    from vl_merging_tpu.models import make_model_spec, init_params, model
    from vl_merging_tpu.models.mome import pallas_attention
    from vl_merging_tpu.ops import attention as att

    cfg = build_config(
        "task_finetune_irtr_coco_square_randaug_base_image384", "ufo",
        overrides={"precision": "bf16"})
    spec = make_model_spec(cfg)
    params = init_params(spec, seed=0)

    def tower_fn():
        @jax.jit
        def tower(p, image, norm_bias):
            p = dict(p)
            p[NB_KEY] = norm_bias
            with pallas_attention(True):
                return model.infer_image_ft(p, spec,
                                            {"image": image})["cls_feats"]
        return tower

    def run(name, ps, batch=BATCH, patches=(), iters=ITERS):
        saved = [(obj, attr, getattr(obj, attr)) for obj, attr, _ in patches]
        for obj, attr, new in patches:
            setattr(obj, attr, new)
        try:
            tower = tower_fn()
            rng = np.random.RandomState(0)
            image = jnp.asarray(
                rng.randn(batch, 3, IMAGE_SIZE, IMAGE_SIZE).astype(np.float32))

            def chained_bias(feats):
                return ps[NB_KEY] + (feats[0, 0] * 0).astype(ps[NB_KEY].dtype)

            t0 = time.time()
            feats = tower(ps, image, ps[NB_KEY])
            np.asarray(feats[:1, :1])
            compile_s = time.time() - t0
            feats = tower(ps, image, chained_bias(feats))
            np.asarray(feats[:1, :1])
            t0 = time.time()
            for _ in range(iters):
                feats = tower(ps, image, chained_bias(feats))
            np.asarray(feats[:1, :1])
            dt = time.time() - t0
            ms = dt / iters * 1e3
            ips = batch * iters / dt
            print(f"{name:14s} {ms:8.1f} ms/pass  {ips:7.1f} img/s"
                  f"   (compile {compile_s:.0f}s)", flush=True)
            return ms, ips
        finally:
            for obj, attr, old in saved:
                setattr(obj, attr, old)

    results = {}
    results["full"] = run("full", params)

    params16 = jax.tree.map(
        lambda x: x.astype(jnp.bfloat16)
        if isinstance(x, jax.Array) and x.dtype == jnp.float32 and x.ndim >= 1
        else x, params)
    results["params_bf16"] = run("params_bf16", params16)

    results["b192"] = run("b192", params, batch=192)
    results["b256"] = run("b256", params, batch=256)

    real_bias = model.precompute_bias

    def zero_bias(p, spec_, kind, true_length=None, pad_to=None):
        b = real_bias(p, spec_, kind, true_length, pad_to)
        return jnp.zeros_like(b)

    # zeros_like keeps shape/dtype/traffic; removes only the gather compute
    results["no_bias"] = run(
        "no_bias", params, patches=[(model, "precompute_bias", zero_bias)])

    def identity_attn(qkv, bias, mask, scale, num_heads):
        C = qkv.shape[-1] // 3
        return qkv[:, :, :C]

    results["no_attn"] = run(
        "no_attn", params,
        patches=[(att, "packed_fused_attention", identity_attn)])

    # --- approx-reciprocal softmax variant (probe-local kernel) ---------
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    def _packed_kernel_ar(qkv_q, qkv_k, qkv_v, bias_ref, mask_ref, o_ref, *,
                          scale):
        valid = mask_ref[:, 0] > 0
        for h in (0, 1):
            sl = slice(h * 64, (h + 1) * 64)
            q = qkv_q[:, :, sl] * jnp.asarray(scale, qkv_q.dtype)
            s = jax.lax.dot_general(
                q, qkv_k[:, :, sl],
                dimension_numbers=(((2,), (2,)), ((0,), (0,))),
                preferred_element_type=jnp.float32)
            s = s + bias_ref[h][None]
            s = jnp.where(valid[:, None, :], s,
                          jnp.asarray(-jnp.inf, jnp.float32))
            m = jnp.max(s, axis=-1, keepdims=True)
            e = jnp.exp(s - m)
            denom = jnp.sum(e, axis=-1, keepdims=True)
            p = e * pl.reciprocal(denom, approx=True)
            o = jax.lax.dot_general(
                p.astype(qkv_v.dtype), qkv_v[:, :, sl],
                dimension_numbers=(((2,), (1,)), ((0,), (0,))),
                preferred_element_type=jnp.float32)
            o_ref[:, :, sl] = o.astype(o_ref.dtype)

    @functools.partial(jax.jit, static_argnames=("scale", "num_heads",
                                                 "block_b"))
    def _packed_ar(qkv, bias, mask, scale, num_heads, block_b=8):
        B, Np, threeC = qkv.shape
        C = threeC // 3
        H2 = num_heads // 2
        mask = mask[:, None, :]
        grid = (H2, B // block_b)
        qkv_spec = lambda off: pl.BlockSpec(              # noqa: E731
            (block_b, Np, 128), lambda j, b, off=off: (b, 0, off + j),
            memory_space=pltpu.VMEM)
        return pl.pallas_call(
            functools.partial(_packed_kernel_ar, scale=scale),
            out_shape=jax.ShapeDtypeStruct((B, Np, C), qkv.dtype),
            grid=grid,
            in_specs=[
                qkv_spec(0), qkv_spec(H2), qkv_spec(2 * H2),
                pl.BlockSpec((2, Np, Np), lambda j, b: (j, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((block_b, 1, Np), lambda j, b: (b, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((block_b, Np, 128),
                                   lambda j, b: (b, 0, j),
                                   memory_space=pltpu.VMEM),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024),
        )(qkv, qkv, qkv, bias, mask)

    def ar_attn(qkv, bias, mask, scale, num_heads):
        return _packed_ar(qkv, bias.astype(jnp.float32),
                          mask.astype(jnp.int32), scale, num_heads)

    results["approx_recip"] = run(
        "approx_recip", params,
        patches=[(att, "packed_fused_attention", ar_attn)])

    real_block = model._block_apply

    def identity_block(p, spec_, b, x, mask, bias_i, type_id, dp, rng, train,
                       text_len=None):
        return x

    results["no_blocks"] = run(
        "no_blocks", params,
        patches=[(model, "_block_apply", identity_block)], iters=16)

    print(f"\n{'variant':14s} {'ms/pass':>8s} {'img/s':>8s}")
    for k, (ms, ips) in results.items():
        print(f"{k:14s} {ms:8.1f} {ips:8.1f}")
    full_ms = results["full"][0]
    print(f"\nattribution vs full ({full_ms:.1f} ms):")
    for k in ("no_bias", "no_attn", "no_blocks", "params_bf16",
              "approx_recip"):
        print(f"  {k:14s} saves {full_ms - results[k][0]:6.1f} ms")


if __name__ == "__main__":
    main()
