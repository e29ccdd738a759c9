#!/usr/bin/env python
"""@224 pretrain FORWARD variants: how much can the fused path win? (r2 #4)

The step ablation (tools/train_trace.py) attributes 187 ms/step as
fwd 72.8 + bwd ~101 + opt 13.  The forward runs ~4.6 TF in 72.8 ms
(~33% MFU) — worse than the backward (~46%) and far below the @384 eval
fused path (67%).  Before investing in custom VJPs for the fused-block
glue kernels (ops/fused_block.py, currently eval-only), measure what the
forward alone could gain:

    xla_train    pallas off, train=True    (production config today)
    xla_eval     pallas off, train=False   (isolates dropout/drop-path)
    packed_train pallas on,  train=True    (packed attention, XLA glue;
                                            pads fused 237→256)
    fused_eval   pallas on,  train=False   (full fused-block path)
    bf16_train   attention_logits_dtype=bf16, train=True (logit traffic)

All variants run the full compute_losses forward (mlm + dual-ifm + itm
hard negatives) at B22 @224, chained on a param leaf so the tunnel cannot
elide iterations (CLAUDE.md).
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

BATCH = 22
ITERS = 10
NB_KEY = "transformer.norm.bias"


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from vl_merging_tpu.config import build_config
    from vl_merging_tpu.models import make_model_spec, init_params
    from vl_merging_tpu.models.mome import pallas_attention
    from vl_merging_tpu.train import train_step as ts

    def setup(overrides=None):
        cfg = build_config(
            "task_mlm_itm_ifm_square_randaug_base", "all_moe",
            overrides=dict(dict(precision="bf16", max_steps=1000,
                                warmup_steps=0), **(overrides or {})))
        spec = make_model_spec(cfg)
        return cfg, spec

    cfg, spec = setup()
    # f32 master params, like the real train step (activations are cast to
    # the bf16 compute dtype inside; comparable to train_trace's fwd_only)
    params = init_params(spec, seed=0)

    rng = np.random.RandomState(3)
    ids = rng.randint(0, spec.vocab_size, (BATCH, spec.max_text_len))
    labels = np.where(rng.rand(*ids.shape) < 0.15, ids, -100)
    batch = {
        "text_ids": jnp.asarray(ids),
        "text_ids_mlm": jnp.asarray(ids),
        "text_labels_mlm": jnp.asarray(labels.astype(np.int32)),
        "text_masks": jnp.ones(ids.shape, jnp.int32),
        "image": jnp.asarray(rng.randn(
            BATCH, 3, spec.image_size, spec.image_size).astype(np.float32)),
    }

    def make_fwd(cfg, spec, use_pallas, train):
        @jax.jit
        def fwd(params, b, carry):
            p = dict(params)
            p[NB_KEY] = p[NB_KEY] + carry.astype(p[NB_KEY].dtype)
            with pallas_attention(use_pallas):
                out = ts.compute_losses(p, spec, cfg, b, jax.random.PRNGKey(0),
                                        train=train)
            return ts.total_loss(out).astype(jnp.float32) * 0
        return fwd

    def run(name, fwd):
        carry = jnp.zeros((), jnp.float32)
        t0 = time.time()
        carry = fwd(params, batch, carry)
        np.asarray(carry)
        compile_s = time.time() - t0
        t0 = time.time()
        for _ in range(ITERS):
            carry = fwd(params, batch, carry)
        np.asarray(carry)
        ms = (time.time() - t0) / ITERS * 1e3
        print(f"{name:14s} {ms:8.1f} ms   (compile {compile_s:.0f}s)",
              flush=True)
        return ms

    results = {}
    results["xla_train"] = run("xla_train", make_fwd(cfg, spec, False, True))
    results["xla_eval"] = run("xla_eval", make_fwd(cfg, spec, False, False))
    results["packed_train"] = run("packed_train",
                                  make_fwd(cfg, spec, True, True))
    results["fused_eval"] = run("fused_eval", make_fwd(cfg, spec, True, False))
    cfgb, specb = setup({"attention_logits_dtype": "bf16"})
    results["bf16_train"] = run("bf16_train",
                                make_fwd(cfgb, specb, False, True))

    print(f"\n{'variant':14s} {'ms':>8s}")
    for k, v in results.items():
        print(f"{k:14s} {v:8.1f}")


if __name__ == "__main__":
    main()
