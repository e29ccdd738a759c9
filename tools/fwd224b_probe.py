#!/usr/bin/env python
"""Follow-up to fwd224_probe: WHY is train-forward 18.4 ms slower than
eval-forward (73.4 vs 55.0 ms) when reference-parity dropout is only the
text-embed dropout + per-sample drop-path masks?

Isolate the two candidate causes at train=True:

    noremat   use_remat=False        — the jax.checkpoint wrapper's cost
                                        in a PURE FORWARD (it should be ~0;
                                        if not, the wrapper is blocking XLA
                                        fusion across block boundaries)
    nodrop    drop_rate=0            — dropout + drop-path + their RNG
    neither   both off               — cross-check (should ≈ xla_eval 55)
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
        return cfg, make_model_spec(cfg)

    cfg0, spec0 = setup()
    params = init_params(spec0, seed=0)

    rng = np.random.RandomState(3)
    ids = rng.randint(0, spec0.vocab_size, (BATCH, spec0.max_text_len))
    labels = np.where(rng.rand(*ids.shape) < 0.15, ids, -100)
    batch = {
        "text_ids": jnp.asarray(ids),
        "text_ids_mlm": jnp.asarray(ids),
        "text_labels_mlm": jnp.asarray(labels.astype(np.int32)),
        "text_masks": jnp.ones(ids.shape, jnp.int32),
        "image": jnp.asarray(rng.randn(
            BATCH, 3, spec0.image_size, spec0.image_size).astype(np.float32)),
    }

    def run(name, overrides):
        cfg, spec = setup(overrides)

        @jax.jit
        def fwd(params, b, carry):
            p = dict(params)
            p[NB_KEY] = p[NB_KEY] + carry.astype(p[NB_KEY].dtype)
            with pallas_attention(False):
                out = ts.compute_losses(p, spec, cfg, b, jax.random.PRNGKey(0),
                                        train=True)
            return ts.total_loss(out).astype(jnp.float32) * 0

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
        print(f"{name:10s} {ms:8.1f} ms   (compile {compile_s:.0f}s)",
              flush=True)
        return ms

    run("noremat", {"use_remat": False})
    run("nodrop", {"drop_rate": 0.0})
    run("neither", {"use_remat": False, "drop_rate": 0.0})


if __name__ == "__main__":
    main()
