#!/usr/bin/env python
"""@224 pretrain step attribution: where do the 187.5 ms go? (VERDICT r2 #4)

End-to-end step probes that REMOVE one cost at a time (trust these on the
tunnel; sub-ms microbenchmarks are noise — CLAUDE.md):

    full        the real step: fwd + bwd + AdamW update (baseline)
    fwd_only    loss forward only (chained through a param leaf)
    fwd_bwd     value_and_grad, optimizer update skipped
    opt_only    AdamW update + apply on frozen grads (donated chain)
    no_remat    full step with use_remat=False
    mlm_only / ifm_only / itm_ifm   single-objective steps

The difference rows bound each phase: bwd ≈ fwd_bwd − fwd_only,
optimizer ≈ full − fwd_bwd (cross-check vs opt_only).

Run: python tools/train_trace.py [ablate|trace]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

BATCH = 22
ITERS = 10
NB_KEY = "transformer.norm.bias"


def _setup(overrides=None):
    import jax

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from vl_merging_tpu.config import build_config
    from vl_merging_tpu.models import make_model_spec, init_params
    from vl_merging_tpu.train import (
        make_optimizer, make_schedule, init_train_state)

    cfg = build_config(
        "task_mlm_itm_ifm_square_randaug_base", "all_moe",
        overrides=dict(dict(precision="bf16", max_steps=1000,
                            warmup_steps=0), **(overrides or {})))
    spec = make_model_spec(cfg)
    params = init_params(spec, seed=0)
    sched = make_schedule(cfg, cfg["max_steps"])
    opt = make_optimizer(params, cfg, cfg["max_steps"], sched)
    state = init_train_state(params, opt, seed=0)
    return cfg, spec, opt, state


def _batch(spec, bsz=BATCH, seed=3):
    import jax.numpy as jnp

    rng = np.random.RandomState(seed)
    ids = rng.randint(0, spec.vocab_size, (bsz, spec.max_text_len))
    labels = np.where(rng.rand(*ids.shape) < 0.15, ids, -100)
    return {
        "text_ids": jnp.asarray(ids),
        "text_ids_mlm": jnp.asarray(ids),
        "text_labels_mlm": jnp.asarray(labels.astype(np.int32)),
        "text_masks": jnp.ones(ids.shape, jnp.int32),
        "image": jnp.asarray(rng.randn(
            bsz, 3, spec.image_size, spec.image_size).astype(np.float32)),
    }


def _loss_fn(cfg, spec):
    from vl_merging_tpu.train import train_step as ts

    def loss_fn(params, batch, rng):
        from vl_merging_tpu.models.mome import pallas_attention

        with pallas_attention(ts._resolve_pallas(cfg, spec)):
            out = ts.compute_losses(params, spec, cfg, batch, rng,
                                    train=True)
        return ts.total_loss(out)
    return loss_fn


def _time_chained(fn, carry, iters=ITERS):
    """fn(carry) -> scalar carry; chained so the tunnel cannot elide."""
    carry = fn(carry)
    np.asarray(carry)
    t0 = time.time()
    for _ in range(iters):
        carry = fn(carry)
    np.asarray(carry)
    return (time.time() - t0) / iters * 1e3


def _time_step(step_fn, state, batch, iters=ITERS):
    state, m = step_fn(state, batch)
    np.asarray(m["total_loss"])
    t0 = time.time()
    for _ in range(iters):
        state, m = step_fn(state, batch)
    np.asarray(m["total_loss"])
    return (time.time() - t0) / iters * 1e3


def ablate():
    import jax
    import jax.numpy as jnp

    from vl_merging_tpu.train import make_train_step

    results = {}

    cfg, spec, opt, state = _setup()
    batch = _batch(spec)
    step = make_train_step(cfg, spec, opt, donate=True)
    results["full"] = _time_step(step, state, batch)
    print(f"full {results['full']:.1f}", flush=True)
    import gc
    del step, state, opt
    gc.collect()

    # forward only (same remat/pallas config; remat only affects bwd).
    # params/batch MUST be jit arguments — closing over them would embed
    # 200M weights as HLO constants and kill the remote compile service.
    loss_fn = _loss_fn(cfg, spec)
    cfg2, spec2, opt2, state2 = _setup()
    p0 = state2.params

    @jax.jit
    def fwd(params, b, carry):
        p = dict(params)
        p[NB_KEY] = p[NB_KEY] + carry * 0
        return loss_fn(p, b, jax.random.PRNGKey(0))

    results["fwd_only"] = _time_chained(
        lambda c: fwd(p0, batch, c), jnp.zeros((), jnp.float32))
    print(f"fwd_only {results['fwd_only']:.1f}", flush=True)

    @jax.jit
    def fwd_bwd(params, b, carry):
        p = dict(params)
        p[NB_KEY] = p[NB_KEY] + carry * 0
        loss, grads = jax.value_and_grad(
            lambda q: loss_fn(q, b, jax.random.PRNGKey(0)))(p)
        # consume EVERY grad leaf — returning just one would let XLA
        # dead-code-eliminate the other params' dW matmuls (≈half the
        # backward FLOPs) and fake the number
        import optax
        return loss + optax.global_norm(grads)

    results["fwd_bwd"] = _time_chained(
        lambda c: fwd_bwd(p0, batch, c), jnp.zeros((), jnp.float32))
    print(f"fwd_bwd {results['fwd_bwd']:.1f}", flush=True)

    # optimizer only: donated (params, opt_state) chain on frozen grads
    grads0 = jax.tree.map(lambda x: jnp.ones_like(x) * 1e-6, p0)

    def opt_step(params, opt_state, grads):
        import optax
        updates, opt_state = opt2.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state

    opt_step_d = jax.jit(opt_step, donate_argnums=(0, 1))
    params, opt_state = opt_step_d(p0, state2.opt_state, grads0)
    np.asarray(params[NB_KEY][:1])
    t0 = time.time()
    for _ in range(ITERS):
        params, opt_state = opt_step_d(params, opt_state, grads0)
    np.asarray(params[NB_KEY][:1])
    results["opt_only"] = (time.time() - t0) / ITERS * 1e3
    print(f"opt_only {results['opt_only']:.1f}", flush=True)

    # free the fwd/opt probes' device state before the next full variants
    import gc
    del p0, params, opt_state, grads0, state2, opt2
    gc.collect()

    # no remat
    cfg3, spec3, opt3, state3 = _setup({"use_remat": False})
    step3 = make_train_step(cfg3, spec3, opt3, donate=True)
    results["no_remat"] = _time_step(step3, state3, _batch(spec3))
    print(f"no_remat {results['no_remat']:.1f}", flush=True)
    del step3, state3, opt3
    gc.collect()

    # single-objective steps
    for name, ln in (("mlm_only", {"mlm": 1}),
                     ("ifm_only", {"ifm": 1}),
                     ("itm_ifm", {"itm": 1, "ifm": 1})):
        cfgx, specx, optx, statex = _setup({"loss_names": ln})
        stepx = make_train_step(cfgx, specx, optx, donate=True)
        results[name] = _time_step(stepx, statex, _batch(specx))
        print(f"{name} {results[name]:.1f}", flush=True)
        del stepx, statex, optx
        gc.collect()

    print(f"{'variant':12s} {'ms/step':>8s}")
    for k, v in results.items():
        print(f"{k:12s} {v:8.1f}")
    if "fwd_only" in results and "fwd_bwd" in results:
        print(f"{'— bwd delta':12s} {results['fwd_bwd']-results['fwd_only']:8.1f}")
        print(f"{'— opt delta':12s} {results['full']-results['fwd_bwd']:8.1f}")


def trace():
    import jax

    from vl_merging_tpu.train import make_train_step

    cfg, spec, opt, state = _setup()
    step = make_train_step(cfg, spec, opt, donate=True)
    batch = _batch(spec)
    state, m = step(state, batch)
    np.asarray(m["total_loss"])
    out_dir = "/tmp/train_trace"
    jax.profiler.start_trace(out_dir)
    for _ in range(3):
        state, m = step(state, batch)
    np.asarray(m["total_loss"])
    jax.profiler.stop_trace()
    print(f"trace written under {out_dir}")


if __name__ == "__main__":
    mode = sys.argv[1] if len(sys.argv) > 1 else "ablate"
    {"ablate": ablate, "trace": trace}[mode]()
