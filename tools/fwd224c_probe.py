#!/usr/bin/env python
"""fwd224 round 3: decompose the 18.3 ms dropout/drop-path forward cost.

rng_step_probe showed unsafe_rbg saves only ~1.3 ms/step, so the
threefry hashing was NOT the cost — the apply chains are.  Which one?

    base          train=True, everything on (expect ~73)
    no_embdrop    layers-level dropout patched to identity (keeps
                  drop-path) — the text-embed dropout's share
    no_droppath   drop_path patched to identity (keeps embed dropout)
    full step     base & no_droppath as FULL train steps (fwd+bwd+opt):
                  does the fwd delta survive the backward?
"""

import os
import sys
import time

_HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, os.path.dirname(_HERE))
sys.path.insert(0, _HERE)

import numpy as np

from train_trace import _setup, _batch, _time_step  # noqa: E402

NB_KEY = "transformer.norm.bias"
ITERS = 10


def main():
    import jax
    import jax.numpy as jnp

    from vl_merging_tpu.models import model, mome
    from vl_merging_tpu.train import train_step as ts, make_train_step

    cfg, spec, opt, state = _setup()
    params = state.params
    batch = _batch(spec)

    def fwd_ms(name):
        @jax.jit
        def fwd(params, b, carry):
            p = dict(params)
            p[NB_KEY] = p[NB_KEY] + carry.astype(p[NB_KEY].dtype)
            from vl_merging_tpu.models.mome import pallas_attention
            with pallas_attention(False):
                out = ts.compute_losses(p, spec, cfg, b,
                                        jax.random.PRNGKey(0), train=True)
            return ts.total_loss(out).astype(jnp.float32) * 0

        carry = jnp.zeros((), jnp.float32)
        carry = fwd(params, batch, carry)
        np.asarray(carry)
        t0 = time.time()
        for _ in range(ITERS):
            carry = fwd(params, batch, carry)
        np.asarray(carry)
        ms = (time.time() - t0) / ITERS * 1e3
        print(f"{name:12s} {ms:8.1f} ms", flush=True)

    fwd_ms("base")

    ident_drop = lambda x, rate, rng, train: x        # noqa: E731
    saved = model.dropout
    model.dropout = ident_drop
    try:
        fwd_ms("no_embdrop")
    finally:
        model.dropout = saved

    ident_dp = lambda x, rate, rng, train: x          # noqa: E731
    saved = mome.drop_path
    mome.drop_path = ident_dp
    try:
        fwd_ms("no_droppath")

        # full step without drop-path
        cfg2, spec2, opt2, state2 = _setup()
        step2 = make_train_step(cfg2, spec2, opt2, donate=True)
        ms = _time_step(step2, state2, _batch(spec2))
        print(f"{'step_nodp':12s} {ms:8.1f} ms/step", flush=True)
    finally:
        mome.drop_path = saved

    cfg3, spec3, opt3, state3 = _setup()
    step3 = make_train_step(cfg3, spec3, opt3, donate=True)
    ms = _time_step(step3, state3, _batch(spec3))
    print(f"{'step_base':12s} {ms:8.1f} ms/step", flush=True)


if __name__ == "__main__":
    main()
