#!/usr/bin/env python
"""fwd224 round 4: WHERE do drop-path's 15 ms go — traffic or serialization?

Neither RNG impl (rbg), nor where→mul, nor the one-uniform dp-scale table
moved the number; removing drop_path entirely saves 15 ms fwd / 15 ms
step.  Compare XLA's own cost model for the two graphs:

  * compiled.cost_analysis() bytes-accessed/flops for base vs no-droppath
  * timed fwd for base (current gs-folded form) vs no-droppath

If bytes-accessed explains the delta it is a fusion break (extra HBM
materializations); if not, it is scheduling/serialization.
"""

import os
import sys
import time

_HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, os.path.dirname(_HERE))
sys.path.insert(0, _HERE)

import numpy as np

from train_trace import _setup, _batch  # noqa: E402

NB_KEY = "transformer.norm.bias"
ITERS = 10


def main():
    import jax
    import jax.numpy as jnp

    from vl_merging_tpu.models import mome
    from vl_merging_tpu.train import train_step as ts

    cfg, spec, opt, state = _setup()
    params = state.params
    batch = _batch(spec)

    def build_fwd():
        @jax.jit
        def fwd(params, b, carry):
            p = dict(params)
            p[NB_KEY] = p[NB_KEY] + carry.astype(p[NB_KEY].dtype)
            with mome.pallas_attention(False):
                out = ts.compute_losses(p, spec, cfg, b,
                                        jax.random.PRNGKey(0), train=True)
            return ts.total_loss(out).astype(jnp.float32) * 0
        return fwd

    def measure(name):
        fwd = build_fwd()
        lowered = fwd.lower(params, batch, jnp.zeros((), jnp.float32))
        compiled = lowered.compile()
        ca = compiled.cost_analysis()
        ca = ca[0] if isinstance(ca, (list, tuple)) else ca
        gb = ca.get("bytes accessed", float("nan")) / 1e9
        tf = ca.get("flops", float("nan")) / 1e12
        carry = jnp.zeros((), jnp.float32)
        carry = fwd(params, batch, carry)
        np.asarray(carry)
        t0 = time.time()
        for _ in range(ITERS):
            carry = fwd(params, batch, carry)
        np.asarray(carry)
        ms = (time.time() - t0) / ITERS * 1e3
        print(f"{name:12s} {ms:8.1f} ms   bytes={gb:7.2f} GB  "
              f"flops={tf:6.2f} TF", flush=True)

    measure("base_gs")

    ident = lambda x, rate, rng, train: x      # noqa: E731
    saved = mome.drop_path
    # also disable the table path so the block applies x + g*branch only
    from vl_merging_tpu.models import model as mdl
    saved_tbl = mdl._dp_scale_table
    mome.drop_path = ident
    mdl._dp_scale_table = lambda spec_, rng_, train_, b_: None
    try:
        measure("no_droppath")
    finally:
        mome.drop_path = saved
        mdl._dp_scale_table = saved_tbl


if __name__ == "__main__":
    main()
