#!/usr/bin/env python
"""Follow-up matrix after adopting prevent_cse=False remat (160.4 ms):

    default       nocse + drop-path barrier + unsafe_rbg (as committed)
    no_barrier    nocse, barrier patched out of block_forward
    threefry      nocse + barrier, train_rng_impl=threefry

Decides whether the optimization_barrier and the rbg RNG still earn
their keep under the faster replay schedule.
"""

import os
import sys

_HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, os.path.dirname(_HERE))
sys.path.insert(0, _HERE)

from train_trace import _setup, _batch, _time_step  # noqa: E402


def main():
    import gc

    from vl_merging_tpu.train import make_train_step
    from vl_merging_tpu.models import mome

    real_barrier = None

    def run(name, overrides=None, no_barrier=False):
        global_jax = mome.jax
        nonlocal real_barrier
        if no_barrier:
            real_barrier = global_jax.lax.optimization_barrier
            global_jax.lax.optimization_barrier = lambda x: x
        try:
            cfg, spec, opt, state = _setup(overrides)
            step = make_train_step(cfg, spec, opt, donate=True)
            ms = _time_step(step, state, _batch(spec))
            print(f"{name:12s} {ms:8.1f} ms/step", flush=True)
            del step, state, opt
            gc.collect()
        finally:
            if no_barrier:
                global_jax.lax.optimization_barrier = real_barrier

    run("default")
    run("no_barrier", no_barrier=True)
    run("threefry", {"train_rng_impl": "threefry"})


if __name__ == "__main__":
    main()
