#!/usr/bin/env python
"""@224 pretrain step: remat-variant matrix after the drop-path rework.

The optimization_barrier in block_forward fixed the stochastic-depth
fusion pathology for the pure forward (75.5 -> 62.4 ms, tools/fwd224d
probes) but the full remat step stayed ~186.5 ms -- the pathology is
replayed inside the checkpointed backward.  Matrix:

    remat        current default (surgical policy, prevent_cse=True)
    remat_nocse  same policy, prevent_cse=False (jit bodies don't need
                 the CSE barriers; they serialize the replay schedule)
    no_remat     use_remat=False (barrier still active in fwd)

Chained donated steps, house timing rules (CLAUDE.md).
"""

import os
import sys

_HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, os.path.dirname(_HERE))
sys.path.insert(0, _HERE)

from train_trace import _setup, _batch, _time_step  # noqa: E402


def main():
    import gc
    import functools

    import jax

    from vl_merging_tpu.train import make_train_step
    from vl_merging_tpu.models import model as model_mod

    real_checkpoint = jax.checkpoint

    def run(name, overrides=None, no_cse=False):
        if no_cse:
            model_mod.jax.checkpoint = functools.partial(
                real_checkpoint, prevent_cse=False)
        try:
            cfg, spec, opt, state = _setup(overrides)
            step = make_train_step(cfg, spec, opt, donate=True)
            ms = _time_step(step, state, _batch(spec))
            print(f"{name:12s} {ms:8.1f} ms/step", flush=True)
            del step, state, opt
            gc.collect()
        finally:
            if no_cse:
                model_mod.jax.checkpoint = real_checkpoint

    run("remat")
    run("remat_nocse", no_cse=True)
    run("no_remat", {"use_remat": False})


if __name__ == "__main__":
    main()
