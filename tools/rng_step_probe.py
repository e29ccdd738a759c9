#!/usr/bin/env python
"""Full @224 pretrain step: train_rng_impl=unsafe_rbg vs threefry.

The fwd-only delta was 18.3 ms (tools/fwd224b_probe.py); under the remat
backward the dropout/drop-path RNG replays, so the full-step win should
be larger.  Chained donated steps, 10 iters (house timing rules)."""

import os
import sys
import time

_HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, os.path.dirname(_HERE))
sys.path.insert(0, _HERE)

from train_trace import _setup, _batch, _time_step  # noqa: E402


def main():
    from vl_merging_tpu.train import make_train_step

    for impl in ("unsafe_rbg", "threefry"):
        cfg, spec, opt, state = _setup({"train_rng_impl": impl})
        step = make_train_step(cfg, spec, opt, donate=True)
        ms = _time_step(step, state, _batch(spec))
        print(f"{impl:12s} {ms:8.1f} ms/step", flush=True)
        del step, state, opt
        import gc
        gc.collect()


if __name__ == "__main__":
    main()
