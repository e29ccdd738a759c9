"""Two-process jax.distributed smoke (tools/multiprocess_smoke.py).

The in-suite multi-device tests run one process with 8 virtual devices;
this is the only check where ``jax.process_count() > 1`` is real, so it is
what exercises the multi-host-only branches: ``parallel.global_put``'s
``make_array_from_process_local_data`` path, the checkpoint param
allgather, and the per-rank VQA submission merge (reference analogue: the
OpenMPI/DDP multi-node path, src/run.py:70-138).
"""

import os
import subprocess
import sys

import pytest

TOOL = os.path.join(os.path.dirname(__file__), os.pardir,
                    "tools", "multiprocess_smoke.py")


@pytest.mark.slow
def test_two_process_distributed_smoke():
    env = {k: v for k, v in os.environ.items()
           if k not in ("XLA_FLAGS", "WORLD_SIZE", "RANK",
                        "JAX_PLATFORMS")}
    r = subprocess.run(
        [sys.executable, TOOL], env=env, timeout=2100,
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True)
    assert r.returncode == 0, r.stdout[-4000:]
    assert "MULTIPROCESS SMOKE OK" in r.stdout, r.stdout[-4000:]
