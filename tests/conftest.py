"""Test environment: force an 8-device CPU mesh simulation.

Mirrors the reference's CPU-DDP dry-run path (reference src/run.py:236-261)
the JAX-native way: XLA host-platform device multiplication lets multi-chip
sharding logic compile and execute on a dev box with zero TPUs.
"""

import os

os.environ.setdefault("XLA_FLAGS",
                      "--xla_force_host_platform_device_count=8")
os.environ.setdefault("JAX_PLATFORMS", "cpu")

import jax  # noqa: E402

jax.config.update("jax_threefry_partitionable", True)
