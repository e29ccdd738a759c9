"""Test environment: force an 8-device CPU mesh simulation.

Mirrors the reference's CPU-DDP dry-run path (reference src/run.py:236-261)
the JAX-native way: XLA host-platform device multiplication lets multi-chip
sharding logic compile and execute on a dev box with zero TPUs.

NOTE: this image's sitecustomize registers a remote TPU backend and forces
``jax_platforms="axon,cpu"`` from inside register(), so the JAX_PLATFORMS
env var alone is NOT enough — we must re-update jax.config after import.
"""

import os

_flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_threefry_partitionable", True)

# Persistent compile cache: CPU compiles dominate suite runtime on this
# one-core box (e2e trainer graphs take minutes); repeat runs hit the cache.
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache_cpu")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
