"""Platform helpers.

This image's sitecustomize force-registers a remote TPU backend and sets
``jax_platforms="axon,cpu"`` inside every Python process; host-side tools
(merging, checkpoint surgery, data prep) must opt back into CPU explicitly
or every tiny array op round-trips through the TPU tunnel.
"""

from __future__ import annotations


def force_cpu() -> None:
    """Pin JAX to the host CPU backend (for offline host-side tools)."""
    import jax

    jax.config.update("jax_platforms", "cpu")


def device_count() -> int:
    import jax

    return jax.device_count()
