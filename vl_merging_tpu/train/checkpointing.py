"""Full training-state checkpointing via orbax.

The torch-style ``weights.ckpt`` written by the trainer covers interop and
weights-only resume; this module adds full-state save/restore (params +
optimizer state + step + rng) so pretraining resumes exactly — the
analogue of Lightning's resume_from_checkpoint (reference run.py:253,280).
"""

from __future__ import annotations

import os
import jax.numpy as jnp

from .train_step import TrainState


def save_train_state(state: TrainState, path: str) -> None:
    import orbax.checkpoint as ocp

    path = os.path.abspath(path)
    ckptr = ocp.StandardCheckpointer()
    payload = {
        "params": dict(state.params),
        "opt_state": state.opt_state,
        "step": state.step,
        "rng": state.rng,
    }
    ckptr.save(path, payload, force=True)
    ckptr.wait_until_finished()


def restore_train_state(path: str, template: TrainState) -> TrainState:
    """Restore with the live state as shape/sharding template."""
    import orbax.checkpoint as ocp

    path = os.path.abspath(path)
    ckptr = ocp.StandardCheckpointer()
    tpl = {
        "params": dict(template.params),
        "opt_state": template.opt_state,
        "step": template.step,
        "rng": template.rng,
    }
    restored = ckptr.restore(path, tpl)
    return TrainState(
        params=restored["params"],
        opt_state=restored["opt_state"],
        step=jnp.asarray(restored["step"], jnp.int32),
        rng=restored["rng"],
    )
