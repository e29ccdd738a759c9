"""Full-state orbax checkpointing round trip."""

import jax
import jax.numpy as jnp
import numpy as np

from vl_merging_tpu.config import build_config
from vl_merging_tpu.models import make_model_spec, init_params
from vl_merging_tpu.train import (make_optimizer, make_schedule,
                                  init_train_state)
from vl_merging_tpu.train.checkpointing import (restore_train_state,
                                                save_train_state)


def test_train_state_roundtrip(tmp_path):
    cfg = build_config(overrides=dict(
        hidden_size=32, num_heads=2, num_layers=2, image_size=32,
        patch_size=16, max_text_len=8, max_text_len_of_initckpt=16,
        vlffn_start_layer_index=1, precision="f32", max_steps=10,
        loss_names={"mlm": 1}))
    spec = make_model_spec(cfg)
    params = init_params(spec, 0)
    opt = make_optimizer(params, cfg, 10, make_schedule(cfg, 10))
    state = init_train_state(params, opt, seed=3)
    state.params["pooler.dense.bias"] = \
        state.params["pooler.dense.bias"] + 1.25

    path = str(tmp_path / "state")
    save_train_state(state, path)
    template = init_train_state(init_params(spec, 1), opt, seed=0)
    restored = restore_train_state(path, template)

    np.testing.assert_array_equal(
        np.asarray(restored.params["pooler.dense.bias"]),
        np.asarray(state.params["pooler.dense.bias"]))
    assert int(restored.step) == int(state.step)
    np.testing.assert_array_equal(np.asarray(restored.rng),
                                  np.asarray(state.rng))
    # optimizer state trees equal
    a = jax.tree.leaves(restored.opt_state)
    b = jax.tree.leaves(state.opt_state)
    assert len(a) == len(b)
    for x, y in zip(a, b):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))
