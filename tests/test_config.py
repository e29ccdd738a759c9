"""Config composition / validation unit tests (no jax compiles)."""

import pytest

from vl_merging_tpu.config import build_config


def test_max_vl_text_len_clamps_to_none_like_reference_slice():
    """The reference slices its max_text_len-sized rel-pos text index by
    [:max_vl_text_len] (vilt_module.py:195-201) — a python slice clamps,
    so vl >= text is a NO-OP there.  build_config normalizes that case to
    None (no truncation) instead of crashing downstream shape logic;
    tiny test configs set max_text_len=8 under the default
    max_vl_text_len=40 and must keep composing."""
    cfg = build_config(
        "task_mlm_itm_ifm_square_randaug_base_vl",
        overrides=dict(max_text_len=8))
    assert cfg["max_vl_text_len"] is None
    # equal is also a no-op slice
    cfg = build_config(
        "task_mlm_itm_ifm_square_randaug_base_vl",
        overrides=dict(max_text_len=40))
    assert cfg["max_vl_text_len"] is None
    # strictly-smaller values truncate, and survive
    cfg = build_config(
        "task_mlm_itm_ifm_square_randaug_base_vl",
        overrides=dict(max_text_len=64, max_vl_text_len=40))
    assert cfg["max_vl_text_len"] == 40


def test_validate_rejects_bad_geometry():
    with pytest.raises(ValueError):
        build_config(overrides=dict(hidden_size=65))
    with pytest.raises(ValueError):
        build_config(overrides=dict(image_size=130))
    with pytest.raises(ValueError):
        build_config(overrides=dict(precision="f16"))


def test_unknown_override_key_rejected():
    with pytest.raises(KeyError):
        build_config(overrides=dict(no_such_key=1))
