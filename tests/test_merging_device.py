"""Device (HBM-resident, fleet-stacked) merging fast path vs the host
contract path (merging/core.py, itself bit-identical to the executed
reference).  The device transform must reproduce the host result to f32
ulp (XLA contracts a·r + b·s into FMAs, so bitwise equality is not
attainable — measured max |Δ| is 1 ulp) for every fleet member, every
expert-set regime, and the missing-expert fallback."""

import jax.numpy as jnp
import numpy as np

from test_merging import (N_LAYERS, VLFFN_START, make_expert_state,
                          make_merged_state)
from vl_merging_tpu.merging import core
from vl_merging_tpu.merging.device import (merge_weights_device, ratio_sweep,
                                           stack_checkpoints,
                                           sum_task_vectors_device)

KW = dict(num_layers=N_LAYERS, vlffn_start_layer_index=VLFFN_START)
PRETRAIN = {"mlm": 1, "itm": 1, "ifm": 1}


def _assert_fleet_matches(fleet_out, host_outs):
    host_keys = set(host_outs[0])
    got_keys = set(fleet_out)
    assert got_keys == host_keys
    for k in host_keys:
        got = np.asarray(fleet_out[k])
        for j, host in enumerate(host_outs):
            h = np.asarray(host[k])
            # ≤ 4 ulp at the key's operand scale: device ratio arithmetic
            # ((2/3)·r etc.) runs in f32 vs the host's f64 python scalars,
            # and XLA contracts a·r + b·s into FMAs — both bounded by a
            # few ulps of the contributing magnitudes, not of the (possibly
            # cancelled) final value.
            tol = 4 * np.spacing(np.float32(max(np.abs(h).max(), 1.0)))
            assert (np.abs(got[j] - h) <= tol).all(), \
                f"member {j} key {k}: max |Δ| {np.abs(got[j] - h).max()}"


def test_merge_weights_device_matches_host_per_member():
    sds = [make_expert_state(seed=s) for s in range(3)]
    fleet = stack_checkpoints(sds)
    out = merge_weights_device(fleet, loss_names=PRETRAIN, merge_ratio=0.3,
                               **KW)
    host = [core.merge_weights(sd, loss_names=PRETRAIN, merge_ratio=0.3, **KW)
            for sd in sds]
    _assert_fleet_matches(out, host)


def test_merge_weights_device_only_activate_used_experts():
    sds = [make_expert_state(seed=s) for s in range(2)]
    fleet = stack_checkpoints(sds)
    for loss in ({"vqa": 1}, {"irtr": 1}, {"nlvr2": 1}):
        out = merge_weights_device(fleet, loss_names=loss, merge_ratio=0.5,
                                   only_activate_used_experts=True, **KW)
        host = [core.merge_weights(sd, loss_names=loss, merge_ratio=0.5,
                                   only_activate_used_experts=True, **KW)
                for sd in sds]
        _assert_fleet_matches(out, host)


def test_merge_weights_device_fallback_missing_expert():
    """A missing expert key falls back to the existing merged weight,
    matching the host quirk."""
    sd = make_expert_state(seed=0)
    merged = make_merged_state(seed=9)
    del sd[f"transformer.blocks.{N_LAYERS - 1}.mlp.l.fc1.weight"]
    sd.update(merged)  # merged keys available as the fallback source
    fleet = stack_checkpoints([sd, sd])
    out = merge_weights_device(fleet, loss_names=PRETRAIN, **KW)
    host = core.merge_weights(sd, loss_names=PRETRAIN, **KW)
    _assert_fleet_matches(out, [host, host])


def test_ratio_sweep_single_dispatch_matches_host_loop():
    sd = make_expert_state(seed=4)
    ratios = [0.0, 0.25, 0.5, 0.75, 1.0]
    out = ratio_sweep(sd, ratios, loss_names=PRETRAIN, **KW)
    host = [core.merge_weights(sd, loss_names=PRETRAIN, merge_ratio=r, **KW)
            for r in ratios]
    _assert_fleet_matches(out, host)


def test_sum_task_vectors_device_matches_host():
    sds = [make_expert_state(seed=s) for s in range(2)]
    central = make_merged_state(seed=7)
    fleet = stack_checkpoints(sds)
    cfleet = stack_checkpoints([central, central])
    for lam in (1.0, 0.4):
        out = sum_task_vectors_device(fleet, cfleet, loss_names=PRETRAIN,
                                      sum_lambda=lam, **KW)
        host = [core.sum_task_vectors(sd, {k: v.copy()
                                           for k, v in central.items()},
                                      loss_names=PRETRAIN, sum_lambda=lam,
                                      **KW)
                for sd in sds]
        _assert_fleet_matches(out, host)


def _make_grams(seed=7):
    from test_merging import HS, MLP

    rng = np.random.RandomState(seed)
    grams = {}
    for i in range(N_LAYERS):
        tasks = ["v", "l"] if i < VLFFN_START else ["v", "l", "vl"]
        p = f"transformer.blocks.{i}"
        for t in tasks:
            for mod, d in [(f"attn.{t}", HS), (f"attn.{t}.proj", HS),
                           (f"mlp.{t}.fc1", HS), (f"mlp.{t}.fc2", MLP)]:
                X = rng.randn(64, d)
                grams[f"{p}.{mod}"] = (X.T @ X).astype(np.float64)
    return grams


def test_regmean_device_matches_host_to_f32():
    """f32 prototype vs the host f64 contract path: relative drift must be
    small on well-conditioned activation grams (the docstring's ~1e-5
    claim; the device path is for sweeps, the host path for the final
    bit-identical checkpoint)."""
    from vl_merging_tpu.merging.device import regmean_device

    sd = make_expert_state(seed=0)
    grams = _make_grams()
    host = core.regmean(sd, grams, loss_names={"itm": 1},
                        scaling_for_non_diag=0.9, **KW)
    fleet = stack_checkpoints([sd])
    gfleet = {k: jnp.asarray(v, jnp.float32) for k, v in grams.items()}
    got = regmean_device(fleet, gfleet, loss_names={"itm": 1},
                         scaling_for_non_diag=0.9, **KW)
    assert set(got) == set(host)
    for k, h in host.items():
        g = np.asarray(got[k])[0]
        scale = max(np.abs(h).max(), 1.0)
        rel = np.abs(g - h.astype(np.float64)).max() / scale
        assert rel < 5e-5, f"{k}: rel drift {rel}"


def test_regmean_device_missing_gram_skips_expert():
    from vl_merging_tpu.merging.device import regmean_device

    sd = make_expert_state(seed=0)
    grams = _make_grams()
    # drop one expert's gram: that expert is skipped (continue), the other
    # experts still merge — same as core.regmean
    del grams["transformer.blocks.0.mlp.v.fc2"]
    host = core.regmean(sd, grams, loss_names={"itm": 1}, **KW)
    got = regmean_device(stack_checkpoints([sd]),
                         {k: jnp.asarray(v, jnp.float32)
                          for k, v in grams.items()},
                         loss_names={"itm": 1}, **KW)
    k = "transformer.blocks.0.mlp.fc2.weight"
    rel = np.abs(np.asarray(got[k])[0] - host[k]).max() / \
        max(np.abs(host[k]).max(), 1.0)
    assert rel < 5e-5


def test_stack_checkpoints_rejects_key_mismatch():
    a = make_expert_state(seed=0)
    b = make_expert_state(seed=1)
    del b["transformer.norm.weight"]
    try:
        stack_checkpoints([a, b])
    except ValueError as e:
        assert "transformer.norm.weight" in str(e)
    else:
        raise AssertionError("expected ValueError")
