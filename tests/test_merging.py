"""Golden tests for the merging suite against a torch CPU oracle.

The oracle re-derives the published merging math (interp / task-vector /
RegMean) in torch float ops, mirroring the reference's numeric pipeline
(torch CPU f32 accumulation; f64 matmul+inverse for RegMean), so parity
here demonstrates bit-identical merged checkpoints.
"""

import numpy as np
import pytest
import torch

from vl_merging_tpu.merging import core


HS = 16
MLP = 32
N_LAYERS = 4
VLFFN_START = 2


def make_expert_state(seed=0, modes=("v", "l", "vl")):
    """Synthetic all_moe state dict with the reference key layout."""
    rng = np.random.RandomState(seed)
    sd = {}
    sd["text_embeddings.word_embeddings.weight"] = rng.randn(50, HS).astype(np.float32)
    sd["transformer.norm.weight"] = rng.randn(HS).astype(np.float32)
    for i in range(N_LAYERS):
        tasks = ("v", "l") if i < VLFFN_START else modes
        p = f"transformer.blocks.{i}"
        for t in tasks:
            sd[f"{p}.attn.{t}.qkv.weight"] = rng.randn(3 * HS, HS).astype(np.float32)
            sd[f"{p}.attn.{t}.q_bias"] = rng.randn(HS).astype(np.float32)
            sd[f"{p}.attn.{t}.v_bias"] = rng.randn(HS).astype(np.float32)
            sd[f"{p}.attn.{t}.proj.weight"] = rng.randn(HS, HS).astype(np.float32)
            sd[f"{p}.attn.{t}.proj.bias"] = rng.randn(HS).astype(np.float32)
            sd[f"{p}.mlp.{t}.fc1.weight"] = rng.randn(MLP, HS).astype(np.float32)
            sd[f"{p}.mlp.{t}.fc1.bias"] = rng.randn(MLP).astype(np.float32)
            sd[f"{p}.mlp.{t}.fc2.weight"] = rng.randn(HS, MLP).astype(np.float32)
            sd[f"{p}.mlp.{t}.fc2.bias"] = rng.randn(HS).astype(np.float32)
            for norm in ("norm1", "norm2"):
                sd[f"{p}.{norm}.{t}.weight"] = rng.randn(HS).astype(np.float32)
                sd[f"{p}.{norm}.{t}.bias"] = rng.randn(HS).astype(np.float32)
        sd[f"{p}.gamma_1"] = rng.randn(HS).astype(np.float32)
        sd[f"{p}.gamma_2"] = rng.randn(HS).astype(np.float32)
    return sd


def make_merged_state(seed=1):
    """Expert-free (ufo-style) state dict, e.g. a central/seed checkpoint."""
    rng = np.random.RandomState(seed)
    sd = {}
    for i in range(N_LAYERS):
        p = f"transformer.blocks.{i}"
        sd[f"{p}.attn.qkv.weight"] = rng.randn(3 * HS, HS).astype(np.float32)
        sd[f"{p}.attn.q_bias"] = rng.randn(HS).astype(np.float32)
        sd[f"{p}.attn.v_bias"] = rng.randn(HS).astype(np.float32)
        sd[f"{p}.attn.proj.weight"] = rng.randn(HS, HS).astype(np.float32)
        sd[f"{p}.attn.proj.bias"] = rng.randn(HS).astype(np.float32)
        sd[f"{p}.mlp.fc1.weight"] = rng.randn(MLP, HS).astype(np.float32)
        sd[f"{p}.mlp.fc1.bias"] = rng.randn(MLP).astype(np.float32)
        sd[f"{p}.mlp.fc2.weight"] = rng.randn(HS, MLP).astype(np.float32)
        sd[f"{p}.mlp.fc2.bias"] = rng.randn(HS).astype(np.float32)
        for norm in ("norm1", "norm2"):
            sd[f"{p}.{norm}.weight"] = rng.randn(HS).astype(np.float32)
            sd[f"{p}.{norm}.bias"] = rng.randn(HS).astype(np.float32)
    return sd


def torch_interp_oracle(sd, merge_ratio, loss_names):
    """Torch-f32 interpolation oracle following the published rule."""
    out = {}
    for i in range(N_LAYERS):
        deep = i >= VLFFN_START
        if not deep:
            ratios = {"v": merge_ratio, "l": 1 - merge_ratio}
        else:
            ratios = {"v": (2 / 3) * merge_ratio,
                      "l": (2 / 3) * (1 - merge_ratio), "vl": 1 / 3}
        p = f"transformer.blocks.{i}"
        for stem, names in [
            (f"{p}.attn.{{}}.qkv.weight", [f"{p}.attn.qkv.weight"]),
            (f"{p}.attn.{{}}.q_bias", [f"{p}.attn.q_bias"]),
            (f"{p}.attn.{{}}.v_bias", [f"{p}.attn.v_bias"]),
            (f"{p}.attn.{{}}.proj.weight", [f"{p}.attn.proj.weight"]),
            (f"{p}.attn.{{}}.proj.bias", [f"{p}.attn.proj.bias"]),
            (f"{p}.mlp.{{}}.fc1.weight", [f"{p}.mlp.fc1.weight"]),
            (f"{p}.mlp.{{}}.fc1.bias", [f"{p}.mlp.fc1.bias"]),
            (f"{p}.mlp.{{}}.fc2.weight", [f"{p}.mlp.fc2.weight"]),
            (f"{p}.mlp.{{}}.fc2.bias", [f"{p}.mlp.fc2.bias"]),
            (f"{p}.norm1.{{}}.weight", [f"{p}.norm1.weight"]),
            (f"{p}.norm1.{{}}.bias", [f"{p}.norm1.bias"]),
            (f"{p}.norm2.{{}}.weight", [f"{p}.norm2.weight"]),
            (f"{p}.norm2.{{}}.bias", [f"{p}.norm2.bias"]),
        ]:
            acc = 0
            for t, r in ratios.items():
                acc = acc + r * torch.from_numpy(sd[stem.format(t)])
            out[names[0]] = acc.numpy()
    return out


def test_interp_merge_bit_identical_to_torch():
    sd = make_expert_state()
    loss_names = {"itm": 1}
    got = core.merge_weights(
        sd, num_layers=N_LAYERS, vlffn_start_layer_index=VLFFN_START,
        loss_names=loss_names, merge_ratio=0.3)
    want = torch_interp_oracle(sd, 0.3, loss_names)
    for k, v in want.items():
        assert got[k].dtype == np.float32
        np.testing.assert_array_equal(got[k], v, err_msg=k)
    # passthrough keys preserved bit-for-bit
    np.testing.assert_array_equal(
        got["text_embeddings.word_embeddings.weight"],
        sd["text_embeddings.word_embeddings.weight"])
    np.testing.assert_array_equal(
        got["transformer.blocks.1.gamma_1"], sd["transformer.blocks.1.gamma_1"])
    # expert keys are not in the merged dict
    assert "transformer.blocks.0.attn.v.qkv.weight" not in got


def test_interp_merge_only_activate_used_experts():
    sd = make_expert_state()
    # vqa → deep layers use only the vl expert (copy)
    got = core.merge_weights(
        sd, num_layers=N_LAYERS, vlffn_start_layer_index=VLFFN_START,
        loss_names={"vqa": 1}, merge_ratio=0.3,
        only_activate_used_experts=True)
    deep = N_LAYERS - 1
    np.testing.assert_array_equal(
        got[f"transformer.blocks.{deep}.mlp.fc1.weight"],
        sd[f"transformer.blocks.{deep}.mlp.vl.fc1.weight"])
    # irtr → deep layers merge v/l only
    got2 = core.merge_weights(
        sd, num_layers=N_LAYERS, vlffn_start_layer_index=VLFFN_START,
        loss_names={"irtr": 1}, merge_ratio=0.5,
        only_activate_used_experts=True)
    want = 0.5 * sd[f"transformer.blocks.{deep}.mlp.v.fc1.weight"] + \
        0.5 * sd[f"transformer.blocks.{deep}.mlp.l.fc1.weight"]
    np.testing.assert_array_equal(
        got2[f"transformer.blocks.{deep}.mlp.fc1.weight"],
        np.float32(0.5) * sd[f"transformer.blocks.{deep}.mlp.v.fc1.weight"]
        + np.float32(0.5) * sd[f"transformer.blocks.{deep}.mlp.l.fc1.weight"])


def test_interp_merge_fallback_to_existing_merged_weight():
    """Missing expert key → copy the already-merged weight."""
    sd = make_merged_state()
    sd["transformer.norm.weight"] = np.ones(HS, np.float32)
    got = core.merge_weights(
        sd, num_layers=N_LAYERS, vlffn_start_layer_index=VLFFN_START,
        loss_names={"itm": 1}, merge_ratio=0.25)
    for i in range(N_LAYERS):
        k = f"transformer.blocks.{i}.mlp.fc1.weight"
        np.testing.assert_array_equal(got[k], sd[k])


def test_task_vector_bit_identical_to_torch():
    sd = make_expert_state()
    central = make_merged_state()
    lam = 0.75
    got = core.sum_task_vectors(
        sd, central, num_layers=N_LAYERS,
        vlffn_start_layer_index=VLFFN_START, loss_names={"itm": 1},
        sum_lambda=lam)
    # torch oracle replicating the reference's in-place aliasing of the
    # central tensor (vilt_module.py:700-710): later_weight IS the central
    # tensor, so each modality's += sees the previous update — a sequential
    # lerp t ← t + λ(w_t − t).  See tests/test_reference_parity.py for the
    # executed-reference version of this check.
    for i in range(N_LAYERS):
        tasks = ["v", "l"] if i < VLFFN_START else ["v", "l", "vl"]
        k = f"transformer.blocks.{i}.mlp.fc1.weight"
        ke = f"transformer.blocks.{i}.mlp.{{}}.fc1.weight"
        acc = torch.from_numpy(central[k]).clone()
        for t in tasks:
            acc += lam * (torch.from_numpy(sd[ke.format(t)]) - acc)
        np.testing.assert_array_equal(got[k], acc.numpy(), err_msg=k)


def test_regmean_bit_identical_to_torch():
    sd = make_expert_state()
    rng = np.random.RandomState(7)
    grams = {}
    for i in range(N_LAYERS):
        tasks = ["v", "l"] if i < VLFFN_START else ["v", "l", "vl"]
        p = f"transformer.blocks.{i}"
        for t in tasks:
            for mod, d in [(f"attn.{t}", HS), (f"attn.{t}.proj", HS),
                           (f"mlp.{t}.fc1", HS), (f"mlp.{t}.fc2", MLP)]:
                X = rng.randn(64, d)
                grams[f"{p}.{mod}"] = (X.T @ X).astype(np.float64)

    scaling = 0.9
    got = core.regmean(
        sd, grams, num_layers=N_LAYERS,
        vlffn_start_layer_index=VLFFN_START, loss_names={"itm": 1},
        scaling_for_non_diag=scaling)

    # torch oracle for one qkv and one fc2 per layer
    def scale_G(G):
        diag = torch.diag_embed(torch.diag(G))
        return scaling * G + (1 - scaling) * diag

    for i in range(N_LAYERS):
        tasks = ["v", "l"] if i < VLFFN_START else ["v", "l", "vl"]
        p = f"transformer.blocks.{i}"
        for stem, gram_suffix in [
            (f"{p}.attn.{{}}.qkv.weight", ".qkv.weight"),
            (f"{p}.mlp.{{}}.fc2.weight", ".weight"),
        ]:
            summed, acc = 0, 0
            for t in tasks:
                name = stem.format(t)
                G = scale_G(torch.from_numpy(grams[name.replace(gram_suffix, "")]))
                summed = summed + G
                acc = acc + torch.from_numpy(sd[name]).to(torch.float64) @ G
            want = acc @ torch.inverse(summed)
            merged_name = stem.format("XX").replace(".XX", "")
            np.testing.assert_array_equal(got[merged_name], want.numpy(),
                                          err_msg=merged_name)
        # biases simple-averaged
        accb = sum(torch.from_numpy(sd[f"{p}.mlp.{t}.fc2.bias"]) for t in tasks)
        np.testing.assert_array_equal(
            got[f"{p}.mlp.fc2.bias"], (accb / len(tasks)).numpy())
        # norms simple-averaged
        accn = sum(torch.from_numpy(sd[f"{p}.norm1.{t}.weight"]) for t in tasks)
        np.testing.assert_array_equal(
            got[f"{p}.norm1.weight"], (accn / len(tasks)).numpy())


def test_regmean_missing_gram_skips_expert():
    """An expert present in the state dict but absent from the gram cache is
    skipped (continue), not treated as fallback."""
    sd = make_expert_state()
    rng = np.random.RandomState(3)
    grams = {}
    i, p = 0, "transformer.blocks.0"
    for t in ["v"]:  # only the v gram exists
        for mod, d in [(f"attn.{t}", HS), (f"attn.{t}.proj", HS),
                       (f"mlp.{t}.fc1", HS), (f"mlp.{t}.fc2", MLP)]:
            X = rng.randn(64, d)
            grams[f"{p}.{mod}"] = (X.T @ X).astype(np.float64)
    got = core.regmean(
        sd, grams, num_layers=1, vlffn_start_layer_index=VLFFN_START,
        loss_names={"itm": 1}, scaling_for_non_diag=1.0)
    G = torch.from_numpy(grams[f"{p}.mlp.v.fc1"])
    w = torch.from_numpy(sd[f"{p}.mlp.v.fc1.weight"]).to(torch.float64)
    want = (w @ G) @ torch.inverse(G)
    np.testing.assert_array_equal(got[f"{p}.mlp.fc1.weight"], want.numpy())


def test_merge_cli_roundtrip(tmp_path):
    """Standalone merge CLI: ckpt in → merged.ckpt out, values correct."""
    import torch
    from vl_merging_tpu.ckpt.io import save_torch_checkpoint
    from vl_merging_tpu.merge import main

    sd = make_expert_state()
    path = str(tmp_path / "ms.ckpt")
    save_torch_checkpoint(sd, path)
    out = main([
        "with",
        f"load_path={path!r}", "merge_weights=True", "merge_ratio=0.5",
        f"log_dir={str(tmp_path)!r}",
        f"num_layers={N_LAYERS}", "hidden_size=16", "num_heads=2",
        "image_size=32", "patch_size=16",
        f"vlffn_start_layer_index={VLFFN_START}",
    ])
    merged = torch.load(out, weights_only=False)["state_dict"]
    want = core.merge_weights(
        sd, num_layers=N_LAYERS, vlffn_start_layer_index=VLFFN_START,
        loss_names={"itm": 1, "ifm": 1, "mlm": 1}, merge_ratio=0.5)
    k = "transformer.blocks.0.mlp.fc1.weight"
    np.testing.assert_array_equal(merged[k].numpy(), want[k])
