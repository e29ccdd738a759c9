"""Checkpoint surgery / I / O tests, incl. torch-bicubic parity."""

import numpy as np
import pytest
import torch

from vl_merging_tpu.ckpt import (
    bicubic_resize, insert_expert_names, clone_vision_weights,
    load_torch_checkpoint, save_torch_checkpoint, state_dict_to_params,
    modify_checkpoint_vlmo,
)
from vl_merging_tpu.ckpt.surgery import import_beit_bias_table
from vl_merging_tpu.ckpt.pipeline import load_params
from vl_merging_tpu.config import build_config
from vl_merging_tpu.models import make_model_spec, init_params


def test_bicubic_matches_torch():
    rng = np.random.RandomState(0)
    for (h, w, oh, ow) in [(27, 27, 47, 47), (47, 47, 27, 27), (5, 7, 13, 11)]:
        x = rng.randn(4, h, w).astype(np.float32)
        mine = bicubic_resize(x, (oh, ow))
        ref = torch.nn.functional.interpolate(
            torch.from_numpy(x).unsqueeze(0), size=(oh, ow),
            mode="bicubic").squeeze(0).numpy()
        np.testing.assert_allclose(mine, ref, atol=5e-5)


def test_vlmo_surgery_resolution_change():
    """224→384 rescale of the image block; text rows untouched."""
    window_src, window_dst = 14, 24  # 224/16, 384/16
    text_rel = 2 * 16
    src_sz, dst_sz = 2 * window_src - 1, 2 * window_dst - 1
    rows_src = src_sz * src_sz + 3 + text_rel + 2
    rows_dst = dst_sz * dst_sz + 3 + text_rel + 2
    rng = np.random.RandomState(0)
    sd = {
        "relative_position_bias_table": rng.randn(rows_src, 6).astype(np.float32),
        "text_embeddings.position_embeddings.weight":
            rng.randn(40, 8).astype(np.float32),
        "text_embeddings.position_ids": np.arange(40)[None],
        "relative_position_index": np.zeros((5, 5)),
    }
    out = modify_checkpoint_vlmo(
        sd, max_text_len=24, text_num_relative_distance=text_rel,
        target_table_rows=rows_dst)
    assert out["relative_position_bias_table"].shape == (rows_dst, 6)
    # trailing non-image rows are copied verbatim
    non_image = text_rel + 2 + 3
    np.testing.assert_array_equal(
        out["relative_position_bias_table"][-non_image:],
        sd["relative_position_bias_table"][-non_image:])
    # text position embeddings truncated, index buffers gone; position_ids
    # kept but truncated like the reference (vilt_module.py:758-759) — the
    # schema filter in io.state_dict_to_params drops it at load time
    assert out["text_embeddings.position_embeddings.weight"].shape[0] == 24
    assert "relative_position_index" not in out
    assert out["text_embeddings.position_ids"].shape == (1, 24)


def test_beit_table_import_shared():
    """Shared BEiT table is tiled across layers; text rows come from the
    target's init table."""
    window = 7
    src_rows = (2 * window - 1) ** 2 + 3
    heads, layers = 3, 4
    text_rel = 2 * 8
    dst_rows = (2 * window - 1) ** 2 + 3 + text_rel + 2
    rng = np.random.RandomState(0)
    sd = {
        "transformer.rel_pos_bias.relative_position_bias_table":
            rng.randn(src_rows, heads).astype(np.float32),
        "transformer.rel_pos_bias.relative_position_index": np.zeros((50, 50)),
    }
    target = rng.randn(dst_rows, heads * layers).astype(np.float32)
    import_beit_bias_table(sd, num_layers=layers, target_table=target,
                           text_num_relative_distance=text_rel)
    table = sd["relative_position_bias_table"]
    assert table.shape == (dst_rows, heads * layers)
    # image rows tiled identically across layers (same src size → no resize)
    np.testing.assert_array_equal(table[:-text_rel - 2 - 3, :heads],
                                  table[:-text_rel - 2 - 3, heads:2 * heads])
    # text rows from target init
    np.testing.assert_array_equal(table[-(text_rel + 2):],
                                  target[-(text_rel + 2):])


def test_insert_expert_names_and_clone():
    sd = {
        "transformer.blocks.0.mlp.fc1.weight": np.ones((2, 2)),
        "transformer.blocks.0.attn.qkv.weight": np.ones((6, 2)),
        "transformer.blocks.0.attn.q_bias": np.ones(2),
        "transformer.blocks.0.norm1.weight": np.ones(2),
        "transformer.blocks.0.norm2.weight": np.ones(2),
        "transformer.blocks.2.mlp.fc2.weight": np.ones((2, 2)),
        "transformer.norm.weight": np.ones(2),
    }
    out = insert_expert_names(sd, moe_in_ffn=True, moe_in_attn=True,
                              custom_ln_attn=True, custom_ln_ffn=True)
    assert "transformer.blocks.0.mlp.v.fc1.weight" in out
    assert "transformer.blocks.0.attn.v.qkv.weight" in out
    assert "transformer.blocks.0.attn.v.q_bias" in out
    assert "transformer.blocks.0.norm1.v.weight" in out
    assert "transformer.blocks.0.norm2.v.weight" in out
    assert "transformer.norm.weight" in out  # untouched

    cloned = clone_vision_weights(out, vlffn_start_layer_index=2)
    assert "transformer.blocks.0.mlp.l.fc1.weight" in cloned
    assert "transformer.blocks.0.mlp.vl.fc1.weight" not in cloned  # shallow
    assert "transformer.blocks.2.mlp.vl.fc2.weight" in cloned      # deep


def test_torch_roundtrip_and_param_mapping(tmp_path):
    cfg = build_config(
        "task_test_vit_tiny_mlm_itm_ifm_square_randaug_base_vl", "ufo",
        overrides=dict(num_layers=2, hidden_size=32, num_heads=2,
                       image_size=32, max_text_len=8,
                       max_text_len_of_initckpt=16,
                       vlffn_start_layer_index=1, precision="f32"))
    spec = make_model_spec(cfg)
    params = init_params(spec, 0)
    sd = {k: np.asarray(v) for k, v in params.items()}
    path = str(tmp_path / "ckpt.pth")
    save_torch_checkpoint(sd, path)
    sd2 = load_torch_checkpoint(path)
    assert set(sd2) == set(sd)
    for k in sd:
        np.testing.assert_array_equal(sd[k], sd2[k])

    loaded, missing, unexpected = state_dict_to_params(sd2, spec)
    assert not missing and not unexpected

    # drop one key → missing; add one → unexpected
    sd3 = dict(sd2)
    sd3.pop("pooler.dense.weight")
    sd3["garbage.key"] = np.zeros(3)
    _, missing, unexpected = state_dict_to_params(sd3, spec)
    assert missing == ["pooler.dense.weight"]
    assert unexpected == ["garbage.key"]


def test_load_params_pipeline_with_merge(tmp_path):
    """all_moe checkpoint + merge_weights → loads cleanly into a ufo model."""
    over = dict(num_layers=2, hidden_size=32, num_heads=2, image_size=32,
                max_text_len=8, max_text_len_of_initckpt=16,
                vlffn_start_layer_index=1, precision="f32")
    moe_cfg = build_config(
        "task_test_vit_tiny_mlm_itm_ifm_square_randaug_base_vl", "all_moe",
        overrides=over)
    moe_spec = make_model_spec(moe_cfg)
    sd = {k: np.asarray(v) for k, v in init_params(moe_spec, 0).items()}
    path = str(tmp_path / "moe.ckpt")
    save_torch_checkpoint(sd, path)

    ufo_cfg = build_config(
        "task_test_vit_tiny_mlm_itm_ifm_square_randaug_base_vl", "ufo",
        overrides=dict(over, load_path=path, merge_weights=True,
                       merge_ratio=0.5))
    ufo_spec = make_model_spec(ufo_cfg)
    params, missing, unexpected = load_params(ufo_cfg, ufo_spec)
    # all trunk weights come from the merged checkpoint
    trunk_missing = [k for k in missing if k.startswith("transformer.blocks")]
    assert trunk_missing == []
    # merged value check: layer 0 (shallow) mlp = mean of v/l experts
    want = 0.5 * sd["transformer.blocks.0.mlp.v.fc1.weight"] \
        + 0.5 * sd["transformer.blocks.0.mlp.l.fc1.weight"]
    np.testing.assert_allclose(
        np.asarray(params["transformer.blocks.0.mlp.fc1.weight"]), want,
        rtol=1e-6)


def test_beit_pipeline_into_all_moe(tmp_path):
    """BEiT image-only checkpoint → expert renames + v→l/vl cloning →
    loads into an all_moe model (the pretraining-init path,
    vilt_module.py:808-972)."""
    over = dict(num_layers=2, hidden_size=32, num_heads=2, image_size=32,
                max_text_len=8, max_text_len_of_initckpt=16,
                vlffn_start_layer_index=1, precision="f32",
                use_beit_weight=True,
                use_vision_weights_for_other_modalities=True)
    cfg = build_config(
        "task_test_vit_tiny_mlm_itm_ifm_square_randaug_base_vl", "all_moe",
        overrides=over)
    spec = make_model_spec(cfg)

    # synthesize a beit-style checkpoint: expert-free trunk + shared
    # rel-pos table with only image buckets (+3)
    rng = np.random.RandomState(0)
    hs, window = 32, 2
    src_rows = (2 * window - 1) ** 2 + 3
    sd = {}
    for i in range(2):
        p = f"transformer.blocks.{i}"
        sd[f"{p}.attn.qkv.weight"] = rng.randn(3 * hs, hs).astype(np.float32)
        sd[f"{p}.attn.q_bias"] = rng.randn(hs).astype(np.float32)
        sd[f"{p}.attn.v_bias"] = rng.randn(hs).astype(np.float32)
        sd[f"{p}.attn.proj.weight"] = rng.randn(hs, hs).astype(np.float32)
        sd[f"{p}.attn.proj.bias"] = rng.randn(hs).astype(np.float32)
        sd[f"{p}.mlp.fc1.weight"] = rng.randn(4 * hs, hs).astype(np.float32)
        sd[f"{p}.mlp.fc1.bias"] = rng.randn(4 * hs).astype(np.float32)
        sd[f"{p}.mlp.fc2.weight"] = rng.randn(hs, 4 * hs).astype(np.float32)
        sd[f"{p}.mlp.fc2.bias"] = rng.randn(hs).astype(np.float32)
        for nrm in ("norm1", "norm2"):
            sd[f"{p}.{nrm}.weight"] = np.ones(hs, np.float32)
            sd[f"{p}.{nrm}.bias"] = np.zeros(hs, np.float32)
        sd[f"{p}.gamma_1"] = np.full(hs, 0.1, np.float32)
        sd[f"{p}.gamma_2"] = np.full(hs, 0.1, np.float32)
    sd["transformer.rel_pos_bias.relative_position_bias_table"] = \
        rng.randn(src_rows, 2).astype(np.float32)
    sd["transformer.rel_pos_bias.relative_position_index"] = \
        np.zeros((5, 5), np.int64)
    sd["transformer.fc_norm.weight"] = np.ones(hs, np.float32)
    sd["transformer.fc_norm.bias"] = np.zeros(hs, np.float32)
    sd["transformer.cls_token"] = rng.randn(1, 1, hs).astype(np.float32)
    sd["transformer.patch_embed.proj.weight"] = \
        rng.randn(hs, 3, 16, 16).astype(np.float32)
    sd["transformer.patch_embed.proj.bias"] = rng.randn(hs).astype(np.float32)

    path = str(tmp_path / "beit.ckpt")
    save_torch_checkpoint(sd, path)
    cfg["load_path"] = path
    params, missing, unexpected = load_params(cfg, spec)

    # v expert got the beit weights; l and (deep layer) vl are clones
    np.testing.assert_array_equal(
        np.asarray(params["transformer.blocks.0.attn.v.qkv.weight"]),
        sd["transformer.blocks.0.attn.qkv.weight"])
    np.testing.assert_array_equal(
        np.asarray(params["transformer.blocks.0.mlp.l.fc1.weight"]),
        sd["transformer.blocks.0.mlp.fc1.weight"])
    np.testing.assert_array_equal(
        np.asarray(params["transformer.blocks.1.mlp.vl.fc2.weight"]),
        sd["transformer.blocks.1.mlp.fc2.weight"])
    # custom LNs renamed into expert slots
    np.testing.assert_array_equal(
        np.asarray(params["transformer.blocks.0.norm1.v.weight"]),
        sd["transformer.blocks.0.norm1.weight"])
    # fc_norm renamed into final norm
    np.testing.assert_array_equal(
        np.asarray(params["transformer.norm.weight"]),
        sd["transformer.fc_norm.weight"])
    # table rebuilt to the fused layout
    assert params["relative_position_bias_table"].shape == \
        (spec.all_num_relative_distance, spec.num_heads * spec.num_layers)


def test_nlvr2_token_type_expansion():
    """(2, hs) pretrain table → (3, hs) with row 2 ← row 1
    (reference vilt_module.py:332-337)."""
    from vl_merging_tpu.ckpt.pipeline import expand_token_types

    class FakeSpec:
        token_type_count = 3

    tt = np.arange(16, dtype=np.float32).reshape(2, 8)
    out = expand_token_types({"token_type_embeddings.weight": tt}, FakeSpec())
    got = out["token_type_embeddings.weight"]
    assert got.shape == (3, 8)
    np.testing.assert_array_equal(got[0], tt[0])
    np.testing.assert_array_equal(got[1], tt[1])
    np.testing.assert_array_equal(got[2], tt[1])

    # already 3 rows (e.g. an nlvr2 test checkpoint) → untouched
    tt3 = np.arange(24, dtype=np.float32).reshape(3, 8)
    out3 = expand_token_types({"token_type_embeddings.weight": tt3}, FakeSpec())
    np.testing.assert_array_equal(out3["token_type_embeddings.weight"], tt3)
