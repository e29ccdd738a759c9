"""TSV datasets + mixed single/multi-modal (v/l/vl) training e2e."""

import base64
import io
import os

import jax
import numpy as np
import pytest
from PIL import Image

from fixtures import make_fixture_root, WORDS
from vl_merging_tpu.config import build_config
from vl_merging_tpu.data.tsv import TSVFile, TSVImageDataset, write_tsv


def _b64_jpeg(seed, size=48):
    arr = (np.random.RandomState(seed).rand(size, size, 3) * 255
           ).astype(np.uint8)
    buf = io.BytesIO()
    Image.fromarray(arr).save(buf, format="JPEG")
    return base64.b64encode(buf.getvalue()).decode("ascii")


@pytest.fixture(scope="module")
def root(tmp_path_factory):
    root = make_fixture_root(tmp_path_factory.mktemp("mixed"))
    # imagenet22k-style TSV shard
    rows = [[f"img{i}", '[{"class": "tabby_cat"}]', _b64_jpeg(i)]
            for i in range(8)]
    write_tsv(rows, os.path.join(root, "imagenet22k_train.tsv"))
    # text-only corpus
    with open(os.path.join(root, "text.txt"), "w") as f:
        for i in range(32):
            f.write(" ".join(np.random.RandomState(i).choice(WORDS, 6)) + "\n")
    return root


def test_tsv_file_random_access(root):
    tsv = TSVFile(os.path.join(root, "imagenet22k_train.tsv"))
    assert len(tsv) == 8
    row = tsv[5]
    assert row[0] == "img5"
    assert row[1] == '[{"class": "tabby_cat"}]'
    # lineidx reused on reopen
    tsv2 = TSVFile(os.path.join(root, "imagenet22k_train.tsv"))
    assert tsv2[0][0] == "img0"


def test_tsv_image_dataset(root):
    ds = TSVImageDataset(
        data_dir=root, names=["imagenet22k_train"],
        transform_keys=["square_transform_randaug_mim"], image_size=32,
        patch_size=16, dvae_image_size=16, image_only=True)
    s = ds[3]
    assert s["image"].shape == (3, 32, 32)
    assert s["image_target"].shape == (3, 16, 16)
    assert s["image_masked_pos"].shape == (4,)  # (32/16)^2


def test_mixed_task_training(root, tmp_path):
    """tasks=['v','l','vl'] through the Trainer: image-only MIM +
    text-only MLM + VL losses in one step (reference
    multi_multitask_datamodule.py + vilt_module.py:1474-1489)."""
    from vl_merging_tpu.data.datamodule import MultiMTDataModule
    from vl_merging_tpu.train.loop import Trainer

    cfg = build_config(overrides=dict(
        tasks=["v", "l", "vl"],
        datasets=[["imagenet"], ["wikipedia"], ["f30k"]],
        data_roots=[[root], [os.path.join(root, "text.txt")], [root]],
        loss_names={"image_only_mim": 1, "text_only_mlm": 1,
                    "itm": 1, "mlm": 1, "ifm": 1},
        train_transform_keys=["square_transform_randaug_mim"],
        val_transform_keys=["square_transform_mim"],
        data_root=root, log_dir=str(tmp_path / "logs"),
        tokenizer=os.path.join(root, "vocab.txt"),
        hidden_size=32, num_heads=2, num_layers=2, image_size=32,
        patch_size=16, dvae_image_size=16,
        max_text_len=16, max_text_len_of_initckpt=16, max_vl_text_len=16,
        vlffn_start_layer_index=1, precision="f32",
        per_device_batch_size=1, batch_size=8, num_workers=2,
        max_steps=2, warmup_steps=0, fast_dev_run=True,
    ))
    dm = MultiMTDataModule(cfg)
    batch = next(iter(dm.train_loader(4)))
    assert set(batch) == {"v", "l", "vl"}
    assert batch["v"]["image"].shape == (4, 3, 32, 32)
    assert batch["l"]["text_ids_mlm"].shape[0] == 4
    assert batch["vl"]["image"].shape == (4, 3, 32, 32)

    # fake dVAE labels (no released weights in CI)
    def mim_label_fn(b):
        shape = (b["image_masked_pos"].shape[0],
                 b["image_masked_pos"].shape[1])
        return jax.numpy.zeros(shape, jax.numpy.int32)

    trainer = Trainer(cfg, mim_label_fn=mim_label_fn)
    trainer.fit(dm)
    assert int(trainer.state.step) >= 1


def test_mixed_task_grad_accumulation(root, tmp_path):
    """batch_size > per_device*devices with nested {'v','l','vl'} batches:
    Trainer._stack_micro must stack each task sub-dict's leaves into the
    (accum, micro, …) layout (regression: it used to jnp.stack the task
    dicts themselves and crash)."""
    from vl_merging_tpu.data.datamodule import MultiMTDataModule
    from vl_merging_tpu.train.loop import Trainer

    cfg = build_config(overrides=dict(
        tasks=["l", "vl"],
        datasets=[["wikipedia"], ["f30k"]],
        data_roots=[[os.path.join(root, "text.txt")], [root]],
        loss_names={"text_only_mlm": 1, "itm": 1, "mlm": 1, "ifm": 1},
        data_root=root, log_dir=str(tmp_path / "logs"),
        tokenizer=os.path.join(root, "vocab.txt"),
        hidden_size=32, num_heads=2, num_layers=2, image_size=32,
        patch_size=16, max_text_len=16, max_text_len_of_initckpt=16,
        max_vl_text_len=16, vlffn_start_layer_index=1, precision="f32",
        per_device_batch_size=1, batch_size=16, num_workers=0,
        max_steps=1, warmup_steps=0, fast_dev_run=True,
    ))
    dm = MultiMTDataModule(cfg)
    trainer = Trainer(cfg)
    assert trainer.accum_steps == 2  # 16 / (1 * 8 devices)
    trainer.fit(dm)
    assert int(trainer.state.step) >= 1


def test_vl_text_len_clamped_to_text_len():
    """max_vl_text_len truncates the vl window of the max_text_len-sized
    rel-pos index (reference vilt_module.py:195-201) — the reference's
    [:max_vl_text_len] slice CLAMPS when it is >= max_text_len, so
    build_config normalizes that case to None (no truncation) instead of
    letting a stale over-long value crash the first step (full matrix in
    tests/test_config.py)."""
    cfg = build_config(overrides=dict(max_text_len=16, max_vl_text_len=40))
    assert cfg["max_vl_text_len"] is None


def test_msrvtt_frame_dataset(root, tmp_path):
    """Frame-TSV video dataset: single-frame sampling + captions."""
    import json
    from vl_merging_tpu.data.video import MSRVTTDataset
    from vl_merging_tpu.data.text import build_tokenizer

    vdir = str(tmp_path / "video")
    rows = [[f"video{i}", "{}", _b64_jpeg(i), _b64_jpeg(i + 50),
             _b64_jpeg(i + 100)] for i in range(4)]
    write_tsv(rows, os.path.join(vdir, "msrvtt_train.tsv"))
    caps = {f"video{i}": [f"a clip number {i}", f"again {i}"]
            for i in range(4)}
    with open(os.path.join(vdir, "msrvtt_train.caption.json"), "w") as f:
        json.dump(caps, f)

    tok = build_tokenizer(os.path.join(root, "vocab.txt"))
    ds = MSRVTTDataset(
        data_dir=vdir, transform_keys=["square_transform"], image_size=32,
        max_text_len=12, tokenizer=tok, split="train")
    assert len(ds) == 8  # 4 videos x 2 captions
    s = ds[3]
    assert s["image"].shape == (3, 32, 32)
    assert "encoding" in s and s["text"].startswith(("a clip", "again"))

    # eval split: deterministic middle frame
    ds_eval = MSRVTTDataset(
        data_dir=vdir, names=["msrvtt_train"], transform_keys=["square_transform"],
        image_size=32, max_text_len=12, tokenizer=tok, split="val")
    a = ds_eval[0]["image"]
    b = ds_eval[0]["image"]
    np.testing.assert_array_equal(a, b)


def test_msrvtt_multi_frame_sampling(root, tmp_path):
    """size_frame>1 stacks (T, C, H, W) with clip-strided frame selection
    (reference msrvtt_dataset.py:130-155; config num_frames)."""
    import json
    from vl_merging_tpu.data.video import MSRVTTDataset
    from vl_merging_tpu.data.text import build_tokenizer

    vdir = str(tmp_path / "video")
    rows = [[f"video{i}", "{}"] + [_b64_jpeg(i + 7 * j) for j in range(5)]
            for i in range(2)]
    write_tsv(rows, os.path.join(vdir, "msrvtt_train.tsv"))
    caps = {f"video{i}": [f"clip {i}"] for i in range(2)}
    with open(os.path.join(vdir, "msrvtt_train.caption.json"), "w") as f:
        json.dump(caps, f)

    tok = build_tokenizer(os.path.join(root, "vocab.txt"))
    ds = MSRVTTDataset(
        data_dir=vdir, transform_keys=["square_transform"], image_size=32,
        max_text_len=12, tokenizer=tok, split="train", size_frame=2)
    s = ds[0]
    assert s["image"].shape == (2, 3, 32, 32)

    # eval multi-frame: deterministic even spread over the whole clip
    ds_eval = MSRVTTDataset(
        data_dir=vdir, names=["msrvtt_train"],
        transform_keys=["square_transform"], image_size=32,
        max_text_len=12, tokenizer=tok, split="val", size_frame=3)
    assert ds_eval.temporal_sample(5, random_sample=False,
                                   center_frame=False) == [0, 2, 4]
    a = ds_eval[0]["image"]
    assert a.shape == (3, 3, 32, 32)
    np.testing.assert_array_equal(a, ds_eval[0]["image"])


def test_video_mim_masks(root, tmp_path):
    """Video MIM (reference tsv_dataset.py:85-101): multi-frame items emit
    stacked two-view pairs plus a (T*H*W) 3D block mask scaled by the
    frame count; single-frame falls back to the 2D generator."""
    import json
    from vl_merging_tpu.data.video import MSRVTTDataset
    from vl_merging_tpu.data.masking_generator import (
        MaskingGenerator, MaskingGenerator3D)
    from vl_merging_tpu.data.text import build_tokenizer

    vdir = str(tmp_path / "video")
    rows = [[f"video{i}", "{}"] + [_b64_jpeg(i + 7 * j) for j in range(4)]
            for i in range(2)]
    write_tsv(rows, os.path.join(vdir, "msrvtt_train.tsv"))
    caps = {f"video{i}": [f"clip {i}"] for i in range(2)}
    with open(os.path.join(vdir, "msrvtt_train.caption.json"), "w") as f:
        json.dump(caps, f)

    tok = build_tokenizer(os.path.join(root, "vocab.txt"))
    common = dict(
        data_dir=vdir, names=["msrvtt_train"],
        transform_keys=["square_transform_mim"], image_size=64,
        patch_size=16, num_mask_patches=4, min_mask_patches_per_block=1,
        dvae_image_size=32, max_text_len=12, tokenizer=tok, split="train")

    ds = MSRVTTDataset(size_frame=2, **common)
    assert isinstance(ds.masked_position_generator, MaskingGenerator3D)
    # num_masking_patches scales with the frame count (tsv_dataset.py:96)
    assert ds.masked_position_generator.num_masking_patches == 8
    s = ds[0]
    assert s["image"].shape == (2, 3, 64, 64)
    assert s["image_target"].shape == (2, 3, 32, 32)
    assert s["image_masked_pos"].shape == (2 * 4 * 4,)
    # block sampling may fall short only when 10 attempts in a row fail
    assert 4 <= s["image_masked_pos"].sum() <= 32

    ds1 = MSRVTTDataset(size_frame=1, **common)
    assert isinstance(ds1.masked_position_generator, MaskingGenerator)
    s1 = ds1[0]
    assert s1["image"].shape == (3, 64, 64)
    assert s1["image_masked_pos"].shape == (4 * 4,)
