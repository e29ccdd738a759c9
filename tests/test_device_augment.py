"""device_augment wiring: dataset → canvas collate → host param sampling →
in-graph augment inside the train step.

Pixel parity of the in-graph ops themselves vs PIL is pinned in
tests/test_augment.py; these tests cover the production plumbing."""

import os
import sys

import jax.numpy as jnp
import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(__file__))

from fixtures import make_fixture_root  # noqa: E402

from vl_merging_tpu.config import build_config  # noqa: E402
from vl_merging_tpu.data.datamodule import MTDataModule  # noqa: E402
from vl_merging_tpu.models import make_model_spec, init_params  # noqa: E402
from vl_merging_tpu.train import (  # noqa: E402
    init_train_state, make_optimizer, make_schedule, make_train_step)
from vl_merging_tpu.train.train_step import (  # noqa: E402
    attach_augment_params, _device_augment_batch)


@pytest.fixture(scope="module")
def root(tmp_path_factory):
    return str(make_fixture_root(tmp_path_factory.mktemp("arrow")))


def _cfg(root, **over):
    base = dict(
        datasets=["coco"], data_root=root,
        tokenizer=os.path.join(root, "vocab.txt"),
        hidden_size=32, num_heads=2, num_layers=2, image_size=32,
        patch_size=16, max_text_len=12, max_text_len_of_initckpt=16,
        vlffn_start_layer_index=2, precision="f32",
        per_device_batch_size=1, batch_size=4, num_workers=0,
        max_steps=2, warmup_steps=0,
        device_augment=True, canvas_size=96,
        loss_names={"itm": 1, "mlm": 1, "ifm": 1})
    base.update(over)
    return build_config("ufo", overrides=base)


def test_loader_emits_canvas_not_image(root):
    cfg = _cfg(root)
    dm = MTDataModule(cfg)
    b = next(iter(dm.train_loader(4)))
    assert "image" not in b
    assert b["image_canvas"].dtype == np.uint8
    assert b["image_canvas"].shape == (4, 96, 96, 3)
    assert b["image_sizes"].shape == (4, 2)
    # fixture jpegs are 64x64: content occupies the top-left corner and
    # the rest of the canvas is the zero pad
    assert (b["image_sizes"] == 64).all()
    assert b["image_canvas"][:, 64:, :, :].max() == 0
    assert b["image_canvas"][:, :64, :64].max() > 0
    # eval split keeps the host transform
    vb = next(iter(dm.val_loader(4)))
    assert "image" in vb and "image_canvas" not in vb


def test_attach_params_then_device_batch_shapes(root):
    cfg = _cfg(root)
    dm = MTDataModule(cfg)
    b = next(iter(dm.train_loader(4)))
    rng = np.random.RandomState(0)
    b2 = attach_augment_params(dict(b), cfg, rng)
    assert "image_sizes" not in b2
    aug = sorted(k for k in b2 if k.startswith("aug_"))
    assert aug == ["aug_affine", "aug_crop", "aug_factor", "aug_flip",
                   "aug_op_apply", "aug_op_idx"]
    dev = _device_augment_batch(
        cfg, {k: jnp.asarray(v) if isinstance(v, np.ndarray) else v
              for k, v in b2.items() if not isinstance(v, list)})
    assert "image_canvas" not in dev and not any(
        k.startswith("aug_") for k in dev)
    img = np.asarray(dev["image"])
    assert img.shape == (4, 3, 32, 32)
    # inception-normalized output: within [-1, 1], not all constant
    assert img.min() >= -1.001 and img.max() <= 1.001
    assert img.std() > 0.05


def test_device_augment_train_step_end_to_end(root):
    cfg = _cfg(root)
    spec = make_model_spec(cfg)
    params = init_params(spec, 0)
    sched = make_schedule(cfg, 10)
    opt = make_optimizer(params, cfg, 10, sched)
    state = init_train_state(params, opt, seed=0)
    step = make_train_step(cfg, spec, opt, donate=False)

    dm = MTDataModule(cfg)
    b = attach_augment_params(next(iter(dm.train_loader(4))), cfg,
                              np.random.RandomState(0))
    feed = {k: jnp.asarray(v) for k, v in b.items()
            if isinstance(v, np.ndarray)}
    state2, metrics = step(state, feed)
    assert np.isfinite(float(metrics["total_loss"]))
    # different host params → different augmented pixels → different loss
    b2 = attach_augment_params(next(iter(dm.train_loader(4))), cfg,
                               np.random.RandomState(99))
    feed2 = {k: jnp.asarray(v) for k, v in b2.items()
             if isinstance(v, np.ndarray)}
    _, m2 = step(state, feed2)
    assert float(m2["total_loss"]) != float(metrics["total_loss"])


def test_device_augment_rejects_mim_and_false_images(root):
    from vl_merging_tpu.data.arrow_dataset import ArrowDataset

    with pytest.raises(ValueError, match="MIM"):
        ArrowDataset(root, ["square_transform_randaug_mim"], 32,
                     names=["coco_caption_karpathy_train"],
                     text_column_name="caption", device_augment=True)
    with pytest.raises(ValueError, match="false_image"):
        ArrowDataset(root, ["square_transform_randaug"], 32,
                     names=["coco_caption_karpathy_train"],
                     text_column_name="caption", device_augment=True,
                     draw_false_image=1)
