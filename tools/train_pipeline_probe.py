#!/usr/bin/env python
"""Input-pipeline-INCLUDED training step (VERDICT r3 #7).

Every training number so far (137 ex/s/chip) feeds one synthetic
device-resident batch; this probe runs real jpegs through the threaded
loader (decode + RandAugment + collate + WWM-style MLM masking) feeding
``make_train_step`` on the TPU, and reports ex/s with a host-vs-device
phase split so the bottleneck is NAMED (reference hot loop:
src/vilt/datasets/base_dataset.py:183-253 runs this in torch DataLoader
worker processes).

Caveat printed with the result: this dev box has ONE cpu core (CLAUDE.md)
— a real v5e host has dozens, so the host-side ex/s here is a floor, and
the per-image host COST (ms of CPU per example) is the portable number.

Run: python tools/train_pipeline_probe.py [n_images] [steps] [mode]

mode ∈ {host, device, both}: `host` is the reference-style pipeline (PIL
decode + host RandAugment + host MLM collator); `device` turns on
device_augment + device_mlm — the loader only decodes and pads, and the
image/text transform work compiles into the train step's XLA graph.
"""
import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tests"))

import numpy as np


def _write_fixture(root: str, n_images: int, size: int = 448) -> None:
    """COCO-shaped arrow with realistically-sized jpegs (COCO averages
    ~640x480; tests use 64px thumbnails that would understate decode)."""
    import io
    import random

    import pyarrow as pa
    from PIL import Image

    from fixtures import WORDS, _write

    nprng = np.random.RandomState(0)
    rng = random.Random(0)
    rows = []
    for i in range(n_images):
        # low-frequency content compresses like a real photo (pure noise
        # jpegs decode unrealistically slowly at high quality)
        small = (nprng.rand(size // 8, size // 8, 3) * 255).astype(np.uint8)
        img = Image.fromarray(small).resize((size + 64, size),
                                            Image.BICUBIC)
        buf = io.BytesIO()
        img.save(buf, format="JPEG", quality=90)
        caps = [" ".join(rng.choice(WORDS) for _ in range(rng.randint(6, 14)))
                for _ in range(5)]
        rows.append([buf.getvalue(), caps, f"COCO_{i:012d}.jpg", "train"])
    table = pa.Table.from_arrays(
        [pa.array([r[j] for r in rows]) for j in range(4)],
        names=["image", "caption", "image_id", "split"])
    _write(table, os.path.join(root, "coco_caption_karpathy_train.arrow"))


def main(n_images=256, steps=8, mode="host"):
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from fixtures import WORDS
    from vl_merging_tpu.config import build_config
    from vl_merging_tpu.data.datamodule import MTDataModule
    from vl_merging_tpu.data.text import write_tiny_vocab
    from vl_merging_tpu.models import make_model_spec, init_params
    from vl_merging_tpu.train import (
        init_train_state, make_optimizer, make_schedule, make_train_step)
    from vl_merging_tpu.train.train_step import attach_augment_params

    B = 22                       # the reference's per-GPU batch
    root = tempfile.mkdtemp(prefix="trainpipe_")
    _write_fixture(root, n_images)
    vocab = os.path.join(root, "vocab.txt")
    write_tiny_vocab(vocab, list(WORDS))

    device_mode = mode == "device"
    over = dict(precision="bf16", max_steps=1000, warmup_steps=0,
                data_root=root, datasets=["coco"], tokenizer=vocab,
                num_workers=4, per_device_batch_size=B,
                batch_size=B)
    if device_mode:
        over.update(device_augment=True, device_mlm=True,
                    whole_word_masking=True, mask_token_id=103,
                    canvas_size=512)  # fixture natives are 512x448
    cfg = build_config("task_mlm_itm_ifm_square_randaug_base", "all_moe",
                       overrides=over)
    spec = make_model_spec(cfg)
    params = init_params(spec, seed=0)
    sched = make_schedule(cfg, cfg["max_steps"])
    opt = make_optimizer(params, cfg, cfg["max_steps"], sched)
    state = init_train_state(params, opt, seed=0)
    step_fn = make_train_step(cfg, spec, opt, donate=True)

    dm = MTDataModule(cfg)
    loader = dm.train_loader(B)
    aug_rng = np.random.RandomState(0)

    def to_device(b):
        if device_mode:
            b = attach_augment_params(dict(b), cfg, aug_rng)
        return {k: jnp.asarray(v) for k, v in b.items()
                if isinstance(v, np.ndarray)}

    # compile off the clock
    it = iter(loader)
    first = to_device(next(it))
    state, m = step_fn(state, first)
    np.asarray(m["total_loss"])

    host_s = 0.0
    feed_s = 0.0
    n_done = 0
    t0 = time.time()
    for _ in range(steps):
        th = time.time()
        try:
            b = next(it)
        except StopIteration:
            it = iter(loader)
            b = next(it)
        host_s += time.time() - th
        tf_ = time.time()
        db = to_device(b)
        feed_s += time.time() - tf_
        state, m = step_fn(state, db)
        n_done += len(b["text_ids"])  # device mode has image_canvas, not image
    np.asarray(m["total_loss"])
    total = time.time() - t0

    # host-only cost per example, measured without the device in the loop
    it2 = iter(loader)
    next(it2)
    t1 = time.time()
    n_host = 0
    for _ in range(min(4, steps)):
        b = next(it2)
        n_host += len(b["text_ids"])
    host_only = (time.time() - t1) / n_host

    print(json.dumps({
        "probe": "train_pipeline_e2e",
        "mode": mode,
        "examples_per_sec": round(n_done / total, 2),
        "steps": steps, "batch": B,
        "phase_split_s": {"host_next_batch": round(host_s, 2),
                          "device_feed": round(feed_s, 2),
                          "total": round(total, 2)},
        "host_only_ms_per_example": round(host_only * 1e3, 2),
        "device_only_ex_per_sec_reference": 137.1,
        "note": ("single-core dev box; host ms/example is the portable "
                 "number — a v5e host with N cores divides it by ~N"),
    }))


if __name__ == "__main__":
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 256
    s = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    m = sys.argv[3] if len(sys.argv) > 3 else "host"
    for one_mode in (("host", "device") if m == "both" else (m,)):
        main(n, s, one_mode)
