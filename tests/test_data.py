"""Data layer tests: tokenizer, collators, arrow datasets, loaders."""

import os

import numpy as np
import pytest

from fixtures import make_fixture_root, WORDS
from vl_merging_tpu.config import build_config
from vl_merging_tpu.data import (
    MLMCollator, MTDataModule, ShardedBatchSampler, WordPieceTokenizer,
    build_tokenizer,
)
from vl_merging_tpu.data.masking_generator import MaskingGenerator
from vl_merging_tpu.data.transforms import SquareTransform, \
    SquareTransformRandaug, SquareTransformMim


@pytest.fixture(scope="module")
def root(tmp_path_factory):
    return make_fixture_root(tmp_path_factory.mktemp("arrow"))


@pytest.fixture(scope="module")
def tok(root):
    return build_tokenizer(os.path.join(root, "vocab.txt"))


def data_cfg(root, **over):
    overrides = dict(
        data_root=root, image_size=64, patch_size=16, max_text_len=16,
        max_text_len_of_initckpt=16, num_workers=2,
        tokenizer=os.path.join(root, "vocab.txt"),
    )
    overrides.update(over)
    return build_config(overrides=overrides)


def test_tokenizer_roundtrip(tok):
    enc = tok.encode("a dog plays with the red ball", max_length=16)
    assert enc["input_ids"][0] == tok.cls_token_id
    assert enc["input_ids"][len(enc["input_ids"]) - 1] == tok.sep_token_id
    assert enc["special_tokens_mask"][0] == 1
    toks = enc["tokens"]
    assert "dog" in toks


def test_mlm_collator_distribution(tok):
    encs = [tok.encode(" ".join(np.random.choice(WORDS, 12)), max_length=16)
            for _ in range(200)]
    coll = MLMCollator(tok, mlm_prob=0.15, seed=0)
    out = coll(encs, max_length=16)
    labels = out["mlm_labels"]
    ids = out["input_ids"]
    masked = labels != -100
    # masked rate over non-special positions ≈ 15%
    nonspecial = (ids != tok.pad_token_id) & (ids != tok.cls_token_id) & \
        (ids != tok.sep_token_id)
    rate = masked.sum() / nonspecial.sum()
    assert 0.10 < rate < 0.20, rate
    # ~80% of masked became [MASK]
    mask_frac = (out["mlm_input_ids"][masked] == tok.mask_token_id).mean()
    assert 0.7 < mask_frac < 0.9, mask_frac
    # labels preserve original ids at masked positions
    np.testing.assert_array_equal(labels[masked], ids[masked])
    # unmasked labels are ignored
    assert (labels[~masked] == -100).all()


def test_wwm_collator_masks_whole_words(tok):
    # "playing" tokenizes to multiple word pieces in the tiny vocab
    text = "playing playing playing playing playing playing"
    enc = tok.encode(text, max_length=32)
    tokens = enc["tokens"]
    assert any(t.startswith("##") for t in tokens)
    coll = MLMCollator(tok, mlm_prob=0.3, whole_word=True, seed=0)
    hit_any = False
    for trial in range(20):
        out = coll([enc], max_length=32)
        labels = out["mlm_labels"][0]
        masked = labels != -100
        if not masked.any():
            continue
        hit_any = True
        # every masked continuation token's word-start is masked too
        for i in np.where(masked)[0]:
            if tokens[i].startswith("##"):
                j = i
                while tokens[j].startswith("##"):
                    j -= 1
                assert masked[j], (i, j, tokens)
        # and conversely whole words are fully covered
        for i in np.where(masked)[0]:
            j = i + 1
            while j < len(tokens) and tokens[j].startswith("##"):
                assert masked[j], (i, j, tokens)
                j += 1
    assert hit_any


def test_transforms_shapes():
    from PIL import Image
    img = Image.fromarray(
        (np.random.rand(100, 80, 3) * 255).astype(np.uint8))
    out = SquareTransform(64)(img)
    assert out.shape == (3, 64, 64)
    assert out.min() >= -1.0 and out.max() <= 1.0
    out = SquareTransformRandaug(64)(img)
    assert out.shape == (3, 64, 64)
    v1, v2 = SquareTransformMim(64, 32)(img)
    assert v1.shape == (3, 64, 64) and v2.shape == (3, 32, 32)
    # dVAE view is logit-laplace mapped into (0.1, 0.9)
    assert v2.min() >= 0.1 - 1e-6 and v2.max() <= 0.9 + 1e-6


def test_masking_generator():
    import random as _random
    _random.seed(1234)  # the bound below is statistical, not universal —
    # rare RNG streams give 10 straight failed block attempts (delta==0
    # break) and a sum below 70; pin the stream so the test is
    # order-independent
    # the real config's window: 14x14 patches, 75 masked (config.py:161)
    gen = MaskingGenerator(14, num_masking_patches=75)
    # the block-wise sampler may fall a few short when the final block
    # can't fit (same as the reference's delta==0 break)
    for _ in range(5):
        m = gen()
        assert m.shape == (14, 14)
        assert 70 <= m.sum() <= 75 + 16


def test_masking_generator_3d_matches_executed_reference():
    """Bit-equal masks vs the reference's operative MaskingGenerator3D
    (the SECOND definition at masking_generator.py:165-235 — the first
    is shadowed) under a shared random seed: the per-attempt RNG call
    order (area, aspect, top, left, t_start, t_end) is identical."""
    import ast
    import math
    import random
    import types

    from vl_merging_tpu.data.masking_generator import MaskingGenerator3D

    path = "/root/reference/src/vilt/datasets/masking_generator.py"
    if not os.path.exists(path):
        pytest.skip("reference checkout not present")
    with open(path) as f:
        tree = ast.parse(f.read())
    cls = [n for n in tree.body if isinstance(n, ast.ClassDef)
           and n.name == "MaskingGenerator3D"][-1]
    # np.int was removed in numpy>=1.24; shim it for the exec'd oracle
    np_shim = types.SimpleNamespace(zeros=np.zeros, int=int)
    ns = {"np": np_shim, "math": math, "random": random}
    exec(compile(ast.Module(body=[cls], type_ignores=[]), path, "exec"), ns)
    RefGen = ns["MaskingGenerator3D"]

    for window, frames, n_mask, min_b in [(14, 4, 75 * 4, 16),
                                          (14, 2, 75 * 2, 4),
                                          (8, 3, 20 * 3, 4)]:
        ref = RefGen(window, frames, num_masking_patches=n_mask,
                     min_num_patches=min_b)
        ours = MaskingGenerator3D(window, frames, num_masking_patches=n_mask,
                                  min_num_patches=min_b)
        for seed in range(5):
            random.seed(seed)
            want = np.asarray(ref())
            random.seed(seed)
            got = ours()
            assert got.shape == (frames, window, window)
            np.testing.assert_array_equal(got, want)


def test_sharded_sampler_partition():
    idx_by_host = []
    for host in range(4):
        s = ShardedBatchSampler(103, batch_size=4, num_hosts=4,
                                host_index=host, seed=7)
        s.set_epoch(3)
        idx_by_host.append([i for b in s for i in b])
    # equal sizes, no overlap across hosts
    sizes = {len(x) for x in idx_by_host}
    assert sizes == {len(idx_by_host[0])}
    flat = sum(idx_by_host, [])
    assert len(flat) == len(set(flat))
    # deterministic given (seed, epoch)
    s2 = ShardedBatchSampler(103, 4, 4, 0, seed=7)
    s2.set_epoch(3)
    assert [i for b in s2 for i in b] == idx_by_host[0]


def test_sampler_single_host_tail_has_no_duplicates():
    """drop_last=False, num_hosts=1: the final batch is the true short
    tail — no wrap-around duplication (that exists only multi-host, for
    torch-DistributedSampler batch-count parity).  Eval loops handle
    device divisibility themselves via pad_to_multiple."""
    s = ShardedBatchSampler(10, batch_size=4, shuffle=False,
                            drop_last=False)
    batches = list(s)
    assert [len(b) for b in batches] == [4, 4, 2]
    assert sum(batches, []) == list(range(10))
    # multi-host keeps the wrap: equal batch counts on every host
    per_host = [list(ShardedBatchSampler(10, 4, num_hosts=2, host_index=h,
                                         shuffle=False, drop_last=False))
                for h in range(2)]
    assert all(len(b) == 4 for bs in per_host for b in bs)
    flat = [i for bs in per_host for b in bs for i in b]
    assert sorted(set(flat)) == list(range(10)) and len(flat) == 16


def test_caption_dataset_and_loader(root):
    cfg = data_cfg(root, datasets=["f30k"])
    dm = MTDataModule(cfg)
    loader = dm.train_loader(batch_size=4)
    batch = next(iter(loader))
    assert batch["image"].shape == (4, 3, 64, 64)
    assert batch["text_ids"].shape == (4, 16)
    assert batch["text_ids_mlm"].shape == (4, 16)
    assert batch["text_masks"].shape == (4, 16)
    assert (batch["text_labels"] == -100).all()
    # mlm labels only where masked
    masked = batch["text_labels_mlm"] != -100
    np.testing.assert_array_equal(batch["text_labels_mlm"][masked],
                                  batch["text_ids"][masked])


def test_vqa_dataset(root):
    cfg = data_cfg(root, datasets=["vqa"],
                   loss_names={"vqa": 1})
    dm = MTDataModule(cfg)
    batch = next(iter(dm.train_loader(batch_size=4)))
    assert batch["vqa_targets"].shape == (4, 3129)
    assert batch["image"].shape == (4, 3, 64, 64)
    assert len(batch["qid"]) == 4
    assert (batch["vqa_targets"].sum(axis=1) > 0).all()


def test_nlvr2_dataset(root):
    cfg = data_cfg(root, datasets=["nlvr2"], loss_names={"nlvr2": 1})
    dm = MTDataModule(cfg)
    batch = next(iter(dm.train_loader(batch_size=4)))
    assert batch["image_0"].shape == (4, 3, 64, 64)
    assert batch["image_1"].shape == (4, 3, 64, 64)
    assert set(np.asarray(batch["answers"]).tolist()) <= {0, 1}
    assert len(batch["table_name"]) == 4


def test_retrieval_eval_dsets(root):
    cfg = data_cfg(root, datasets=["f30k"])
    dm = MTDataModule(cfg)
    text_dset = dm.dms[0].make_no_false_test_dset()
    img_dset = dm.dms[0].make_no_false_test_dset(image_only=True)
    # text dset is caption-flattened; image dset one row per image
    assert len(text_dset) == 2 * len(img_dset) or len(text_dset) >= len(img_dset)
    s = text_dset[0]
    assert "encoding" in s and "img_index" in s


def test_mim_transform_batch(root):
    cfg = data_cfg(root, datasets=["f30k"],
                   train_transform_keys=["square_transform_randaug_mim"],
                   loss_names={"mim": 1, "itm": 1, "mlm": 1, "ifm": 1})
    dm = MTDataModule(cfg)
    batch = next(iter(dm.train_loader(batch_size=2)))
    assert batch["image"].shape == (2, 3, 64, 64)
    assert batch["image_target"].shape == (2, 3, 112, 112)
    assert batch["image_masked_pos"].shape == (2, 16)  # (64/16)^2


def test_wwm_statistics_match_hf(tok, root):
    """Distributional parity with HF's DataCollatorForWholeWordMask:
    similar masked-token rate and identical whole-word grouping rule."""
    import torch
    from transformers import DataCollatorForWholeWordMask, BertTokenizerFast

    # build an HF tokenizer from the same tiny vocab for the oracle
    hf_tok = BertTokenizerFast(vocab_file=os.path.join(root, "vocab.txt"),
                               lowercase=True)
    texts = [" ".join(np.random.RandomState(i).choice(WORDS, 10))
             for i in range(200)]
    hf_coll = DataCollatorForWholeWordMask(tokenizer=hf_tok,
                                           mlm_probability=0.15)
    hf_enc = [hf_tok(t, truncation=True, max_length=16) for t in texts]
    hf_out = hf_coll([{"input_ids": e["input_ids"]} for e in hf_enc])
    hf_rate = (hf_out["labels"] != -100).float().sum() / \
        sum(len(e["input_ids"]) - 2 for e in hf_enc)

    ours_enc = [tok.encode(t, max_length=16) for t in texts]
    coll = MLMCollator(tok, mlm_prob=0.15, whole_word=True, seed=0)
    out = coll(ours_enc, max_length=16)
    our_rate = (out["mlm_labels"] != -100).sum() / \
        sum(len(e["input_ids"]) - 2 for e in ours_enc)
    assert abs(float(hf_rate) - float(our_rate)) < 0.05, \
        (float(hf_rate), float(our_rate))


def _write_composite_fixture(root, n_shards=2, rows_per_shard=3, caps=2):
    """Tiny CCSV-style composite: visual + caption shard TSVs, a seq
    linelist (src, row, cap_idx), and the yaml glue."""
    import base64
    import json as _json

    import yaml as _yaml

    from fixtures import _jpeg_bytes
    from vl_merging_tpu.data.tsv import write_tsv

    rng = np.random.RandomState(0)
    img_files, cap_files, seq_rows = [], [], []
    for s in range(n_shards):
        vis_rows, cap_rows = [], []
        for r in range(rows_per_shard):
            key = f"img_{s}_{r}"
            b64 = base64.b64encode(_jpeg_bytes(rng, 48)).decode()
            vis_rows.append([key, b64])
            cap_rows.append([key, _json.dumps(
                [{"caption": f"caption {s} {r} {c}"} for c in range(caps)])])
            for c in range(caps):
                seq_rows.append(f"{s}\t{r}\t{c}")
        write_tsv(vis_rows, os.path.join(root, f"vis_{s}.tsv"))
        write_tsv(cap_rows, os.path.join(root, f"cap_{s}.tsv"))
        img_files.append(f"vis_{s}.tsv")
        cap_files.append(f"cap_{s}.tsv")
    with open(os.path.join(root, "seq.linelist"), "w") as f:
        f.write("\n".join(seq_rows))
    for split in ("train_cc3m-coco-sbu-vg", "val_cc3m-coco"):
        with open(os.path.join(root, f"{split}.yaml"), "w") as f:
            _yaml.safe_dump({"composite": True, "img": img_files,
                             "caption": cap_files,
                             "caption_linelist": "seq.linelist"}, f)
    return n_shards * rows_per_shard * caps


def test_ccsv_composite_dataset(tmp_path):
    """ccsv registry entry loads a yaml-driven composite
    (reference combine_tsv_dataset.py:25-37, tsv_dataset.py:50-511)."""
    from vl_merging_tpu.data.datasets import dataset_class
    from vl_merging_tpu.data.text import build_tokenizer, write_tiny_vocab

    root = str(tmp_path)
    total = _write_composite_fixture(root)
    vocab = os.path.join(root, "vocab.txt")
    write_tiny_vocab(vocab, ["caption"] + [str(i) for i in range(4)])
    tok = build_tokenizer(vocab)

    cls = dataset_class("ccsv")
    ds = cls(root, ["square_transform"], image_size=32, split="train",
             max_text_len=8, tokenizer=tok, patch_size=16)
    assert len(ds) == total
    item = ds[0]
    assert item["image"].shape == (3, 32, 32)
    assert item["text"].startswith("caption")
    # distinct captions per (row, cap_idx)
    assert ds[0]["text"] != ds[1]["text"]
    # last item reads the last shard through the seq indirection
    last = ds[len(ds) - 1]
    assert last["image"].shape == (3, 32, 32)


def test_tsv_composite_plain_with_linelist(tmp_path):
    """Non-composite yaml + 2-column linelist (img_row, cap_idx)."""
    import base64
    import json as _json

    import yaml as _yaml

    from fixtures import _jpeg_bytes
    from vl_merging_tpu.data.tsv import TSVCompositeDataset, write_tsv

    rng = np.random.RandomState(1)
    root = str(tmp_path)
    vis, cap, lines = [], [], []
    for r in range(3):
        b64 = base64.b64encode(_jpeg_bytes(rng, 48)).decode()
        vis.append([f"k{r}", b64])
        cap.append([f"k{r}", _json.dumps(
            [{"caption": f"one {r}"}, {"caption": f"two {r}"}])])
        lines += [f"{r}\t0", f"{r}\t1"]
    write_tsv(vis, os.path.join(root, "vis.tsv"))
    write_tsv(cap, os.path.join(root, "cap.tsv"))
    with open(os.path.join(root, "ll.linelist"), "w") as f:
        f.write("\n".join(lines))
    with open(os.path.join(root, "data.yaml"), "w") as f:
        _yaml.safe_dump({"img": "vis.tsv", "caption": "cap.tsv",
                         "caption_linelist": "ll.linelist"}, f)

    ds = TSVCompositeDataset(root, ["square_transform"], image_size=32,
                             split="val", yaml_file="data.yaml",
                             image_only=True)
    assert len(ds) == 6
    assert ds[3]["image"].shape == (3, 32, 32)
    assert ds._caption(1, 1) == "two 1"


def test_new_imagenet_tsv_dataset(tmp_path):
    """new_imagenet port (reference new_imagenet_dataset.py:8-42): caption
    TSV rows are class-annotation json; text = first annotation's 'class'
    string; class_label is hard-set to 0 (the reference parses then
    overwrites it)."""
    import base64
    import json as _json

    import yaml as _yaml

    from fixtures import _jpeg_bytes
    from vl_merging_tpu.data.datasets import dataset_class
    from vl_merging_tpu.data.text import build_tokenizer, write_tiny_vocab
    from vl_merging_tpu.data.tsv import write_tsv

    rng = np.random.RandomState(2)
    root = str(tmp_path)
    vis, cap = [], []
    classes = ["tench", "goldfish", "shark"]
    for r, cls_name in enumerate(classes):
        b64 = base64.b64encode(_jpeg_bytes(rng, 48)).decode()
        vis.append([f"k{r}", b64])
        cap.append([f"k{r}", _json.dumps([{"class": cls_name}])])
    write_tsv(vis, os.path.join(root, "vis.tsv"))
    write_tsv(cap, os.path.join(root, "cap.tsv"))
    with open(os.path.join(root, "train_imagenet-22k_30.yaml"), "w") as f:
        _yaml.safe_dump({"img": "vis.tsv", "caption": "cap.tsv"}, f)

    vocab = os.path.join(root, "vocab.txt")
    write_tiny_vocab(vocab, classes)
    tok = build_tokenizer(vocab)

    ds = dataset_class("new_imagenet")(
        root, ["square_transform"], image_size=32, split="train",
        max_text_len=8, tokenizer=tok, patch_size=16)
    assert len(ds) == 3
    item = ds[1]
    assert item["image"].shape == (3, 32, 32)
    assert item["text"] == "goldfish"
    assert item["class_label"] == 0  # reference :28 quirk

    # image_only suites never call get_text, so the key is absent
    # (reference emits class_label only from get_text :27-37)
    ds_img = dataset_class("new_imagenet")(
        root, ["square_transform"], image_size=32, split="train",
        max_text_len=8, tokenizer=tok, patch_size=16, image_only=True)
    assert "class_label" not in ds_img[1]


def test_didemo_dataset(tmp_path):
    """DiDeMo port (reference didemo_dataset.py:6-40): shared img_didemo.tsv
    for every split, txt_didemo-retrieval.json caption lists flattened
    one-per-caption, and "@"-suffixed video ids parsed to ints for
    retrieval grouping (get_video_id parity)."""
    import base64
    import json as _json

    from fixtures import _jpeg_bytes
    from vl_merging_tpu.data.datasets import dataset_class
    from vl_merging_tpu.data.tsv import write_tsv

    rng = np.random.RandomState(0)
    root = str(tmp_path)
    rows = []
    anns = []
    for i in range(3):
        vid = f"{100 + i}@flickr"
        b64 = base64.b64encode(_jpeg_bytes(rng, 48)).decode()
        rows.append([vid, "{}", b64, b64])
        anns.append({"video": vid,
                     "caption": [f"moment {i} a", f"moment {i} b"]})
    write_tsv(rows, os.path.join(root, "img_didemo.tsv"))
    with open(os.path.join(root, "txt_didemo-retrieval.json"), "w") as f:
        _json.dump(anns, f)

    cls = dataset_class("didemo")
    for split in ("train", "test"):
        ds = cls(root, transform_keys=["square_transform"], image_size=32,
                 split=split)
        assert len(ds) == 6  # 3 videos × 2 captions, flattened
        s = ds[1]
        assert s["image"].shape == (3, 32, 32)
        assert s["img_index"] == 100  # int("100@flickr".split("@")[0])
        assert ds[2]["img_index"] == 101
        assert s["cap_index"] == 1
