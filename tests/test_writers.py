"""Arrow-writer tests: raw fixtures → .arrow → our datasets load them."""

import io
import json
import os

import numpy as np
import pytest
from PIL import Image

from vl_merging_tpu.utils.glossary import normalize_word
from vl_merging_tpu.utils.write_arrows import (
    build_answer_vocab, get_score, make_arrow_nlvr2, make_arrow_vqa,
)


def _save_jpg(path, seed=0, size=48):
    os.makedirs(os.path.dirname(path), exist_ok=True)
    arr = (np.random.RandomState(seed).rand(size, size, 3) * 255
           ).astype(np.uint8)
    Image.fromarray(arr).save(path, format="JPEG" if path.endswith(".jpg")
                              else "PNG")


def test_normalize_word():
    assert normalize_word("Dont") == "don't"
    assert normalize_word("two") == "2"
    assert normalize_word("a dog") == "dog"
    assert normalize_word("yes!") == "yes"
    assert normalize_word("1,000") == "1000"


def test_get_score():
    assert [get_score(i) for i in range(5)] == [0.0, 0.3, 0.6, 0.9, 1.0]


def test_vqa_writer_roundtrip(tmp_path):
    root = str(tmp_path / "raw")
    out = str(tmp_path / "arrows")
    os.makedirs(root, exist_ok=True)

    # raw fixtures: 3 images, 2 questions each, 10 repeated answers
    questions = {"train": [], "val": []}
    annotations = {"train": [], "val": []}
    qid = 0
    for split, img_dir in (("train", "train2014"), ("val", "val2014")):
        for i in range(3):
            iid = i + (100 if split == "val" else 0)
            _save_jpg(f"{root}/{img_dir}/COCO_{img_dir}_{iid:012d}.jpg",
                      seed=iid)
            for _ in range(2):
                questions[split].append({
                    "image_id": iid, "question_id": qid,
                    "question": "what color is it?"})
                annotations[split].append({
                    "image_id": iid, "question_id": qid,
                    "multiple_choice_answer": "red",
                    "answers": [{"answer": "red"}] * 7
                    + [{"answer": "blue"}] * 3})
                qid += 1

    for split, fn in (("train", "train2014"), ("val", "val2014")):
        with open(f"{root}/v2_OpenEnded_mscoco_{fn}_questions.json", "w") as f:
            json.dump({"questions": questions[split]}, f)
        with open(f"{root}/v2_mscoco_{fn}_annotations.json", "w") as f:
            json.dump({"annotations": annotations[split]}, f)
    for fn in ("test2015", "test-dev2015"):
        with open(f"{root}/v2_OpenEnded_mscoco_{fn}_questions.json",
                  "w") as f:
            json.dump({"questions": []}, f)

    make_arrow_vqa(root, out)
    assert os.path.exists(f"{out}/vqav2_train.arrow")
    assert os.path.exists(f"{out}/vqav2_ans2label.json")
    with open(f"{out}/vqav2_ans2label.json") as f:
        ans2label = json.load(f)
    assert "red" in ans2label  # 12 occurrences ≥ 9

    # loads through our dataset class
    from vl_merging_tpu.data.datasets import VQAv2Dataset
    from vl_merging_tpu.data.text import build_tokenizer, write_tiny_vocab
    vocab = write_tiny_vocab(f"{out}/vocab.txt",
                             ["what", "color", "is", "it", "red", "blue"])
    ds = VQAv2Dataset(
        data_dir=out, transform_keys=["square_transform"], image_size=48,
        split="train", max_text_len=12, tokenizer=build_tokenizer(vocab),
        label_size=len(ans2label))
    sample = ds[0]
    assert sample["vqa_targets"].shape == (len(ans2label),)
    assert sample["vqa_targets"].max() == 1.0  # 'red' appears 7 times


def test_nlvr2_writer_roundtrip(tmp_path):
    root = str(tmp_path / "raw")
    out = str(tmp_path / "arrows")
    data_dir = f"{root}/nlvr2/data"
    os.makedirs(data_dir, exist_ok=True)
    for split in ("train", "dev", "test1"):
        rows = []
        for i in range(3):
            ident = f"{split}-{i}-0-0"
            base = ident[:ident.rindex("-")]
            _save_jpg(f"{root}/images/{split}/{base}-img0.png", seed=i)
            _save_jpg(f"{root}/images/{split}/{base}-img1.png", seed=i + 9)
            rows.append({"identifier": ident,
                         "sentence": "two dogs play",
                         "label": "True" if i % 2 else "False"})
        with open(f"{data_dir}/{split}.json", "w") as f:
            f.write("\n".join(json.dumps(r) for r in rows))

    make_arrow_nlvr2(root, out)
    for split in ("train", "dev", "test1"):
        assert os.path.exists(f"{out}/nlvr2_{split}.arrow"), split

    from vl_merging_tpu.data.datasets import NLVR2Dataset
    from vl_merging_tpu.data.text import build_tokenizer, write_tiny_vocab
    vocab = write_tiny_vocab(f"{out}/vocab.txt", ["two", "dogs", "play"])
    ds = NLVR2Dataset(
        data_dir=out, transform_keys=["square_transform"], image_size=48,
        split="val", max_text_len=8, tokenizer=build_tokenizer(vocab))
    sample = ds[0]
    assert sample["image_0"].shape == (3, 48, 48)
    assert sample["answers"] in (0, 1)
    assert "nlvr2_dev" in sample["table_name"] or \
        "nlvr2_test1" in sample["table_name"]
