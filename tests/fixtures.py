"""Synthetic arrow fixtures matching the reference writers' schemas
(reference: src/vilt/utils/write_*.py) so data-layer tests never need the
real /storage paths."""

from __future__ import annotations

import io
import os
import random
from typing import List

import numpy as np
import pyarrow as pa
from PIL import Image

from vl_merging_tpu.data.text import write_tiny_vocab

WORDS = ["a", "dog", "plays", "with", "red", "ball", "cat", "sleeps", "on",
         "the", "mat", "bird", "flies", "over", "blue", "water", "child",
         "eats", "green", "apple"]


def _jpeg_bytes(rng: np.ndarray, size=64) -> bytes:
    arr = (rng.rand(size, size, 3) * 255).astype(np.uint8)
    img = Image.fromarray(arr)
    buf = io.BytesIO()
    img.save(buf, format="JPEG")
    return buf.getvalue()


def _caption(rng) -> str:
    return " ".join(rng.choice(WORDS) for _ in range(rng.randint(3, 8)))


def _write(table: pa.Table, path: str) -> None:
    os.makedirs(os.path.dirname(path), exist_ok=True)
    with pa.OSFile(path, "wb") as sink:
        with pa.RecordBatchFileWriter(sink, table.schema) as w:
            w.write_table(table)


def write_caption_arrow(root: str, name: str, n_images: int = 8,
                        caps_per_image: int = 2, seed: int = 0) -> str:
    """coco/f30k-style schema: image bytes, caption list, image_id, split."""
    nprng = np.random.RandomState(seed)
    rng = random.Random(seed)
    rows = []
    for i in range(n_images):
        rows.append([
            _jpeg_bytes(nprng),
            [_caption(rng) for _ in range(caps_per_image)],
            f"COCO_val2014_{i:012d}.jpg",
            "train",
        ])
    table = pa.Table.from_arrays(
        [pa.array([r[j] for r in rows]) for j in range(4)],
        names=["image", "caption", "image_id", "split"])
    path = os.path.join(root, f"{name}.arrow")
    _write(table, path)
    return path


def write_vqa_arrow(root: str, name: str, n_images: int = 6,
                    qs_per_image: int = 2, label_size: int = 3129,
                    seed: int = 0) -> str:
    nprng = np.random.RandomState(seed)
    rng = random.Random(seed)
    images, questions, qids, answers, labels, scores = [], [], [], [], [], []
    qid = 0
    for i in range(n_images):
        images.append(_jpeg_bytes(nprng))
        qs, qi, ans, lab, sc = [], [], [], [], []
        for _ in range(qs_per_image):
            qs.append(_caption(rng) + "?")
            qi.append(qid)
            qid += 1
            ans.append([rng.choice(WORDS)])
            lab.append([rng.randint(0, label_size - 1)])
            sc.append([rng.choice([0.3, 0.6, 0.9, 1.0])])
        questions.append(qs)
        qids.append(qi)
        answers.append(ans)
        labels.append(lab)
        scores.append(sc)
    table = pa.Table.from_arrays(
        [pa.array(images), pa.array(questions), pa.array(qids),
         pa.array(answers), pa.array(labels), pa.array(scores)],
        names=["image", "questions", "question_id", "answers",
               "answer_labels", "answer_scores"])
    path = os.path.join(root, f"{name}.arrow")
    _write(table, path)
    return path


def write_nlvr2_arrow(root: str, name: str, n_rows: int = 6,
                      seed: int = 0) -> str:
    nprng = np.random.RandomState(seed)
    rng = random.Random(seed)
    img0 = [_jpeg_bytes(nprng) for _ in range(n_rows)]
    img1 = [_jpeg_bytes(nprng) for _ in range(n_rows)]
    questions = [[_caption(rng)] for _ in range(n_rows)]
    answers = [[rng.choice(["True", "False"])] for _ in range(n_rows)]
    identifier = [[f"{name}-{i}"] for i in range(n_rows)]
    table = pa.Table.from_arrays(
        [pa.array(img0), pa.array(img1), pa.array(questions),
         pa.array(answers), pa.array(identifier)],
        names=["image_0", "image_1", "questions", "answers", "identifier"])
    path = os.path.join(root, f"{name}.arrow")
    _write(table, path)
    return path


def write_imagenet_arrow(root: str, name: str, n_rows: int = 8,
                         n_classes: int = 10, seed: int = 0) -> str:
    nprng = np.random.RandomState(seed)
    rng = random.Random(seed)
    table = pa.Table.from_arrays(
        [pa.array([_jpeg_bytes(nprng) for _ in range(n_rows)]),
         pa.array([rng.randint(0, n_classes - 1) for _ in range(n_rows)])],
        names=["image", "label"])
    path = os.path.join(root, f"{name}.arrow")
    _write(table, path)
    return path


def make_fixture_root(tmp_path, vocab_words: List[str] = WORDS):
    """Full fixture: vocab + f30k/coco/vqa/nlvr2/imagenet arrows."""
    root = str(tmp_path)
    write_tiny_vocab(os.path.join(root, "vocab.txt"), vocab_words)
    write_caption_arrow(root, "f30k_caption_karpathy_train")
    write_caption_arrow(root, "f30k_caption_karpathy_test", seed=1)
    write_caption_arrow(root, "coco_caption_karpathy_train")
    write_caption_arrow(root, "coco_caption_karpathy_val", seed=2)
    write_caption_arrow(root, "coco_caption_karpathy_test", seed=3)
    write_vqa_arrow(root, "vqav2_train")
    write_vqa_arrow(root, "vqav2_trainable_val", seed=4)
    write_vqa_arrow(root, "vqav2_rest_val", seed=5)
    write_vqa_arrow(root, "vqav2_test", seed=9)
    write_nlvr2_arrow(root, "nlvr2_train")
    write_nlvr2_arrow(root, "nlvr2_dev", seed=6)
    write_nlvr2_arrow(root, "nlvr2_test1", seed=7)
    write_imagenet_arrow(root, "imagenet1k_train")
    write_imagenet_arrow(root, "imagenet1k_val", seed=8)
    return root
