"""Video-frame datasets (MSRVTT-style): frame TSV + JSON annotations.

The reference's video stack (reference: src/vilt/datasets/
msrvtt_dataset.py:15-421, webvid_dataset.py:6-23) stores sampled video
frames in lineidx TSVs (rows: video_id \\t json \\t base64 frames…) with
caption annotations in JSON; current configs run single-frame
(num_frames=1), treating the sampled frame as an image.  This module
implements that single-frame contract: temporal sampling picks one frame
per clip (uniform index for eval, random for train).
"""

from __future__ import annotations

import json
import os.path as op
import random
from typing import Dict, List

from .tsv import CompositeTSVFile, TSVFile, decode_b64_image
from .transforms import keys_to_transforms


class FrameTSVDataset:
    """Frame rows: ``video_id \\t meta_json \\t b64_frame_0 [\\t b64_frame_k …]``.

    Captions come from ``{name}.caption.json``: {video_id: [captions…]} or
    the MSRVTT annotation list format [{"video_id","caption"}…].
    """

    def __init__(
        self,
        data_dir: str,
        names: List[str],
        transform_keys: List[str],
        image_size: int,
        max_text_len: int = 40,
        tokenizer=None,
        split: str = "train",
        size_frame: int = 1,
        **_,
    ):
        paths = [op.join(data_dir, f"{n}.tsv") for n in names
                 if op.isfile(op.join(data_dir, f"{n}.tsv"))]
        if not paths:
            raise FileNotFoundError(f"no frame .tsv for {names} in {data_dir}")
        self.tsv = CompositeTSVFile(paths)
        self.transforms = keys_to_transforms(transform_keys, size=image_size)
        self.tokenizer = tokenizer
        self.max_text_len = max_text_len
        self.split = split
        self.size_frame = size_frame

        captions: Dict[str, List[str]] = {}
        for n in names:
            cpath = op.join(data_dir, f"{n}.caption.json")
            if not op.isfile(cpath):
                continue
            with open(cpath) as f:
                data = json.load(f)
            if isinstance(data, dict):
                for vid, caps in data.items():
                    captions.setdefault(vid, []).extend(
                        caps if isinstance(caps, list) else [caps])
            else:
                for item in data:
                    captions.setdefault(item["video_id"], []).append(
                        item["caption"])
        self.captions = captions

        # caption-flattened index like the arrow datasets' index_mapper
        self.index_mapper: Dict[int, tuple] = {}
        j = 0
        for row_idx in range(len(self.tsv)):
            vid = self.tsv[row_idx][0]
            caps = captions.get(vid, [None])
            for ci in range(len(caps)):
                self.index_mapper[j] = (row_idx, ci)
                j += 1

    def __len__(self) -> int:
        return len(self.index_mapper)

    def _sample_frame(self, row: List[str]) -> int:
        n_frames = len(row) - 2
        if n_frames <= 1:
            return 2
        if self.split == "train":
            return 2 + random.randrange(n_frames)
        return 2 + n_frames // 2  # deterministic middle frame for eval

    def __getitem__(self, index: int) -> Dict:
        row_idx, cap_idx = self.index_mapper[index]
        row = self.tsv[row_idx]
        img = decode_b64_image(row[self._sample_frame(row)])
        ret: Dict = {
            "image": self.transforms[0](img),
            "img_index": row_idx,
            "cap_index": cap_idx,
            "raw_index": index,
        }
        caps = self.captions.get(row[0])
        if caps and self.tokenizer is not None:
            text = caps[cap_idx]
            ret["text"] = text
            ret["encoding"] = self.tokenizer.encode(
                text, max_length=self.max_text_len)
        return ret

    def collate(self, batch, mlm_collator):
        from .arrow_dataset import ArrowDataset

        return ArrowDataset.collate(self, batch, mlm_collator)

    @property
    def max_vl_text_len(self):
        return None

    @property
    def draw_false_text(self):
        return 0


class MSRVTTDataset(FrameTSVDataset):
    """reference msrvtt_dataset.py: frame TSVs named per split."""

    def __init__(self, *args, split: str = "train", **kwargs):
        names = kwargs.pop("names", None) or [f"msrvtt_{split}"]
        kwargs.pop("draw_false_image", None)
        kwargs.pop("draw_false_text", None)
        kwargs.pop("image_only", None)
        kwargs.pop("patch_size", None)
        kwargs.pop("num_mask_patches", None)
        kwargs.pop("max_mask_patches_per_block", None)
        kwargs.pop("min_mask_patches_per_block", None)
        kwargs.pop("dvae_image_size", None)
        kwargs.pop("max_vl_text_len", None)
        super().__init__(*args, names=names, split=split, **kwargs)


class WebVidDataset(MSRVTTDataset):
    """reference webvid_dataset.py: same frame-TSV contract."""

    def __init__(self, *args, split: str = "train", **kwargs):
        kwargs["names"] = [f"webvid_{split}"]
        super().__init__(*args, split=split, **kwargs)
