"""TSV datasets: lineidx random access + base64 images.

Re-implements the reference's TSV stack (reference:
src/vilt/datasets/tsv_file.py:246-369, src/vilt/datasets/tsv_dataset.py:
50-511): a ``.tsv`` data file with a sibling ``.lineidx`` of byte offsets
for O(1) row seeks, optional composite indirection across shards, and an
image dataset whose rows carry base64-encoded JPEG bytes — the format the
reference uses for ImageNet-22k and web-scale corpora.
"""

from __future__ import annotations

import base64
import io
import json
import os
import os.path as op
from typing import Dict, List, Optional, Sequence

from PIL import Image

from .masking_generator import MaskingGenerator
from .transforms import keys_to_transforms, keys_to_transforms_for_mim


def generate_lineidx(tsv_path: str, lineidx_path: str) -> None:
    """Byte-offset index for each TSV row (written once, reused)."""
    offsets = []
    with open(tsv_path, "rb") as f:
        pos = 0
        for line in f:
            offsets.append(pos)
            pos += len(line)
    with open(lineidx_path, "w") as f:
        f.write("\n".join(str(o) for o in offsets))


class TSVFile:
    """Random-access TSV reader (reference tsv_file.py:246-312)."""

    def __init__(self, tsv_path: str, generate_index: bool = True):
        import threading

        self.tsv_path = tsv_path
        self.lineidx_path = op.splitext(tsv_path)[0] + ".lineidx"
        if not op.isfile(self.lineidx_path) and generate_index:
            generate_lineidx(tsv_path, self.lineidx_path)
        with open(self.lineidx_path) as f:
            self._offsets = [int(l) for l in f if l.strip()]
        # loader worker threads seek concurrently: one handle per thread
        self._local = threading.local()

    def num_rows(self) -> int:
        return len(self._offsets)

    def __len__(self) -> int:
        return self.num_rows()

    def seek(self, idx: int) -> List[str]:
        fh = getattr(self._local, "fh", None)
        if fh is None:
            fh = self._local.fh = open(self.tsv_path, "r")
        fh.seek(self._offsets[idx])
        return fh.readline().rstrip("\n").split("\t")

    def __getitem__(self, idx: int) -> List[str]:
        return self.seek(idx)


class CompositeTSVFile:
    """Row indirection over a list of shard TSVFiles
    (reference tsv_file.py:314-369): rows of the composite are
    (shard_idx, row_idx) pairs from a ``.lineidx`` composite listing."""

    def __init__(self, shard_paths: Sequence[str],
                 composite_rows: Optional[Sequence[tuple]] = None):
        self.shards = [TSVFile(p) for p in shard_paths]
        if composite_rows is None:
            composite_rows = [(s, r) for s, shard in enumerate(self.shards)
                              for r in range(len(shard))]
        self.rows = list(composite_rows)

    def __len__(self) -> int:
        return len(self.rows)

    def seek(self, idx: int) -> List[str]:
        s, r = self.rows[idx]
        return self.shards[s].seek(r)

    __getitem__ = seek


def decode_b64_image(data: str) -> Image.Image:
    raw = base64.b64decode(data)
    return Image.open(io.BytesIO(raw)).convert("RGB")


class TSVImageDataset:
    """Image(+label/caption) rows from TSV shards.

    Row format (reference imagenet_dataset.py / tsv_dataset.py):
    ``key \\t annotation \\t base64_image`` where annotation is either a
    JSON list of {"class": …} dicts, a plain label, or a caption string.
    Emits class-label text stubs for IN-22k-style pretraining
    (reference imagenet_dataset.py:394-411) or captions for web corpora.
    """

    def __init__(
        self,
        data_dir: str,
        names: List[str],
        transform_keys: List[str],
        image_size: int,
        patch_size: int = 16,
        num_mask_patches: int = 75,
        max_mask_patches_per_block: Optional[int] = None,
        min_mask_patches_per_block: int = 16,
        dvae_image_size: int = 112,
        max_text_len: int = 40,
        tokenizer=None,
        image_only: bool = True,
        caption_column: int = 1,
        image_column: int = 2,
        **_,
    ):
        paths = []
        for name in names:
            p = op.join(data_dir, f"{name}.tsv")
            if op.isfile(p):
                paths.append(p)
        if not paths:
            raise FileNotFoundError(f"no .tsv for {names} under {data_dir}")
        self.tsv = CompositeTSVFile(paths)
        self.tokenizer = tokenizer
        self.max_text_len = max_text_len
        self.image_only = image_only
        self.caption_column = caption_column
        self.image_column = image_column

        self.use_mim_transform = any(t.endswith("mim") for t in transform_keys)
        if self.use_mim_transform:
            window = image_size // patch_size
            self.masked_position_generator = MaskingGenerator(
                window, num_masking_patches=num_mask_patches,
                max_num_patches=max_mask_patches_per_block,
                min_num_patches=min_mask_patches_per_block)
            self.transforms = keys_to_transforms_for_mim(
                transform_keys, size=image_size, second_size=dvae_image_size)
        else:
            self.transforms = keys_to_transforms(transform_keys,
                                                 size=image_size)

    def __len__(self) -> int:
        return len(self.tsv)

    def _annotation_text(self, field: str) -> str:
        """JSON class annotations → 'a photo of <class>'-style text stub;
        plain strings pass through as captions."""
        try:
            parsed = json.loads(field)
        except (ValueError, TypeError):
            return field
        if isinstance(parsed, list) and parsed and isinstance(parsed[0], dict):
            cls = parsed[0].get("class", "")
            return str(cls).replace("_", " ")
        return str(parsed)

    def __getitem__(self, index: int) -> Dict:
        row = self.tsv[index]
        img = decode_b64_image(row[self.image_column])
        out = [tr(img) for tr in self.transforms]
        ret: Dict = {"img_index": index, "cap_index": None,
                     "raw_index": index}
        if self.use_mim_transform:
            views, targets = zip(*out)
            ret["image"] = views[0]
            ret["image_target"] = targets[0]
            ret["image_masked_pos"] = \
                self.masked_position_generator().reshape(-1)
        else:
            ret["image"] = out[0]
        if not self.image_only and self.tokenizer is not None:
            text = self._annotation_text(row[self.caption_column])
            ret["text"] = text
            ret["encoding"] = self.tokenizer.encode(
                text, max_length=self.max_text_len)
        return ret

    # share the arrow collate (numpy stacking + MLM keys)
    def collate(self, batch, mlm_collator):
        from .arrow_dataset import ArrowDataset

        return ArrowDataset.collate(self, batch, mlm_collator)

    @property
    def max_vl_text_len(self):
        return None

    @property
    def draw_false_text(self):
        return 0


def write_tsv(rows: List[List[str]], path: str) -> None:
    """Write rows + lineidx (data-prep helper, reference tsv_file.py)."""
    os.makedirs(op.dirname(op.abspath(path)), exist_ok=True)
    with open(path, "w") as f:
        for row in rows:
            f.write("\t".join(row) + "\n")
    generate_lineidx(path, op.splitext(path)[0] + ".lineidx")
