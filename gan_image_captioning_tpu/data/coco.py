"""MS-COCO Karpathy-split dataset.

Host-side dataset over the records produced by :mod:`vocab` — the rebuild of
reference ``COCO_data`` (``tasks.py:18-136``) with the same on-disk layout:
``{data_dir}/dataset_coco.json`` and images under
``{data_dir}/{filepath}/{filename}`` (``tasks.py:120``), plus the
reference-compatible pickle cache.

Differences (all catalogued reference bugs not reproduced): captions are
pre-tokenized to int ids ONCE at construction (the reference re-maps in
``__getitem__`` and corrupts its own token lists after epoch 1,
``tasks.py:130-134``); ``dataset_percent`` truncates length the same way
(``tasks.py:106-108``).
"""

from __future__ import annotations

import os
from typing import Optional, Tuple

import numpy as np

from gan_image_captioning_tpu.data import images as images_lib
from gan_image_captioning_tpu.data import vocab as vocab_lib


class CocoCaptions:
    def __init__(self, captions_path: str, image_path: str, split: str,
                 image_size: int = 256, captions_per_image: int = 5,
                 vocab_dicts: Optional[Tuple[dict, dict]] = None,
                 dataset_percent: float = 1.0, conditional: bool = True,
                 use_cache: bool = True, use_native: bool = True,
                 device_preprocess: bool = False, bpe_tokenizer=None):
        assert split in {"train", "val", "test"}
        self.split = split
        self.image_path = image_path
        self.image_size = image_size
        self.conditional = conditional
        self.dataset_percent = dataset_percent
        # device_preprocess: emit resized CHW uint8 (normalization runs on
        # device, kernels/image_norm.py) — 4× smaller host→device batches.
        self.device_preprocess = device_preprocess
        if use_native:
            from gan_image_captioning_tpu.data import native as native_lib

            self._native = native_lib if native_lib.available() else None
        else:
            self._native = None

        self.captions, self.word_to_index, self.index_to_word = (
            vocab_lib.build_coco_records(captions_path, image_path, split,
                                         captions_per_image, vocab_dicts,
                                         use_cache))
        if bpe_tokenizer is not None:
            # GPT-2 BPE data path (--tokenizer bpe): captions tokenized into
            # the pretrained model's id space (+4 special offset,
            # data/bpe.py) instead of the first-appearance word vocab.
            self.vocab_size = bpe_tokenizer.vocab_size
            self._token_ids = [
                np.asarray(bpe_tokenizer.encode(" ".join(rec["tokens"])),
                           dtype=np.int32)
                for rec in self.captions]
        else:
            self.vocab_size = len(self.word_to_index)  # tasks.py:102
            # Pre-tokenize once, non-destructively.
            self._token_ids = [
                vocab_lib.tokens_to_ids(rec["tokens"], self.word_to_index)
                for rec in self.captions]

    def __len__(self):
        # dataset_percent truncates (tasks.py:106-108)
        return int(self.dataset_percent * len(self.captions))

    def caption_length(self, index: int) -> int:
        """Token count (pre-wrap) — cheap lookup for length bucketing."""
        return len(self._token_ids[index])

    def caption_ids(self, index: int) -> np.ndarray:
        """Token ids without touching the image (for feature caching)."""
        return self._token_ids[index]

    def image_key(self, index: int) -> str:
        """Grouping key for multi-reference evaluation: rows are flattened
        per-caption (≤ captions_per_image per image, ``tasks.py:64``), so
        the filename identifies which rows share an image."""
        return self.captions[index]["filename"]

    def sample(self, index: int) -> Tuple[np.ndarray, Optional[np.ndarray]]:
        ids = self._token_ids[index]
        if not self.conditional:
            return ids, None
        rec = self.captions[index]
        path = os.path.join(self.image_path, rec["filepath"], rec["filename"])
        if self.device_preprocess:
            if self._native is not None:
                image = self._native.decode_image_u8(path, self.image_size)
                if image is not None:
                    return ids, image
            return ids, images_lib.load_resize_u8(path, self.image_size)
        if self._native is not None:
            image = self._native.decode_image(path, self.image_size)
            if image is not None:
                return ids, image
            # non-JPEG or corrupt file → PIL fallback
        image = images_lib.load_and_preprocess(path, self.image_size)
        return ids, image
