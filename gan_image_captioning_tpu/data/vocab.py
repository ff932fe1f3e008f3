"""Vocabulary build + caption-record extraction for the Karpathy COCO split.

Reproduces the reference's semantics (``tasks.py:18-108``) without its bugs:

* special tokens ``<PAD>=0, <S>=1, <E>=2, <UNK>=3`` (``tasks.py:42-49``),
* vocabulary grown in first-appearance order over the train captions
  (``tasks.py:75-80``), reused read-only for val/test (``tasks.py:50-51``),
* rows filtered by ``split in row['filepath']`` (``tasks.py:60``) — kept
  verbatim for split parity (Karpathy filepaths are ``train2014``/
  ``val2014``; the Karpathy 'restval' images live under val2014 but carry
  ``'split': 'restval'`` — the reference ignores the ``split`` field
  entirely and so do we),
* first ``captions_per_image`` sentences per image (``tasks.py:64``),
* a pickle cache named ``{split}_{captions_per_image}.pkl`` with keys
  ``captions`` / ``w2i`` / ``i2w`` — byte-compatible with caches produced by
  the reference (``tasks.py:30-37,86-88``), so a data dir prepared by either
  implementation works for both.

NOT reproduced (catalogued reference bugs): the list-mutation-while-iterating
filter (``tasks.py:60-61``) and the epoch-2 in-place caption corruption
(``tasks.py:130-134`` mutates ``caption_dict['tokens']`` so every epoch
after the first sees ``<UNK>`` everywhere) — tokens here are mapped to ids
non-destructively, once, up front.
"""

from __future__ import annotations

import json
import os
import pickle
from typing import Dict, List, Optional, Tuple

import numpy as np

SPECIAL_TOKENS = ("<PAD>", "<S>", "<E>", "<UNK>")
PAD, START, END, UNK = 0, 1, 2, 3


def _new_vocab() -> Tuple[Dict[str, int], Dict[int, str]]:
    w2i = {tok: i for i, tok in enumerate(SPECIAL_TOKENS)}
    i2w = {i: tok for i, tok in enumerate(SPECIAL_TOKENS)}
    return w2i, i2w


def build_coco_records(captions_path: str, image_path: str, split: str,
                       captions_per_image: int = 5,
                       vocab_dicts: Optional[Tuple[dict, dict]] = None,
                       use_cache: bool = True):
    """Parse the Karpathy json into flat caption records + vocab.

    Returns ``(captions, word_to_index, index_to_word)`` where ``captions``
    is a list of dicts each holding the image's scalar fields plus the
    sentence's fields (``tokens`` remains a list of words — reference cache
    format, ``tasks.py:64-73``).
    """
    assert split in {"train", "val", "test"}
    cache_file = os.path.join(image_path, f"{split}_{captions_per_image}.pkl")
    if use_cache and os.path.exists(cache_file):
        with open(cache_file, "rb") as f:
            saved = pickle.load(f)
        return saved["captions"], saved["w2i"], saved["i2w"]

    with open(captions_path, "r") as f:
        rows = json.load(f)["images"]

    if vocab_dicts is None:
        word_to_index, index_to_word = _new_vocab()
        grow = True
    else:
        word_to_index, index_to_word = vocab_dicts
        grow = False

    captions: List[dict] = []
    for row in rows:
        if split not in row["filepath"]:
            continue
        scalar_fields = {k: v for k, v in row.items()
                         if not isinstance(v, list)}
        for sentence in row["sentences"][:captions_per_image]:
            record = dict(scalar_fields)
            record.update(sentence)
            captions.append(record)
            if grow:
                for word in sentence["tokens"]:
                    if word not in word_to_index:
                        idx = len(word_to_index)
                        word_to_index[word] = idx
                        index_to_word[idx] = word

    if use_cache:
        with open(cache_file, "wb") as f:
            pickle.dump({"captions": captions, "w2i": word_to_index,
                         "i2w": index_to_word}, f)
    return captions, word_to_index, index_to_word


def tokens_to_ids(tokens: List[str], word_to_index: Dict[str, int]) -> np.ndarray:
    """Map words → ids with <UNK> fallback (``tasks.py:130-134`` semantics,
    done non-destructively)."""
    return np.asarray([word_to_index.get(t, UNK) for t in tokens],
                      dtype=np.int32)
