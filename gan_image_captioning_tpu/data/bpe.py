"""GPT-2 byte-level BPE tokenizer (the pretrained-GPT-2 caption data path).

Implements the standard GPT-2 byte-pair encoding from its two public data
files — ``vocab.json`` (token → id) and ``merges.txt`` (ranked merge
pairs) — so captions can be tokenized into GPT-2's id space and pretrained
GPT-2 weights (imported via ``src/import_gpt2.py``) see the token
distribution they were trained on.  Oracle-tested against
``transformers.GPT2Tokenizer`` on the same data files
(tests/test_gpt2_import.py).

Id-space convention: this framework reserves ids 0-3 for the specials
``<PAD>=0, <S>=1, <E>=2, <UNK>=3`` (reference ``tasks.py:42-49``), so BPE
ids are OFFSET by 4: framework_id = bpe_id + 4.  The weight importer
prepends 4 fresh rows to ``wte`` to match (models/torch_import.py:
``gpt2_decoder_from_torch``).

Zero-egress note: the real ``vocab.json``/``merges.txt`` are downloadable
artifacts; this module only needs their paths.  Tests fabricate small
format-identical files.
"""

from __future__ import annotations

import json
from functools import lru_cache
from typing import Dict, List

NUM_SPECIALS = 4  # <PAD>, <S>, <E>, <UNK> — reference tasks.py:42-49

# GPT-2's pre-tokenization pattern (contractions, letter runs, number runs,
# punctuation runs, trailing/other whitespace).
_PAT = (r"""'s|'t|'re|'ve|'m|'ll|'d| ?\p{L}+| ?\p{N}+|"""
        r""" ?[^\s\p{L}\p{N}]+|\s+(?!\S)|\s+""")


@lru_cache()
def bytes_to_unicode() -> Dict[int, str]:
    """The reversible byte → printable-unicode map BPE operates over:
    printable ASCII/Latin-1 ranges map to themselves, everything else to
    256+n so no byte is whitespace/control inside the merge alphabet."""
    bs = (list(range(ord("!"), ord("~") + 1))
          + list(range(ord("¡"), ord("¬") + 1))
          + list(range(ord("®"), ord("ÿ") + 1)))
    cs = bs[:]
    n = 0
    for b in range(256):
        if b not in bs:
            bs.append(b)
            cs.append(256 + n)
            n += 1
    return dict(zip(bs, [chr(c) for c in cs]))


def _get_pairs(word):
    return {(word[i], word[i + 1]) for i in range(len(word) - 1)}


class BPETokenizer:
    """GPT-2 byte-level BPE over local ``vocab.json`` + ``merges.txt``."""

    def __init__(self, vocab_file: str, merges_file: str,
                 offset: int = NUM_SPECIALS):
        import regex

        with open(vocab_file, encoding="utf-8") as f:
            self.encoder: Dict[str, int] = json.load(f)
        self.decoder = {v: k for k, v in self.encoder.items()}
        with open(merges_file, encoding="utf-8") as f:
            lines = f.read().split("\n")
        merges = [tuple(m.split()) for m in lines
                  if m and not m.startswith("#version") and len(m.split()) == 2]
        self.bpe_ranks = {m: i for i, m in enumerate(merges)}
        self.byte_encoder = bytes_to_unicode()
        self.byte_decoder = {v: k for k, v in self.byte_encoder.items()}
        self.pat = regex.compile(_PAT)
        self.offset = offset
        self._cache: Dict[str, List[str]] = {}

    @property
    def vocab_size(self) -> int:
        """Framework-facing vocab size (BPE vocab + the 4 specials)."""
        return len(self.encoder) + self.offset

    def _bpe(self, token: str) -> List[str]:
        if token in self._cache:
            return self._cache[token]
        word = tuple(token)
        pairs = _get_pairs(word)
        while pairs:
            best = min(pairs, key=lambda p: self.bpe_ranks.get(p, float("inf")))
            if best not in self.bpe_ranks:
                break
            a, b = best
            new_word = []
            i = 0
            while i < len(word):
                try:
                    j = word.index(a, i)
                except ValueError:
                    new_word.extend(word[i:])
                    break
                new_word.extend(word[i:j])
                i = j
                if i < len(word) - 1 and word[i] == a and word[i + 1] == b:
                    new_word.append(a + b)
                    i += 2
                else:
                    new_word.append(word[i])
                    i += 1
            word = tuple(new_word)
            if len(word) == 1:
                break
            pairs = _get_pairs(word)
        out = list(word)
        self._cache[token] = out
        return out

    def encode(self, text: str) -> List[int]:
        """Text → framework ids (BPE id + offset)."""
        ids = []
        for tok in self.pat.findall(text):
            mapped = "".join(self.byte_encoder[b] for b in tok.encode("utf-8"))
            for piece in self._bpe(mapped):
                ids.append(self.encoder[piece] + self.offset)
        return ids

    def decode(self, ids) -> str:
        """Framework ids → text (specials dropped)."""
        pieces = [self.decoder[int(i) - self.offset] for i in ids
                  if int(i) >= self.offset]
        text = "".join(pieces)
        return bytearray(self.byte_decoder[c] for c in text).decode(
            "utf-8", errors="replace")
