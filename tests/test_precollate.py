"""Precollated Batcher fast path == per-batch collation, bit-for-bit.

The precollate path (data/loader.py Batcher(precollate=...)) pays the
per-item Python work once and serves every epoch batch as a numpy
row-gather; these tests pin it to the classic ``_build`` output across
every batching feature: shuffle, drop_last, zero-weighted tail padding,
length buckets (incl. top-bucket truncation of over-long captions),
host sharding, and conditional image/feature payloads.
"""

import os

import numpy as np
import pytest

from gan_image_captioning_tpu.data.loader import Batcher
from gan_image_captioning_tpu.data.synthetic import SyntheticCaptions


class VarLenDataset:
    """Variable caption lengths incl. one over-long row (truncation path)."""

    def __init__(self, n=37, seq_len=12, conditional=False, feats=False):
        self.n = n
        self.conditional = conditional
        self.feats = feats
        rng = np.random.default_rng(7)
        self.lens = rng.integers(1, seq_len + 4, size=n)  # some exceed width
        self.lens[3] = seq_len + 6                        # force truncation

    def __len__(self):
        return self.n

    def caption_length(self, i):
        return int(self.lens[i])

    def sample(self, i):
        rng = np.random.default_rng(1000 + i)
        toks = rng.integers(4, 50, size=self.lens[i]).astype(np.int32)
        img = None
        if self.feats:
            img = rng.normal(size=(16,)).astype(np.float32)
        elif self.conditional:
            img = rng.integers(0, 255, size=(3, 8, 8)).astype(np.uint8)
        return toks, img


def epochs(batcher, n=2):
    out = []
    for _ in range(n):
        out.append(list(batcher))
    return out


def assert_stream_equal(a, b):
    assert len(a) == len(b)
    for ea, eb in zip(a, b):
        assert len(ea) == len(eb)
        for ba, bb in zip(ea, eb):
            assert set(ba) == set(bb)
            for k in ba:
                np.testing.assert_array_equal(ba[k], bb[k], err_msg=k)


def make_pair(ds, **kw):
    kw.setdefault("batch_size", 8)
    kw.setdefault("seq_len", 14)
    a = Batcher(ds, precollate="off", **kw)
    b = Batcher(ds, precollate="on", **kw)
    return a, b


def test_unconditional_parity():
    ds = SyntheticCaptions("train", num_items=50, conditional=False)
    a, b = make_pair(ds, shuffle=True, seed=3, drop_last=False)
    assert_stream_equal(epochs(a), epochs(b))
    assert b._pre is not None


def test_varlen_buckets_and_truncation_parity():
    ds = VarLenDataset(n=41, seq_len=12)
    a, b = make_pair(ds, seq_len=14, shuffle=True, seed=5,
                     bucket_bounds=[6, 10])
    assert_stream_equal(epochs(a), epochs(b))


def test_drop_last_and_host_shard_parity():
    ds = VarLenDataset(n=41, seq_len=12)
    a, b = make_pair(ds, shuffle=True, seed=9, drop_last=True,
                     host_shard=(1, 2))
    assert_stream_equal(epochs(a), epochs(b))


def test_conditional_u8_and_feature_parity():
    for kw in ({"conditional": True}, {"feats": True}):
        ds = VarLenDataset(n=21, seq_len=12, **kw)
        a, b = make_pair(ds)
        assert_stream_equal(epochs(a), epochs(b))
        assert b._pre is not None


def test_budget_gate_auto_vs_on(monkeypatch):
    ds = VarLenDataset(n=21, seq_len=12, conditional=True)
    monkeypatch.setenv("GIC_PRECOLLATE_BUDGET", "1")
    auto = Batcher(ds, batch_size=8, seq_len=14, precollate="auto")
    list(auto)
    assert auto._pre is None          # images over budget -> fallback
    forced = Batcher(ds, batch_size=8, seq_len=14, precollate="on")
    list(forced)
    assert forced._pre is not None    # explicit on ignores the budget


def test_cache_shared_across_batchers():
    ds = SyntheticCaptions("train", num_items=30, conditional=False)
    a = Batcher(ds, batch_size=8, seq_len=14, precollate="on")
    list(a)
    b = Batcher(ds, batch_size=4, seq_len=14, precollate="on")
    list(b)
    assert b._pre is a._pre


def test_pad_final_tail_rows_zeroed():
    ds = SyntheticCaptions("train", num_items=10, conditional=False)
    b = Batcher(ds, batch_size=8, seq_len=14, precollate="on")
    last = list(b)[-1]
    assert last["captions"].shape[0] == 8
    assert last["weights"][2:].sum() == 0.0   # 10 % 8 = 2 real rows
    assert (last["captions"][2:] == 0).all()  # PAD tail
