"""Length-bucketed batching."""

import numpy as np

from gan_image_captioning_tpu.data.loader import Batcher


class VarLenDataset:
    """Synthetic dataset with varying caption lengths."""

    def __init__(self, lengths):
        self.lengths = lengths

    def __len__(self):
        return len(self.lengths)

    def caption_length(self, i):
        return self.lengths[i]

    def sample(self, i):
        return np.arange(4, 4 + self.lengths[i], dtype=np.int32), None


def test_buckets_group_by_width():
    lengths = [3] * 10 + [10] * 10 + [20] * 10
    ds = VarLenDataset(lengths)
    b = Batcher(ds, batch_size=5, seq_len=24, shuffle=False, num_workers=1,
                bucket_bounds=[6, 14, 24])
    widths = sorted({batch["captions"].shape[1] for batch in b})
    assert widths == [6, 14, 24]
    for batch in b:
        w = batch["captions"].shape[1]
        for row, wt in zip(batch["captions"], batch["weights"]):
            if wt == 0:
                continue
            # every caption fits its bucket exactly: <S> tokens <E> ≤ width
            assert row[0] == 1 and 2 in row
            n_tokens = int((row > 2).sum())
            assert n_tokens + 2 <= w
            # and would NOT fit the next-smaller bucket
            if w == 14:
                assert n_tokens + 2 > 6
            if w == 24:
                assert n_tokens + 2 > 14


def test_buckets_cover_all_samples():
    lengths = list(range(1, 31))
    ds = VarLenDataset(lengths)
    b = Batcher(ds, batch_size=4, seq_len=32, shuffle=True, seed=3,
                num_workers=1, bucket_bounds=[8, 16, 32])
    seen_tokens = set()
    for batch in b:
        for row, wt in zip(batch["captions"], batch["weights"]):
            if wt > 0:
                n_tokens = int((row > 2).sum())
                seen_tokens.add(n_tokens)
    assert seen_tokens == set(range(1, 31))


def test_bucket_truncation_at_top_bound():
    ds = VarLenDataset([40])  # longer than seq_len
    b = Batcher(ds, batch_size=1, seq_len=12, num_workers=1,
                bucket_bounds=[8, 12])
    (batch,) = list(b)
    assert batch["captions"].shape[1] == 12
    assert batch["captions"][0, -1] == 2  # truncated then <E>-terminated
