"""Data pipeline: batching semantics, vocab build, synthetic fixture, cache."""

import json
import os

import numpy as np

from gan_image_captioning_tpu.data import vocab as vocab_lib
from gan_image_captioning_tpu.data.loader import Batcher, make_batch
from gan_image_captioning_tpu.data.synthetic import SyntheticCaptions


def test_make_batch_wrapping_and_padding():
    # collate semantics (tasks.py:138-158): <S> tokens <E> pad*, length = n+2
    caps = [np.array([5, 6, 7]), np.array([9])]
    batch = make_batch(caps, None, seq_len=8)
    np.testing.assert_array_equal(batch["captions"][0], [1, 5, 6, 7, 2, 0, 0, 0])
    np.testing.assert_array_equal(batch["captions"][1], [1, 9, 2, 0, 0, 0, 0, 0])
    np.testing.assert_array_equal(batch["lengths"], [5, 3])
    np.testing.assert_array_equal(batch["weights"], [1.0, 1.0])


def test_make_batch_truncation_and_pad_rows():
    caps = [np.arange(4, 20)]  # longer than seq_len-2
    batch = make_batch(caps, None, seq_len=8, batch_size=3)
    assert batch["captions"].shape == (3, 8)
    np.testing.assert_array_equal(batch["captions"][0],
                                  [1, 4, 5, 6, 7, 8, 9, 2])
    np.testing.assert_array_equal(batch["weights"], [1.0, 0.0, 0.0])


def test_synthetic_deterministic_and_learnable():
    ds = SyntheticCaptions("train", num_items=32, conditional=True,
                           image_size=16)
    ids1, img1 = ds.sample(3)
    ids2, img2 = ds.sample(3)
    np.testing.assert_array_equal(ids1, ids2)
    np.testing.assert_array_equal(img1, img2)
    assert img1.shape == (3, 16, 16)
    # val split differs from train
    ds_val = SyntheticCaptions("val", num_items=32, conditional=False)
    ids_v, img_v = ds_val.sample(3)
    assert img_v is None
    assert ds.vocab_size == ds_val.vocab_size


def test_batcher_epochs_and_shapes():
    ds = SyntheticCaptions("train", num_items=10, conditional=False)
    b = Batcher(ds, batch_size=4, seq_len=12, shuffle=True, seed=0,
                num_workers=1)
    batches = list(b)
    assert len(batches) == len(b) == 3
    assert all(bt["captions"].shape == (4, 12) for bt in batches)
    # final batch padded with zero weights (10 = 4+4+2)
    np.testing.assert_array_equal(batches[-1]["weights"], [1, 1, 0, 0])
    # second epoch: different shuffle order
    batches2 = list(b)
    assert not np.array_equal(batches[0]["captions"], batches2[0]["captions"])


def test_batcher_threaded_matches_sync():
    ds = SyntheticCaptions("train", num_items=20, conditional=False)
    sync = list(Batcher(ds, 4, 10, shuffle=False, num_workers=1))
    threaded = list(Batcher(ds, 4, 10, shuffle=False, num_workers=2))
    for a, b in zip(sync, threaded):
        np.testing.assert_array_equal(a["captions"], b["captions"])


def _mini_karpathy(tmp_path):
    """Fabricated Karpathy-format json (tasks.py:26-28 schema)."""
    rows = []
    for i in range(6):
        split = "train2014" if i < 4 else "val2014"
        rows.append({
            "filepath": split,
            "filename": f"img_{i}.jpg",
            "imgid": i,
            "split": "train" if i < 4 else "val",
            "sentences": [
                {"tokens": ["a", "cat", f"word{i}"], "raw": "", "imgid": i,
                 "sentid": 10 * i},
                {"tokens": ["the", "dog"], "raw": "", "imgid": i,
                 "sentid": 10 * i + 1},
                {"tokens": ["extra", "one"], "raw": "", "imgid": i,
                 "sentid": 10 * i + 2},
            ],
        })
    path = os.path.join(tmp_path, "dataset_coco.json")
    with open(path, "w") as f:
        json.dump({"images": rows}, f)
    return path


def test_vocab_build_order_and_split_filter(tmp_path):
    path = _mini_karpathy(str(tmp_path))
    caps, w2i, i2w = vocab_lib.build_coco_records(
        path, str(tmp_path), "train", captions_per_image=2, use_cache=False)
    # 4 train images x 2 captions-per-image (tasks.py:64)
    assert len(caps) == 8
    # specials first (tasks.py:42-49), then first-appearance order
    assert [i2w[i] for i in range(6)] == ["<PAD>", "<S>", "<E>", "<UNK>",
                                          "a", "cat"]
    assert "extra" not in w2i  # third caption dropped by captions_per_image
    # val reuses the train vocab read-only (tasks.py:50-51)
    caps_v, w2i_v, _ = vocab_lib.build_coco_records(
        path, str(tmp_path), "val", 2, vocab_dicts=(w2i, i2w), use_cache=False)
    assert len(caps_v) == 4
    assert w2i_v is w2i
    # val-only words map to <UNK>
    ids = vocab_lib.tokens_to_ids(["a", "word5"], w2i)
    assert ids[0] == w2i["a"] and ids[1] == vocab_lib.UNK


def test_pickle_cache_roundtrip(tmp_path):
    path = _mini_karpathy(str(tmp_path))
    caps1, w2i1, _ = vocab_lib.build_coco_records(
        path, str(tmp_path), "train", 2, use_cache=True)
    assert os.path.exists(os.path.join(str(tmp_path), "train_2.pkl"))
    caps2, w2i2, _ = vocab_lib.build_coco_records(
        path, str(tmp_path), "train", 2, use_cache=True)
    assert w2i1 == w2i2 and len(caps1) == len(caps2)


def test_coco_dataset_end_to_end(tmp_path):
    from PIL import Image

    path = _mini_karpathy(str(tmp_path))
    os.makedirs(os.path.join(str(tmp_path), "train2014"), exist_ok=True)
    for i in range(4):
        Image.new("RGB", (40, 30), (120, 30, 200)).save(
            os.path.join(str(tmp_path), "train2014", f"img_{i}.jpg"))
    from gan_image_captioning_tpu.data.coco import CocoCaptions

    ds = CocoCaptions(path, str(tmp_path), "train", image_size=32,
                      captions_per_image=2, conditional=True, use_cache=False)
    ids, img = ds.sample(0)
    assert img.shape == (3, 32, 32) and ids.dtype == np.int32
    # normalized with ImageNet stats: not in [0,1]
    assert img.min() < 0
    # dataset_percent truncation (tasks.py:106-108)
    ds_half = CocoCaptions(path, str(tmp_path), "train", 32, 2,
                           dataset_percent=0.5, conditional=False,
                           use_cache=False)
    assert len(ds_half) == len(ds) // 2


def test_batcher_worker_exception_propagates():
    """A failing sample() in the worker thread must raise in the consumer,
    not silently truncate the epoch."""
    class Exploding:
        def __len__(self):
            return 8

        def sample(self, i):
            if i == 5:
                raise RuntimeError("boom")
            return np.array([4, 5], np.int32), None

    import pytest as _pytest

    b = Batcher(Exploding(), batch_size=2, seq_len=6, num_workers=2)
    with _pytest.raises(RuntimeError, match="boom"):
        list(b)


def test_host_sharded_loading_partitions_the_epoch():
    """host_shard=(i, n): hosts iterate disjoint slices that union to the
    full epoch (multi-host DP feeding, SURVEY §2.3)."""
    ds = SyntheticCaptions("train", num_items=23, conditional=False)
    seen = []
    for host in range(3):
        b = Batcher(ds, batch_size=4, seq_len=12, shuffle=True, seed=5,
                    num_workers=1, host_shard=(host, 3))
        for batch in b:
            for row, w in zip(batch["captions"], batch["weights"]):
                if w > 0:
                    seen.append(tuple(row.tolist()))
    # every sample appears exactly once across hosts
    full = []
    for batch in Batcher(ds, 4, 12, shuffle=False, num_workers=1):
        for row, w in zip(batch["captions"], batch["weights"]):
            if w > 0:
                full.append(tuple(row.tolist()))
    assert sorted(seen) == sorted(full)


def test_device_prefetch_order_and_identity():
    """device_prefetch yields put(batch) in source order, for both the
    threaded and the size<=0 (inline) paths."""
    from gan_image_captioning_tpu.data.loader import device_prefetch

    src = [{"captions": np.full((2, 3), i, np.int32)} for i in range(7)]
    for size in (0, 1, 3):
        out = list(device_prefetch(iter(src), lambda b: b, size=size))
        assert [int(b["captions"][0, 0]) for b in out] == list(range(7))


def test_device_prefetch_propagates_errors_and_stops_early():
    from gan_image_captioning_tpu.data.loader import device_prefetch

    import pytest as _pytest

    def gen():
        yield {"x": 1}
        raise RuntimeError("upload boom")

    with _pytest.raises(RuntimeError, match="upload boom"):
        list(device_prefetch(gen(), lambda b: b, size=2))

    # abandoning the iterator early must not deadlock the producer
    it = device_prefetch(iter([{"x": i} for i in range(100)]),
                         lambda b: b, size=2)
    assert next(it)["x"] == 0
    it.close()


def test_device_prefetch_device_put_matches_host():
    """jax.device_put through the prefetcher leaves values untouched."""
    import jax

    from gan_image_captioning_tpu.data.loader import device_prefetch

    src = [{"captions": np.arange(6, dtype=np.int32).reshape(2, 3),
            "weights": np.ones((2,), np.float32)}]
    (dev,) = list(device_prefetch(iter(src), jax.device_put, size=2))
    np.testing.assert_array_equal(np.asarray(dev["captions"]),
                                  src[0]["captions"])
    assert isinstance(dev["captions"], jax.Array)
