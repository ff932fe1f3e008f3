"""Native C++ data pipeline (libgicdata.so) vs. the Python path."""

import os
import tempfile

import numpy as np
import pytest

from gan_image_captioning_tpu.data import native
from gan_image_captioning_tpu.data.images import load_and_preprocess
from gan_image_captioning_tpu.data.loader import make_batch

pytestmark = pytest.mark.skipif(not native.available(),
                                reason="native lib not built")


@pytest.fixture(scope="module")
def jpeg_file():
    from PIL import Image

    tmp = tempfile.mkdtemp()
    rng = np.random.RandomState(0)
    arr = (np.linspace(0, 255, 120 * 90 * 3).reshape(90, 120, 3)
           + rng.rand(90, 120, 3) * 20).astype(np.uint8)
    path = os.path.join(tmp, "t.jpg")
    Image.fromarray(arr).save(path, quality=95)
    return path


def test_decode_matches_pil(jpeg_file):
    ours = native.decode_image(jpeg_file, 64)
    ref = load_and_preprocess(jpeg_file, 64)
    assert ours.shape == (3, 64, 64)
    # same resize family (triangle filter) + identical normalize constants;
    # sub-pixel filter differences stay tiny
    assert float(np.abs(ours - ref).max()) < 0.05
    assert float(np.abs(ours - ref).mean()) < 0.01


def test_grayscale_jpeg(jpeg_file):
    from PIL import Image

    path = jpeg_file.replace("t.jpg", "gray.jpg")
    Image.open(jpeg_file).convert("L").save(path)
    out = native.decode_image(path, 32)
    assert out.shape == (3, 32, 32)  # grayscale → 3 channels (tasks.py:96)
    ref = load_and_preprocess(path, 32)
    assert float(np.abs(out - ref).max()) < 0.08


def test_batch_decode_threaded(jpeg_file):
    single = native.decode_image(jpeg_file, 48)
    batch = native.decode_batch([jpeg_file] * 7, 48, num_threads=3)
    assert batch.shape == (7, 3, 48, 48)
    for i in range(7):
        np.testing.assert_array_equal(batch[i], single)


def test_decode_failure_returns_none_and_zero_slot(jpeg_file):
    assert native.decode_image("/nonexistent.jpg", 16) is None
    batch = native.decode_batch([jpeg_file, "/nonexistent.jpg"], 16)
    assert np.all(batch[1] == 0.0)
    assert not np.all(batch[0] == 0.0)


def test_assemble_matches_python_collate():
    caps = [np.array([5, 6, 7], np.int32), np.arange(4, 40, dtype=np.int32),
            np.array([9], np.int32)]
    captions, lengths, weights = native.assemble_captions(caps, 12)
    ref = make_batch(caps, None, 12)
    np.testing.assert_array_equal(captions, ref["captions"])
    np.testing.assert_array_equal(lengths, ref["lengths"])
    np.testing.assert_array_equal(weights, ref["weights"])
