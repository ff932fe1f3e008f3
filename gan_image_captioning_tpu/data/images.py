"""Host-side image preprocessing.

Reproduces the reference transform chain (``tasks.py:92-100``) with the
exact constants: resize to ``(image_size, image_size)`` bilinear
(``interpolation=2`` = PIL BILINEAR), scale to [0,1], grayscale→3-channel
repeat, normalize with ImageNet mean/std.  Output layout is CHW float32 like
torchvision's ToTensor.

The per-image decode/resize runs on host worker threads; the normalize step
is cheap enough that keeping it here (instead of fused on-device) lets the
device step receive ready-to-use tensors.  A fused on-device variant (uint8
HWC batches → Pallas normalize) is provided for the high-throughput path.
"""

from __future__ import annotations

import numpy as np

IMAGENET_MEAN = np.asarray([0.485, 0.456, 0.406], np.float32)  # tasks.py:97
IMAGENET_STD = np.asarray([0.229, 0.224, 0.225], np.float32)   # tasks.py:98


def load_and_preprocess(path: str, image_size: int) -> np.ndarray:
    """JPEG → normalized CHW float32, reference ``tasks.py:92-100``."""
    from PIL import Image

    with Image.open(path) as im:
        im = im.resize((image_size, image_size), Image.BILINEAR)
        arr = np.asarray(im, dtype=np.float32) / 255.0
    if arr.ndim == 2:  # grayscale → repeat to 3 channels (tasks.py:96)
        arr = np.stack([arr] * 3, axis=-1)
    elif arr.shape[-1] == 4:  # RGBA → drop alpha
        arr = arr[..., :3]
    arr = (arr - IMAGENET_MEAN) / IMAGENET_STD
    return np.transpose(arr, (2, 0, 1)).copy()  # HWC → CHW


def load_resize_u8(path: str, image_size: int) -> np.ndarray:
    """JPEG → resized CHW uint8 (PIL fallback for the device-preprocess
    path; normalization happens on device, kernels/image_norm.py)."""
    from PIL import Image

    with Image.open(path) as im:
        im = im.resize((image_size, image_size), Image.BILINEAR)
        arr = np.asarray(im, dtype=np.uint8)
    if arr.ndim == 2:
        arr = np.stack([arr] * 3, axis=-1)
    elif arr.shape[-1] == 4:
        arr = arr[..., :3]
    return np.transpose(arr, (2, 0, 1)).copy()


def normalize_uint8_batch(batch_hwc_uint8: np.ndarray) -> np.ndarray:
    """[B, H, W, 3] uint8 → [B, 3, H, W] normalized float32 (vectorized)."""
    x = batch_hwc_uint8.astype(np.float32) / 255.0
    x = (x - IMAGENET_MEAN) / IMAGENET_STD
    return np.transpose(x, (0, 3, 1, 2))
