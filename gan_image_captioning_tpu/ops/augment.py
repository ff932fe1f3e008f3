"""On-device image augmentation (train-time only).

The reference's transform chain is deterministic — resize + normalize only
(``tasks.py:92-100``).  These augmentations are framework extensions, chosen
to be SHAPE-PRESERVING so the jitted step's static shapes never change, and
to run ON DEVICE inside the fused train step (driven by the step's PRNG):
the host pipeline stays untouched and the ops are pure gathers/selects that
XLA fuses into the surrounding program.

* random horizontal flip — per-image coin, ``where(coin, x[..., ::-1], x)``;
* random translation — reflect-pad by ``crop_pad`` then per-image
  ``dynamic_slice`` back to the original size (the classic pad-and-crop
  jitter), vmapped over the batch.

Works on both image layouts the step can receive: normalized float
``[B, C, H, W]`` and the device-preprocess uint8 path (flip/crop commute
with per-pixel normalization).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def augment_images(images, rng, flip: bool = True, crop_pad: int = 0):
    """Randomly flip / translate a ``[B, C, H, W]`` batch (any dtype)."""
    k_flip, k_h, k_w = jax.random.split(rng, 3)
    if flip:
        coin = jax.random.bernoulli(k_flip, 0.5, (images.shape[0],))
        images = jnp.where(coin[:, None, None, None],
                           images[..., ::-1], images)
    if crop_pad > 0:
        p = int(crop_pad)
        h, w = images.shape[2], images.shape[3]
        padded = jnp.pad(images, ((0, 0), (0, 0), (p, p), (p, p)),
                         mode="reflect")
        oy = jax.random.randint(k_h, (images.shape[0],), 0, 2 * p + 1)
        ox = jax.random.randint(k_w, (images.shape[0],), 0, 2 * p + 1)

        def crop_one(img, y, x):
            return jax.lax.dynamic_slice(img, (0, y, x),
                                         (img.shape[0], h, w))

        images = jax.vmap(crop_one)(padded, oy, ox)
    return images
