"""Frozen-backbone feature caching.

The reference re-runs the (frozen!) ResNet on every image every epoch
(``training.py:65-66`` inside both loops) — pure waste when
``torch.no_grad()`` guarantees the backbone never changes
(``generator.py:21-22``).  Here the pooled backbone output is precomputed
ONCE per image with a jitted batched pass; training batches then carry
``[B, 512]`` features and only the trainable head (Linear + BatchNorm1d)
runs per step.

Semantic note: caching fixes the backbone's BatchNorms in eval mode
(running statistics).  The reference's backbone BN runs in train mode (its
``gen.train()`` recurses into the no-grad backbone), so its "frozen"
features actually drift batch-to-batch — caching trades that quirk for a
large speedup, which is why ``--cache-features`` is opt-in.
"""

from __future__ import annotations

from typing import Tuple

import jax
import numpy as np


def precompute_backbone_features(dataset, encoder_params, config,
                                 batch_size: int = 32) -> np.ndarray:
    """[N, feature_dim] pooled backbone outputs (eval-mode BN), batched+jitted."""
    if config.encoder_arch == "vit":
        from gan_image_captioning_tpu.models import vit as vit_lib

        def backbone(weights, stats, images):
            return vit_lib.vit(weights, stats, images, train=False)[0]
    else:
        from gan_image_captioning_tpu.models import resnet as resnet_lib

        def backbone(weights, stats, images):
            return resnet_lib.resnet18(weights, stats, images, train=False)[0]

    fn = jax.jit(backbone)
    weights = encoder_params["backbone"]
    stats = encoder_params["bn_stats"]["backbone"]

    out = []
    n = len(dataset)
    for start in range(0, n, batch_size):
        idx = range(start, min(start + batch_size, n))
        imgs = []
        for i in idx:
            _, img = dataset.sample(i)
            if img is None:
                raise ValueError("feature caching needs a conditional dataset")
            if img.dtype == np.uint8:
                from gan_image_captioning_tpu.kernels.image_norm import (
                    _jnp_normalize)

                import jax.numpy as jnp

                img = np.asarray(_jnp_normalize(
                    jax.numpy.asarray(img[None]), jnp.float32))[0]
            imgs.append(img)
        batch = np.stack(imgs)
        # pad the tail to the jitted batch size (one compiled shape)
        pad = batch_size - batch.shape[0]
        if pad:
            batch = np.concatenate([batch, np.zeros_like(batch[:1]).repeat(
                pad, axis=0)])
        feats = np.asarray(fn(weights, stats, batch))
        out.append(feats[: len(idx)])
    return np.concatenate(out)


class CachedFeatureDataset:
    """Wraps a conditional dataset, serving cached backbone features in
    place of images.  Keeps the base vocab/caption interface."""

    def __init__(self, base, features: np.ndarray):
        assert len(base) == len(features)
        self.base = base
        self.features = features
        self.word_to_index = base.word_to_index
        self.index_to_word = base.index_to_word
        self.vocab_size = base.vocab_size

    def __len__(self):
        return len(self.base)

    def caption_length(self, i: int) -> int:
        return self.base.caption_length(i)

    def caption_ids(self, i: int) -> np.ndarray:
        get_ids = getattr(self.base, "caption_ids", None)
        return get_ids(i) if get_ids else self.base.sample(i)[0]

    def image_key(self, i: int) -> str:
        """Forward the base dataset's grouping key — --scst-multi-ref /
        --multi-ref must keep working under --cache-features."""
        key_of = getattr(self.base, "image_key", None)
        return key_of(i) if key_of else str(i)

    def sample(self, i: int) -> Tuple[np.ndarray, np.ndarray]:
        return self.caption_ids(i), self.features[i]
