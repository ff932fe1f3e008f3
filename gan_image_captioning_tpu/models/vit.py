"""ViT-B/16 image encoder backbone.

The stretch config's encoder (BASELINE.json config 5: "ViT-B encoder +
GPT-2-small generator GAN captioning").  Standard ViT-Base: 16×16 patch
embedding, CLS token, learned positions, 12 pre-LN blocks (d=768, 12 heads,
MLP 3072) — all MXU-friendly dense matmuls, no convs beyond the patchify
(which is itself one big matmul over unfolded patches).

Interface matches :mod:`resnet`: ``vit(weights, stats, images, train)`` →
``([B, 768] pooled, stats)`` and ``vit_grid`` → ``([B, P, 768], stats)`` for
cross-attention conditioning.  ViT has no BatchNorm, so ``stats`` is an
empty dict threaded for interface parity.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from gan_image_captioning_tpu.models.transformer import (
    _dense_init, _ln_init, block_apply, init_block, layer_norm)

FEATURE_DIM = 768
PATCH = 16
DEPTH = 12
HEADS = 12
MLP_DIM = 3072


def init_vit_params(rng, config=None, dtype=jnp.float32):
    """Returns ``(weights, stats)``; stats is empty (no BN in ViT)."""
    image_size = getattr(config, "image_size", 224) if config else 224
    num_patches = (image_size // PATCH) ** 2
    ks = jax.random.split(rng, DEPTH + 4)
    weights = {
        # patchify as a dense over flattened 16x16x3 patches
        "patch_embed": _dense_init(ks[0], PATCH * PATCH * 3, FEATURE_DIM, dtype),
        "cls": jax.random.normal(ks[1], (1, 1, FEATURE_DIM), dtype) * 0.02,
        "pos": jax.random.normal(ks[2], (num_patches + 1, FEATURE_DIM),
                                 dtype) * 0.02,
        "blocks": [init_block(ks[3 + i], FEATURE_DIM, MLP_DIM, dtype)
                   for i in range(DEPTH)],
        "ln_f": _ln_init(FEATURE_DIM, dtype),
    }
    return weights, {}


def _patchify(images):
    """[B, 3, H, W] → [B, P, 16·16·3] unfolded patches."""
    b, c, h, w = images.shape
    gh, gw = h // PATCH, w // PATCH
    x = images.reshape(b, c, gh, PATCH, gw, PATCH)
    x = jnp.transpose(x, (0, 2, 4, 3, 5, 1))  # B, gh, gw, ph, pw, C
    return x.reshape(b, gh * gw, PATCH * PATCH * c)


def _trunk(weights, images, train):
    x = _patchify(images) @ weights["patch_embed"]["w"] + weights["patch_embed"]["b"]
    b, p, d = x.shape
    cls = jnp.broadcast_to(weights["cls"], (b, 1, d))
    x = jnp.concatenate([cls, x], axis=1) + weights["pos"][: p + 1]
    for blk in weights["blocks"]:
        x = block_apply(blk, x, HEADS)
    return layer_norm(weights["ln_f"], x)


def vit(weights, stats, images, train: bool = False):
    """[B, 3, S, S] → ([B, 768] CLS features, stats)."""
    x = _trunk(weights, images, train)
    return x[:, 0], stats


def vit_grid(weights, stats, images, train: bool = False):
    """[B, 3, S, S] → ([B, P, 768] patch grid, stats)."""
    x = _trunk(weights, images, train)
    return x[:, 1:], stats
