"""Image encoder: backbone + projection + BatchNorm head.

Rebuild of reference ``Encoder`` (``generator.py:8-25``): ResNet-18 minus the
FC, then a trainable ``Linear(512 → gen_embed_dim)`` and
``BatchNorm1d(momentum=0.01)`` (``generator.py:15-16,24``).

* Frozen mode (reference default, ``generator.py:21-22``): the backbone
  output passes through ``lax.stop_gradient`` — no grads, but BN running
  stats still drift in train mode exactly like the reference's
  no_grad-but-train-mode torch modules.
* Trainable mode (``--trainable-backbone 1``): the report's second setting
  (NLP_Report.pdf §4.2); no stop_gradient.
* Optional grid output for cross-attention conditioning (the transformer
  generator attends over the HW×C conv feature grid, report §4.2).

Param tree:
  ``backbone`` — resnet weights (conv/bn scale+bias)
  ``proj`` — {'w': [D, 512], 'b': [D]} (torch Linear layout)
  ``head_bn`` — {'scale': [D], 'bias': [D]}
  ``bn_stats`` — {'backbone': resnet stats, 'head': {'mean','var'}} —
      running statistics, threaded functionally through train steps.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from gan_image_captioning_tpu.config import Config
from gan_image_captioning_tpu.models import resnet as resnet_lib

HEAD_BN_MOMENTUM = 0.01  # generator.py:16


def init_encoder_params(rng, config: Config, dtype=jnp.float32) -> dict:
    k_backbone, k_proj = jax.random.split(rng)
    if config.encoder_arch == "vit":
        from gan_image_captioning_tpu.models import vit as vit_lib

        backbone, stats = vit_lib.init_vit_params(k_backbone, config, dtype)
        feat_dim = vit_lib.FEATURE_DIM
    else:
        backbone, stats = resnet_lib.init_resnet18_params(k_backbone, dtype)
        feat_dim = resnet_lib.FEATURE_DIM
    D = config.gen_embed_dim
    head_weights, head_stats = ({"scale": jnp.ones((D,), dtype),
                                 "bias": jnp.zeros((D,), dtype)},
                                {"mean": jnp.zeros((D,), jnp.float32),
                                 "var": jnp.ones((D,), jnp.float32)})
    return {
        "backbone": backbone,
        "proj": {"w": jax.random.normal(k_proj, (D, feat_dim), dtype)
                 / jnp.sqrt(feat_dim * 1.0),
                 "b": jnp.zeros((D,), dtype)},
        "head_bn": head_weights,
        "bn_stats": {"backbone": stats, "head": head_stats},
    }


def encode(params: dict, images, config: Config, train: bool = False):
    """[B, 3, S, S] → ([B, gen_embed_dim] features, new_bn_stats).

    Reference forward (``generator.py:19-25``): no_grad backbone → flatten →
    linear → BatchNorm1d.
    """
    if config.encoder_arch == "vit":
        from gan_image_captioning_tpu.models import vit as vit_lib

        feats, new_backbone_stats = vit_lib.vit(
            params["backbone"], params["bn_stats"]["backbone"], images, train)
    else:
        feats, new_backbone_stats = resnet_lib.resnet18(
            params["backbone"], params["bn_stats"]["backbone"], images, train)
    if not config.trainable_backbone:
        feats = jax.lax.stop_gradient(feats)  # generator.py:21-22

    feats = feats @ params["proj"]["w"].T + params["proj"]["b"]
    feats, new_head_stats = resnet_lib.batch_norm(
        feats, params["head_bn"], params["bn_stats"]["head"], train,
        momentum=HEAD_BN_MOMENTUM)
    return feats, {"backbone": new_backbone_stats, "head": new_head_stats}


def project_head(params: dict, pooled, config: Config, train: bool = False):
    """Trainable head only: ``Linear(512→D)`` + ``BatchNorm1d(0.01)``
    (generator.py:15-16,24) applied to cached backbone features.

    When the backbone is frozen its pooled output never changes, so the
    instructor can precompute it once per image and feed ``[B, 512]``
    batches here — the reference recomputed the whole ResNet every epoch
    (SURVEY §7.4's "free win")."""
    feats = pooled @ params["proj"]["w"].T + params["proj"]["b"]
    feats, new_head_stats = resnet_lib.batch_norm(
        feats, params["head_bn"], params["bn_stats"]["head"], train,
        momentum=HEAD_BN_MOMENTUM)
    return feats, {"backbone": params["bn_stats"]["backbone"],
                   "head": new_head_stats}


def encode_with_grid(params: dict, images, config: Config,
                     train: bool = False):
    """One backbone pass → both conditioning forms:
    ([B, D] pooled features, [B, HW, C] grid, new_bn_stats).

    The pooled features equal the backbone's global-avg-pool (the grid mean),
    so the reference's Encoder semantics (generator.py:19-25) are preserved
    while the grid feeds the transformer's cross-attention (report §4.2)
    without a second backbone pass."""
    grid, new_backbone_stats = encode_grid(params, images, config, train)
    pooled = jnp.mean(grid, axis=1)
    feats = pooled @ params["proj"]["w"].T + params["proj"]["b"]
    feats, new_head_stats = resnet_lib.batch_norm(
        feats, params["head_bn"], params["bn_stats"]["head"], train,
        momentum=HEAD_BN_MOMENTUM)
    return feats, grid, {"backbone": new_backbone_stats,
                         "head": new_head_stats}


def encode_grid(params: dict, images, config: Config, train: bool = False):
    """Conv feature grid for cross-attention conditioning (report §4.2):
    [B, 3, S, S] → ([B, HW, C] grid, new_backbone_stats).

    Uses the backbone's pre-pool activations (resnet: final stage output)."""
    if config.encoder_arch == "vit":
        from gan_image_captioning_tpu.models import vit as vit_lib

        return vit_lib.vit_grid(params["backbone"],
                                params["bn_stats"]["backbone"], images, train)
    grid, new_stats = resnet_lib.resnet18_grid(
        params["backbone"], params["bn_stats"]["backbone"], images, train)
    if not config.trainable_backbone:
        grid = jax.lax.stop_gradient(grid)
    return grid, new_stats
