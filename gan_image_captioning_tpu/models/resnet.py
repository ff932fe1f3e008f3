"""ResNet-18 backbone in pure JAX.

Rebuild of the reference's torchvision ``resnet18(pretrained=False)`` with
the final FC dropped (``generator.py:12-14`` — the docstring there says
ResNet-152; the code is ResNet-18).  Param layout is torch-compatible
(Conv2d OIHW, BatchNorm scale/bias), with running statistics split into a
parallel ``stats`` tree so the functional train step can thread updated
stats explicitly.

Faithful BatchNorm semantics: train mode normalizes with batch statistics
and updates running stats with momentum (torch default 0.1, unbiased var in
the running update) — the reference's encoder runs the backbone under
``torch.no_grad()`` but in TRAIN mode (``gen.train()`` recurses into it,
``training.py:106``), so its BN stats drift during training even though
weights are frozen; we reproduce that by keeping stats updates separate from
gradients.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

BN_MOMENTUM = 0.1  # torch BatchNorm2d default (resnet backbone)


# --------------------------------------------------------------------- layers

def conv2d(x, w, stride: int = 1, padding: int = 0):
    """NCHW conv with OIHW weights (torch layout), no bias (resnet convs)."""
    return jax.lax.conv_general_dilated(
        x, w, window_strides=(stride, stride),
        padding=[(padding, padding), (padding, padding)],
        dimension_numbers=("NCHW", "OIHW", "NCHW"))


def batch_norm(x, weights, stats, train: bool, momentum: float = BN_MOMENTUM,
               eps: float = 1e-5):
    """Functional BatchNorm2d/1d.

    Returns ``(y, new_stats)``.  Train: normalize with batch stats, update
    running stats (unbiased var in the update, biased in the normalization —
    torch semantics).  Eval: normalize with running stats; stats unchanged.
    """
    axes = tuple(i for i in range(x.ndim) if i != 1)
    shape = [1] * x.ndim
    shape[1] = x.shape[1]

    if train:
        mean = jnp.mean(x, axis=axes)
        var = jnp.var(x, axis=axes)
        n = x.size // x.shape[1]
        unbiased = var * n / max(n - 1, 1)
        new_stats = {
            "mean": (1 - momentum) * stats["mean"]
                    + momentum * jax.lax.stop_gradient(mean),
            "var": (1 - momentum) * stats["var"]
                   + momentum * jax.lax.stop_gradient(unbiased),
        }
    else:
        mean, var = stats["mean"], stats["var"]
        new_stats = stats

    y = (x - mean.reshape(shape)) * jax.lax.rsqrt(var.reshape(shape) + eps)
    return y * weights["scale"].reshape(shape) + weights["bias"].reshape(shape), new_stats


def max_pool(x, window: int = 3, stride: int = 2, padding: int = 1):
    return jax.lax.reduce_window(
        x, -jnp.inf, jax.lax.max,
        (1, 1, window, window), (1, 1, stride, stride),
        [(0, 0), (0, 0), (padding, padding), (padding, padding)])


# --------------------------------------------------------------------- params

def _bn_init(c, dtype):
    return ({"scale": jnp.ones((c,), dtype), "bias": jnp.zeros((c,), dtype)},
            {"mean": jnp.zeros((c,), jnp.float32),
             "var": jnp.ones((c,), jnp.float32)})


def _conv_init(rng, out_c, in_c, k, dtype):
    # torch kaiming-normal fan_out for resnet convs
    fan_out = out_c * k * k
    std = jnp.sqrt(2.0 / fan_out)
    return {"w": std * jax.random.normal(rng, (out_c, in_c, k, k), dtype)}


# ResNet-18: 4 stages × 2 BasicBlocks, widths 64/128/256/512.
STAGES = ((64, 2, 1), (128, 2, 2), (256, 2, 2), (512, 2, 2))
FEATURE_DIM = 512


def init_resnet18_params(rng, dtype=jnp.float32) -> Tuple[dict, dict]:
    """Returns ``(weights, stats)`` trees mirroring torchvision resnet18
    minus ``fc``."""
    keys = iter(jax.random.split(rng, 64))
    weights = {"conv1": _conv_init(next(keys), 64, 3, 7, dtype)}
    stats = {}
    weights["bn1"], stats["bn1"] = _bn_init(64, dtype)

    in_c = 64
    for s, (width, blocks, stride) in enumerate(STAGES, start=1):
        wblocks, sblocks = [], []
        for b in range(blocks):
            st = stride if b == 0 else 1
            bw = {"conv1": _conv_init(next(keys), width, in_c, 3, dtype),
                  "conv2": _conv_init(next(keys), width, width, 3, dtype)}
            bs = {}
            bw["bn1"], bs["bn1"] = _bn_init(width, dtype)
            bw["bn2"], bs["bn2"] = _bn_init(width, dtype)
            if st != 1 or in_c != width:
                bw["downsample"] = _conv_init(next(keys), width, in_c, 1, dtype)
                bw["downsample_bn"], bs["downsample_bn"] = _bn_init(width, dtype)
            wblocks.append(bw)
            sblocks.append(bs)
            in_c = width
        weights[f"layer{s}"] = wblocks
        stats[f"layer{s}"] = sblocks
    return weights, stats


# -------------------------------------------------------------------- forward

def _basic_block(x, bw, bs, stride: int, train: bool):
    new_bs = {}
    out = conv2d(x, bw["conv1"]["w"], stride=stride, padding=1)
    out, new_bs["bn1"] = batch_norm(out, bw["bn1"], bs["bn1"], train)
    out = jax.nn.relu(out)
    out = conv2d(out, bw["conv2"]["w"], stride=1, padding=1)
    out, new_bs["bn2"] = batch_norm(out, bw["bn2"], bs["bn2"], train)
    if "downsample" in bw:
        identity = conv2d(x, bw["downsample"]["w"], stride=stride)
        identity, new_bs["downsample_bn"] = batch_norm(
            identity, bw["downsample_bn"], bs["downsample_bn"], train)
    else:
        identity = x
    return jax.nn.relu(out + identity), new_bs


def _trunk(weights: dict, stats: dict, images, train: bool):
    """Everything up to (excluding) the global pool: [B,3,H,W] → [B,512,h,w]."""
    new_stats = {}
    x = conv2d(images, weights["conv1"]["w"], stride=2, padding=3)
    x, new_stats["bn1"] = batch_norm(x, weights["bn1"], stats["bn1"], train)
    x = jax.nn.relu(x)
    x = max_pool(x)
    for s, (width, blocks, stride) in enumerate(STAGES, start=1):
        sblocks = []
        for b in range(blocks):
            st = stride if b == 0 else 1
            x, bs = _basic_block(x, weights[f"layer{s}"][b],
                                 stats[f"layer{s}"][b], st, train)
            sblocks.append(bs)
        new_stats[f"layer{s}"] = sblocks
    return x, new_stats


def resnet18(weights: dict, stats: dict, images, train: bool = False):
    """[B, 3, H, W] → ([B, 512] pooled features, new_stats)."""
    x, new_stats = _trunk(weights, stats, images, train)
    return jnp.mean(x, axis=(2, 3)), new_stats  # adaptive avg pool to 1x1


def resnet18_grid(weights: dict, stats: dict, images, train: bool = False):
    """[B, 3, H, W] → ([B, h*w, 512] feature grid, new_stats) — the HW×C
    grid the transformer generator cross-attends over (report §4.2)."""
    x, new_stats = _trunk(weights, stats, images, train)
    b, c, h, w = x.shape
    return jnp.transpose(x.reshape(b, c, h * w), (0, 2, 1)), new_stats
