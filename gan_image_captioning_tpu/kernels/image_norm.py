"""Device-side image normalization kernel.

The tail of the fused image pipeline (north star: "JPEG decode, resize,
normalize … becomes a fused preprocessing stage feeding HBM-resident
feature batches"): the host ships resized CHW **uint8** (4× less
host→device transfer than float32), and this kernel expands to the
normalized float the encoder consumes —

    out[c] = (u8[c] / 255 − mean[c]) / std[c]        (tasks.py:97-98 constants)

One VMEM pass per (image, channel) grid cell; off-TPU a jnp twin runs (the
math is identical; this is bandwidth plumbing, not exotic compute).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# ImageNet constants, reference tasks.py:97-98
MEAN = (0.485, 0.456, 0.406)
STD = (0.229, 0.224, 0.225)


def _jnp_normalize(u8, dtype):
    mean = jnp.asarray(MEAN, jnp.float32).reshape(1, 3, 1, 1)
    std = jnp.asarray(STD, jnp.float32).reshape(1, 3, 1, 1)
    x = u8.astype(jnp.float32) / 255.0
    return ((x - mean) / std).astype(dtype)


def _kernel(scale_ref, shift_ref, u8_ref, out_ref):
    c = pl.program_id(1)
    x = u8_ref[:].astype(jnp.float32)
    out_ref[:] = (x * scale_ref[c] + shift_ref[c]).astype(out_ref.dtype)


def normalize_images(u8, dtype=jnp.float32):
    """[B, 3, H, W] uint8 → normalized [B, 3, H, W] ``dtype``."""
    if jax.default_backend() != "tpu":
        return _jnp_normalize(u8, dtype)
    b, c, h, w = u8.shape
    # fold the /255 into one multiply-add per element:
    # out = u8 * (1/(255*std)) + (-mean/std)
    scale = jnp.asarray([1.0 / (255.0 * s) for s in STD], jnp.float32)
    shift = jnp.asarray([-m / s for m, s in zip(MEAN, STD)], jnp.float32)
    return pl.pallas_call(
        _kernel,
        grid=(b, c),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1, h, w), lambda i, j: (i, j, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 1, h, w), lambda i, j: (i, j, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, c, h, w), dtype),
    )(scale, shift, u8)
