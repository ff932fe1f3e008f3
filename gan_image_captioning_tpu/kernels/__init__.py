"""Pallas TPU kernels for the hot ops.

Flag-gated (``ops.gumbel.set_use_pallas`` / ``--use-pallas``): every kernel
has a pure-jnp twin used on CPU and in parity tests (interpret mode)."""

from gan_image_captioning_tpu.kernels.gumbel_sample import (  # noqa: F401
    fused_gumbel_sample)
