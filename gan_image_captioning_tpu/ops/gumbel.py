"""Gumbel-softmax relaxation ops (RelGAN-style).

The reference adds Gumbel(0,1) noise to the decoder logits and softmaxes the
result *multiplied* by the temperature (``generator.py:50-51,68-69,84-96``):

    pred = softmax(temperature * (logits + g)),   g = -log(-log(u + eps) + eps)

Note this is the reference's convention (multiply by temperature; RelGAN's
usual form divides) — we match the reference so temperatures mean the same
thing.  The argmax of ``pred`` is the argmax of ``logits + g``, i.e. an exact
categorical sample from ``softmax(logits)`` (the Gumbel-max trick), which is
what makes the reference's "greedy" adversarial decode a sampler.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def gumbel_noise(rng, shape, dtype=jnp.float32, eps: float = 1e-10):
    """Gumbel(0,1) noise via the reference's explicit double-log formula
    (``generator.py:90-91``), for reproducible parity checks."""
    u = jax.random.uniform(rng, shape, dtype=dtype, minval=0.0, maxval=1.0)
    return -jnp.log(-jnp.log(u + eps) + eps)


def add_gumbel(rng, logits, eps: float = 1e-10):
    """``logits + Gumbel(0,1)`` — reference ``add_gumbel`` (generator.py:84-96)."""
    return logits + gumbel_noise(rng, logits.shape, logits.dtype, eps)


_USE_PALLAS = False


def set_use_pallas(flag: bool):
    """Route :func:`gumbel_softmax` through the fused Pallas kernel
    (``kernels/gumbel_sample.py``).  The kernel's PRNG stream differs from
    ``jax.random``'s, so parity-sensitive paths keep this off; the sampling
    distribution is identical."""
    global _USE_PALLAS
    _USE_PALLAS = bool(flag)


def use_pallas() -> bool:
    """Current Pallas-sampler routing state (see :func:`set_use_pallas`)."""
    return _USE_PALLAS


def gumbel_softmax(rng, logits, temperature, eps: float = 1e-10):
    """Soft sample ``softmax(temperature * (logits + g))`` plus its hard ids.

    Returns ``(soft [..., V], ids [...])``.  ``ids`` is the argmax of the
    soft sample (reference ``generator.py:73``); with Gumbel noise present
    this is a categorical draw from ``softmax(logits)``.
    """
    if _USE_PALLAS and logits.ndim == 2:
        from gan_image_captioning_tpu.kernels.gumbel_sample import (
            fused_gumbel_sample)

        seed = jax.random.randint(rng, (), 0, jnp.iinfo(jnp.int32).max,
                                  dtype=jnp.int32)
        return fused_gumbel_sample(logits, seed,
                                   jnp.asarray(temperature, jnp.float32))
    g_t = add_gumbel(rng, logits, eps)
    soft = jax.nn.softmax(g_t * temperature, axis=-1)
    ids = jnp.argmax(soft, axis=-1)
    return soft, ids
