"""Fused Gumbel-softmax sampling kernel.

The inner-loop op of adversarial decoding (reference ``generator.py:68-73``):

    g    ~ Gumbel(0,1)
    soft = softmax(temperature * (logits + g))
    ids  = argmax(soft)

As separate XLA ops this reads/writes the [B, V] logits several times
(noise materialization, add, softmax's two passes, argmax).  The Pallas
kernel does it in ONE pass over VMEM-resident rows: on-core PRNG
(``pltpu.prng_random_bits``) generates the noise in registers, then a fused
max/exp/sum/normalize/argmax — no [B, V] intermediate ever touches HBM.

Backward (for the generator's gradient through the soft sample) is the
standard softmax VJP with the saved ``soft``, scaled by ``temperature`` —
attached via ``jax.custom_vjp`` (Gumbel noise is constant wrt logits).

The PRNG stream differs from ``jax.random.gumbel``'s, so this path is
flag-gated (bit-parity tests use the jnp twin; distribution-level tests
cover this kernel).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_EPS = 1e-10  # reference add_gumbel eps (generator.py:84)


def _kernel(seed_ref, temp_ref, logits_ref, soft_ref, ids_ref):
    # Per-tile seed: mix the host seed with the grid position so every row
    # block draws an independent stream.  Adjacent integer seeds can map to
    # near-identical hardware PRNG states, so avalanche the bits first
    # (two rounds of a murmur3-style finalizer).
    seed = (seed_ref[0] + pl.program_id(0)).astype(jnp.uint32)
    seed = seed ^ (seed >> 16)
    seed = seed * jnp.uint32(0x85EBCA6B)
    seed = seed ^ (seed >> 13)
    seed = seed * jnp.uint32(0xC2B2AE35)
    seed = seed ^ (seed >> 16)
    pltpu.prng_seed(seed)
    logits = logits_ref[:]  # [TB, V] in VMEM

    # prng_random_bits yields int32 on TPU — bitcast to uint32 BEFORE the
    # shift (sign extension would poison the uniform transform), then back to
    # int32 for the float cast (Mosaic lowers int32→f32 but not uint32→f32;
    # after >>8 the top bits are zero so the int32 view is non-negative).
    bits = pltpu.bitcast(pltpu.prng_random_bits(logits.shape), jnp.uint32)
    top24 = pltpu.bitcast(bits >> jnp.uint32(8), jnp.int32)
    # uniform in [0, 1): 24 bits map cleanly onto the float mantissa
    u = top24.astype(jnp.float32) * (1.0 / (1 << 24))
    g = -jnp.log(-jnp.log(u + _EPS) + _EPS)

    x = (logits.astype(jnp.float32) + g) * temp_ref[0]
    x_max = jnp.max(x, axis=-1, keepdims=True)
    e = jnp.exp(x - x_max)
    soft = e / jnp.sum(e, axis=-1, keepdims=True)
    soft_ref[:] = soft.astype(soft_ref.dtype)
    ids_ref[:] = jnp.argmax(x, axis=-1, keepdims=True).astype(jnp.int32)


def _forward(logits, seed, temperature, block_b: int):
    if jax.default_backend() != "tpu":
        # The Pallas TPU interpreter stubs prng_random_bits to zeros, so off-
        # TPU we use a seeded jnp twin (same math, jax.random PRNG stream).
        rng = jax.random.PRNGKey(seed)
        u = jax.random.uniform(rng, logits.shape, jnp.float32)
        g = -jnp.log(-jnp.log(u + _EPS) + _EPS)
        x = (logits.astype(jnp.float32) + g) * temperature
        soft = jax.nn.softmax(x, axis=-1).astype(logits.dtype)
        return soft, jnp.argmax(x, axis=-1).astype(jnp.int32)

    b, v = logits.shape
    grid = pl.cdiv(b, block_b)
    seed_arr = jnp.asarray([seed], jnp.int32)
    temp_arr = jnp.asarray([temperature], jnp.float32)
    soft, ids = pl.pallas_call(
        _kernel,
        grid=(grid,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((block_b, v), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((block_b, v), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block_b, 1), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((b, v), logits.dtype),
            jax.ShapeDtypeStruct((b, 1), jnp.int32),
        ),
    )(seed_arr, temp_arr, logits)
    return soft, ids[:, 0]


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def fused_gumbel_sample(logits, seed, temperature, block_b: int = 8):
    """``(soft [B, V], ids [B])`` — fused Gumbel-softmax categorical sample.

    Args:
      logits: [B, V] unnormalized scores (any float dtype).
      seed: int32 scalar PRNG seed (derive from the step's key).
      temperature: scalar; the reference's convention
        ``softmax(temp * (logits + g))``.
      block_b: batch rows per kernel instance.
    """
    return _forward(logits, seed, temperature, block_b)


def _fwd(logits, seed, temperature, block_b):
    soft, ids = _forward(logits, seed, temperature, block_b)
    return (soft, ids), (soft, jnp.asarray(temperature, jnp.float32))


def _bwd(block_b, res, grads):
    soft, temperature = res
    d_soft, _ = grads  # ids carry no gradient
    d_soft = d_soft.astype(jnp.float32)
    soft32 = soft.astype(jnp.float32)
    inner = jnp.sum(d_soft * soft32, axis=-1, keepdims=True)
    d_logits = temperature * soft32 * (d_soft - inner)
    return d_logits.astype(soft.dtype), None, None


fused_gumbel_sample.defvjp(_fwd, _bwd)
