"""Ring + Ulysses context-parallel attention: exact equivalence on the
virtual CPU mesh."""

import jax
import numpy as np
import pytest

from gan_image_captioning_tpu.parallel.context_parallel import (
    reference_attention, ring_attention, ulysses_attention)
from gan_image_captioning_tpu.parallel.mesh import make_mesh


@pytest.fixture(scope="module")
def sp_mesh(devices8):
    return make_mesh("sp:4", devices8[:4])


def _qkv(seed, b=2, t=16, h=4, d=8):
    ks = jax.random.split(jax.random.PRNGKey(seed), 3)
    return tuple(jax.random.normal(k, (b, t, h, d)) for k in ks)


@pytest.mark.parametrize("causal", [False, True])
def test_ring_matches_reference(sp_mesh, causal):
    q, k, v = _qkv(0)
    ref = np.asarray(reference_attention(q, k, v, causal))  # [B, T, H, D]
    out = ring_attention(q, k, v, sp_mesh, causal=causal)
    np.testing.assert_allclose(np.asarray(jax.device_get(out)), ref,
                               atol=2e-5)


@pytest.mark.parametrize("causal", [False, True])
def test_ulysses_matches_reference(sp_mesh, causal):
    q, k, v = _qkv(1)
    ref = np.asarray(reference_attention(q, k, v, causal))
    out = ulysses_attention(q, k, v, sp_mesh, causal=causal)
    np.testing.assert_allclose(np.asarray(jax.device_get(out)), ref,
                               atol=2e-5)


def test_ring_matches_ulysses(sp_mesh):
    q, k, v = _qkv(2, t=32)
    a = np.asarray(jax.device_get(ring_attention(q, k, v, sp_mesh, causal=True)))
    b = np.asarray(jax.device_get(
        ulysses_attention(q, k, v, sp_mesh, causal=True)))
    np.testing.assert_allclose(a, b, atol=2e-5)
