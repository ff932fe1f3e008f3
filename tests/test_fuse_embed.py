"""Equivalence tests for the fused sample→disc-embed kernel path.

The round-3 fusion (models/generator.py:sample_embed +
kernels/decode_sample.py mode 'sample_embed') must be mathematically
identical to the composition it replaces:

    soft, ids = _kernel_sample_soft(...)          # [T, B, V]
    emb       = soft @ disc_embed.T               # [T, B, Ed]

in values AND in every cotangent (generator params, features, and the
disc embedding weight).  Off-TPU both paths run the Pallas kernels in
interpret mode with the PRNG stubbed to zeros, so the comparison is exact
(same zero noise on both sides).
"""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gan_image_captioning_tpu.config import Config
from gan_image_captioning_tpu.models import generator as gen_lib

B, T, V, H, E, ED = 4, 6, 256, 32, 32, 16


@pytest.fixture(autouse=True)
def _interpret_env(monkeypatch):
    monkeypatch.setenv("GIC_KERNEL_INTERPRET", "1")
    monkeypatch.setenv("GIC_FUSE_EMBED", "1")


def _setup(nl=2):
    config = Config(vocab_size=V, gen_embed_dim=E, gen_hidden_dim=H,
                    gen_num_layers=nl, max_seq_len=T - 2)
    rng = jax.random.PRNGKey(0)
    k1, k2, k3 = jax.random.split(rng, 3)
    dec = gen_lib.init_decoder_params(k1, config)
    features = jax.random.normal(k2, (B, E), jnp.float32)
    wd = jax.random.normal(k3, (ED, V), jnp.float32) * 0.1
    return config, dec, features, wd


def _composition(dec, features, temp, seed):
    soft_tm, ids = gen_lib._kernel_sample_soft(dec, features, temp, seed, T)
    return soft_tm, ids


def test_forward_matches_composition():
    _, dec, features, wd = _setup()
    temp = jnp.float32(3.0)
    seed = jnp.int32(7)
    soft_tm, ids_ref = _composition(dec, features, temp, seed)
    want = jnp.einsum("tbv,ev->tbe", soft_tm, wd)

    emb_tm, ids = gen_lib._kernel_sample_embed(dec, features, temp, seed,
                                               wd, T, "gen")
    np.testing.assert_array_equal(np.asarray(ids), np.asarray(ids_ref))
    np.testing.assert_allclose(np.asarray(emb_tm), np.asarray(want),
                               atol=2e-5, rtol=2e-5)


def test_gen_gradients_match_composition():
    _, dec, features, wd = _setup()
    temp = jnp.float32(2.0)
    seed = jnp.int32(11)
    probe = jax.random.normal(jax.random.PRNGKey(5), (T, B, ED))

    def loss_fused(dec_p, feats):
        emb_tm, _ = gen_lib._kernel_sample_embed(dec_p, feats, temp, seed,
                                                 wd, T, "gen")
        return jnp.sum(emb_tm * probe)

    def loss_ref(dec_p, feats):
        soft_tm, _ = gen_lib._kernel_sample_soft(dec_p, feats, temp, seed, T)
        return jnp.sum(jnp.einsum("tbv,ev->tbe", soft_tm, wd) * probe)

    g_fused = jax.grad(loss_fused, argnums=(0, 1))(dec, features)
    g_ref = jax.grad(loss_ref, argnums=(0, 1))(dec, features)
    flat_f, _ = jax.tree_util.tree_flatten(g_fused)
    flat_r, _ = jax.tree_util.tree_flatten(g_ref)
    assert len(flat_f) == len(flat_r)
    for a, b in zip(flat_f, flat_r):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=3e-4, rtol=3e-4)


def test_disc_embedding_gradient_matches():
    _, dec, features, wd = _setup()
    temp = jnp.float32(2.0)
    seed = jnp.int32(13)
    probe = jax.random.normal(jax.random.PRNGKey(6), (T, B, ED))

    def loss_fused(wd_p):
        emb_tm, _ = gen_lib._kernel_sample_embed(dec, features, temp, seed,
                                                 wd_p, T, "disc")
        return jnp.sum(emb_tm * probe)

    def loss_ref(wd_p):
        soft_tm, _ = gen_lib._kernel_sample_soft(dec, features, temp, seed, T)
        soft_tm = jax.lax.stop_gradient(soft_tm)
        return jnp.sum(jnp.einsum("tbv,ev->tbe", soft_tm, wd_p) * probe)

    g_fused = jax.grad(loss_fused)(wd)
    g_ref = jax.grad(loss_ref)(wd)
    np.testing.assert_allclose(np.asarray(g_fused), np.asarray(g_ref),
                               atol=3e-4, rtol=3e-4)


def test_full_adv_step_matches_unfused(monkeypatch):
    """One fused adversarial step with GIC_FUSE_EMBED=1 must produce the
    same losses and updated params as the =0 kernel path (both interpret,
    both zero-noise)."""
    from gan_image_captioning_tpu.data.loader import make_batch
    from gan_image_captioning_tpu.train.state import create_train_state
    from gan_image_captioning_tpu.train.steps import make_adv_step

    config = Config(vocab_size=V, gen_embed_dim=E, gen_hidden_dim=H,
                    gen_num_layers=2, max_seq_len=T - 2,
                    disc_embed_dim=ED, disc_num_rep=4,
                    disc_filter_sizes=(2, 3), disc_num_filters=(4, 4),
                    adv_train_batch_size=B, decode_impl="kernel",
                    no_jit=True)
    caps = [np.asarray([5, 6, 7]), np.asarray([8, 9]),
            np.asarray([10, 11, 12]), np.asarray([4])]
    batch = {k: jnp.asarray(v)
             for k, v in make_batch(caps, None, config.seq_len).items()}

    results = {}
    for flag in ("1", "0"):
        monkeypatch.setenv("GIC_FUSE_EMBED", flag)
        state = create_train_state(config, jax.random.PRNGKey(1008))
        step = make_adv_step(config)
        state, metrics = step(state, batch, 5.0)
        results[flag] = (state, metrics)

    m1, m0 = results["1"][1], results["0"][1]
    np.testing.assert_allclose(float(m1["gen_adv_loss"]),
                               float(m0["gen_adv_loss"]), atol=1e-5)
    np.testing.assert_allclose(float(m1["disc_adv_loss"]),
                               float(m0["disc_adv_loss"]), atol=1e-5)
    f1, _ = jax.tree_util.tree_flatten(
        (results["1"][0].gen_params, results["1"][0].disc_params))
    f0, _ = jax.tree_util.tree_flatten(
        (results["0"][0].gen_params, results["0"][0].disc_params))
    for a, b in zip(f1, f0):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=5e-5, rtol=5e-4)
