"""Equivalence of the decoupled decode restructure vs the fused scan.

The decoupled implementation (models/generator.py:_sample_decoupled) claims
mathematical identity with the single differentiable scan: same ids, same
outputs, same gradients.  The claim rests on the reference detaching the
feedback path (``self.embed(pred_index.detach())``, generator.py:75) — the
differentiable graph of a free-running sample IS a teacher-forced pass over
the sampled ids.  These tests pin every piece of that claim.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gan_image_captioning_tpu.config import Config
from gan_image_captioning_tpu.models import generator as gen_lstm
from gan_image_captioning_tpu.models import lstm
from gan_image_captioning_tpu.ops.gumbel import gumbel_noise


def small_config(**kw):
    base = dict(vocab_size=97, gen_embed_dim=16, gen_hidden_dim=24,
                gen_num_layers=2, max_seq_len=9, disc_embed_dim=8,
                disc_num_rep=4, disc_filter_sizes=(2, 3),
                disc_num_filters=(6, 6))
    base.update(kw)
    return Config(**base)


def test_vmapped_gumbel_noise_matches_per_key():
    """Phase 2 regenerates the phase-1 per-step Gumbel draws by vmapping
    over the same split keys — jax.random must make those identical."""
    rngs = jax.random.split(jax.random.PRNGKey(7), 5)
    batched = jax.vmap(lambda k: gumbel_noise(k, (3, 11)))(rngs)
    for t in range(5):
        single = gumbel_noise(rngs[t], (3, 11))
        np.testing.assert_array_equal(np.asarray(batched[t]),
                                      np.asarray(single))


def test_lstm_seq_tm_forward_matches_lstm_forward():
    rng = jax.random.PRNGKey(0)
    params = lstm.init_lstm_params(rng, 8, 16, 2)
    xs = jax.random.normal(jax.random.PRNGKey(1), (4, 7, 8))
    ref, _ = lstm.lstm_forward(params, xs)
    out = lstm.lstm_seq_tm(params, jnp.swapaxes(xs, 0, 1))
    np.testing.assert_allclose(np.asarray(jnp.swapaxes(out, 0, 1)),
                               np.asarray(ref), rtol=1e-6, atol=1e-6)


def test_lstm_seq_tm_gradients_match_autodiff():
    """The deferred-gradient custom VJP must reproduce XLA autodiff of the
    plain scan: weight grads, bias grads, input grads."""
    rng = jax.random.PRNGKey(2)
    params = lstm.init_lstm_params(rng, 6, 12, 2)
    xs = jax.random.normal(jax.random.PRNGKey(3), (3, 5, 6))
    tgt = jax.random.normal(jax.random.PRNGKey(4), (3, 5, 12))

    def loss_ref(p, x):
        out, _ = lstm.lstm_forward(p, x)
        return jnp.sum((out - tgt) ** 2)

    def loss_new(p, x):
        out = lstm.lstm_seq_tm(p, jnp.swapaxes(x, 0, 1))
        return jnp.sum((jnp.swapaxes(out, 0, 1) - tgt) ** 2)

    (v_ref, g_ref) = jax.value_and_grad(loss_ref, argnums=(0, 1))(params, xs)
    (v_new, g_new) = jax.value_and_grad(loss_new, argnums=(0, 1))(params, xs)
    np.testing.assert_allclose(float(v_new), float(v_ref), rtol=1e-6)
    flat_ref, _ = jax.tree_util.tree_flatten(g_ref)
    flat_new, _ = jax.tree_util.tree_flatten(g_new)
    for a, b in zip(flat_new, flat_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("pretrain", [True, False])
def test_decoupled_sample_matches_fused(pretrain):
    config = small_config()
    params = gen_lstm.init_generator_params(jax.random.PRNGKey(11), config)
    feats = jax.random.normal(jax.random.PRNGKey(12),
                              (5, config.gen_embed_dim))
    rng = jax.random.PRNGKey(13)
    out_f, ids_f = gen_lstm.sample(params["decoder"], feats, rng, 2.5,
                                   config.seq_len, pretrain, impl="fused")
    out_d, ids_d = gen_lstm.sample(params["decoder"], feats, rng, 2.5,
                                   config.seq_len, pretrain, impl="decoupled")
    np.testing.assert_array_equal(np.asarray(ids_d), np.asarray(ids_f))
    np.testing.assert_allclose(np.asarray(out_d), np.asarray(out_f),
                               rtol=1e-5, atol=1e-6)


@pytest.mark.parametrize("pretrain", [True, False])
def test_decoupled_gradients_match_fused(pretrain):
    """End-to-end gradient identity through a sample-dependent loss."""
    config = small_config()
    params = gen_lstm.init_generator_params(jax.random.PRNGKey(21), config)
    feats = jax.random.normal(jax.random.PRNGKey(22),
                              (4, config.gen_embed_dim))
    rng = jax.random.PRNGKey(23)
    probe = jax.random.normal(
        jax.random.PRNGKey(24), (4, config.seq_len, config.vocab_size))

    def loss(p, impl):
        out, _ = gen_lstm.sample(p["decoder"], feats, rng, 1.7,
                                 config.seq_len, pretrain, impl=impl)
        return jnp.mean(out * probe) + jnp.mean(out ** 2)

    v_f, g_f = jax.value_and_grad(lambda p: loss(p, "fused"))(params)
    v_d, g_d = jax.value_and_grad(lambda p: loss(p, "decoupled"))(params)
    np.testing.assert_allclose(float(v_d), float(v_f), rtol=1e-6)
    flat_f, _ = jax.tree_util.tree_flatten(g_f)
    flat_d, _ = jax.tree_util.tree_flatten(g_d)
    for a, b in zip(flat_d, flat_f):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-5, atol=1e-6)


def test_adv_step_losses_match_across_impls():
    """The fused adversarial losses are impl-invariant (same rng)."""
    from gan_image_captioning_tpu.models.discriminator import (
        init_discriminator_params)
    from gan_image_captioning_tpu.train.steps import adv_losses

    for impl in ("fused", "decoupled"):
        config = small_config(decode_impl=impl)
        gp = gen_lstm.init_generator_params(jax.random.PRNGKey(31), config)
        dp = init_discriminator_params(jax.random.PRNGKey(32), config)
        caps = jax.random.randint(jax.random.PRNGKey(33),
                                  (4, config.seq_len), 0, config.vocab_size)
        g_loss, d_loss, _ = adv_losses(config, gp, dp, {"captions": caps},
                                       jax.random.PRNGKey(34), 2.0,
                                       train=False)
        if impl == "fused":
            ref = (float(g_loss), float(d_loss))
        else:
            np.testing.assert_allclose(float(g_loss), ref[0], rtol=1e-5)
            np.testing.assert_allclose(float(d_loss), ref[1], rtol=1e-5)


def test_adv_gradients_match_across_impls():
    """Generator gradients of the adversarial loss are impl-invariant —
    the property the whole restructure stands on."""
    from gan_image_captioning_tpu.models.discriminator import (
        init_discriminator_params)
    from gan_image_captioning_tpu.train.steps import adv_losses

    grads = {}
    for impl in ("fused", "decoupled"):
        config = small_config(decode_impl=impl)
        gp = gen_lstm.init_generator_params(jax.random.PRNGKey(41), config)
        dp = init_discriminator_params(jax.random.PRNGKey(42), config)
        caps = jax.random.randint(jax.random.PRNGKey(43),
                                  (4, config.seq_len), 0, config.vocab_size)

        def g_loss_fn(g, config=config, dp=dp, caps=caps):
            gl, _, _ = adv_losses(config, g, dp, {"captions": caps},
                                  jax.random.PRNGKey(44), 2.0, train=False)
            return gl

        grads[impl] = jax.grad(g_loss_fn)(gp)
    flat_f, _ = jax.tree_util.tree_flatten(grads["fused"])
    flat_d, _ = jax.tree_util.tree_flatten(grads["decoupled"])
    for a, b in zip(flat_d, flat_f):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-5, atol=1e-6)
