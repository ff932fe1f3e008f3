"""Weights-resident decode sampling kernel vs the jnp scan.

Interpret mode (CPU): the on-core PRNG is stubbed, so greedy/pretrain modes
must match the jnp scan EXACTLY (same argmax feedback path, f32).  Sample
mode's noise stream is TPU-hardware-defined and covered by on-TPU
distribution checks (run when a TPU backend is present).
"""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

os.environ["GIC_KERNEL_INTERPRET"] = "1"  # force the kernel path off-TPU

from gan_image_captioning_tpu.config import Config
from gan_image_captioning_tpu.kernels.decode_sample import decode_sample
from gan_image_captioning_tpu.models import generator as gen_lib


def _setup(vocab=256, e=32, h=64, nl=2, b=8, t=9):
    config = Config(vocab_size=vocab, gen_embed_dim=e, gen_hidden_dim=h,
                    gen_num_layers=nl, max_seq_len=t - 2)
    params = gen_lib.init_generator_params(jax.random.PRNGKey(3), config)
    dec = params["decoder"]
    feats = gen_lib.start_token_features(dec, b)
    return config, dec, feats


def _kernel_args(dec):
    return (dec["lstm"], dec["linear"]["w"], dec["linear"]["b"],
            dec["embed"])


def test_greedy_matches_scan():
    config, dec, feats = _setup()
    t = config.seq_len
    ids = decode_sample(feats, *_kernel_args(dec), seq_len=t, mode="greedy")
    _, ids_ref = gen_lib.sample(dec, feats, jax.random.PRNGKey(0), 1.0, t,
                                pretrain=True, impl="fused")
    np.testing.assert_array_equal(np.asarray(ids), np.asarray(ids_ref))


def test_pretrain_logits_match_scan():
    config, dec, feats = _setup()
    t = config.seq_len
    ids, logits_tm = decode_sample(feats, *_kernel_args(dec), seq_len=t,
                                   mode="pretrain")
    outs_ref, ids_ref = gen_lib.sample(dec, feats, jax.random.PRNGKey(0),
                                       1.0, t, pretrain=True, impl="fused")
    np.testing.assert_array_equal(np.asarray(ids), np.asarray(ids_ref))
    np.testing.assert_allclose(np.asarray(jnp.swapaxes(logits_tm, 0, 1)),
                               np.asarray(outs_ref), atol=1e-5)


def test_sample_mode_plumbing():
    """Interpret mode stubs the PRNG to zeros → noise must be the g(0)
    constant and ids must equal greedy ids (argmax is noise-shift
    invariant when the noise is constant)."""
    config, dec, feats = _setup()
    t = config.seq_len
    ids, noise = decode_sample(feats, *_kernel_args(dec), seq_len=t,
                               mode="sample", seed=5)
    ids_greedy = decode_sample(feats, *_kernel_args(dec), seq_len=t,
                               mode="greedy")
    np.testing.assert_array_equal(np.asarray(ids), np.asarray(ids_greedy))
    assert noise.shape == (t, feats.shape[0], config.vocab_size)
    # zero-stubbed uniform → g = -log(-log(eps) + eps), one constant value
    assert float(jnp.std(noise)) < 1e-4


def test_single_layer_and_odd_dims():
    config, dec, feats = _setup(vocab=128, e=16, h=32, nl=1, b=4, t=5)
    t = config.seq_len
    ids = decode_sample(feats, *_kernel_args(dec), seq_len=t, mode="greedy")
    _, ids_ref = gen_lib.sample(dec, feats, jax.random.PRNGKey(0), 1.0, t,
                                pretrain=True, impl="fused")
    np.testing.assert_array_equal(np.asarray(ids), np.asarray(ids_ref))


@pytest.mark.skipif(jax.default_backend() != "tpu",
                    reason="hardware PRNG stream is TPU-only")
def test_sample_distribution_tpu():
    config, dec, feats = _setup(vocab=128, e=16, h=32, nl=1, b=64, t=6)
    t = config.seq_len
    ids1, noise1 = decode_sample(feats, *_kernel_args(dec), seq_len=t,
                                 mode="sample", seed=5)
    ids2, _ = decode_sample(feats, *_kernel_args(dec), seq_len=t,
                            mode="sample", seed=6)
    assert not np.array_equal(np.asarray(ids1), np.asarray(ids2))
    # Gumbel(0,1) noise: mean ≈ γ ≈ 0.577, finite spread
    m = float(jnp.mean(noise1))
    assert 0.3 < m < 0.9


def test_impl_kernel_pretrain_matches_fused():
    """generator.sample(impl='kernel') pretrain path: identical ids, logits
    AND parameter gradients to the fused scan (the rescore is exact because
    the argmax feedback is detached — reference generator.py:75)."""
    config, dec, feats = _setup()
    t = config.seq_len
    rng = jax.random.PRNGKey(0)

    def loss(impl):
        def f(dec):
            outs, ids = gen_lib.sample(dec, feats, rng, 1.0, t,
                                       pretrain=True, impl=impl)
            return jnp.sum(outs ** 2) / outs.size, ids
        (l, ids), g = jax.value_and_grad(f, has_aux=True)(dec)
        return l, ids, g

    l_k, ids_k, g_k = loss("kernel")
    l_f, ids_f, g_f = loss("fused")
    np.testing.assert_array_equal(np.asarray(ids_k), np.asarray(ids_f))
    np.testing.assert_allclose(float(l_k), float(l_f), rtol=1e-6)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=2e-5), g_k, g_f)


def test_impl_kernel_adversarial_gradients_flow():
    config, dec, feats = _setup()
    t = config.seq_len

    def f(dec):
        soft, ids = gen_lib.sample(dec, feats, jax.random.PRNGKey(1),
                                   jnp.float32(5.0), t, pretrain=False,
                                   impl="kernel")
        return jnp.sum(soft ** 2) / soft.size

    g = jax.grad(f)(dec)
    total = sum(float(jnp.sum(jnp.abs(l)))
                for l in jax.tree_util.tree_leaves(g))
    assert np.isfinite(total) and total > 0


def test_kernel_vjp_matches_rescore_grads(monkeypatch):
    """The manual residual-based backward (_kernel_sample_soft) must equal
    the autodiff of the decoupled rescore — same kernel noise (interpret:
    zeros), same ids, same loss, same parameter gradients."""
    config, dec, feats = _setup()
    t = config.seq_len

    def run(vjp_flag):
        monkeypatch.setenv("GIC_KERNEL_VJP", vjp_flag)

        def f(dec):
            soft, ids = gen_lib.sample(dec, feats, jax.random.PRNGKey(1),
                                       jnp.float32(5.0), t, pretrain=False,
                                       impl="kernel")
            return jnp.sum(soft ** 2) / soft.size, ids

        (l, ids), g = jax.value_and_grad(f, has_aux=True)(dec)
        return l, ids, g

    l0, ids0, g0 = run("0")
    l1, ids1, g1 = run("1")
    np.testing.assert_array_equal(np.asarray(ids0), np.asarray(ids1))
    np.testing.assert_allclose(float(l0), float(l1), rtol=1e-5)
    jax.tree_util.tree_map(lambda a, b: np.testing.assert_allclose(
        np.asarray(a), np.asarray(b), atol=3e-6), g0, g1)
