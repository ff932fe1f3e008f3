"""The Pallas LSTM BPTT reverse kernel must match the lax.scan backward
bit-for-bit in structure (same math, float32 both sides)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gan_image_captioning_tpu.models import lstm as lstm_lib

T, B, H, E = 7, 4, 16, 8


@pytest.fixture(autouse=True)
def _env(monkeypatch):
    monkeypatch.setenv("GIC_KERNEL_INTERPRET", "1")


def _grad_through_layer_seq(monkeypatch, kernel: str):
    monkeypatch.setenv("GIC_BPTT_KERNEL", kernel)
    rng = jax.random.PRNGKey(0)
    ks = jax.random.split(rng, 4)
    w = jax.random.normal(ks[0], (E + H, 4 * H)) * 0.3
    b = jax.random.normal(ks[1], (4 * H,)) * 0.1
    xs = jax.random.normal(ks[2], (T, B, E))
    probe = jax.random.normal(ks[3], (T, B, H))
    h0 = jnp.zeros((B, H))
    c0 = jnp.zeros((B, H))

    def loss(w, b, xs, h0, c0):
        hs = lstm_lib._layer_seq(w, b, xs, h0, c0)
        return jnp.sum(hs * probe)

    return jax.grad(loss, argnums=(0, 1, 2, 3, 4))(w, b, xs, h0, c0)


def test_bptt_kernel_matches_scan_backward(monkeypatch):
    g_kernel = _grad_through_layer_seq(monkeypatch, "1")
    g_scan = _grad_through_layer_seq(monkeypatch, "0")
    for a, b in zip(g_kernel, g_scan):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-5, rtol=1e-5)


def test_bptt_kernel_in_full_sample_vjp(monkeypatch):
    """The kernel path through _kernel_sample_soft's manual VJP (the
    production adversarial backward) must match the scan path."""
    from gan_image_captioning_tpu.config import Config
    from gan_image_captioning_tpu.models import generator as gen_lib

    config = Config(vocab_size=64, gen_embed_dim=E, gen_hidden_dim=H,
                    gen_num_layers=2, max_seq_len=T - 2)
    dec = gen_lib.init_decoder_params(jax.random.PRNGKey(1), config)
    feats = jax.random.normal(jax.random.PRNGKey(2), (B, E))
    probe = jax.random.normal(jax.random.PRNGKey(3), (T, B, 64))

    def loss(dec_p):
        soft, _ = gen_lib._kernel_sample_soft(dec_p, feats,
                                              jnp.float32(2.0),
                                              jnp.int32(5), T)
        return jnp.sum(soft * probe)

    grads = {}
    for flag in ("1", "0"):
        monkeypatch.setenv("GIC_BPTT_KERNEL", flag)
        grads[flag] = jax.grad(loss)(dec)
    fa, _ = jax.tree_util.tree_flatten(grads["1"])
    fb, _ = jax.tree_util.tree_flatten(grads["0"])
    for a, b in zip(fa, fb):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-5, rtol=1e-5)


@pytest.mark.parametrize("nl", [1, 2, 3])
def test_chained_bptt_matches_scan_in_sample_vjp(monkeypatch, nl):
    """The CHAINED multi-layer reverse kernel (GIC_BPTT_CHAIN — one grid
    for the whole stacked backward recurrence incl. inter-layer input
    grads) must match the per-layer scan path through the production
    sample VJP, for 1/2/3-layer stacks."""
    from gan_image_captioning_tpu.config import Config
    from gan_image_captioning_tpu.models import generator as gen_lib

    config = Config(vocab_size=64, gen_embed_dim=E, gen_hidden_dim=H,
                    gen_num_layers=nl, max_seq_len=T - 2)
    dec = gen_lib.init_decoder_params(jax.random.PRNGKey(1), config)
    feats = jax.random.normal(jax.random.PRNGKey(2), (B, E))
    probe = jax.random.normal(jax.random.PRNGKey(3), (T, B, 64))

    def loss(dec_p):
        soft, _ = gen_lib._kernel_sample_soft(dec_p, feats,
                                              jnp.float32(2.0),
                                              jnp.int32(5), T)
        return jnp.sum(soft * probe)

    grads = {}
    for flag in ("1", "0"):
        monkeypatch.setenv("GIC_BPTT_CHAIN", flag)
        grads[flag] = jax.grad(loss)(dec)
    fa, _ = jax.tree_util.tree_flatten(grads["1"])
    fb, _ = jax.tree_util.tree_flatten(grads["0"])
    assert fa and len(fa) == len(fb)
    for a, b in zip(fa, fb):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-5, rtol=1e-5)


def test_chained_bptt_in_fused_embed_vjp(monkeypatch):
    """Chain kernel must also serve the fused sample→disc-embed VJP
    (_kernel_sample_embed shares _lstm_bptt_from_dhs)."""
    from gan_image_captioning_tpu.config import Config
    from gan_image_captioning_tpu.models import generator as gen_lib

    config = Config(vocab_size=64, gen_embed_dim=E, gen_hidden_dim=H,
                    gen_num_layers=2, max_seq_len=T - 2)
    dec = gen_lib.init_decoder_params(jax.random.PRNGKey(1), config)
    feats = jax.random.normal(jax.random.PRNGKey(2), (B, E))
    wd = jax.random.normal(jax.random.PRNGKey(4), (8, 64)) * 0.2
    probe = jax.random.normal(jax.random.PRNGKey(3), (T, B, 8))

    def loss(dec_p):
        emb, _ = gen_lib._kernel_sample_embed(dec_p, feats,
                                              jnp.float32(2.0),
                                              jnp.int32(5), wd, T, "gen")
        return jnp.sum(emb * probe)

    grads = {}
    for flag in ("1", "0"):
        monkeypatch.setenv("GIC_BPTT_CHAIN", flag)
        grads[flag] = jax.grad(loss)(dec)
    fa, _ = jax.tree_util.tree_flatten(grads["1"])
    fb, _ = jax.tree_util.tree_flatten(grads["0"])
    for a, b in zip(fa, fb):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-5, rtol=1e-5)
