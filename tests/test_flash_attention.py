"""Flash-attention kernel parity (kernels/flash_attention.py).

The blocked online-softmax kernel must match the dense attention the
transformer stack otherwise runs — forward and gradients — across every
mask structure the stack builds (causal / full × with / without key-length
padding masks), and the model-level routing (GIC_FLASH_ATTN) must be a
numerical no-op.  Runs in interpreter mode on the CPU backend.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gan_image_captioning_tpu.kernels.flash_attention import (
    attention_reference, flash_attention, pick_block, supported)


def _qkv(b=2, t=256, h=4, d=32, seed=0):
    ks = jax.random.split(jax.random.PRNGKey(seed), 3)
    return [jax.random.normal(k, (b, t, h, d), jnp.float32) for k in ks]


@pytest.mark.parametrize("causal", [True, False])
@pytest.mark.parametrize("with_lengths", [False, True])
def test_forward_matches_dense(causal, with_lengths):
    q, k, v = _qkv()
    lengths = jnp.array([200, 77], jnp.int32) if with_lengths else None
    out = flash_attention(q, k, v, causal, lengths)
    ref = attention_reference(q, k, v, causal, lengths)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=5e-6, rtol=1e-5)


def test_gradients_match_dense():
    q, k, v = _qkv(t=128)
    lengths = jnp.array([100, 33], jnp.int32)

    def loss(fn, *args):
        return jnp.sum(fn(*args, True, lengths) ** 2)

    gf = jax.grad(lambda *a: loss(flash_attention, *a), (0, 1, 2))(q, k, v)
    gr = jax.grad(lambda *a: loss(attention_reference, *a), (0, 1, 2))(q, k, v)
    for a, b in zip(gf, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=2e-5, rtol=1e-4)


def test_multi_block_causal_boundary():
    """T = 4 blocks of 64: the causal loop bound and the diagonal-block
    triangular mask both get exercised at block granularity."""
    q, k, v = _qkv(b=1, t=256, h=2, d=16, seed=3)
    out = flash_attention(q, k, v, True)
    ref = attention_reference(q, k, v, True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=5e-6, rtol=1e-5)
    assert pick_block(256) == 128


def test_supported_predicate():
    assert supported(256, 32)
    assert supported(512, 64)
    assert supported(35, 32)          # ragged T: handled by padding
    assert not supported(256, 12)     # ragged head_dim


@pytest.mark.parametrize("t", [35, 200, 513])
def test_ragged_T_padding(t):
    """Real sequence lengths are ragged (caption + feature token = L+1);
    the wrapper pads T to a block multiple and slices back."""
    q, k, v = _qkv(b=2, t=t, h=2, d=16, seed=7)
    lengths = jnp.array([t - 3, max(t // 2, 1)], jnp.int32)
    out = flash_attention(q, k, v, True, lengths)
    ref = attention_reference(q, k, v, True, lengths)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=5e-6, rtol=1e-5)
    g = jax.grad(lambda q: jnp.sum(flash_attention(q, k, v, True,
                                                   lengths) ** 2))(q)
    gr = jax.grad(lambda q: jnp.sum(attention_reference(q, k, v, True,
                                                        lengths) ** 2))(q)
    np.testing.assert_allclose(np.asarray(g), np.asarray(gr),
                               atol=2e-5, rtol=1e-4)


def test_block_routing_is_numerical_noop(monkeypatch):
    """block_apply with GIC_FLASH_ATTN=1 == the dense path, padding masks
    included (the teacher_forced/discriminator mask structure)."""
    from gan_image_captioning_tpu.models import transformer as tf

    d_model, heads, t, b = 64, 2, 128, 2
    blk = tf.init_block(jax.random.PRNGKey(0), d_model, 2 * d_model,
                        jnp.float32)
    x = jax.random.normal(jax.random.PRNGKey(1), (b, t, d_model))
    lengths = jnp.array([100, 60], jnp.int32)
    mask = tf.causal_mask(t)
    mask = mask & (jnp.arange(t)[None, :] < lengths[:, None])[:, None, None, :]

    monkeypatch.setenv("GIC_FLASH_ATTN", "0")
    dense_out = tf.block_apply(blk, x, heads, mask, flash_causal=True,
                               flash_lengths=lengths)
    monkeypatch.setenv("GIC_FLASH_ATTN", "1")
    flash_out = tf.block_apply(blk, x, heads, mask, flash_causal=True,
                               flash_lengths=lengths)
    np.testing.assert_allclose(np.asarray(flash_out), np.asarray(dense_out),
                               atol=5e-5, rtol=1e-4)


def test_teacher_forced_flash_matches_dense(monkeypatch):
    """End-to-end generator MLE pass: flash on vs off, same logits."""
    from gan_image_captioning_tpu.config import Config
    from gan_image_captioning_tpu.models import transformer as tf

    config = Config(vocab_size=64, gen_arch="transformer", gen_embed_dim=32,
                    gen_hidden_dim=64, gen_num_layers=2, gen_num_heads=2,
                    max_seq_len=125)  # T = 125 + 2 + 1 = 128 after wrap
    dec = tf.init_transformer_decoder_params(jax.random.PRNGKey(0), config)
    caps = jax.random.randint(jax.random.PRNGKey(1), (2, 127), 0, 64)
    feats = jax.random.normal(jax.random.PRNGKey(2), (2, 32))
    lengths = jnp.array([90, 30], jnp.int32)

    monkeypatch.setenv("GIC_FLASH_ATTN", "0")
    dense_logits = tf.teacher_forced(dec, feats, caps, config,
                                     lengths=lengths)
    monkeypatch.setenv("GIC_FLASH_ATTN", "1")
    flash_logits = tf.teacher_forced(dec, feats, caps, config,
                                     lengths=lengths)
    np.testing.assert_allclose(np.asarray(flash_logits),
                               np.asarray(dense_logits),
                               atol=1e-4, rtol=1e-3)


def test_flash_under_remat(monkeypatch):
    """GIC_TF_REMAT=1 composes with the flash kernel (checkpointed
    backward re-runs the Pallas forward)."""
    from gan_image_captioning_tpu.models import transformer as tf

    d_model, heads, t = 32, 2, 64
    blk = tf.init_block(jax.random.PRNGKey(0), d_model, d_model, jnp.float32)
    x = jax.random.normal(jax.random.PRNGKey(1), (2, t, d_model))

    def loss(x, flash, remat):
        monkeypatch.setenv("GIC_FLASH_ATTN", flash)
        monkeypatch.setenv("GIC_TF_REMAT", remat)
        return jnp.sum(tf.remat_block_apply(blk, x, heads,
                                            tf.causal_mask(t),
                                            flash_causal=True) ** 2)

    g_dense = jax.grad(lambda x: loss(x, "0", "0"))(x)
    g_flash_remat = jax.grad(lambda x: loss(x, "1", "1"))(x)
    np.testing.assert_allclose(np.asarray(g_flash_remat),
                               np.asarray(g_dense), atol=1e-4, rtol=1e-3)
