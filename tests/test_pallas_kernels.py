"""Pallas kernels (interpret mode on CPU): distribution + gradient parity."""

import jax
import jax.numpy as jnp
import numpy as np

from gan_image_captioning_tpu.kernels.gumbel_sample import fused_gumbel_sample
from gan_image_captioning_tpu.ops import gumbel as gumbel_ops


def test_fused_sample_shapes_and_softmax_property():
    logits = jax.random.normal(jax.random.PRNGKey(0), (6, 256))
    soft, ids = fused_gumbel_sample(logits, 42, 2.0)
    assert soft.shape == (6, 256) and ids.shape == (6,)
    np.testing.assert_allclose(np.asarray(soft.sum(-1)), np.ones(6), atol=1e-5)
    np.testing.assert_array_equal(np.asarray(soft.argmax(-1)), np.asarray(ids))


def test_fused_sample_deterministic_per_seed():
    logits = jax.random.normal(jax.random.PRNGKey(1), (4, 128))
    s1, i1 = fused_gumbel_sample(logits, 7, 1.0)
    s2, i2 = fused_gumbel_sample(logits, 7, 1.0)
    s3, i3 = fused_gumbel_sample(logits, 8, 1.0)
    np.testing.assert_array_equal(np.asarray(i1), np.asarray(i2))
    np.testing.assert_allclose(np.asarray(s1), np.asarray(s2))
    assert not np.array_equal(np.asarray(i1), np.asarray(i3))


def test_fused_sample_matches_categorical_distribution():
    """ids must be distributed ~ softmax(logits) (the Gumbel-max trick):
    compare empirical frequencies over many seeds on a small vocab."""
    logits = jnp.log(jnp.asarray([[0.6, 0.25, 0.1, 0.05] + [1e-9] * 124]))
    logits = jnp.broadcast_to(logits, (16, 128))
    counts = np.zeros(4)
    trials = 200
    for seed in range(trials):
        _, ids = fused_gumbel_sample(logits, seed, 1.0)
        for t in np.asarray(ids):
            if t < 4:
                counts[t] += 1
    freq = counts / counts.sum()
    np.testing.assert_allclose(freq, [0.6, 0.25, 0.1, 0.05], atol=0.05)


def test_fused_sample_gradient_matches_softmax_vjp():
    logits = jax.random.normal(jax.random.PRNGKey(2), (3, 128))
    temp = 3.0

    def f_pallas(l):
        soft, _ = fused_gumbel_sample(l, 11, temp)
        return jnp.sum(soft ** 2)

    g_pallas = jax.grad(f_pallas)(logits)

    # analytic check: same function built from the saved soft output
    soft, _ = fused_gumbel_sample(logits, 11, temp)

    def f_manual(l):
        # softmax(temp * (l + g)) with g implied by the saved sample:
        # gradient of sum(soft^2) wrt l is temp * J_softmax^T (2*soft)
        dy = 2 * soft
        inner = jnp.sum(dy * soft, -1, keepdims=True)
        return temp * soft * (dy - inner)

    np.testing.assert_allclose(np.asarray(g_pallas), np.asarray(f_manual(None)),
                               rtol=1e-4, atol=1e-6)


def test_dispatcher_flag():
    logits = jax.random.normal(jax.random.PRNGKey(3), (4, 128))
    rng = jax.random.PRNGKey(0)
    try:
        gumbel_ops.set_use_pallas(True)
        soft_p, ids_p = gumbel_ops.gumbel_softmax(rng, logits, 1.0)
    finally:
        gumbel_ops.set_use_pallas(False)
    soft_j, ids_j = gumbel_ops.gumbel_softmax(rng, logits, 1.0)
    # different PRNG streams → different draws, same distribution family
    assert soft_p.shape == soft_j.shape
    np.testing.assert_allclose(np.asarray(soft_p.sum(-1)), np.ones(4), atol=1e-5)


def test_image_normalize_matches_reference_constants():
    from gan_image_captioning_tpu.kernels.image_norm import normalize_images
    from gan_image_captioning_tpu.data.images import IMAGENET_MEAN, IMAGENET_STD

    rng = np.random.RandomState(0)
    u8 = rng.randint(0, 256, (2, 3, 8, 16), dtype=np.uint8)
    out = np.asarray(normalize_images(jnp.asarray(u8)))
    ref = (u8.astype(np.float32) / 255.0
           - IMAGENET_MEAN.reshape(1, 3, 1, 1)) / IMAGENET_STD.reshape(1, 3, 1, 1)
    np.testing.assert_allclose(out, ref, atol=1e-6)


def test_device_preprocess_conditional_step():
    """images_u8 batches flow through generator_condition → encoder."""
    from gan_image_captioning_tpu.config import Config
    from gan_image_captioning_tpu.data.loader import make_batch
    from gan_image_captioning_tpu.models import api

    cfg = Config(vocab_size=40, gen_embed_dim=12, gen_hidden_dim=16,
                 max_seq_len=6, conditional_gan=1, image_size=32)
    params = api.init_generator(jax.random.PRNGKey(0), cfg)
    caps = [np.arange(4, 8), np.arange(5, 10)]
    imgs = [np.random.RandomState(s).randint(0, 256, (3, 32, 32),
                                             dtype=np.uint8) for s in (0, 1)]
    batch = make_batch(caps, imgs, cfg.seq_len)
    assert "images_u8" in batch and batch["images_u8"].dtype == np.uint8
    cond, stats = api.generator_condition(cfg, params, batch, train=False)
    assert cond["features"].shape == (2, 12)
    assert np.all(np.isfinite(np.asarray(cond["features"])))
