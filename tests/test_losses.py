"""GAN loss zoo vs. a PyTorch oracle.

The oracle computes each loss with torch primitives following the intended
math of reference ``utils.py:10-53`` (with the hinge/tv constructor-misuse
bugs fixed, as catalogued in SURVEY.md).
"""

import numpy as np
import pytest
import torch
import torch.nn.functional as F

from gan_image_captioning_tpu.ops.losses import (
    LOSS_TYPES, bce_with_logits, cross_entropy_loss, gan_losses)


def _torch_losses(d_real, d_fake, g_out, loss_type):
    d_real, d_fake, g_out = map(torch.tensor, (d_real, d_fake, g_out))
    bce = torch.nn.BCEWithLogitsLoss()
    if loss_type == "standard":
        d = bce(d_real, torch.ones_like(d_real)) + bce(d_fake, torch.zeros_like(d_fake))
        g = bce(g_out, torch.ones_like(g_out))
    elif loss_type == "JS":
        d = bce(d_real, torch.ones_like(d_real)) + bce(d_fake, torch.zeros_like(d_fake))
        g = -bce(g_out, torch.zeros_like(g_out))
    elif loss_type == "KL":
        d = bce(d_real, torch.ones_like(d_real)) + bce(d_fake, torch.zeros_like(d_fake))
        g = torch.mean(-g_out)
    elif loss_type == "hinge":
        d = torch.mean(F.relu(1.0 - d_real)) + torch.mean(F.relu(1.0 + d_fake))
        g = -torch.mean(g_out)
    elif loss_type == "tv":
        d = torch.mean(torch.tanh(d_fake) - torch.tanh(d_real))
        g = torch.mean(-torch.tanh(g_out))
    elif loss_type == "rsgan":
        d = bce(d_real - d_fake, torch.ones_like(d_real))
        g = bce(d_fake - d_real, torch.ones_like(d_fake))
    return g.item(), d.item()


@pytest.mark.parametrize("loss_type", LOSS_TYPES)
def test_gan_losses_match_torch(loss_type):
    rng = np.random.RandomState(0)
    d_real = rng.randn(64).astype(np.float32) * 2
    d_fake = rng.randn(64).astype(np.float32) * 2
    g_out = rng.randn(64).astype(np.float32) * 2
    g_ref, d_ref = _torch_losses(d_real, d_fake, g_out, loss_type)
    g, d = gan_losses(d_real, d_fake, g_out, loss_type)
    np.testing.assert_allclose(float(g), g_ref, rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(float(d), d_ref, rtol=1e-5, atol=1e-6)


def test_unknown_loss_raises():
    x = np.zeros(4, np.float32)
    with pytest.raises(NotImplementedError):
        gan_losses(x, x, x, "wgan-gp")


def test_bce_with_logits_matches_torch():
    rng = np.random.RandomState(1)
    logits = rng.randn(128).astype(np.float32) * 5
    targets = (rng.rand(128) > 0.5).astype(np.float32)
    ref = torch.nn.BCEWithLogitsLoss()(
        torch.tensor(logits), torch.tensor(targets)).item()
    np.testing.assert_allclose(float(bce_with_logits(logits, targets)), ref,
                               rtol=1e-5, atol=1e-7)


def test_cross_entropy_matches_torch_unmasked():
    # The reference MLE objective: CE over ALL B*T positions, pads included
    # (training.py:81-83 — no ignore_index).
    rng = np.random.RandomState(2)
    B, T, V = 4, 9, 23
    logits = rng.randn(B, T, V).astype(np.float32)
    targets = rng.randint(0, V, (B, T))
    ref = torch.nn.CrossEntropyLoss()(
        torch.tensor(logits).view(-1, V), torch.tensor(targets).view(-1)).item()
    np.testing.assert_allclose(
        float(cross_entropy_loss(logits, targets)), ref, rtol=1e-5, atol=1e-6)


def test_cross_entropy_masked():
    rng = np.random.RandomState(3)
    B, T, V = 2, 5, 11
    logits = rng.randn(B, T, V).astype(np.float32)
    targets = rng.randint(0, V, (B, T))
    mask = np.zeros((B, T), np.float32)
    mask[:, :3] = 1.0
    ref = torch.nn.CrossEntropyLoss()(
        torch.tensor(logits[:, :3]).reshape(-1, V),
        torch.tensor(targets[:, :3]).reshape(-1)).item()
    np.testing.assert_allclose(
        float(cross_entropy_loss(logits, targets, mask)), ref,
        rtol=1e-5, atol=1e-6)


def test_label_smoothing_changes_only_real_term():
    rng = np.random.RandomState(4)
    x = rng.randn(32).astype(np.float32)
    g1, d1 = gan_losses(x, x, x, "standard", real_label=1.0)
    g2, d2 = gan_losses(x, x, x, "standard", real_label=0.9)
    assert float(g1) == float(g2)
    assert float(d1) != float(d2)


def test_noisy_label_flip_per_sample_statistics():
    # Report §4.3 noisy labels: flips are i.i.d. per SAMPLE (not one draw
    # for the whole batch), constant across a sample's num_rep replicas.
    import jax
    import jax.numpy as jnp

    from gan_image_captioning_tpu.train.steps import noisy_label_flip

    B, num_rep = 512, 4
    d_real = jnp.repeat(jnp.arange(B, dtype=jnp.float32), num_rep)
    d_fake = -d_real - 1.0
    r_in, f_in = noisy_label_flip(
        jax.random.PRNGKey(7), d_real, d_fake, 0.5, num_rep)
    r_in, f_in = np.asarray(r_in), np.asarray(f_in)

    flipped = (r_in < 0).reshape(B, num_rep)
    # constant within each sample's replica block
    assert (flipped == flipped[:, :1]).all()
    # i.i.d. per sample at p=0.5: ~B/2 flips (binomial 6-sigma bounds),
    # impossible under per-batch flipping (0 or B)
    n = flipped[:, 0].sum()
    assert 0.5 * B - 6 * np.sqrt(0.25 * B) < n < 0.5 * B + 6 * np.sqrt(0.25 * B)
    # swap is exact: flipped rows exchange real/fake, others untouched
    np.testing.assert_array_equal(
        np.where(flipped.reshape(-1), np.asarray(d_fake), np.asarray(d_real)), r_in)
    np.testing.assert_array_equal(
        np.where(flipped.reshape(-1), np.asarray(d_real), np.asarray(d_fake)), f_in)

    # p=0 is the identity
    r0, f0 = noisy_label_flip(jax.random.PRNGKey(3), d_real, d_fake, 0.0, num_rep)
    np.testing.assert_array_equal(np.asarray(r0), np.asarray(d_real))
    np.testing.assert_array_equal(np.asarray(f0), np.asarray(d_fake))
