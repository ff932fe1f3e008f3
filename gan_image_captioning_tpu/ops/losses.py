"""Adversarial loss zoo + sequence cross-entropy.

Re-implements the reference's six GAN losses (``utils.py:10-53``) as pure
jnp functions.  Two reference variants contain latent bugs — ``hinge`` and
``tv`` call ``nn.ReLU(...)`` / ``nn.Tanh(...)`` as if they were functions
(``utils.py:36-44``), which raises at run time — here the intended math
(``relu`` / ``tanh``) is implemented correctly, per the survey's
"match intended semantics, not the bugs" rule.

All reductions are means over every logit element, matching
``torch.nn.BCEWithLogitsLoss`` / ``torch.mean`` defaults so loss curves are
comparable with the reference.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

LOSS_TYPES = ("standard", "JS", "KL", "hinge", "tv", "rsgan")


def _wmean(x, weights=None):
    """Mean, optionally weighted (weights broadcast against ``x``).

    Weighted means let eval run on padded final batches while reproducing the
    reference's exact unpadded batch statistics (weight 0 on pad samples)."""
    if weights is None:
        return jnp.mean(x)
    w = jnp.broadcast_to(jnp.asarray(weights, x.dtype), x.shape)
    return jnp.sum(x * w) / jnp.maximum(jnp.sum(w), 1e-8)


def bce_with_logits(logits, targets, weights=None):
    """Numerically-stable binary cross entropy with logits, mean reduction.

    Identical math to ``torch.nn.BCEWithLogitsLoss()`` (used throughout
    reference ``utils.py:12-48``):
    ``max(x, 0) - x*z + log(1 + exp(-|x|))`` averaged over all elements.
    """
    logits = jnp.asarray(logits)
    targets = jnp.asarray(targets, dtype=logits.dtype)
    per_elem = (jnp.maximum(logits, 0.0) - logits * targets
                + jnp.log1p(jnp.exp(-jnp.abs(logits))))
    return _wmean(per_elem, weights)


def gan_losses(d_out_real, d_out_fake, g_out, loss_type: str = "standard",
               real_label: float = 1.0, weights=None):
    """Return ``(g_loss, d_loss)`` for the given adversarial loss family.

    Mirrors reference ``get_losses`` (``utils.py:10-53``) including its
    slightly unusual convention that ``standard`` is the *non-saturating*
    loss and ``JS`` the vanilla (saturating) one.

    Args:
      d_out_real: discriminator logits on real sequences.
      d_out_fake: discriminator logits on detached generated sequences.
      g_out: discriminator logits on the non-detached generated sequences
        (the generator's gradient path, reference ``training.py:164``).
      loss_type: one of ``standard | JS | KL | hinge | tv | rsgan``.
      real_label: target value for "real" (``< 1.0`` gives one-sided label
        smoothing, report §4.3's stabilization trick; 1.0 = reference).
      weights: optional per-logit weights (e.g. 0 for pad samples in a
        padded eval batch); every mean becomes a weighted mean.
    """
    ones_r = jnp.full_like(d_out_real, real_label)
    zeros_f = jnp.zeros_like(d_out_fake)

    if loss_type == "standard":  # the non-saturating GAN loss (utils.py:14-19)
        d_loss = (bce_with_logits(d_out_real, ones_r, weights)
                  + bce_with_logits(d_out_fake, zeros_f, weights))
        g_loss = bce_with_logits(g_out, jnp.ones_like(g_out), weights)
    elif loss_type == "JS":  # the vanilla GAN loss (utils.py:21-26)
        d_loss = (bce_with_logits(d_out_real, ones_r, weights)
                  + bce_with_logits(d_out_fake, zeros_f, weights))
        g_loss = -bce_with_logits(g_out, jnp.zeros_like(g_out), weights)
    elif loss_type == "KL":  # implicitly minimizes KL (utils.py:28-33)
        d_loss = (bce_with_logits(d_out_real, ones_r, weights)
                  + bce_with_logits(d_out_fake, zeros_f, weights))
        g_loss = _wmean(-g_out, weights)
    elif loss_type == "hinge":  # utils.py:35-40, with the intended relu math
        d_loss = (_wmean(jax.nn.relu(1.0 - d_out_real), weights)
                  + _wmean(jax.nn.relu(1.0 + d_out_fake), weights))
        g_loss = -_wmean(g_out, weights)
    elif loss_type == "tv":  # total variation (utils.py:42-44), intended tanh
        d_loss = _wmean(jnp.tanh(d_out_fake) - jnp.tanh(d_out_real), weights)
        g_loss = _wmean(-jnp.tanh(g_out), weights)
    elif loss_type == "rsgan":  # relativistic standard GAN (utils.py:46-48)
        d_loss = bce_with_logits(d_out_real - d_out_fake,
                                 jnp.ones_like(d_out_real), weights)
        g_loss = bce_with_logits(d_out_fake - d_out_real,
                                 jnp.ones_like(d_out_fake), weights)
    else:
        raise NotImplementedError(
            "Divergence '%s' is not implemented" % loss_type)

    return g_loss, d_loss


def cross_entropy_loss(logits, targets, mask=None):
    """Token-level cross entropy.

    With ``mask=None`` this matches the reference's MLE objective exactly:
    ``nn.CrossEntropyLoss()(logits.view(-1, V), targets.view(-1))``
    (``training.py:81-83``) — a mean over *all* ``B*T`` positions, pads
    included (the reference does not pass ``ignore_index``).

    Args:
      logits: ``[B, T, V]`` unnormalized scores.
      targets: ``[B, T]`` int token ids.
      mask: optional ``[B, T]`` {0,1} weights; when given, the loss is the
        weighted mean over unmasked positions (the masked variant the
        reference's ``pack_padded_sequence`` path would have computed had it
        been used, ``training.py:78-79``).
    """
    logp = jax.nn.log_softmax(logits, axis=-1)
    nll = -jnp.take_along_axis(logp, targets[..., None], axis=-1)[..., 0]
    if mask is None:
        return jnp.mean(nll)
    mask = mask.astype(nll.dtype)
    return jnp.sum(nll * mask) / jnp.maximum(jnp.sum(mask), 1.0)
