"""Policy-gradient adversarial training with rollout-based rewards.

BASELINE.json config 4 names "adversarial training with rollout-based
rewards" and the north star lists "Gumbel-softmax/policy-gradient sampling"
as the two sampling regimes.  The committed reference implements only the
Gumbel relaxation (``generator.py:84-96``); this module adds the SeqGAN-style
policy-gradient alternative (Yu et al. 2017) as a flag-gated objective
(``--adv-objective reinforce``), for both generator architectures.

Design (TPU-first):

* **Sampling** is the Gumbel-max trick already used by the decode scans —
  ``argmax(logits + Gumbel)`` is an exact categorical draw, so the sampler
  is shared with the Gumbel path (no ``jax.random.categorical`` per step).
* **Rollout rewards**: for prefix lengths ``p ∈ {stride, 2·stride, …}`` the
  sampled prefix is completed ``--rollout-num`` times by the current policy
  and scored by the discriminator; a position's reward is the completion
  score of the nearest evaluated prefix covering it (SeqGAN evaluates every
  position; ``--rollout-stride`` bounds the O(T²·K) cost).  All rollouts of
  one prefix run as ONE batched decode (batch tiled ×K); the prefix-length
  loop is a ``lax.map`` whose body compiles once.  Prefix forcing is a
  per-step ``where(t < p, forced, sampled)`` — one static-shape program for
  every prefix length.
* **REINFORCE**: ``g_loss = -E[(r - b) · log π(y_t | y_<t)]``.  The log-probs
  come from a *teacher-forced* differentiable pass over the sampled ids —
  the same decoupled-rescore structure as the Gumbel path (big MXU matmuls,
  no per-step weight-gradient traffic).  Baseline ``b``: ``greedy`` =
  self-critical sequence training (the greedy decode's terminal score), or
  ``batch_mean``.
* **Discriminator** trains on real int ids vs sampled fake int ids with the
  configured ``--adv-loss-type`` (embedding-gather inputs on both sides; no
  [B, L, V] one-hot materialization).

With ``--rollout-num 0`` the reward is terminal-only (one D score per
sequence, broadcast over time) — REINFORCE without rollouts.
"""

from __future__ import annotations

from typing import Any, Dict

import jax
import jax.numpy as jnp

from gan_image_captioning_tpu.config import Config
from gan_image_captioning_tpu.models import api
from gan_image_captioning_tpu.models import generator as gen_lstm
from gan_image_captioning_tpu.models import lstm
from gan_image_captioning_tpu.models import transformer as gen_tf
from gan_image_captioning_tpu.ops.gumbel import add_gumbel
from gan_image_captioning_tpu.ops.losses import gan_losses


# ----------------------------------------------------------------- sampling

def _prefix_decode_lstm(dec: dict, features, forced_tm, prefix_len, rng,
                        seq_len: int):
    """Free-running LSTM decode whose first ``prefix_len`` tokens are forced
    to ``forced_tm`` [T, B] (traced ``prefix_len`` → one compiled program for
    every prefix length).  Returns sampled ids [T, B] (ints only — no
    gradient path, suitable for rollouts)."""
    batch = features.shape[0]
    hidden_dim = dec["lstm"][0]["w_hh"].shape[1]
    fused = lstm.fuse_layer_params(dec["lstm"])
    states = lstm.zero_state(len(dec["lstm"]), batch, hidden_dim,
                             features.dtype)

    def step(carry, inp):
        x, states, t = carry
        rng_t, forced_t = inp
        h, states = lstm.lstm_step(fused, x, states)
        logits = gen_lstm._project(dec, h)
        sampled = jnp.argmax(add_gumbel(rng_t, logits), axis=-1)
        ids = jnp.where(t < prefix_len, forced_t, sampled)
        return (dec["embed"][ids], states, t + 1), ids

    rngs = jax.random.split(rng, seq_len)
    init = (features, states, jnp.asarray(0, jnp.int32))
    _, ids_tm = jax.lax.scan(step, init, (rngs, forced_tm))
    return ids_tm


def _prefix_decode_transformer(dec: dict, features, forced_tm, prefix_len,
                               rng, seq_len: int, config: Config,
                               context=None):
    """Transformer twin of :func:`_prefix_decode_lstm` over the KV cache."""
    batch = features.shape[0]
    if context is not None and context.shape[-1] != features.shape[-1]:
        context = gen_tf.dense(dec["ctx_proj"], context)
    k_cache, v_cache = gen_tf._init_kv_cache(config, batch, features.dtype)

    def step(carry, inp):
        x_tok, k_cache, v_cache, t = carry
        rng_t, forced_t = inp
        logits, k_cache, v_cache = gen_tf.decode_step(
            dec, config, x_tok, k_cache, v_cache, t, context)
        sampled = jnp.argmax(add_gumbel(rng_t, logits), axis=-1)
        ids = jnp.where(t < prefix_len, forced_t, sampled)
        return (dec["embed"][ids], k_cache, v_cache, t + 1), ids

    rngs = jax.random.split(rng, seq_len)
    carry = (features, k_cache, v_cache, jnp.asarray(0, jnp.int32))
    _, ids_tm = jax.lax.scan(step, carry, (rngs, forced_tm))
    return ids_tm


def _prefix_decode(config: Config, gen_params, cond, forced_tm, prefix_len,
                   rng, seq_len: int):
    if config.gen_arch == "lstm":
        return _prefix_decode_lstm(gen_params["decoder"], cond["features"],
                                   forced_tm, prefix_len, rng, seq_len)
    return _prefix_decode_transformer(gen_params["decoder"],
                                      cond["features"], forced_tm,
                                      prefix_len, rng, seq_len, config,
                                      context=cond["context"])


# ------------------------------------------------------------------ rewards

def _disc_prob(config: Config, disc_params, ids_bm):
    """Per-sample probability-of-real from the discriminator: sigmoid of the
    logits, averaged over each sample's representations (SeqGAN's reward)."""
    logits = api.discriminator_apply(disc_params, ids_bm, config, None,
                                     train=False).astype(jnp.float32)
    per = api.disc_logits_per_sample(config)
    return jax.nn.sigmoid(logits).reshape(-1, per).mean(axis=-1)


def rollout_rewards(config: Config, gen_params, disc_params, cond, ids_bm,
                    rng):
    """Monte-Carlo rollout rewards → [B, T] (SeqGAN eq. 4 with stride).

    Position t's reward is the mean discriminator real-probability over
    ``rollout_num`` policy completions of the prefix ``ids[:, :p]`` for the
    smallest evaluated prefix length ``p ≥ t+1``; the tail past the last
    stride point uses the full sequence's own score.  Everything is
    ``stop_gradient`` — rewards are REINFORCE coefficients, not a gradient
    path.
    """
    b, t_len = ids_bm.shape
    k = max(1, int(config.rollout_num))
    stride = max(1, int(config.rollout_stride))
    positions = list(range(stride, t_len, stride))

    cond_ng, gen_ng, disc_ng, ids_ng = jax.lax.stop_gradient(
        (cond, gen_params, disc_params, ids_bm))

    d_full = _disc_prob(config, disc_ng, ids_ng)             # [B]
    if config.rollout_num <= 0 or not positions:
        return jnp.broadcast_to(d_full[:, None], (b, t_len))

    feats_k = jnp.repeat(cond_ng["features"], k, axis=0)
    ctx = cond_ng.get("context")
    cond_k = {"features": feats_k,
              "context": None if ctx is None else jnp.repeat(ctx, k, axis=0)}
    forced_tm = jnp.repeat(ids_ng, k, axis=0).T              # [T, B·K]

    def eval_prefix(args):
        rng_p, p = args
        roll_tm = _prefix_decode(config, gen_ng, cond_k, forced_tm, p,
                                 rng_p, t_len)
        probs = _disc_prob(config, disc_ng, roll_tm.T)       # [B·K]
        return probs.reshape(b, k).mean(axis=-1)             # [B]

    rngs = jax.random.split(rng, len(positions))
    per_pos = jax.lax.map(eval_prefix,
                          (rngs, jnp.asarray(positions, jnp.int32)))
    table = jnp.concatenate([per_pos, d_full[None]], axis=0)  # [P+1, B]
    idx = position_reward_index(t_len, stride, len(positions))
    return table[idx].T                                       # [B, T]


def position_reward_index(t_len: int, stride: int, num_positions: int):
    """Row of the reward table covering position t: the first evaluated
    prefix length ≥ t+1, the full-sequence score (row ``num_positions``)
    past the last stride point."""
    return jnp.minimum(jnp.arange(t_len) // stride, num_positions)


# ---------------------------------------------------------------- log-probs

def sequence_log_probs(config: Config, gen_params, cond, ids_bm):
    """Differentiable ``log π_t(y_t | y_<t)`` → [B, T], teacher-forced over
    the sampled ids (the decoupled-rescore structure: embedding gather +
    :func:`lstm.lstm_seq_tm` / parallel causal pass + one big projection)."""
    t_len = ids_bm.shape[1]
    if config.gen_arch == "lstm":
        dec = gen_params["decoder"]
        ids_tm = ids_bm.T
        emb_tm = dec["embed"][ids_tm[:-1]]
        xs_tm = jnp.concatenate([cond["features"][None], emb_tm], axis=0)
        hs_tm = lstm.lstm_seq_tm(dec["lstm"], xs_tm)
        logits = jnp.swapaxes(gen_lstm._project(dec, hs_tm), 0, 1)
    else:
        logits = gen_tf.teacher_forced(gen_params["decoder"],
                                       cond["features"], ids_bm, config,
                                       pretrain=True,
                                       context=cond["context"])[:, :t_len]
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    return jnp.take_along_axis(logp, ids_bm[..., None], axis=-1)[..., 0]


# ------------------------------------------------------------------- losses

def reinforce_losses(config: Config, gen_params, disc_params, batch, rng,
                     temperature, train: bool):
    """Drop-in twin of ``steps.adv_losses`` for ``--adv-objective reinforce``.

    Returns ``(g_loss, d_loss, aux)``.  ``temperature`` is accepted for
    interface parity but unused — policy-gradient sampling is exact
    categorical, no relaxation to anneal.
    """
    del temperature
    rng_sample, rng_roll, rng_d1, rng_d2, rng_base = jax.random.split(rng, 5)
    gen_params_c, disc_params, batch_c = _compute_cast(
        config, gen_params, disc_params, batch)
    cond, new_stats = api.generator_condition(config, gen_params_c, batch_c,
                                              train)
    captions = batch["captions"]
    seq_len = captions.shape[1]

    # categorical sample (ids only; the soft outputs are dead code → DCE'd)
    _, gen_ids = api.generator_sample(gen_params_c, cond, rng_sample,
                                      jnp.float32(1.0), seq_len, False,
                                      config)
    gen_ids = jax.lax.stop_gradient(gen_ids)

    # --- discriminator loss: real ids vs sampled ids (both int gathers) ---
    # independent dropout keys per pass (matches steps.adv_losses — a shared
    # key would give real and fake batches identical dropout masks)
    d_real = api.discriminator_apply(disc_params, captions, config,
                                     rng_d1, train).astype(jnp.float32)
    d_fake = api.discriminator_apply(disc_params, gen_ids, config,
                                     rng_d2, train).astype(jnp.float32)
    w = batch.get("weights")
    w_rep = (None if w is None
             else jnp.repeat(w, api.disc_logits_per_sample(config)))
    real_label = 1.0 - config.label_smoothing
    _, d_loss = gan_losses(d_real, d_fake, d_fake, config.adv_loss_type,
                           real_label=real_label, weights=w_rep)

    # --- generator loss: REINFORCE with rollout rewards ---
    rewards = rollout_rewards(config, gen_params_c, disc_params, cond,
                              gen_ids, rng_roll)              # [B, T]
    if config.rl_baseline == "greedy":
        # self-critical: the greedy decode's terminal score
        _, greedy = api.generator_sample(gen_params_c, cond, rng_base,
                                         jnp.float32(1.0), seq_len, True,
                                         config)
        baseline = _disc_prob(config, jax.lax.stop_gradient(disc_params),
                              jax.lax.stop_gradient(greedy))[:, None]
    else:  # batch_mean
        baseline = jnp.mean(rewards, axis=0, keepdims=True)
    advantage = jax.lax.stop_gradient(rewards - baseline)

    logp = sequence_log_probs(config, gen_params_c, cond, gen_ids)  # [B, T]
    per_sample = -(advantage * logp).mean(axis=-1)
    if w is not None:
        g_loss = jnp.sum(per_sample * w) / jnp.maximum(jnp.sum(w), 1.0)
    else:
        g_loss = per_sample.mean()

    aux = {"gen_ids": gen_ids, "new_stats": new_stats,
           "d_real_mean": jnp.mean(d_real), "d_fake_mean": jnp.mean(d_fake),
           "mean_reward": jnp.mean(rewards)}
    return g_loss, d_loss, aux


def _compute_cast(config: Config, *trees):
    from gan_image_captioning_tpu.train import steps

    return steps._compute_cast(config, *trees)
