"""Fused jitted training steps.

The reference runs each training batch as dozens of eager kernel launches —
a 34-step Python decode loop (``generator.py:60-76``), three discriminator
passes, two backward passes and two optimizer steps (``training.py:150-169``).
Here each batch is ONE compiled XLA program:

* :func:`make_mle_step` — free-running generator sample (``lax.scan``) +
  cross-entropy + Adam, matching the reference pretrain objective
  (``training.py:71,81-88``: the reference pretrains on *free-running*
  samples, not teacher forcing — ``Decoder.forward`` is never called).
* :func:`make_adv_step` — the "single fused G-step/D-step adversarial
  update": Gumbel sample + D(real)/D(fake)/D(gen) + both gradients + both
  Adam updates in one program (reference ``training.py:144-169``).  The
  forward (sample + three discriminator passes) runs ONCE: a single
  ``jax.vjp`` over the joint ``(g_loss, d_loss)`` output is pulled back
  twice with one-hot cotangents (``(1,0)`` → generator grads, ``(0,1)`` →
  discriminator grads).  The older two-closure structure relied on XLA CSE
  to merge the two identical forwards, which holds for pure-XLA graphs but
  NOT for Pallas custom-calls (Mosaic kernels never CSE) — a real-chip
  trace showed the decode kernel and the disc-conv bank kernels each
  executing twice per step (`GIC_SINGLE_FWD=0` restores that structure
  for A/B).
* ``disc_train_freq`` (parsed-but-dead in the reference, ``args.py:155-158``)
  is honored via ``lax.cond``: the discriminator updates on every k-th
  generator step, reproducing the report's Table 2 G:D-ratio experiments.

Batches are dicts with static structure:
  ``captions``: [B, L] int32 (``<S> … <E> <PAD>*``, fixed L = max_seq_len+2)
  ``images``:   [B, 3, S, S] float32 (conditional mode only)
  ``weights``:  [B] float32 — 1 for real samples, 0 for pad rows of a padded
                final eval batch (reference loaders instead produced ragged
                final batches, ``training.py:28-32``; XLA wants one shape).
"""

from __future__ import annotations

import os
from typing import Any, Dict

import jax
import jax.numpy as jnp
import optax

from gan_image_captioning_tpu.config import Config
from gan_image_captioning_tpu.models import api
from gan_image_captioning_tpu.ops.losses import cross_entropy_loss, gan_losses
from gan_image_captioning_tpu.train.state import TrainState, make_optimizer


def _maybe_jit(fn, config: Config, donate_argnums=()):
    if config.no_jit:
        return fn
    return jax.jit(fn, donate_argnums=donate_argnums)


# ZeRO-1 (--zero1): a NamedSharding pytree matching TrainState, set by the
# instructor (parallel/sharding.py:train_state_shardings).  When set, every
# train step pins its OUTPUT state to this layout — Adam moments sharded
# over 'data', params replicated — so GSPMD's bidirectional propagation
# cannot float the params into a moment-induced sharded layout between
# steps (which would break donation and the replicated-weights decode
# paths).  None (the default) is a zero-cost no-op: the trace is unchanged.
_STATE_SHARDINGS = None


def set_state_shardings(shardings) -> None:
    global _STATE_SHARDINGS
    _STATE_SHARDINGS = shardings


def _constrain_state(state: "TrainState") -> "TrainState":
    if _STATE_SHARDINGS is None:
        return state
    return jax.lax.with_sharding_constraint(state, _STATE_SHARDINGS)


def _compute_cast(config: Config, *trees):
    """Mixed precision (``--dtype bfloat16``): master params stay float32 in
    the TrainState/Adam, compute runs in bfloat16 (halves the HBM traffic
    that dominates the sequential decode scan — each step re-reads the
    [V, H] projection and LSTM weights).  The cast is differentiable, so
    grads flow back to the float32 masters; losses are reduced in float32.
    Default float32 = exact reference numerics."""
    if config.dtype != "bfloat16":
        return trees if len(trees) > 1 else trees[0]

    def cast(x):
        if hasattr(x, "dtype") and jnp.issubdtype(x.dtype, jnp.floating):
            return x.astype(jnp.bfloat16)
        return x

    out = tuple(jax.tree_util.tree_map(cast, t) for t in trees)
    return out if len(out) > 1 else out[0]


def _bf16_grads(config: Config) -> bool:
    """GIC_BF16_GRADS=1 (bfloat16 mode only): differentiate wrt the bf16
    compute params so the scan's per-step weight-gradient accumulators stay
    bf16 — the dominant HBM traffic of the decode backward (the [V,H]
    projection/embedding dW read-modify-writes, docs/benchmarks.md roofline).
    Master weights and Adam moments remain float32."""
    import os

    return (config.dtype == "bfloat16"
            and os.environ.get("GIC_BF16_GRADS", "0") == "1")


def _grad_boundary(config: Config, loss_fn, params, has_aux=False):
    """value_and_grad with the bf16-grad boundary option: grads come back in
    the master dtype either way (cast after accumulation)."""
    if not _bf16_grads(config):
        return jax.value_and_grad(loss_fn, has_aux=has_aux)(params)
    params_c = _compute_cast(config.replace(dtype="bfloat16"), params)
    out, grads = jax.value_and_grad(loss_fn, has_aux=has_aux)(params_c)
    grads = jax.tree_util.tree_map(
        lambda g, p: g.astype(p.dtype) if hasattr(g, "dtype") else g,
        grads, params)
    return out, grads


def _sample_weights(batch) -> Any:
    return batch.get("weights")


def _split_micro(batch: Dict[str, Any], k: int) -> Dict[str, Any]:
    """Reshape every [B, ...] batch array to [k, B/k, ...] microbatches for
    ``--grad-accum`` (shapes are static, so the check fires at trace time)."""

    def r(x):
        if x.shape[0] % k != 0:
            raise ValueError(
                "--grad-accum %d does not divide batch size %d"
                % (k, x.shape[0]))
        return x.reshape((k, x.shape[0] // k) + x.shape[1:])

    return jax.tree_util.tree_map(r, batch)


def _guard_nonfinite(config: Config, grad_norm, new_tree, old_tree):
    """``--skip-nonfinite-grads``: keep ``old_tree`` when the side's grad
    global norm is non-finite (one poisoned batch must not destroy a long
    bf16 run).  Static no-op when disabled — the default trace is
    unchanged."""
    if not config.skip_nonfinite_grads:
        return new_tree
    ok = jnp.isfinite(grad_norm)
    return jax.tree_util.tree_map(
        lambda n, o: jnp.where(ok, n, o) if hasattr(n, "dtype") else n,
        new_tree, old_tree)


def _ema_update(config: Config, ema, new_params):
    """Shadow-param EMA (``--ema-decay`` > 0): ``e ← e·d + p·(1−d)``."""
    if config.ema_decay <= 0.0 or ema is None:
        return ema
    d = config.ema_decay
    return jax.tree_util.tree_map(
        lambda e, p: e * d + p.astype(e.dtype) * (1.0 - d), ema, new_params)


def noisy_label_flip(rng, d_real, d_fake, p, num_rep):
    """Swap real/fake discriminator logits i.i.d. per SAMPLE with
    probability ``p`` (the report §4.3 noisy-labels trick).

    Logits are [B * num_rep] in sample-major layout (all of a sample's
    ``num_rep`` representation logits contiguous, discriminator.py:51,60
    layout) — the per-sample draw broadcasts across a sample's replicas so
    its representations flip together."""
    batch = d_real.shape[0] // num_rep
    flip = jax.random.bernoulli(rng, p, (batch,))
    flip = jnp.repeat(flip, num_rep)
    return jnp.where(flip, d_fake, d_real), jnp.where(flip, d_real, d_fake)


def _rep_weights(batch, num_rep: int):
    """Per-sample weights replicated to the discriminator's [B*num_rep]
    logit layout (discriminator.py:51,60: sample-major then rep)."""
    w = _sample_weights(batch)
    if w is None:
        return None
    return jnp.repeat(w, num_rep)


def _augment_batch(config: Config, batch, rng, train: bool):
    """Train-time on-device image augmentation (``--random-flip`` /
    ``--random-crop-pad``, ops/augment.py).  Static no-op when disabled —
    the default trace (and its PRNG streams) is unchanged.  Cached backbone
    features (``--cache-features``) bypass augmentation by construction."""
    if not train or not config.cgan:
        return batch
    if not (config.random_flip or config.random_crop_pad):
        return batch
    key = ("images" if "images" in batch
           else "images_u8" if "images_u8" in batch else None)
    if key is None:
        return batch
    from gan_image_captioning_tpu.ops.augment import augment_images

    imgs = augment_images(batch[key], rng, flip=bool(config.random_flip),
                          crop_pad=int(config.random_crop_pad))
    return dict(batch, **{key: imgs})


def _merge_bn_stats(gen_params, new_stats):
    """Write the encoder head's updated BatchNorm running stats back into the
    (optimizer-updated) generator params — stats are state, not weights."""
    if new_stats is None:
        return gen_params
    enc = dict(gen_params["encoder"], bn_stats=new_stats)
    return dict(gen_params, encoder=enc)


# ------------------------------------------------------------------ MLE step

def mle_loss(config: Config, gen_params, batch, rng, train: bool,
             sample_prob=None):
    """The MLE objective.

    LSTM (``--mle-objective free``, default): the reference's exact pretrain
    objective (training.py:71,81-83) — free-running pretrain-mode sample for
    L steps, CE against the real captions over ALL positions (pads included
    — no ignore_index there).  ``teacher``/``scheduled`` swap the forward
    (api.generator_mle_outputs); ``sample_prob`` is the scheduled-sampling
    model-feedback probability (traced scalar, ramped by the instructor).
    Transformer: parallel teacher-forced causal scoring (report §3.2.2)."""
    rng_aug, rng_sample = jax.random.split(rng)
    gen_params_c, batch_c = _compute_cast(config, gen_params, batch)
    batch_c = _augment_batch(config, batch_c, rng_aug, train)
    cond, new_stats = api.generator_condition(config, gen_params_c, batch_c,
                                              train)
    captions = batch["captions"]
    logits = api.generator_mle_outputs(gen_params_c, cond, captions,
                                       rng_sample, config,
                                       lengths=batch.get("lengths"),
                                       sample_prob=sample_prob)
    w = _sample_weights(batch)
    mask = None if w is None else jnp.broadcast_to(w[:, None], captions.shape)
    loss = cross_entropy_loss(logits.astype(jnp.float32), captions, mask)
    return loss, (new_stats, logits)


def make_mle_step(config: Config, _raw: bool = False):
    """Jitted pretrain step: loss → grads → clip(5.0) → Adam(pretrain_lr)
    (reference ``training.py:88,194-199`` with ``args.py:123-126,190-193``).

    ``--grad-accum k`` scans k microbatches through the loss/grad body and
    applies ONE clipped Adam update on the mean grads (one traced body —
    compile time does not grow with k).

    ``_raw=True`` returns the untraced step function (no jit/donation) for
    composition inside :func:`make_multi_step`'s scan."""
    tx = make_optimizer(config.pretrain_lr, config.clip_norm, config)
    accum = max(1, int(config.grad_accum))

    def grads_of(gen_params, batch, rng_step, sample_prob):
        return jax.value_and_grad(
            lambda gp: mle_loss(config, gp, batch, rng_step, train=True,
                                sample_prob=sample_prob),
            has_aux=True)(gen_params)

    def step(state: TrainState, batch: Dict[str, Any], sample_prob=0.0):
        sample_prob = jnp.asarray(sample_prob, jnp.float32)
        rng, rng_step = jax.random.split(state.rng)
        if accum == 1:
            (loss, (new_stats, _)), grads = grads_of(state.gen_params, batch,
                                                     rng_step, sample_prob)
        else:
            micro = _split_micro(batch, accum)
            rngs = jax.random.split(rng_step, accum)

            def body(carry, inp):
                g_acc, loss_acc = carry
                mb, r = inp
                (mb_loss, (stats, _)), g = grads_of(state.gen_params, mb, r,
                                                    sample_prob)
                g_acc = jax.tree_util.tree_map(jnp.add, g_acc, g)
                return (g_acc, loss_acc + mb_loss), stats

            zeros = jax.tree_util.tree_map(jnp.zeros_like, state.gen_params)
            (g_sum, loss_sum), stats_seq = jax.lax.scan(
                body, (zeros, jnp.zeros((), jnp.float32)), (micro, rngs))
            grads = jax.tree_util.tree_map(lambda g: g / accum, g_sum)
            loss = loss_sum / accum
            new_stats = (None if stats_seq is None else
                         jax.tree_util.tree_map(lambda s: s[-1], stats_seq))
        grad_norm = optax.global_norm(grads)   # pre-clip global norm
        updates, new_opt = tx.update(grads, state.pretrain_opt_state,
                                     state.gen_params)
        gen_params = jax.tree_util.tree_map(
            lambda p, u: p + u, state.gen_params, updates)
        gen_params = _merge_bn_stats(gen_params, new_stats)
        ema = _ema_update(config, state.ema_gen_params, gen_params)
        gen_params, new_opt, ema = _guard_nonfinite(
            config, grad_norm, (gen_params, new_opt, ema),
            (state.gen_params, state.pretrain_opt_state,
             state.ema_gen_params))
        state = _constrain_state(state._replace(
            gen_params=gen_params,
            pretrain_opt_state=new_opt,
            rng=rng,
            ema_gen_params=ema,
        ))
        return state, {"gen_pretrain_loss": loss,
                       "gen_grad_norm": grad_norm}

    if _raw:
        return step
    return _maybe_jit(step, config, donate_argnums=(0,))


def make_mle_eval_step(config: Config):
    """Eval-mode MLE loss (reference ``genpretrain_loop('val')``,
    training.py:52,112-114 — no grads, eval-mode BN/dropout)."""

    def step(state: TrainState, batch: Dict[str, Any], sample_prob=0.0):
        sample_prob = jnp.asarray(sample_prob, jnp.float32)
        rng, rng_step = jax.random.split(state.rng)
        loss, _ = mle_loss(config, state.gen_params, batch, rng_step,
                           train=False, sample_prob=sample_prob)
        return state._replace(rng=rng), {"gen_pretrain_loss": loss}

    return _maybe_jit(step, config)


# ---------------------------------------------------------------- adversarial

def _fuse_embed_active(config: Config) -> bool:
    """The round-3 fused sample→disc-embed path: the decode kernel
    contracts each step's soft sample into the discriminator embedding
    ON-CORE, so the [T, B, V] soft tensor never exists in HBM in either
    direction (models/generator.py:sample_embed).  LSTM generator + CNN
    discriminator + kernel decode only."""
    if (config.gen_arch != "lstm" or config.disc_arch != "cnn"
            or config.decode_impl != "kernel"):
        return False
    from gan_image_captioning_tpu.models.generator import fuse_embed_available

    return fuse_embed_available()


def _single_forward_active(config: Config) -> bool:
    """Whether the adversarial step computes both gradients from ONE shared
    forward (``jax.vjp``, single joint pullback) instead of two closures.

    Default ON except for the paths whose *forward itself* depends on which
    side is being differentiated: the fused sample→disc-embed kernel
    (``grad_side`` selects which cotangents its manual VJP materializes) and
    REINFORCE (its own losses function).  ``GIC_SINGLE_FWD`` overrides:
    0 = two-closure A/B reference structure, 1 = single forward + single
    joint pullback (default), 2 = single forward + two pullbacks (the r3c6
    structure, kept for A/B)."""
    v = os.environ.get("GIC_SINGLE_FWD")
    if v is not None:
        return v in ("1", "2")
    return (config.adv_objective != "reinforce"
            and not _fuse_embed_active(config))


def adv_losses(config: Config, gen_params, disc_params, batch, rng,
               temperature, train: bool, grad_side: str = "gen"):
    """One adversarial forward: Gumbel sample + the reference's three
    discriminator passes (``training.py:150-165``).

    ``grad_side`` (static) names which parameter set the CALLER is about to
    differentiate — "gen", "disc", or "both".  It changes nothing about the
    values computed.  "gen"/"disc": the fused sample→disc-embed kernel path
    uses it to pick which cotangents its manual backward materializes (the
    forward programs are identical and CSE into one kernel execution).
    "both" (the single-forward step, `_single_forward_grads`): the
    gradient-irrelevant cross-terms are cut with ``stop_gradient`` — the
    gen pass runs with stopped disc params and ``g_loss`` reads a stopped
    ``d_real`` — so that ``∇(g_loss + d_loss)`` over ``(gen, disc)`` params
    equals the two per-loss gradients exactly (``∂g_loss/∂disc`` and
    ``∂d_loss/∂gen`` are both structurally zero by construction).

    Returns ``(g_loss, d_loss, aux)``.

    Semantics notes vs. the reference:
      * real captions stay int ids — the discriminator fuses the one-hot
        into an embedding gather (vs ``training.py:158``'s [B,L,V] one-hot).
      * ``fake = stop_gradient(soft)`` reproduces ``gen_captions.detach()``
        (``training.py:151``); the D loss therefore carries no generator
        gradient and the G loss flows only through the third pass.
      * for ``rsgan`` the generator loss uses ``g_out`` (the un-detached
        pass) in place of ``d_out_fake``: the reference's plumbing passes
        the detached logits into the relativistic g_loss (utils.py:48 with
        training.py:163), which makes the generator update a silent no-op —
        a catalogued latent bug; RelGAN's intended formulation is used here.
      * optional one-sided label smoothing / noisy labels implement the
        report §4.3 stabilization tricks (flag-gated, off by default).
    """
    if config.adv_objective == "reinforce":
        from gan_image_captioning_tpu.train.reinforce import reinforce_losses

        return reinforce_losses(config, gen_params, disc_params, batch, rng,
                                temperature, train)
    rng_feat, rng_sample, rng_d1, rng_d2, rng_d3, rng_flip = (
        jax.random.split(rng, 6))
    gen_params_c, disc_params_c, batch_c = _compute_cast(
        config, gen_params, disc_params, batch)
    # fold_in (not a wider split) so the default no-augmentation trace keeps
    # its PRNG streams — golden/parity trajectories are unchanged
    batch_c = _augment_batch(config, batch_c,
                             jax.random.fold_in(rng_feat, 7), train)
    # keep the Gumbel temperature in the compute dtype — a float32 scalar
    # would silently promote the whole soft sample out of bfloat16
    temperature = jnp.asarray(
        temperature, jnp.bfloat16 if config.dtype == "bfloat16"
        else jnp.float32)
    cond, new_stats = api.generator_condition(config, gen_params_c, batch_c,
                                              train)
    captions = batch["captions"]
    seq_len = captions.shape[1]

    if _fuse_embed_active(config):
        from gan_image_captioning_tpu.models import discriminator as disc_cnn
        from gan_image_captioning_tpu.models.generator import sample_embed

        # Fused path: the decode kernel emits the generator output ALREADY
        # contracted into the disc embedding ([B, T, Ed]); the detach
        # semantics of training.py:151 are reproduced at the embedding
        # level — in the g-grad closure the fake pass input is
        # stop_gradient'ed (gen grads flow only through g_out), in the
        # d-grad closure gradients flow to the disc embedding through the
        # fused kernel's dWd (the generator side is constant there).
        wd = disc_params_c["embeddings"]["w"]             # [Ed, V]
        emb, gen_ids = sample_embed(
            gen_params_c["decoder"], cond["features"], rng_sample,
            temperature, seq_len, wd, wrt=grad_side)
        if grad_side == "gen":
            emb_gen, emb_fake = emb, jax.lax.stop_gradient(emb)
        else:
            emb_gen = emb_fake = emb
        d_real = api.discriminator_apply(disc_params_c, captions, config,
                                         rng_d1, train).astype(jnp.float32)
        d_fake = disc_cnn.apply_embedded(disc_params_c, emb_fake, config,
                                         rng_d2, train).astype(jnp.float32)
        g_out = disc_cnn.apply_embedded(disc_params_c, emb_gen, config,
                                        rng_d3, train).astype(jnp.float32)
    else:
        soft, gen_ids = api.generator_sample(gen_params_c, cond, rng_sample,
                                             temperature, seq_len, False,
                                             config)
        fake = jax.lax.stop_gradient(soft)

        # Three separate discriminator passes (training.py:162-164).  A
        # manually concatenated [real; fake; gen] single-trunk variant
        # exists (api.discriminator_apply_three) but measured ~40% SLOWER
        # on v5e than letting XLA schedule the three passes — the big
        # [3B, L, V] @ [V, E] embedding matmul and conv pads lay out worse
        # than three smaller ones.
        #
        # grad_side="both": the gen pass runs with STOPPED disc params, so
        # one ∇(g_loss + d_loss) pull yields both exact gradient sets —
        # g_loss reaches the generator only through `soft` here, and the
        # stopped d_real below keeps rsgan's g_loss out of the disc grads.
        disc_params_g = (jax.tree_util.tree_map(jax.lax.stop_gradient,
                                                disc_params_c)
                         if grad_side == "both" else disc_params_c)
        d_real = api.discriminator_apply(disc_params_c, captions, config,
                                         rng_d1, train).astype(jnp.float32)
        d_fake = api.discriminator_apply(disc_params_c, fake, config, rng_d2,
                                         train).astype(jnp.float32)
        g_out = api.discriminator_apply(disc_params_g, soft, config, rng_d3,
                                        train).astype(jnp.float32)

    if config.noisy_labels > 0.0 and train:
        d_real_in, d_fake_in = noisy_label_flip(
            rng_flip, d_real, d_fake, config.noisy_labels,
            api.disc_logits_per_sample(config))
    else:
        d_real_in, d_fake_in = d_real, d_fake

    w = _rep_weights(batch, api.disc_logits_per_sample(config))
    real_label = 1.0 - config.label_smoothing
    _, d_loss = gan_losses(d_real_in, d_fake_in, g_out, config.adv_loss_type,
                           real_label=real_label, weights=w)
    d_real_g = (jax.lax.stop_gradient(d_real) if grad_side == "both"
                else d_real)
    g_loss, _ = gan_losses(d_real_g, g_out, g_out, config.adv_loss_type,
                           real_label=real_label, weights=w)
    aux = {"gen_ids": gen_ids, "new_stats": new_stats,
           "d_real_mean": jnp.mean(d_real), "d_fake_mean": jnp.mean(d_fake)}
    return g_loss, d_loss, aux


def make_adv_step(config: Config, _raw: bool = False):
    """The single fused adversarial update.

    One compiled program per batch: G-sample + 3 D passes + d-grads + g-grads
    + conditional D Adam update + G Adam update (reference eager equivalent:
    ``training.py:144-169`` + ``optimize`` at ``:194-199``).

    ``disc_train_freq = k`` updates D only when ``gen_steps % k == 0``
    (report Table 2's G:D ratio; reference flag args.py:155-158).
    """
    gen_tx = make_optimizer(config.gen_lr, config.clip_norm, config)
    disc_tx = make_optimizer(config.disc_lr, config.clip_norm, config)
    # GIC_FUSED_ADAM=1: clip→Adam→apply as one fused elementwise pass per
    # leaf (no intermediate update trees in HBM) — same state pytree, same
    # numerics (tests/test_fused_adam.py); constant-lr only (None = optax)
    from gan_image_captioning_tpu.train.state import (fused_adam_active,
                                                      make_fused_update)
    fused_g = fused_d = None
    if fused_adam_active():
        fused_g = make_fused_update(config.gen_lr, config.clip_norm, config)
        fused_d = make_fused_update(config.disc_lr, config.clip_norm, config)
    disc_every = max(1, int(config.disc_train_freq))
    accum = max(1, int(config.grad_accum))

    def both_grads(state, batch, rng_step, temperature):
        """g-grads, d-grads and scalar aux for ONE (micro)batch."""
        if _single_forward_active(config):
            return _single_forward_grads(state, batch, rng_step, temperature)

        # Two-closure structure (GIC_SINGLE_FWD=0, and the fuse-embed /
        # REINFORCE paths whose forward depends on grad_side).

        # Generator gradient: g_loss as a function of gen params only.
        def g_loss_fn(gp):
            g_loss, _, aux = adv_losses(config, gp, state.disc_params, batch,
                                        rng_step, temperature, train=True,
                                        grad_side="gen")
            return g_loss, aux

        # Discriminator gradient: d_loss as a function of disc params only
        # (the sample inside is constant wrt dp → XLA CSEs it with the
        # g-grad's identical forward, same rng — for pure-XLA graphs; the
        # Pallas custom-call paths duplicate, hence _single_forward_grads).
        def d_loss_fn(dp):
            _, d_loss, _ = adv_losses(config, state.gen_params, dp, batch,
                                      rng_step, temperature, train=True,
                                      grad_side="disc")
            return d_loss

        (g_loss, aux), g_grads = _grad_boundary(
            config, g_loss_fn, state.gen_params, has_aux=True)
        d_loss, d_grads = _grad_boundary(config, d_loss_fn, state.disc_params)
        return g_loss, d_loss, g_grads, d_grads, aux

    def _single_forward_grads(state, batch, rng_step, temperature):
        """Both gradients from ONE forward AND one backward: ``jax.vjp``
        over the joint ``(g_loss, d_loss)`` output, pulled back once with
        cotangent ``(1, 1)``.  Values and gradients are mathematically
        identical to the two-closure structure (same functions, same PRNG
        streams); the difference is purely structural — the sample, the
        three discriminator passes AND their backward custom-calls exist
        once in the program (XLA never CSEs Mosaic custom-calls, so any
        duplicated pullback re-executes every Pallas kernel).

        Exactness of the joint pullback: ``adv_losses(grad_side="both")``
        cuts both cross-terms structurally — ``fake = stop_gradient(soft)``
        makes ``∂d_loss/∂gen ≡ 0`` (training.py:151 semantics) and the gen
        pass runs with stopped disc params (plus a stopped ``d_real`` in
        ``g_loss``) so ``∂g_loss/∂disc ≡ 0``.  Hence
        ``∇(g_loss + d_loss) = (∇_gen g_loss, ∇_disc d_loss)`` exactly
        (tests/test_single_forward.py pins bit-parity vs two-closure).

        ``GIC_SINGLE_FWD=2`` keeps the r3c6 two-pullback variant (one
        forward, duplicated backward) for A/B."""
        bf16_g = _bf16_grads(config)
        gp, dp = state.gen_params, state.disc_params
        if bf16_g:
            cfg_b = config.replace(dtype="bfloat16")
            gp_in, dp_in = _compute_cast(cfg_b, gp, dp)
        else:
            gp_in, dp_in = gp, dp
        two_pull = os.environ.get("GIC_SINGLE_FWD") == "2"
        side = "gen" if two_pull else "both"

        def joint(gp_, dp_):
            g_loss, d_loss, aux = adv_losses(config, gp_, dp_, batch,
                                             rng_step, temperature,
                                             train=True, grad_side=side)
            return (g_loss, d_loss), aux

        ((g_loss, d_loss), vjp_fn, aux) = jax.vjp(joint, gp_in, dp_in,
                                                  has_aux=True)
        one = jnp.ones_like(g_loss)
        if two_pull:
            zero = jnp.zeros_like(g_loss)
            g_grads, _ = vjp_fn((one, zero))
            _, d_grads = vjp_fn((zero, one))
        else:
            g_grads, d_grads = vjp_fn((one, one))
        if bf16_g:
            g_grads = jax.tree_util.tree_map(
                lambda g, p: g.astype(p.dtype) if hasattr(g, "dtype") else g,
                g_grads, gp)
            d_grads = jax.tree_util.tree_map(
                lambda g, p: g.astype(p.dtype) if hasattr(g, "dtype") else g,
                d_grads, dp)
        return g_loss, d_loss, g_grads, d_grads, aux

    def step(state: TrainState, batch: Dict[str, Any], temperature):
        rng, rng_step = jax.random.split(state.rng)

        if accum == 1:
            g_loss, d_loss, g_grads, d_grads, aux = both_grads(
                state, batch, rng_step, temperature)
        else:
            micro = _split_micro(batch, accum)
            rngs = jax.random.split(rng_step, accum)

            def body(carry, inp):
                gg_acc, dg_acc, scal_acc = carry
                mb, r = inp
                gl, dl, gg, dg, aux = both_grads(state, mb, r, temperature)
                gg_acc = jax.tree_util.tree_map(jnp.add, gg_acc, gg)
                dg_acc = jax.tree_util.tree_map(jnp.add, dg_acc, dg)
                scal = jnp.stack([gl, dl, aux["d_real_mean"],
                                  aux["d_fake_mean"]])
                return (gg_acc, dg_acc, scal_acc + scal), aux["new_stats"]

            zeros_g = jax.tree_util.tree_map(jnp.zeros_like, state.gen_params)
            zeros_d = jax.tree_util.tree_map(jnp.zeros_like,
                                             state.disc_params)
            (gg_sum, dg_sum, scal_sum), stats_seq = jax.lax.scan(
                body, (zeros_g, zeros_d, jnp.zeros((4,), jnp.float32)),
                (micro, rngs))
            g_grads = jax.tree_util.tree_map(lambda g: g / accum, gg_sum)
            d_grads = jax.tree_util.tree_map(lambda g: g / accum, dg_sum)
            scal = scal_sum / accum
            g_loss, d_loss = scal[0], scal[1]
            aux = {"new_stats": (None if stats_seq is None else
                                 jax.tree_util.tree_map(lambda s: s[-1],
                                                        stats_seq)),
                   "d_real_mean": scal[2], "d_fake_mean": scal[3]}

        # pre-clip global grad norms: the observability signal for GAN
        # instability (the report's §4.3 discussion) — spikes precede the
        # mode-collapse the BLEU/self-BLEU probes detect after the fact
        g_grad_norm = optax.global_norm(g_grads)
        d_grad_norm = optax.global_norm(d_grads)

        # --- D update, conditionally (disc_train_freq) ---
        def update_disc(operand):
            dp, opt, steps = operand
            if fused_d is not None:
                new_dp, new_opt = fused_d(d_grads, opt, dp)
            else:
                updates, new_opt = disc_tx.update(d_grads, opt, dp)
                new_dp = jax.tree_util.tree_map(lambda p, u: p + u, dp,
                                                updates)
            return new_dp, new_opt, steps + 1

        do_d = (state.gen_steps % disc_every) == 0
        disc_params, disc_opt_state, disc_steps = jax.lax.cond(
            do_d, update_disc, lambda op: op,
            (state.disc_params, state.disc_opt_state, state.disc_steps))
        disc_params, disc_opt_state = _guard_nonfinite(
            config, d_grad_norm, (disc_params, disc_opt_state),
            (state.disc_params, state.disc_opt_state))

        # --- G update, every step (training.py:169) ---
        if fused_g is not None:
            gen_params, gen_opt_state = fused_g(
                g_grads, state.gen_opt_state, state.gen_params)
        else:
            g_updates, gen_opt_state = gen_tx.update(
                g_grads, state.gen_opt_state, state.gen_params)
            gen_params = jax.tree_util.tree_map(
                lambda p, u: p + u, state.gen_params, g_updates)
        gen_params = _merge_bn_stats(gen_params, aux["new_stats"])
        ema = _ema_update(config, state.ema_gen_params, gen_params)
        gen_params, gen_opt_state, ema = _guard_nonfinite(
            config, g_grad_norm, (gen_params, gen_opt_state, ema),
            (state.gen_params, state.gen_opt_state, state.ema_gen_params))

        state = _constrain_state(state._replace(
            gen_params=gen_params,
            disc_params=disc_params,
            gen_opt_state=gen_opt_state,
            disc_opt_state=disc_opt_state,
            gen_steps=state.gen_steps + 1,
            disc_steps=disc_steps,
            temperature=jnp.asarray(temperature, jnp.float32),
            rng=rng,
            ema_gen_params=ema,
        ))
        metrics = {"gen_adv_loss": g_loss, "disc_adv_loss": d_loss,
                   "d_real_mean": aux["d_real_mean"],
                   "d_fake_mean": aux["d_fake_mean"],
                   "gen_grad_norm": g_grad_norm,
                   "disc_grad_norm": d_grad_norm}
        return state, metrics

    if _raw:
        return step
    return _maybe_jit(step, config, donate_argnums=(0,))


def make_multi_step(config: Config, kind: str):
    """``--steps-per-call K``: K consecutive train steps fused into ONE
    compiled device program via ``lax.scan`` over stacked batches.

    The reference dispatches one eager graph per batch (``training.py:53,136``);
    even this framework's per-batch jitted steps pay one host→device dispatch
    round-trip each, which caps in-run throughput on remote/tunneled chips
    (~15 steps/s measured over the axon tunnel vs ~104 for back-to-back
    device-resident stepping — docs/benchmarks.md).  Scanning K steps per
    call amortizes that RTT by K while keeping the math identical: the scan
    body IS the single-step function, so each inner step consumes exactly the
    same batch, per-step scalar (scheduled-sampling prob / Gumbel
    temperature) and PRNG stream as K separate calls would.

    ``kind``: ``"mle"`` (scalars = sample_prob per step) or ``"adv"``
    (scalars = temperature per step).  Call as
    ``multi(state, stacked_batch, scalars)`` where every array in
    ``stacked_batch`` is ``[K, ...]`` (leading step axis) and ``scalars`` is
    ``[K]``; returns ``(state, metrics)`` with each metric ``[K]``-stacked.
    """
    if kind == "mle":
        step = make_mle_step(config, _raw=True)
    elif kind == "adv":
        step = make_adv_step(config, _raw=True)
    else:
        raise ValueError(f"unknown multi-step kind: {kind!r}")

    def multi(state: TrainState, batches: Dict[str, Any], scalars):
        def body(st, xs):
            b, s = xs
            return step(st, b, s)

        return jax.lax.scan(body, state, (batches, scalars))

    return _maybe_jit(multi, config, donate_argnums=(0,))


def make_adv_eval_step(config: Config):
    """Eval-mode adversarial losses (reference ``adv_loop('val')``,
    training.py:219-221: eval-mode models, no updates)."""

    def step(state: TrainState, batch: Dict[str, Any], temperature):
        rng, rng_step = jax.random.split(state.rng)
        g_loss, d_loss, aux = adv_losses(
            config, state.gen_params, state.disc_params, batch, rng_step,
            temperature, train=False)
        metrics = {"gen_adv_loss": g_loss, "disc_adv_loss": d_loss,
                   "d_real_mean": aux["d_real_mean"],
                   "d_fake_mean": aux["d_fake_mean"]}
        return state._replace(rng=rng), metrics

    return _maybe_jit(step, config)
