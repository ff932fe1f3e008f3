"""Architecture dispatch: one API over the lstm/transformer generators and
the cnn/transformer/ar_transformer discriminators.

The train steps and instructor program against these five functions; the
``--gen-arch`` / ``--disc-arch`` flags (report §4.2's model grid, Table 5)
pick the implementation.  Every branch is static (config-driven), so each
(gen_arch, disc_arch) pair compiles to its own fused XLA program.
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from gan_image_captioning_tpu.config import Config
from gan_image_captioning_tpu.models import discriminator as disc_cnn
from gan_image_captioning_tpu.models import discriminator_bilstm as disc_bilstm
from gan_image_captioning_tpu.models import discriminator_transformer as disc_tf
from gan_image_captioning_tpu.models import generator as gen_lstm
from gan_image_captioning_tpu.models import transformer as gen_tf


# ------------------------------------------------------------------ generator

def init_generator(rng, config: Config, dtype=jnp.float32,
                   with_encoder: Optional[bool] = None):
    if config.gen_arch == "lstm":
        return gen_lstm.init_generator_params(rng, config, dtype, with_encoder)
    return gen_tf.init_transformer_generator_params(rng, config, dtype,
                                                    with_encoder)


def generator_condition(config: Config, gen_params, batch: Dict[str, Any],
                        train: bool) -> Tuple[Dict[str, Any], Any]:
    """Build the conditioning bundle for one batch.

    Returns ``(cond, new_bn_stats)`` where ``cond`` = {'features': [B, E],
    'context': [B, HW, C] | None}.  Conditional transformer generators get
    the cross-attention grid (report §4.2) from the SAME backbone pass that
    produces the pooled feature token; LSTM generators use features only
    (reference ``training.py:65-68``)."""
    captions = batch["captions"]
    if config.cgan:
        from gan_image_captioning_tpu.models import encoder as encoder_lib

        if "backbone_feats" in batch:
            # frozen backbone: pooled features precomputed once per image
            # (SURVEY §7.4); only the trainable head runs per step.
            feats, new_stats = encoder_lib.project_head(
                gen_params["encoder"], batch["backbone_feats"], config, train)
            return {"features": feats, "context": None}, new_stats
        if "images_u8" in batch:
            # device-side normalization of uint8 host batches (4× less
            # host→device transfer; kernels/image_norm.py)
            from gan_image_captioning_tpu.kernels.image_norm import (
                normalize_images)

            dtype = (jnp.bfloat16 if config.dtype == "bfloat16"
                     else jnp.float32)
            images = normalize_images(batch["images_u8"], dtype)
        else:
            images = batch["images"]
        if config.gen_arch != "lstm":
            feats, grid, new_stats = encoder_lib.encode_with_grid(
                gen_params["encoder"], images, config, train)
            return {"features": feats, "context": grid}, new_stats
        feats, new_stats = encoder_lib.encode(
            gen_params["encoder"], images, config, train)
        return {"features": feats, "context": None}, new_stats
    batch_size = captions.shape[0]
    return ({"features": gen_lstm.start_token_features(
        gen_params["decoder"] if config.gen_arch == "lstm"
        else {"embed": gen_params["decoder"]["embed"]}, batch_size),
        "context": None}, None)


def generator_sample(gen_params, cond: Dict[str, Any], rng, temperature,
                     seq_len: int, pretrain: bool, config: Config):
    """Free-running decode → ``(outputs [B, T, V], ids [B, T])``."""
    if config.gen_arch == "lstm":
        return gen_lstm.sample(gen_params["decoder"], cond["features"], rng,
                               temperature, seq_len, pretrain,
                               impl=config.decode_impl)
    return gen_tf.sample(gen_params["decoder"], cond["features"], rng,
                         temperature, seq_len, pretrain, config,
                         context=cond["context"])


def generator_mle_outputs(gen_params, cond: Dict[str, Any], captions, rng,
                          config: Config, lengths=None, sample_prob=None):
    """MLE-phase logits ``[B, T, V]`` (targets = ``captions``).

    LSTM — dispatched on ``--mle-objective``:
      * ``free`` (default): free-running pretrain-mode sample — the
        reference's actual objective (``training.py:71``;
        ``Decoder.forward`` is never called).
      * ``teacher``: teacher-forced pass — the reference's
        ``Decoder.forward`` semantics (``generator.py:39-53``; BASELINE
        config 1's "MLE teacher-forcing pretrain").
      * ``scheduled``: scheduled sampling (Bengio et al. 2015) — ground
        truth vs. own argmax per step with probability ``sample_prob``.
    Transformer: parallel teacher-forced causal pass with padding attention
    masks over the key positions beyond each caption's length — the report's
    MLE mode (§3.2.2 "parallel decode in MLE", "padding attention masks"),
    regardless of ``--mle-objective``."""
    seq_len = captions.shape[1]
    if config.gen_arch == "lstm":
        dec = gen_params["decoder"]
        if config.mle_objective == "teacher":
            logits, _ = gen_lstm.teacher_forced(dec, cond["features"],
                                                captions, pretrain=True)
            return logits[:, :seq_len]
        if config.mle_objective == "scheduled":
            p = jnp.float32(0.0) if sample_prob is None else sample_prob
            return gen_lstm.scheduled_sample(dec, cond["features"], captions,
                                             rng, p)
        logits, _ = gen_lstm.sample(dec, cond["features"],
                                    rng, jnp.float32(1.0), seq_len,
                                    pretrain=True, impl=config.decode_impl)
        return logits
    logits = gen_tf.teacher_forced(gen_params["decoder"], cond["features"],
                                   captions, config, pretrain=True,
                                   context=cond["context"], lengths=lengths)
    return logits[:, :seq_len]


# -------------------------------------------------------------- discriminator

def init_discriminator(rng, config: Config, dtype=jnp.float32):
    if config.disc_arch == "cnn":
        return disc_cnn.init_discriminator_params(rng, config, dtype)
    if config.disc_arch == "bilstm":
        return disc_bilstm.init_bilstm_discriminator_params(rng, config, dtype)
    return disc_tf.init_transformer_discriminator_params(rng, config, dtype)


def discriminator_apply(params, inp, config: Config, rng=None,
                        train: bool = False):
    """Logits for soft [B, L, V] or int [B, L] inputs.  Output shape depends
    on the arch: cnn → [B·num_rep], transformer → [B], ar_transformer →
    [B·L] (all flat 1-D, as the loss zoo expects)."""
    if config.disc_arch == "cnn":
        return disc_cnn.apply(params, inp, config, rng, train)
    if config.disc_arch == "bilstm":
        return disc_bilstm.apply(params, inp, config, rng, train)
    if config.disc_arch == "ar_transformer":
        return disc_tf.apply_autoregressive(params, inp, config, rng, train)
    return disc_tf.apply(params, inp, config, rng, train)


def discriminator_apply_three(params, real_ids, fake, soft, config: Config,
                              rng=None, train: bool = False):
    """The adversarial step's three discriminator passes
    (``training.py:162-164``) as ONE trunk execution over the concatenated
    ``[real; fake; gen]`` batch — one conv/attention stack + one backward
    instead of three.  Returns ``(d_real, d_fake, g_out)`` flat logits.

    Only the embeddings differ per pass (gather for int real ids, matmul for
    the soft tensors); the trunk is linear in batch so concatenation is
    exact.  Dropout draws one mask over the 3B rows (still i.i.d. per row —
    the reference drew three independent masks, equally valid)."""
    b = real_ids.shape[0]
    if config.disc_arch == "cnn":
        emb = jnp.concatenate([
            disc_cnn.embed_tokens(params, real_ids),
            disc_cnn.embed_tokens(params, fake),
            disc_cnn.embed_tokens(params, soft),
        ], axis=0)
        logits = disc_cnn.apply_embedded(params, emb, config, rng, train)
        per = config.disc_num_rep
    elif config.disc_arch == "bilstm":
        emb = jnp.concatenate([
            disc_bilstm.embed_tokens(params, real_ids),
            disc_bilstm.embed_tokens(params, fake),
            disc_bilstm.embed_tokens(params, soft),
        ], axis=0)
        logits = disc_bilstm.apply_embedded(params, emb, config, rng, train)
        per = 1
    else:
        emb = jnp.concatenate([
            disc_tf._embed(params, real_ids),
            disc_tf._embed(params, fake),
            disc_tf._embed(params, soft),
        ], axis=0)
        causal = config.disc_arch == "ar_transformer"
        x = disc_tf._trunk_embedded(params, emb, config, causal)
        if causal:
            if train:
                keep = jax.random.bernoulli(rng, 0.8, x.shape)
                x = jnp.where(keep, x / 0.8, 0.0)
            logits = disc_tf.dense(params["head"], x)[..., 0].reshape(-1)
            per = config.seq_len
        else:
            pooled = jnp.mean(x, axis=1)
            if train:
                keep = jax.random.bernoulli(rng, 0.8, pooled.shape)
                pooled = jnp.where(keep, pooled / 0.8, 0.0)
            logits = disc_tf.dense(params["head"], pooled)[:, 0]
            per = 1
    n = b * per
    return logits[:n], logits[n: 2 * n], logits[2 * n:]


def disc_logits_per_sample(config: Config) -> int:
    """How many logits each sample contributes (for per-sample weighting)."""
    if config.disc_arch == "cnn":
        return config.disc_num_rep
    if config.disc_arch == "ar_transformer":
        return config.seq_len
    return 1  # transformer and bilstm: one sequence-level logit
