"""Bidirectional-LSTM discriminator.

The report lists bidirectional LSTMs among the explored architecture
settings (NLP_Report.pdf §4.2); the committed reference exposes only
stacked unidirectional LSTMs (``--gen-num-layers``, args.py:22-25).  A
free-running *generator* cannot be bidirectional, so the natural home for
the bi-LSTM is the discriminator, which always sees whole sequences
(teacher-forced scoring): ``--disc-arch bilstm``.

Pipeline: bias-free V→E token embedding (the same fused soft/hard input
trick as the CNN discriminator, ``discriminator.py:20`` — int ids gather,
soft distributions matmul) → ``disc_num_layers``-deep forward+backward
LSTM stacks over the sequence (two ``lax.scan`` programs) → concat [B, T,
2H] → max-pool over time (the CNN discriminator's pooling,
``discriminator.py:45``) → dropout(0.2) → Linear(2H → 1).  One logit per
sequence, ``[B]`` — the same contract as the bidirectional transformer
discriminator.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from gan_image_captioning_tpu.config import Config
from gan_image_captioning_tpu.models.lstm import bilstm_forward, init_lstm_params
from gan_image_captioning_tpu.models.transformer import _dense_init, dense
from gan_image_captioning_tpu.ops.initializers import init_param_tree


def init_bilstm_discriminator_params(rng, config: Config,
                                     dtype=jnp.float32) -> dict:
    d_emb = config.disc_embed_dim      # 64 (args.py:34-37)
    hidden = config.disc_hidden_dim    # 128 (report §4.2 discriminator size)
    k_emb, k_fwd, k_bwd, k_head, k_init = jax.random.split(rng, 5)
    params = {
        # bias-free V→E embedding, same [E, V] layout as the CNN/transformer
        # discriminators (discriminator.py:20)
        "embeddings": {"w": jax.random.normal(
            k_emb, (d_emb, config.vocab_size), dtype) * 0.02},
        "fwd": init_lstm_params(k_fwd, d_emb, hidden,
                                config.disc_num_layers, dtype),
        "bwd": init_lstm_params(k_bwd, d_emb, hidden,
                                config.disc_num_layers, dtype),
        "head": _dense_init(k_head, 2 * hidden, 1, dtype),
    }
    return init_param_tree(k_init, params, config.disc_init)


def embed_tokens(params, inp):
    """[B, L] int ids (gather) or [B, L, V] soft distributions (matmul)."""
    w = params["embeddings"]["w"]  # [E, V]
    if jnp.issubdtype(inp.dtype, jnp.integer):
        return w.T[inp]
    return inp @ w.T


def apply_embedded(params: dict, emb, config: Config, rng=None,
                   train: bool = False, dropout_rate: float = 0.2):
    """Logits [N] from already-embedded input [N, L, E] (lets the fused
    adversarial step concatenate real/fake/gen after their differing
    embedding paths)."""
    feats = bilstm_forward(params["fwd"], params["bwd"], emb)  # [N, L, 2H]
    pooled = jnp.max(feats, axis=1)                            # [N, 2H]
    if train and dropout_rate > 0.0:
        keep = jax.random.bernoulli(rng, 1.0 - dropout_rate, pooled.shape)
        pooled = jnp.where(keep, pooled / (1.0 - dropout_rate), 0.0)
    return dense(params["head"], pooled)[:, 0]


def apply(params: dict, inp, config: Config, rng=None, train: bool = False,
          dropout_rate: float = 0.2):
    """Sequence-level logits ``[B]``."""
    return apply_embedded(params, embed_tokens(params, inp), config, rng,
                          train, dropout_rate)
