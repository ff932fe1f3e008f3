"""Transformer discriminators.

Two variants from the report, absent from the committed reference code:

* :func:`apply` — bidirectional transformer discriminator
  (NLP_Report.pdf §4.2, Table 5: 64 emb, 128 hid, 8 heads, 4 layers):
  token-distribution embedding (V→64, the same fused soft/hard input trick
  as the CNN discriminator) → project to d_model=128 → self-attention blocks
  → masked mean-pool → MLP → ONE logit per sequence ``[B]``.

* :func:`apply_autoregressive` — the "PatchGAN-for-text" discriminator
  (NLP_Report.pdf §3.2.4, Table 5 row "Transformer-ATransformer"): a CAUSAL
  transformer emitting one logit per prefix — position t scores the
  subsequence x[..t] — output ``[B * L]`` logits.  Local per-prefix scores
  give the generator dense feedback the single-score discriminator cannot.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from gan_image_captioning_tpu.config import Config
from gan_image_captioning_tpu.models.transformer import (
    _dense_init, _ln_init, block_apply, causal_mask, dense, init_block,
    layer_norm, remat_block_apply)
from gan_image_captioning_tpu.ops.initializers import init_param_tree


def init_transformer_discriminator_params(rng, config: Config,
                                          dtype=jnp.float32) -> dict:
    """Shared param tree for both variants (the AR variant simply applies a
    causal mask and a per-position head)."""
    d_emb = config.disc_embed_dim       # 64 (args.py:34-37 / report §4.2)
    d_model = config.disc_hidden_dim    # 128 (report §4.2)
    ks = jax.random.split(rng, config.disc_num_layers + 5)
    params = {
        # bias-free V→E embedding, same layout as the CNN disc
        # (discriminator.py:20): [E, V]
        "embeddings": {"w": jax.random.normal(
            ks[0], (d_emb, config.vocab_size), dtype) * 0.02},
        "in_proj": _dense_init(ks[1], d_emb, d_model, dtype),
        "pos": jax.random.normal(ks[2], (config.seq_len, d_model), dtype) * 0.02,
        "blocks": [init_block(ks[3 + i], d_model, 2 * d_model, dtype)
                   for i in range(config.disc_num_layers)],
        "ln_f": _ln_init(d_model, dtype),
        "head": _dense_init(ks[-1], d_model, 1, dtype),
    }
    return init_param_tree(ks[-2], params, config.disc_init)


def _embed(params, inp):
    w = params["embeddings"]["w"]  # [E, V]
    if jnp.issubdtype(inp.dtype, jnp.integer):
        return w.T[inp]
    return inp @ w.T


def _trunk(params, inp, config: Config, causal: bool, lengths=None):
    return _trunk_embedded(params, _embed(params, inp), config, causal,
                           lengths)


def _trunk_embedded(params, emb, config: Config, causal: bool, lengths=None):
    """Trunk from already-embedded input [N, L, E] (lets the fused
    adversarial step concatenate real/fake/gen after their differing
    embedding paths)."""
    x = dense(params["in_proj"], emb)
    t = x.shape[1]
    x = x + params["pos"][:t]
    mask = causal_mask(t) if causal else jnp.ones((1, 1, t, t), bool)
    # exactly-causal / full masks are eligible for the explicit CP kernels
    # and pipelining (transformer.set_context_parallel / set_pipeline)
    cp_causal = causal if lengths is None else None
    if lengths is not None:
        key_ok = jnp.arange(t)[None, :] < lengths[:, None]
        mask = mask & key_ok[:, None, None, :]
    from gan_image_captioning_tpu.models.transformer import (pipeline_blocks,
                                                             pp_applicable)

    if cp_causal is not None and pp_applicable(params["blocks"], x):
        x = pipeline_blocks(params["blocks"], x, config.disc_num_heads,
                            causal=causal)
    else:
        for blk in params["blocks"]:
            x = remat_block_apply(blk, x, config.disc_num_heads, mask,
                                  cp_causal=cp_causal, flash_causal=causal,
                                  flash_lengths=lengths)
    return layer_norm(params["ln_f"], x)


def apply(params: dict, inp, config: Config, rng=None, train: bool = False,
          dropout_rate: float = 0.2, lengths=None):
    """Sequence-level logits ``[B]`` (bidirectional variant)."""
    x = _trunk(params, inp, config, causal=False, lengths=lengths)
    if lengths is not None:
        t = x.shape[1]
        m = (jnp.arange(t)[None, :] < lengths[:, None]).astype(x.dtype)
        pooled = jnp.sum(x * m[..., None], 1) / jnp.maximum(
            jnp.sum(m, 1, keepdims=True), 1.0)
    else:
        pooled = jnp.mean(x, axis=1)
    if train and dropout_rate > 0.0:
        keep = jax.random.bernoulli(rng, 1.0 - dropout_rate, pooled.shape)
        pooled = jnp.where(keep, pooled / (1.0 - dropout_rate), 0.0)
    return dense(params["head"], pooled)[:, 0]


def apply_autoregressive(params: dict, inp, config: Config, rng=None,
                         train: bool = False, dropout_rate: float = 0.2,
                         lengths=None):
    """Per-prefix logits ``[B * L]`` (causal "PatchGAN-for-text" variant)."""
    x = _trunk(params, inp, config, causal=True, lengths=lengths)
    if train and dropout_rate > 0.0:
        keep = jax.random.bernoulli(rng, 1.0 - dropout_rate, x.shape)
        x = jnp.where(keep, x / (1.0 - dropout_rate), 0.0)
    logits = dense(params["head"], x)[..., 0]  # [B, L]
    return logits.reshape(-1)
