"""Transformer building blocks + caption generator.

The report (NLP_Report.pdf §3.2.2, §4.2) describes transformer variants that
were never committed to the reference repo: a transformer generator
(256 emb, 256 hid, 4 layers, 8 heads; parallel teacher-forced decode in MLE,
autoregressive decode in adversarial training; padding attention masks;
optional cross-attention over the conv feature grid) and transformer
discriminators (see :mod:`discriminator_transformer`).  This module is their
TPU-native implementation:

* pre-LN blocks, learned positional embeddings, GELU MLPs;
* MLE scoring is one parallel causal pass (MXU-friendly — the whole [B,T]
  grid in one matmul chain);
* adversarial/free-running decode is a ``lax.scan`` carrying a static-shape
  KV cache ``[n_layers, B, T, n_heads, head_dim]`` — the transformer
  equivalent of the LSTM decode's carried (h, c);
* conditioning: the image feature vector is prepended as the t=0 token
  (mirroring the LSTM wiring, reference ``generator.py:42``), plus optional
  cross-attention over the HW×C grid when provided.

Param layouts use [in, out] matrices (x @ w + b).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from gan_image_captioning_tpu.config import Config
from gan_image_captioning_tpu.ops.gumbel import gumbel_softmax
from gan_image_captioning_tpu.ops.initializers import init_param_tree


# --------------------------------------------------------------------- layers

def _dense_init(rng, d_in, d_out, dtype):
    return {"w": jax.random.normal(rng, (d_in, d_out), dtype)
            / jnp.sqrt(d_in * 1.0),
            "b": jnp.zeros((d_out,), dtype)}


def dense(p, x):
    return x @ p["w"] + p["b"]


def layer_norm(p, x, eps: float = 1e-5):
    mu = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.var(x, axis=-1, keepdims=True)
    return (x - mu) * jax.lax.rsqrt(var + eps) * p["scale"] + p["bias"]


def _ln_init(d, dtype):
    return {"scale": jnp.ones((d,), dtype), "bias": jnp.zeros((d,), dtype)}


def init_attention(rng, d_model, dtype):
    ks = jax.random.split(rng, 4)
    return {"wq": _dense_init(ks[0], d_model, d_model, dtype),
            "wk": _dense_init(ks[1], d_model, d_model, dtype),
            "wv": _dense_init(ks[2], d_model, d_model, dtype),
            "wo": _dense_init(ks[3], d_model, d_model, dtype)}


def _split_heads(x, n_heads):
    b, t, d = x.shape
    return x.reshape(b, t, n_heads, d // n_heads)


def attention(p, x_q, x_kv, n_heads: int, mask=None):
    """Multi-head attention.  ``mask``: broadcastable to
    [B, heads, Tq, Tkv], True = attend."""
    q = _split_heads(dense(p["wq"], x_q), n_heads)
    k = _split_heads(dense(p["wk"], x_kv), n_heads)
    v = _split_heads(dense(p["wv"], x_kv), n_heads)
    scores = jnp.einsum("bqhd,bkhd->bhqk", q, k) / jnp.sqrt(q.shape[-1] * 1.0)
    if mask is not None:
        scores = jnp.where(mask, scores, jnp.finfo(scores.dtype).min)
    probs = jax.nn.softmax(scores, axis=-1)
    out = jnp.einsum("bhqk,bkhd->bqhd", probs, v)
    b, t = x_q.shape[:2]
    return dense(p["wo"], out.reshape(b, t, -1))


def init_block(rng, d_model, d_mlp, dtype, cross: bool = False):
    ks = jax.random.split(rng, 5)
    p = {"ln1": _ln_init(d_model, dtype),
         "attn": init_attention(ks[0], d_model, dtype),
         "ln2": _ln_init(d_model, dtype),
         "mlp": {"fc1": _dense_init(ks[1], d_model, d_mlp, dtype),
                 "fc2": _dense_init(ks[2], d_mlp, d_model, dtype)}}
    if cross:
        p["ln_cross"] = _ln_init(d_model, dtype)
        p["cross"] = init_attention(ks[3], d_model, dtype)
    return p


def block_apply(p, x, n_heads, mask=None, context=None, context_mask=None,
                cp_causal=None, flash_causal=None, flash_lengths=None):
    """Pre-LN block: self-attn → (cross-attn) → MLP, residual each.

    ``cp_causal``: when the self-attention mask is exactly causal (True) or
    absent (False) — and an explicit context-parallel mode is active
    (:func:`set_context_parallel`) — the self-attention runs as the
    shard_map ring/Ulysses kernel over the ``sp`` mesh axis instead of the
    dense path; cross-attention (image-grid K/V, not sequence-sharded)
    stays dense.  ``None`` = arbitrary mask, dense only.

    ``flash_causal`` / ``flash_lengths``: when the self-attention mask is
    structurally (causal|full) ∧ (key < length) — the only three masks the
    transformer stack builds — the caller declares that structure here and
    the single-chip Pallas flash kernel (kernels/flash_attention.py)
    becomes eligible, replacing the dense ``[B, H, T, T]`` score
    materialization (GIC_FLASH_ATTN=1 opt-in; a measured long-context
    MEMORY lever, see the module comment below).
    ``flash_causal=None`` = arbitrary mask, dense only."""
    x = _constrain(x)
    h1 = layer_norm(p["ln1"], x)
    if cp_causal is not None and _cp_applicable(x, n_heads):
        x = x + _cp_attention(p["attn"], h1, n_heads, cp_causal)
    elif flash_causal is not None and _flash_applicable(x, n_heads):
        x = x + _flash_attention_block(p["attn"], h1, n_heads, flash_causal,
                                       flash_lengths)
    else:
        x = x + attention(p["attn"], h1, h1, n_heads, mask)
    if context is not None and "cross" in p:
        x = x + attention(p["cross"], layer_norm(p["ln_cross"], x), context,
                          n_heads, context_mask)
    h = layer_norm(p["ln2"], _constrain(x))
    return x + dense(p["mlp"]["fc2"], jax.nn.gelu(dense(p["mlp"]["fc1"], h)))


def _tf_remat() -> bool:
    """GIC_TF_REMAT=1: rematerialize each transformer block's activations
    in the backward pass (``jax.checkpoint`` per block) — residual memory
    per block drops from every intermediate to the block input, trading
    one extra forward.  Off by default: at the report's 4-layer/256-wide
    geometry activations are not the constraint; this is the lever for
    the config-5 stretch (GPT-2-small depth) and long-context variants,
    mirroring GIC_SCAN_REMAT on the LSTM scan (measured-neutral there,
    docs/benchmarks.md)."""
    import os

    return os.environ.get("GIC_TF_REMAT", "0") == "1"


def remat_block_apply(p, x, n_heads, mask=None, context=None,
                      context_mask=None, cp_causal=None, flash_causal=None,
                      flash_lengths=None):
    """``block_apply``, optionally wrapped in ``jax.checkpoint``
    (GIC_TF_REMAT=1).  Static Python args (n_heads, cp_causal,
    flash_causal) close over the wrapped function; array/None args flow
    through the checkpoint."""
    if not _tf_remat():
        return block_apply(p, x, n_heads, mask, context, context_mask,
                           cp_causal, flash_causal, flash_lengths)
    fn = jax.checkpoint(
        lambda p_, x_, m_, c_, cm_, fl_: block_apply(
            p_, x_, n_heads, m_, c_, cm_, cp_causal, flash_causal, fl_))
    return fn(p, x, mask, context, context_mask, flash_lengths)


def causal_mask(t: int):
    """Lower-triangular [1, 1, T, T] attend-mask."""
    return jnp.tril(jnp.ones((t, t), bool))[None, None, :, :]


# ------------------------------------------------------- flash attention
# Single-chip blocked attention (kernels/flash_attention.py): no [B,H,T,T]
# score tensor in HBM in either direction.  GIC_FLASH_ATTN=1 enables it
# wherever the shape is eligible (tests force it with the interpreter
# off-TPU); default OFF.  Measured on the real chip (docs/benchmarks.md
# "flash attention"): a MEMORY lever, not a speed lever — at GPT-2 depth
# it cuts grad-program temps 65% at T=2k (2.4 GB → 845 MB; 276 MB = 8.7×
# composed with GIC_TF_REMAT) but runs ~15% slower per step than XLA's
# fully-fused dense attention, which is excellent at these lengths.
# Opt in when the dense [B,H,T,T] temporaries don't fit, exactly like
# the remat flag — same family as the measured-negative GIC_FUSE_EMBED
# precedent: kept honest, kept opt-in.

def _flash_applicable(x, n_heads: int) -> bool:
    import os

    if os.environ.get("GIC_FLASH_ATTN", "0") != "1":
        return False
    t, d = x.shape[1], x.shape[2]
    from gan_image_captioning_tpu.kernels import flash_attention as fa

    return fa.supported(t, d // n_heads)


def _flash_attention_block(p, x, n_heads: int, causal: bool, lengths=None):
    """Self-attention through the Pallas flash kernel (q/k/v/o projections
    stay XLA matmuls — only the softmax(QKᵀ)V core is kernelized)."""
    from gan_image_captioning_tpu.kernels.flash_attention import (
        flash_attention)

    q = _split_heads(dense(p["wq"], x), n_heads)
    k = _split_heads(dense(p["wk"], x), n_heads)
    v = _split_heads(dense(p["wv"], x), n_heads)
    out = flash_attention(q, k, v, causal, lengths)
    b, t = x.shape[:2]
    return dense(p["wo"], out.reshape(b, t, -1))


# --------------------------------------------------- sequence parallelism
# GSPMD-style SP: when a PartitionSpec is set, block activations carry a
# with_sharding_constraint pinning [B, T, D] to (data, sp, None) — XLA then
# keeps the MLP/layernorm compute sequence-sharded and inserts the K/V
# all-gathers only around attention.  (The explicit shard_map ring/Ulysses
# kernels live in parallel/context_parallel.py; this is the
# compiler-managed integration for the jitted train step.)
_ACTIVATION_SPEC = None


def set_activation_sharding(sharding):
    """Set (or clear with None) the activation sharding — pass a
    ``NamedSharding(mesh, P('data', 'sp', None))`` (a bare PartitionSpec
    needs an ambient ``jax.set_mesh``)."""
    global _ACTIVATION_SPEC
    _ACTIVATION_SPEC = sharding


def _constrain(x):
    if _ACTIVATION_SPEC is not None and x.ndim == 3:
        return jax.lax.with_sharding_constraint(x, _ACTIVATION_SPEC)
    return x


# ------------------------------------------- explicit context parallelism
# Ring / Ulysses shard_map kernels (parallel/context_parallel.py) routed
# INTO block self-attention, so `--mesh …,sp:k --cp-mode ring|ulysses` runs
# them inside the fused jitted train steps (VERDICT round-1 item 7) rather
# than only standalone.  GSPMD SP (above) remains the compiler-managed
# default (--cp-mode gspmd).
_CP_MODE = None  # (mode str, mesh, axis_name) | None


def set_context_parallel(mode, mesh=None, axis_name: str = "sp"):
    """Route causal/full self-attention through the explicit shard_map
    kernels.  ``mode``: 'ring' | 'ulysses' | None (clear — dense/GSPMD)."""
    global _CP_MODE
    _CP_MODE = None if mode is None else (mode, mesh, axis_name)


def _cp_applicable(x, n_heads: int) -> bool:
    if _CP_MODE is None:
        return False
    mode, mesh, axis_name = _CP_MODE
    if axis_name not in mesh.shape:
        return False
    sp = mesh.shape[axis_name]
    if x.shape[1] % sp != 0:
        return False  # sequence must split evenly over the sp axis
    if mode == "ulysses" and n_heads % sp != 0:
        return False  # Ulysses shards heads
    return True


def _cp_attention(p, x, n_heads: int, causal: bool):
    """Self-attention via the ring / Ulysses shard_map kernel (in-jit)."""
    import functools

    from jax.sharding import PartitionSpec as P

    from gan_image_captioning_tpu.parallel.context_parallel import (
        ring_attention_local, ulysses_attention_local)

    mode, mesh, axis_name = _CP_MODE
    body = ring_attention_local if mode == "ring" else ulysses_attention_local
    q = _split_heads(dense(p["wq"], x), n_heads)
    k = _split_heads(dense(p["wk"], x), n_heads)
    v = _split_heads(dense(p["wv"], x), n_heads)
    fn = jax.shard_map(
        functools.partial(body, axis_name=axis_name, causal=causal),
        mesh=mesh,
        in_specs=(P(None, axis_name, None, None),) * 3,
        out_specs=P(None, axis_name, None, None),
    )
    out = fn(q, k, v)                                  # [B, T, H, D]
    b, t = x.shape[:2]
    return dense(p["wo"], out.reshape(b, t, -1))


# --------------------------------------------------- pipeline parallelism
# `--mesh …,pp:k` routes the block stack through the GPipe microbatch
# pipeline (parallel/pipeline.py) INSIDE the jitted steps (VERDICT round-1
# item 7).  Applies to the parallel teacher-forced passes (MLE and the
# transformer-discriminator trunk); the KV-cache incremental decode is not
# pipelined (a 1-token stage would be all bubble).  CP-inside-PP is not
# composed — stages use dense attention.
_PP = None  # (mesh, axis_name, num_microbatches) | None


def set_pipeline(mesh=None, axis_name: str = "pp", num_microbatches: int = 4):
    """Enable (or clear with mesh=None) pipeline routing of block stacks."""
    global _PP
    _PP = None if mesh is None else (mesh, axis_name, num_microbatches)


def pp_applicable(blocks, x) -> bool:
    if _PP is None:
        return False
    mesh, axis_name, m = _PP
    if axis_name not in mesh.shape:
        return False
    stages = mesh.shape[axis_name]
    return (len(blocks) % stages == 0 and x.shape[0] % m == 0
            and "cross" not in blocks[0])


def pipeline_blocks(blocks, x, n_heads: int, causal: bool):
    """Run a block stack as a ``pp``-sharded GPipe pipeline (in-jit)."""
    from gan_image_captioning_tpu.parallel.pipeline import pipeline_apply

    mesh, axis_name, m = _PP
    stages = mesh.shape[axis_name]
    g = len(blocks) // stages
    chunks = [blocks[i * g:(i + 1) * g] for i in range(stages)]
    stacked = jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *chunks)

    def stage(params_chunk, xb):
        mask = causal_mask(xb.shape[1]) if causal else None
        for blk in params_chunk:  # list of g per-stage blocks
            xb = remat_block_apply(blk, xb, n_heads, mask,
                                   flash_causal=causal)
        return xb

    return pipeline_apply(stacked, x, stage, mesh, axis_name,
                          num_microbatches=m, injit=True)


# ----------------------------------------------------------------- generator

def init_transformer_decoder_params(rng, config: Config,
                                    dtype=jnp.float32) -> dict:
    """Transformer caption generator params.

    d_model = ``gen_embed_dim``, MLP inner = ``gen_hidden_dim``
    (report §4.2: 256 emb / 256 hid), ``gen_num_layers`` blocks,
    ``gen_num_heads`` heads; cross-attention blocks are always built (used
    when a context grid is supplied)."""
    d, d_mlp = config.gen_embed_dim, config.gen_hidden_dim
    L = config.seq_len + 1  # +1 for the prepended feature token
    ks = jax.random.split(rng, config.gen_num_layers + 5)
    if config.encoder_arch == "vit":
        from gan_image_captioning_tpu.models import vit as vit_lib

        ctx_dim = vit_lib.FEATURE_DIM
    else:
        from gan_image_captioning_tpu.models import resnet as resnet_lib

        ctx_dim = resnet_lib.FEATURE_DIM
    return {
        "embed": jax.random.normal(ks[0], (config.vocab_size, d), dtype) * 0.02,
        "pos": jax.random.normal(ks[1], (L, d), dtype) * 0.02,
        # projects the encoder's HW×C grid into d_model for cross-attention
        "ctx_proj": _dense_init(ks[2], ctx_dim, d, dtype),
        "blocks": [init_block(ks[3 + i], d, d_mlp, dtype, cross=True)
                   for i in range(config.gen_num_layers)],
        "ln_f": _ln_init(d, dtype),
        # weight-tied-style separate projection, torch Linear layout [V, d]
        "linear": {"w": jax.random.normal(ks[-1], (config.vocab_size, d),
                                          dtype) * 0.02,
                   "b": jnp.zeros((config.vocab_size,), dtype)},
    }


def init_transformer_generator_params(rng, config: Config, dtype=jnp.float32,
                                      with_encoder: Optional[bool] = None) -> dict:
    """Full generator (decoder + optional encoder) with the reference init
    sweep applied (generator.py:116-123 semantics)."""
    if with_encoder is None:
        with_encoder = config.cgan
    k_dec, k_enc, k_init = jax.random.split(rng, 3)
    params = {"decoder": init_transformer_decoder_params(k_dec, config, dtype)}
    if with_encoder:
        from gan_image_captioning_tpu.models import encoder as encoder_lib

        params["encoder"] = encoder_lib.init_encoder_params(k_enc, config, dtype)

    natural_encoder = getattr(config, "encoder_init", "sweep") == "natural"

    def _skip(path, leaf):
        keys = [getattr(p, "key", getattr(p, "name", "")) for p in path]
        if natural_encoder and keys and keys[0] == "encoder":
            return True
        return any(k in ("mean", "var") for k in keys)

    return init_param_tree(k_init, params, config.gen_init,
                           skip_predicate=_skip)


def _project(dec, x):
    return x @ dec["linear"]["w"].T + dec["linear"]["b"]


def teacher_forced(dec: dict, features, captions, config: Config, rng=None,
                   temperature=1.0, pretrain: bool = True, context=None,
                   lengths=None):
    """Parallel causal decode (the report's MLE mode, §3.2.2).

    Sequence = [feature-token, embed(captions)]; output position i predicts
    ``captions[i]``.  Padding positions are masked out of attention when
    ``lengths`` is given (report: "padding attention masks").
    Returns logits (pretrain) or Gumbel-softmax samples ``[B, T+1, V]``.
    """
    if context is not None and context.shape[-1] != features.shape[-1]:
        context = dense(dec["ctx_proj"], context)
    emb = dec["embed"][captions]
    x = jnp.concatenate([features[:, None, :], emb], axis=1)
    t = x.shape[1]
    x = x + dec["pos"][:t]
    mask = causal_mask(t)
    # purely-causal masks are eligible for the explicit CP kernels and for
    # pipelining (both rebuild the mask per shard/stage); padding masks
    # (lengths given) keep the dense per-sample path.
    cp_causal = True if lengths is None else None
    if lengths is not None:
        # key positions beyond 1 + length are padding → not attended
        key_ok = (jnp.arange(t)[None, :] < (lengths + 1)[:, None])
        mask = mask & key_ok[:, None, None, :]
    if cp_causal and context is None and pp_applicable(dec["blocks"], x):
        x = pipeline_blocks(dec["blocks"], x, config.gen_num_heads,
                            causal=True)
    else:
        flash_lengths = None if lengths is None else lengths + 1
        for blk in dec["blocks"]:
            x = remat_block_apply(blk, x, config.gen_num_heads, mask,
                                  context, cp_causal=cp_causal,
                                  flash_causal=True,
                                  flash_lengths=flash_lengths)
    logits = _project(dec, layer_norm(dec["ln_f"], x))
    if pretrain:
        return logits
    from gan_image_captioning_tpu.ops.gumbel import add_gumbel

    return jax.nn.softmax(add_gumbel(rng, logits) * temperature, axis=-1)


def _init_kv_cache(config: Config, batch: int, dtype):
    d = config.gen_embed_dim
    h = config.gen_num_heads
    L = config.seq_len + 1
    shape = (config.gen_num_layers, batch, L, h, d // h)
    return jnp.zeros(shape, dtype), jnp.zeros(shape, dtype)


def decode_step(dec: dict, config: Config, x_tok, k_cache, v_cache, t,
                context=None):
    """One incremental decode step over a KV cache.

    Args:
      x_tok: [N, d] input embedding at position ``t`` (feature vector at
        t=0, token embedding afterwards).
      k_cache/v_cache: [n_layers, N, L, heads, head_dim].
      t: traced int32 position.
      context: optional [N, HW, d] cross-attention context (already
        projected to d_model).
    Returns ``(logits [N, V], new_k, new_v)``.
    """
    n_heads = config.gen_num_heads
    batch = x_tok.shape[0]
    x = (x_tok + dec["pos"][t])[:, None, :]  # [N, 1, d]
    pos_ok = (jnp.arange(k_cache.shape[2])[None, None, None, :] <= t)
    new_k, new_v = [], []
    for li, blk in enumerate(dec["blocks"]):
        h_in = layer_norm(blk["ln1"], x)
        q = _split_heads(dense(blk["attn"]["wq"], h_in), n_heads)
        k_new = _split_heads(dense(blk["attn"]["wk"], h_in), n_heads)
        v_new = _split_heads(dense(blk["attn"]["wv"], h_in), n_heads)
        k_l = jax.lax.dynamic_update_slice(k_cache[li], k_new, (0, t, 0, 0))
        v_l = jax.lax.dynamic_update_slice(v_cache[li], v_new, (0, t, 0, 0))
        new_k.append(k_l)
        new_v.append(v_l)
        scores = jnp.einsum("bqhd,bkhd->bhqk", q, k_l) / jnp.sqrt(
            q.shape[-1] * 1.0)
        scores = jnp.where(pos_ok, scores, jnp.finfo(scores.dtype).min)
        probs = jax.nn.softmax(scores, axis=-1)
        att = jnp.einsum("bhqk,bkhd->bqhd", probs, v_l).reshape(batch, 1, -1)
        x = x + dense(blk["attn"]["wo"], att)
        if context is not None and "cross" in blk:
            x = x + attention(blk["cross"], layer_norm(blk["ln_cross"], x),
                              context, n_heads)
        h = layer_norm(blk["ln2"], x)
        x = x + dense(blk["mlp"]["fc2"], jax.nn.gelu(dense(blk["mlp"]["fc1"], h)))
    logits = _project(dec, layer_norm(dec["ln_f"], x))[:, 0, :]
    return logits, jnp.stack(new_k), jnp.stack(new_v)


def decode_step_slots(dec: dict, config: Config, x_tok, k_cache, v_cache,
                      t_vec, context=None):
    """One incremental decode step with PER-ROW positions — the
    continuous-batching slot variant of :func:`decode_step` (serving.py
    ContinuousBatcher: each slot sits at its own decode position, so the
    position embedding, cache write index and attention mask are all
    per-row).

    Args:
      x_tok: [N, d] input embeddings (row n at position ``t_vec[n]``).
      k_cache/v_cache: [n_layers, N, L, heads, head_dim].
      t_vec: [N] int32 per-row positions.
      context: optional [N, HW, d] cross-attention context.
    Returns ``(logits [N, V], new_k, new_v)``.

    Stale cache rows from a slot's previous occupant need no zeroing: the
    mask only attends positions ≤ t_vec[n], and every such position is
    (re)written before it is first attended after a slot reset to t=0.
    """
    n_heads = config.gen_num_heads
    batch = x_tok.shape[0]
    rows = jnp.arange(batch)
    x = (x_tok + dec["pos"][t_vec])[:, None, :]             # [N, 1, d]
    pos_ok = (jnp.arange(k_cache.shape[2])[None, None, None, :]
              <= t_vec[:, None, None, None])                # [N, 1, 1, L]
    new_k, new_v = [], []
    for li, blk in enumerate(dec["blocks"]):
        h_in = layer_norm(blk["ln1"], x)
        q = _split_heads(dense(blk["attn"]["wq"], h_in), n_heads)
        k_new = _split_heads(dense(blk["attn"]["wk"], h_in), n_heads)
        v_new = _split_heads(dense(blk["attn"]["wv"], h_in), n_heads)
        k_l = k_cache[li].at[rows, t_vec].set(k_new[:, 0])
        v_l = v_cache[li].at[rows, t_vec].set(v_new[:, 0])
        new_k.append(k_l)
        new_v.append(v_l)
        scores = jnp.einsum("bqhd,bkhd->bhqk", q, k_l) / jnp.sqrt(
            q.shape[-1] * 1.0)
        scores = jnp.where(pos_ok, scores, jnp.finfo(scores.dtype).min)
        probs = jax.nn.softmax(scores, axis=-1)
        att = jnp.einsum("bhqk,bkhd->bqhd", probs, v_l).reshape(batch, 1, -1)
        x = x + dense(blk["attn"]["wo"], att)
        if context is not None and "cross" in blk:
            x = x + attention(blk["cross"], layer_norm(blk["ln_cross"], x),
                              context, n_heads)
        h = layer_norm(blk["ln2"], x)
        x = x + dense(blk["mlp"]["fc2"],
                      jax.nn.gelu(dense(blk["mlp"]["fc1"], h)))
    logits = _project(dec, layer_norm(dec["ln_f"], x))[:, 0, :]
    return logits, jnp.stack(new_k), jnp.stack(new_v)


def sample(dec: dict, features, rng, temperature, seq_len: int,
           pretrain: bool = False, config: Config = None, context=None):
    """Free-running autoregressive decode with a KV cache in ``lax.scan``.

    The transformer twin of the LSTM decode loop (reference
    ``generator.py:55-81``): per step — embed previous token (+pos) → attend
    over the cached prefix → project → (logits | Gumbel-softmax) → argmax
    feedback.  Returns ``(outputs [B, T, V], ids [B, T])``.
    """
    batch = features.shape[0]
    dtype = features.dtype
    if context is not None and context.shape[-1] != features.shape[-1]:
        context = dense(dec["ctx_proj"], context)
    k_cache, v_cache = _init_kv_cache(config, batch, dtype)

    def step(carry, rng_t):
        x_tok, k_cache, v_cache, t = carry
        logits, k_cache, v_cache = decode_step(dec, config, x_tok, k_cache,
                                               v_cache, t, context)
        if pretrain:
            out = logits
            ids = jnp.argmax(logits, axis=-1)
        else:
            out, ids = gumbel_softmax(rng_t, logits, temperature)
        x_next = dec["embed"][ids]
        return (x_next, k_cache, v_cache, t + 1), (out, ids)

    rngs = jax.random.split(rng, seq_len)
    carry = (features, k_cache, v_cache, jnp.asarray(0, jnp.int32))
    _, (outs, ids) = jax.lax.scan(step, carry, rngs)
    return jnp.swapaxes(outs, 0, 1), jnp.swapaxes(ids, 0, 1)
