"""RelGAN multi-representation CNN discriminator.

TPU-native rebuild of reference ``discriminator.py:9-86``:

* Input is either a soft token-distribution sequence ``[B, L, V]`` (generated
  captions) or integer token ids ``[B, L]`` (real captions).  The reference
  materializes a ``[B, L, V]`` one-hot for real captions and multiplies it
  with the embedding Linear (``training.py:158`` + ``discriminator.py:20,40``)
  — at V≈11k that is ~100 MB/batch of pure waste.  Here integer input takes
  an embedding *gather* instead, which is mathematically identical
  (``one_hot(x) @ W.T == W.T[x]``) and HBM-bandwidth-friendly.
* The ``num_rep`` multi-representation trick: the E-dim embedding is viewed
  as ``num_rep`` columns of width ``emb_dim_single = E / num_rep``
  (``discriminator.py:17,23``); each Conv2d bank slides over time with
  stride ``emb_dim_single`` in the embedding axis, scoring each
  representation independently; output logits are ``[B * num_rep]``.
* conv banks (filter sizes × filters, ``discriminator.py:22-25``) → relu →
  max-pool over time (``:45``) → concat → highway (``:53-55``) →
  dropout(0.2) → Linear(F→100) → Linear(100→1) (``:58-60``).

Parameter layouts are torch-compatible (Conv2d OIHW, Linear [out, in]) for
1:1 weight conversion and oracle tests.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from gan_image_captioning_tpu.config import Config
from gan_image_captioning_tpu.ops.initializers import init_param_tree


# --------------------------------------------------------------------- params

def init_discriminator_params(rng, config: Config, dtype=jnp.float32) -> dict:
    """Build params then apply the reference init sweep
    (``discriminator.py:32,79-86``)."""
    V = config.vocab_size
    E = config.disc_embed_dim
    F = config.disc_feature_dim
    eds = config.emb_dim_single
    keys = jax.random.split(rng, 6 + len(config.disc_filter_sizes))
    convs = []
    for i, (n, f) in enumerate(zip(config.disc_num_filters,
                                   config.disc_filter_sizes)):
        convs.append({
            "w": jax.random.normal(keys[i], (n, 1, f, eds), dtype) * 0.02,
            "b": jnp.zeros((n,), dtype),
        })
    base = len(config.disc_filter_sizes)
    params = {
        # torch Linear(V, E, bias=False).weight → [E, V] (discriminator.py:20)
        "embeddings": {"w": jax.random.normal(keys[base], (E, V), dtype) * 0.02},
        "convs": convs,
        "highway": {"w": jax.random.normal(keys[base + 1], (F, F), dtype) * 0.02,
                    "b": jnp.zeros((F,), dtype)},
        "feature2out": {"w": jax.random.normal(keys[base + 2], (100, F), dtype) * 0.02,
                        "b": jnp.zeros((100,), dtype)},
        "out2logits": {"w": jax.random.normal(keys[base + 3], (1, 100), dtype) * 0.02,
                       "b": jnp.zeros((1,), dtype)},
    }
    return init_param_tree(keys[base + 4], params, config.disc_init)


# -------------------------------------------------------------------- compute

def embed_tokens(params: dict, inp):
    """Token embedding for soft or hard inputs.

    Soft ``[B, L, V]``: ``inp @ W.T`` (the reference's bias-free Linear,
    ``discriminator.py:20,40``).  Int ``[B, L]``: gather ``W.T[inp]`` —
    identical result for one-hot rows, no ``[B, L, V]`` materialization
    (fuses reference ``training.py:158``'s one-hot into the lookup).
    """
    w = params["embeddings"]["w"]  # [E, V]
    if jnp.issubdtype(inp.dtype, jnp.integer):
        return w.T[inp]            # [B, L, E]
    return inp @ w.T               # [B, L, E]


def _conv_bank(conv_params: dict, emb4, eds: int):
    """One conv bank: input [B, 1, L, E], kernel [N, 1, f, eds], stride
    (1, eds) — reference ``discriminator.py:22-25``.  Output [B, N, L-f+1, R]."""
    out = jax.lax.conv_general_dilated(
        emb4, conv_params["w"],
        window_strides=(1, eds),
        padding="VALID",
        dimension_numbers=("NCHW", "OIHW", "NCHW"),
    )
    return out + conv_params["b"][None, :, None, None]


def _highway(params: dict, pred):
    """Highway layer — reference ``discriminator.py:53-55``:
    ``sigmoid(h) * relu(h) + (1 - sigmoid(h)) * x``."""
    hw = pred @ params["highway"]["w"].T + params["highway"]["b"]
    gate = jax.nn.sigmoid(hw)
    return gate * jax.nn.relu(hw) + (1.0 - gate) * pred


def _conv_layout() -> str:
    """GIC_DISC_CONV_LAYOUT ∈ {nchw, nhwc} (measurement flag)."""
    import os

    return os.environ.get("GIC_DISC_CONV_LAYOUT", "nchw")


def _disc_remat() -> bool:
    """GIC_DISC_REMAT=1 recomputes the conv trunk in the backward pass."""
    import os

    return os.environ.get("GIC_DISC_REMAT", "0") == "1"


def _use_conv_kernel(config: Config) -> str:
    """Select the disc conv engine (kernels/disc_conv.py) — all
    numerics-equivalent (gradient-tested):

      GIC_DISC_KERNEL=1 → 'pallas' (register-blocked Pallas fwd + bwd)
      GIC_DISC_KERNEL=2 → 'hybrid' (XLA conv forward + Pallas backward)
      GIC_DISC_KERNEL=3 → 'mxu' (MXU-matmul Pallas fwd + bwd — the conv
                          maps never touch HBM and the tap loops ride the
                          MXU; fastest measured: 114.2-114.7 vs 101.9-104.0
                          steps/s hybrid, 3/3 interleaved reps on the
                          flagship adv step — bench default; shard_maps
                          over data meshes, falls back to 'hybrid' on
                          unaligned per-shard row counts)
      unset/0           → '' (pure XLA path)

    Without the env var, ``--disc-engine`` decides: 'auto' (default) picks
    'mxu' on TPU and the pure-XLA path elsewhere (interpret-mode Pallas is
    slow); explicit names force an engine.

    Mesh guard: a Pallas engine inside a GSPMD-partitioned step is only
    valid when the kernel shard_map mesh is installed
    (``decode_sample.set_mesh`` — data-only meshes; GSPMD cannot partition
    the opaque Mosaic custom-calls itself), so with ``--mesh`` configured
    but no kernel mesh the engines stay off.
    """
    import os

    import jax

    from gan_image_captioning_tpu.kernels.decode_sample import _data_mesh
    from gan_image_captioning_tpu.kernels.disc_conv import kernel_supported

    if not kernel_supported(config.emb_dim_single):
        return ""
    mesh_ok = not config.mesh or _data_mesh() is not None
    env = os.environ.get("GIC_DISC_KERNEL")
    if env is not None:
        choice = {"1": "pallas", "2": "hybrid", "3": "mxu"}.get(env, "")
    elif config.disc_engine == "auto":
        choice = "mxu" if jax.default_backend() == "tpu" else ""
    else:
        choice = {"pallas": "pallas", "hybrid": "hybrid",
                  "mxu": "mxu"}.get(config.disc_engine, "")
    return choice if (choice and mesh_ok) else ""


def conv_pooled(params: dict, emb, config: Config):
    """Pooled conv features ``[(N·R), F]`` from embedded input [N, L, E] —
    conv banks → bias → relu → max over time (discriminator.py:42-45)."""
    eds = config.emb_dim_single
    kernel_impl = _use_conv_kernel(config)
    if kernel_impl:
        from gan_image_captioning_tpu.kernels.disc_conv import pooled_features

        pooled = pooled_features(params["convs"], emb, eds,
                                 impl=kernel_impl)             # [B, R, F]
        return pooled.reshape(-1, config.disc_feature_dim)
    if _conv_layout() == "nhwc":
        # channels-last formulation — TPU's native conv layout (the NCHW
        # form costs layout transposes around every conv in fwd AND bwd):
        # input [B, L, E, 1], kernel [f, eds, 1, n], output [B, L', R, n]
        emb4 = emb[:, :, :, None]
        pools = []
        for conv_params in params["convs"]:
            w = jnp.transpose(conv_params["w"], (2, 3, 1, 0))  # [f,eds,1,n]
            con = jax.lax.conv_general_dilated(
                emb4, w, window_strides=(1, eds), padding="VALID",
                dimension_numbers=("NHWC", "HWIO", "NHWC"))
            con = jax.nn.relu(con + conv_params["b"][None, None, None, :])
            pools.append(jnp.max(con, axis=1))                 # [B, R, n]
        pred = jnp.concatenate(pools, axis=2)                  # [B, R, F]
        return pred.reshape(-1, config.disc_feature_dim)
    emb4 = emb[:, None, :, :]                          # [N, 1, L, E]
    pools = []
    for conv_params in params["convs"]:
        con = jax.nn.relu(_conv_bank(conv_params, emb4, eds))  # [B,N,L',R]
        pools.append(jnp.max(con, axis=2))                     # [B, N, R]
    pred = jnp.concatenate(pools, axis=1)              # [B, F, R]
    return jnp.transpose(pred, (0, 2, 1)).reshape(-1, config.disc_feature_dim)


def apply_embedded(params: dict, emb, config: Config, rng=None,
                   train: bool = False, dropout_rate: float = 0.2):
    """Trunk from embedded input ``[N, L, E]`` → ``[N * num_rep]`` logits.

    Split out so the adversarial step can run the trunk ONCE over the
    concatenated [real; fake; gen] batch (one conv stack + backward instead
    of the reference's three, ``training.py:162-164``)."""
    if _disc_remat():
        # Rematerialize the conv/relu/maxpool chain in the backward pass:
        # the [B, N, L', R] activation maps (~80 MB/bank) are residual
        # traffic the backward re-reads from HBM, while recomputing them
        # costs ~1 GFLOP — trade cheap MXU/VPU FLOPs for HBM bytes.
        pred = jax.checkpoint(
            lambda p, e: conv_pooled(p, e, config))(params, emb)
    else:
        pred = conv_pooled(params, emb, config)
    pred = _highway(params, pred)                      # [(B·R), F]

    if train and dropout_rate > 0.0:
        keep = jax.random.bernoulli(rng, 1.0 - dropout_rate, pred.shape)
        pred = jnp.where(keep, pred / (1.0 - dropout_rate), 0.0)

    pred = pred @ params["feature2out"]["w"].T + params["feature2out"]["b"]
    logits = pred @ params["out2logits"]["w"].T + params["out2logits"]["b"]
    return logits[:, 0]                                # [(N·R)]


def apply(params: dict, inp, config: Config, rng=None, train: bool = False,
          dropout_rate: float = 0.2):
    """Discriminator logits — reference ``Discriminator.forward``
    (``discriminator.py:34-62``).

    Args:
      inp: ``[B, L, V]`` float soft sequences or ``[B, L]`` int token ids.
      rng: dropout PRNG key (required when ``train``).
      train: apply dropout(0.2) (reference ``discriminator.py:30,58``;
        train/eval mode toggled at ``training.py:215-220``).
    Returns:
      ``[B * num_rep]`` logits (one score per representation).
    """
    emb = embed_tokens(params, inp)                    # [B, L, E]
    return apply_embedded(params, emb, config, rng, train, dropout_rate)


def get_feature(params: dict, inp, config: Config):
    """Pooled feature vector — reference ``Discriminator.get_feature``
    (``discriminator.py:64-77``).

    The reference's version only type-checks when ``num_rep == 1`` (its
    ``squeeze(3)`` assumes a single representation); here the max-pool runs
    over both time and representation axes so any config returns
    ``[B, feature_dim]``, which is the intended semantics.
    """
    eds = config.emb_dim_single
    emb = embed_tokens(params, inp)[:, None, :, :]
    pools = []
    for conv_params in params["convs"]:
        con = jax.nn.relu(_conv_bank(conv_params, emb, eds))   # [B,N,L',R]
        pools.append(jnp.max(con, axis=(2, 3)))                # [B, N]
    pred = jnp.concatenate(pools, axis=1)                      # [B, F]
    return _highway(params, pred)


# --------------------------------------------------------------------- facade

class Discriminator:
    """API facade mirroring reference ``Discriminator(args)``
    (discriminator.py:9-33)."""

    def __init__(self, config: Config, dropout: float = 0.2):
        self.config = config
        self.dropout = dropout

    def init(self, rng, dtype=jnp.float32):
        return init_discriminator_params(rng, self.config, dtype)

    def __call__(self, params, inp, rng=None, train: bool = False):
        return apply(params, inp, self.config, rng=rng, train=train,
                     dropout_rate=self.dropout)

    def get_feature(self, params, inp):
        return get_feature(params, inp, self.config)
