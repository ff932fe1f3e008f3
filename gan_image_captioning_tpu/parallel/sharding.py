"""Sharding rules for the GAN captioner.

Layout decisions (SURVEY §2.3 / §7):

* **DP**: batch dim of every batch array → ``data`` axis.  Params replicated
  across ``data``; XLA inserts the psum grad all-reduce.
* **TP**: the vocab dimension is the big one (V ≈ 11k at 10% COCO vs
  H = 512) — shard it over ``model``:
    - generator embedding table ``[V, E]`` → rows sharded,
    - generator output projection ``[V, H]`` + bias ``[V]`` → rows sharded
      (the [B,L,V] logits/softmax then compute sharded over vocab),
    - discriminator embedding ``[E, V]`` → columns sharded (contracting dim;
      XLA reduce-scatters the matmul).
  LSTM/conv/MLP weights stay replicated (tiny next to vocab-dim tensors).
* Optimizer state mirrors its parameter's sharding (Adam mu/nu are
  params-shaped trees inside ``ScaleByAdamState``).
"""

from __future__ import annotations

from typing import Any

import jax
import numpy as np
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def _has_axis(mesh: Mesh, name: str) -> bool:
    return name in mesh.axis_names and mesh.shape[name] > 1


def generator_param_spec(params: Any, mesh: Mesh) -> Any:
    """PartitionSpec tree for generator params."""
    model = "model" if _has_axis(mesh, "model") else None

    def spec_for(path, leaf):
        keys = [getattr(p, "key", getattr(p, "name", "")) for p in path]
        if model:
            if "embed" in keys:                       # [V, E]
                return P(model, None)
            if "linear" in keys and "w" in keys:      # [V, H]
                return P(model, None)
            if "linear" in keys and "b" in keys:      # [V]
                return P(model)
        return P()

    return jax.tree_util.tree_map_with_path(spec_for, params)


def quantized_generator_param_spec(params: Any, mesh: Mesh) -> Any:
    """PartitionSpec tree for a decode-quantized generator (the
    ``ops/quantize.py`` layout: ``decoder.embed``/``decoder.linear.w`` are
    ``QTensor`` NamedTuples, the vocab projection pre-transposed to
    ``[H, V]``).  Vocab-dim payloads shard over ``model`` exactly as the
    full-precision rules; each ``QTensor.scale`` follows its payload's
    channel axis (the ``[1, V]`` projection scales shard, the ``[1, E]``
    embedding scales replicate)."""
    model = "model" if _has_axis(mesh, "model") else None

    def spec_for(path, leaf):
        keys = [getattr(p, "key", getattr(p, "name", "")) for p in path]
        if model:
            if "embed" in keys and "q" in keys:       # [V, E] int8 rows
                return P(model, None)
            if "linear" in keys and "w" in keys:      # QTensor [H, V]
                return P(None, model)                 # q and [1, V] scales
            if "linear" in keys and "b" in keys:      # [V]
                return P(model)
        return P()

    return jax.tree_util.tree_map_with_path(spec_for, params)


def discriminator_param_spec(params: Any, mesh: Mesh) -> Any:
    """PartitionSpec tree for discriminator params (embedding cols → model)."""
    model = "model" if _has_axis(mesh, "model") else None

    def spec_for(path, leaf):
        keys = [getattr(p, "key", getattr(p, "name", "")) for p in path]
        if model and "embeddings" in keys:            # [E, V]
            return P(None, model)
        return P()

    return jax.tree_util.tree_map_with_path(spec_for, params)


def _put(tree, spec_tree, mesh: Mesh):
    return jax.tree_util.tree_map(
        lambda x, s: jax.device_put(x, NamedSharding(mesh, s)), tree, spec_tree)


def _shard_opt_state(opt_state, param_spec, mesh: Mesh):
    """Recursively shard an optax chain state: Adam's mu/nu follow their
    params' specs, scalars/counts replicate."""
    if isinstance(opt_state, optax.ScaleByAdamState):
        return optax.ScaleByAdamState(
            count=jax.device_put(opt_state.count, NamedSharding(mesh, P())),
            mu=_put(opt_state.mu, param_spec, mesh),
            nu=_put(opt_state.nu, param_spec, mesh),
        )
    if isinstance(opt_state, tuple) and not hasattr(opt_state, "_fields"):
        return tuple(_shard_opt_state(s, param_spec, mesh) for s in opt_state)
    if hasattr(opt_state, "_fields"):  # other NamedTuple states (EmptyState…)
        leaves = jax.tree_util.tree_leaves(opt_state)
        if not leaves:
            return opt_state
        return jax.tree_util.tree_map(
            lambda x: jax.device_put(x, NamedSharding(mesh, P())), opt_state)
    return opt_state


def shard_train_state(state, mesh: Mesh):
    """Place a TrainState onto the mesh according to the rules above."""
    gen_spec = generator_param_spec(state.gen_params, mesh)
    disc_spec = discriminator_param_spec(state.disc_params, mesh)
    rep = NamedSharding(mesh, P())
    return state._replace(
        gen_params=_put(state.gen_params, gen_spec, mesh),
        disc_params=_put(state.disc_params, disc_spec, mesh),
        pretrain_opt_state=_shard_opt_state(state.pretrain_opt_state,
                                            gen_spec, mesh),
        gen_opt_state=_shard_opt_state(state.gen_opt_state, gen_spec, mesh),
        disc_opt_state=_shard_opt_state(state.disc_opt_state, disc_spec, mesh),
        pretrain_steps=jax.device_put(state.pretrain_steps, rep),
        gen_steps=jax.device_put(state.gen_steps, rep),
        disc_steps=jax.device_put(state.disc_steps, rep),
        temperature=jax.device_put(state.temperature, rep),
        rng=jax.device_put(state.rng, rep),
    )


def shard_batch(batch: dict, mesh: Mesh, step_axis: bool = False) -> dict:
    """Shard every batch array over the ``data`` axis (leading dim).

    ``step_axis=True`` handles ``--steps-per-call`` stacked batches
    (data/loader.py:stack_batches): arrays carry a leading ``[K]`` step axis,
    so the batch dim to shard is axis 1 (the scan peels the step axis off
    before the per-step program sees its usual ``data``-sharded batch).
    """
    data = "data" if _has_axis(mesh, "data") else None
    multihost = jax.process_count() > 1

    def put(x):
        x = np.asarray(x)
        lead = [None] if step_axis else []
        batch_dims = x.ndim - len(lead)
        spec = P(*lead, data, *([None] * (batch_dims - 1)))
        sharding = NamedSharding(mesh, spec)
        if multihost and data is not None:
            # multi-host DP: each process holds only ITS slice of the
            # global batch (Batcher host_shard feeds the local rows);
            # assemble the global array from per-process local data —
            # device_put would demand the full global value on every host
            return jax.make_array_from_process_local_data(sharding, x)
        return jax.device_put(x, sharding)

    return {k: put(v) for k, v in batch.items()}
