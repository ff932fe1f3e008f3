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
* **ZeRO-1** (``--zero1``): instead of replicating the Adam moments over the
  ``data`` axis, shard each mu/nu leaf's first free dimension over ``data`` —
  every device holds 1/N of the optimizer state and runs 1/N of the moment
  update math; GSPMD inserts the grad reduce-scatter into the sharded
  moments and the update all-gather back onto the replicated params.  The
  step OUTPUT layout is pinned via :func:`train_state_shardings` +
  ``with_sharding_constraint`` (train/steps.py:set_state_shardings) so the
  propagation pass cannot drift params into a sharded layout between steps.
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


def _is_spec(x) -> bool:
    return isinstance(x, P)


def _zero1_moment_spec(spec: P, shape, mesh: Mesh) -> P:
    """ZeRO-1 spec for one Adam-moment leaf: the param's own spec plus the
    ``data`` axis on the FIRST free dimension it divides evenly (composes
    with TP — a [V, E] embedding moment sharded P('model', None) becomes
    P('model', 'data') when E divides).  Leaves with no dividable free dim
    (scalars, short biases) stay on the param spec — replicating a [H]
    vector costs nothing next to the matrices ZeRO-1 targets."""
    n = mesh.shape["data"]
    entries = list(spec) + [None] * (len(shape) - len(spec))
    for i, dim in enumerate(shape):
        if entries[i] is None and dim >= n and dim % n == 0:
            entries[i] = "data"
            return P(*entries)
    return spec


def _moment_spec_tree(param_spec, params, mesh: Mesh, zero1: bool):
    """Spec tree for Adam mu/nu: the param specs, ZeRO-1-extended when on."""
    if not (zero1 and _has_axis(mesh, "data")):
        return param_spec
    return jax.tree_util.tree_map(
        lambda s, p: _zero1_moment_spec(s, getattr(p, "shape", ()), mesh),
        param_spec, params, is_leaf=_is_spec)


def _shard_opt_state(opt_state, param_spec, mesh: Mesh, moment_spec=None):
    """Recursively shard an optax chain state: Adam's mu/nu follow their
    params' specs (or the ZeRO-1 moment specs), scalars/counts replicate."""
    if moment_spec is None:
        moment_spec = param_spec
    if isinstance(opt_state, optax.ScaleByAdamState):
        return optax.ScaleByAdamState(
            count=jax.device_put(opt_state.count, NamedSharding(mesh, P())),
            mu=_put(opt_state.mu, moment_spec, mesh),
            nu=_put(opt_state.nu, moment_spec, mesh),
        )
    if isinstance(opt_state, tuple) and not hasattr(opt_state, "_fields"):
        return tuple(_shard_opt_state(s, param_spec, mesh, moment_spec)
                     for s in opt_state)
    if hasattr(opt_state, "_fields"):  # other NamedTuple states (EmptyState…)
        leaves = jax.tree_util.tree_leaves(opt_state)
        if not leaves:
            return opt_state
        return jax.tree_util.tree_map(
            lambda x: jax.device_put(x, NamedSharding(mesh, P())), opt_state)
    return opt_state


def _spec_to_ns(spec_tree, mesh: Mesh):
    return jax.tree_util.tree_map(lambda s: NamedSharding(mesh, s),
                                  spec_tree, is_leaf=_is_spec)


def _opt_state_shardings(opt_state, moment_ns, mesh: Mesh):
    """NamedSharding tree mirroring an optax chain state's structure
    (the shardings twin of :func:`_shard_opt_state`)."""
    rep = NamedSharding(mesh, P())
    if isinstance(opt_state, optax.ScaleByAdamState):
        return optax.ScaleByAdamState(count=rep, mu=moment_ns, nu=moment_ns)
    if isinstance(opt_state, tuple) and not hasattr(opt_state, "_fields"):
        return tuple(_opt_state_shardings(s, moment_ns, mesh)
                     for s in opt_state)
    if hasattr(opt_state, "_fields"):
        return jax.tree_util.tree_map(lambda x: rep, opt_state)
    return None if opt_state is None else rep


def train_state_shardings(state, mesh: Mesh, zero1: bool = False):
    """NamedSharding pytree matching ``state`` under the placement rules
    above — the single source of truth for both :func:`shard_train_state`
    (input placement) and the step-output ``with_sharding_constraint`` pin
    (train/steps.py:set_state_shardings, required under ZeRO-1 so GSPMD
    propagation cannot float params into a moment-induced sharded layout)."""
    gen_spec = generator_param_spec(state.gen_params, mesh)
    disc_spec = discriminator_param_spec(state.disc_params, mesh)
    gen_m = _spec_to_ns(
        _moment_spec_tree(gen_spec, state.gen_params, mesh, zero1), mesh)
    disc_m = _spec_to_ns(
        _moment_spec_tree(disc_spec, state.disc_params, mesh, zero1), mesh)
    gen_ns = _spec_to_ns(gen_spec, mesh)
    disc_ns = _spec_to_ns(disc_spec, mesh)
    rep = NamedSharding(mesh, P())
    return type(state)(
        gen_params=gen_ns,
        disc_params=disc_ns,
        pretrain_opt_state=_opt_state_shardings(state.pretrain_opt_state,
                                                gen_m, mesh),
        gen_opt_state=_opt_state_shardings(state.gen_opt_state, gen_m, mesh),
        disc_opt_state=_opt_state_shardings(state.disc_opt_state, disc_m,
                                            mesh),
        pretrain_steps=rep,
        gen_steps=rep,
        disc_steps=rep,
        temperature=rep,
        rng=rep,
        ema_gen_params=None if state.ema_gen_params is None else gen_ns,
    )


def shard_train_state(state, mesh: Mesh, zero1: bool = False):
    """Place a TrainState onto the mesh according to the rules above."""
    ns = train_state_shardings(state, mesh, zero1=zero1)
    return jax.tree_util.tree_map(jax.device_put, state, ns)


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
