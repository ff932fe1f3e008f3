"""Checkpointing with resume — async by default.

The reference writes best-val ``state_dict`` files only — no optimizer
state, no step counters, and nothing is ever loaded back
(``training.py:116-119,223-227``).  Here:

* :func:`save_params` / :func:`load_params` — best-val model params with the
  reference's file names (``pretrained_model.ckpt``, ``adv_model.ckpt``,
  written as Orbax checkpoint directories);
* :func:`save_state` / :func:`load_state` — the FULL :class:`TrainState`
  (params + all three Adam states + step counters + temperature + PRNG key),
  enabling step-granular ``--resume``.

Saves are ASYNC (SURVEY §5): the caller thread only snapshots the pytree to
host memory (the device→host copy must happen before donated buffers are
reused by the next step); the Orbax write runs on a single background writer
thread so the step loop never stalls on filesystem I/O.  Ordering is
preserved (one worker, FIFO).  :func:`wait_for_checkpoints` is the barrier —
called automatically before any load and at interpreter exit; pass
``sync=True`` for must-complete-now saves (the SIGTERM interrupt path).
"""

from __future__ import annotations

import atexit
import os
import threading
from concurrent.futures import Future, ThreadPoolExecutor
from typing import Any, List

import jax
import numpy as np

_writer_lock = threading.Lock()
_writer: ThreadPoolExecutor | None = None
_pending: List[Future] = []


def _tree_to_numpy(tree):
    return jax.tree_util.tree_map(lambda x: np.asarray(x), tree)


def _orbax_write(path: str, host_tree: Any):
    """Synchronous Orbax write of an already-host-resident tree.

    Multi-host: only process 0 reaches here (save_params guards), so the
    checkpointer's cross-process barrier must span the active set {0}
    alone — the default barrier waits for EVERY process and deadlocks
    against the guards."""
    import jax
    import orbax.checkpoint as ocp

    if jax.process_count() > 1:
        ckptr = ocp.Checkpointer(
            ocp.StandardCheckpointHandler(),
            multiprocessing_options=ocp.options.MultiprocessingOptions(
                primary_host=0, active_processes={0}))
        ckptr.save(path, args=ocp.args.StandardSave(host_tree), force=True)
        return
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(path, host_tree, force=True)
    ckptr.wait_until_finished()


def _get_writer() -> ThreadPoolExecutor:
    global _writer
    with _writer_lock:
        if _writer is None:
            _writer = ThreadPoolExecutor(
                max_workers=1, thread_name_prefix="gic-ckpt")
            atexit.register(wait_for_checkpoints)
        return _writer


def wait_for_checkpoints():
    """Barrier: block until every async save has committed; re-raise the
    first writer error.  As the atexit handler it is best-effort: orbax
    cannot schedule its commit futures once the interpreter is shutting
    down, so late writes surface a RuntimeError here instead of hanging —
    entry points that must not lose a save use ``sync=True`` or call this
    barrier themselves before returning (instructor._run does)."""
    with _writer_lock:
        pending, _pending[:] = list(_pending), []
    for fut in pending:
        fut.result()


def pending_checkpoints() -> int:
    """Number of async saves not yet known-complete (testing/metrics)."""
    with _writer_lock:
        _pending[:] = [f for f in _pending if not f.done()]
        return len(_pending)


def save_params(path: str, params: Any, sync: bool = False):
    """Save a params pytree (Orbax).  Returns immediately after the
    device→host snapshot unless ``sync=True``.

    Multi-host: only process 0 writes (training state is fully replicated
    under data-parallel multihost meshes; every process holds the same
    values, so one writer suffices and concurrent writers would corrupt
    the directory).  TP-sharded-across-hosts state would need an Orbax
    multihost save — out of scope (TP axes live within a host here)."""
    import jax

    if jax.process_count() > 1 and jax.process_index() != 0:
        return
    path = os.path.abspath(path)
    host_tree = _tree_to_numpy(params)
    if sync:
        wait_for_checkpoints()  # keep ordering vs earlier async saves
        _orbax_write(path, host_tree)
        return
    fut = _get_writer().submit(_orbax_write, path, host_tree)
    with _writer_lock:
        _pending.append(fut)


def load_params(path: str, target: Any):
    """Restore a params pytree shaped like ``target``."""
    import orbax.checkpoint as ocp

    wait_for_checkpoints()
    ckptr = ocp.StandardCheckpointer()
    return ckptr.restore(os.path.abspath(path), target=target)


def load_generator_checkpoint(path: str, config):
    """Load either checkpoint form the training loop writes: a plain
    generator pytree (``pretrained_model.ckpt``) or the adversarial
    ``{"generator": …, "discriminator": …}`` dict (``adv_model.ckpt``).

    Returns ``(gen_params, disc_params_or_None)``.  The shared loader for
    every inference CLI (serve/evaluate/caption/human_eval) — one place
    to handle checkpoint formats.  A path that matches NEITHER form
    re-raises the plain-form error (the more informative one: a missing
    or corrupt path fails identically under both templates).
    """
    import jax

    from gan_image_captioning_tpu.models import api

    wait_for_checkpoints()  # in-process async saves may still be landing
    if not os.path.exists(path):
        raise FileNotFoundError(f"checkpoint not found: {path}")
    template = api.init_generator(jax.random.PRNGKey(0), config)
    try:
        return load_params(path, template), None
    except Exception as plain_err:
        disc_template = api.init_discriminator(jax.random.PRNGKey(1), config)
        try:
            both = load_params(path, {"generator": template,
                                      "discriminator": disc_template})
        except Exception:
            raise plain_err
        return both["generator"], both["discriminator"]


def save_state(path: str, state, sync: bool = False):
    """Save the full TrainState."""
    save_params(path, state, sync=sync)


def load_state(path: str, template):
    """Restore a full TrainState shaped like ``template`` (built with the
    same config via :func:`create_train_state`)."""
    return load_params(path, template)


def prune_checkpoints(model_dir: str, prefix: str, keep: int) -> list:
    """Retention policy for periodic snapshots: keep the ``keep``
    highest-numbered ``{prefix}{N}.ckpt`` directories under ``model_dir``
    and delete the rest (``keep <= 0`` keeps everything).  Best-val files
    (``pretrained_model.ckpt`` / ``adv_model.ckpt``) never match a
    numbered prefix, so they are never pruned.  Returns the deleted paths.
    """
    import re
    import shutil

    if keep <= 0:
        return []
    if pending_checkpoints():
        # async writes land AFTER this call would list the directory (and
        # deleting a directory mid-write corrupts it) — drain first.  Rare
        # and bounded: once every checkpoint_every epochs, FIFO queue.
        wait_for_checkpoints()
    pat = re.compile(re.escape(prefix) + r"(\d+)\.ckpt$")
    found = []
    for name in os.listdir(model_dir):
        m = pat.fullmatch(name)
        if m:
            found.append((int(m.group(1)), name))
    found.sort()
    doomed = [name for _, name in found[:-keep]] if len(found) > keep else []
    deleted = []
    for name in doomed:
        path = os.path.join(model_dir, name)
        shutil.rmtree(path, ignore_errors=True)
        # schedule sidecar (train/schedule.py) travels with its checkpoint
        sidecar = path + ".schedule.json"
        if os.path.exists(sidecar):
            os.remove(sidecar)
        deleted.append(path)
    return deleted
