"""Checkpointing with resume.

The reference writes best-val ``state_dict`` files only — no optimizer
state, no step counters, and nothing is ever loaded back
(``training.py:116-119,223-227``).  Here:

* :func:`save_params` / :func:`load_params` — best-val model params with the
  reference's file names (``pretrained_model.ckpt``, ``adv_model.ckpt``,
  written as Orbax checkpoint directories);
* :func:`save_state` / :func:`load_state` — the FULL :class:`TrainState`
  (params + all three Adam states + step counters + temperature + PRNG key),
  enabling step-granular ``--resume``.
"""

from __future__ import annotations

import os
from typing import Any

import jax
import numpy as np


def _tree_to_numpy(tree):
    return jax.tree_util.tree_map(lambda x: np.asarray(x), tree)


def save_params(path: str, params: Any):
    """Save a params pytree (Orbax StandardCheckpointer)."""
    import orbax.checkpoint as ocp

    path = os.path.abspath(path)
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(path, _tree_to_numpy(params), force=True)
    ckptr.wait_until_finished()


def load_params(path: str, target: Any):
    """Restore a params pytree shaped like ``target``."""
    import orbax.checkpoint as ocp

    ckptr = ocp.StandardCheckpointer()
    return ckptr.restore(os.path.abspath(path), target=target)


def save_state(path: str, state):
    """Save the full TrainState."""
    save_params(path, state)


def load_state(path: str, template):
    """Restore a full TrainState shaped like ``template`` (built with the
    same config via :func:`create_train_state`)."""
    return load_params(path, template)
