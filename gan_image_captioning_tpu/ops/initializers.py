"""Weight-init strategies.

The reference re-initializes *every* parameter of a freshly built model with
either ``uniform(-0.05, 0.05)`` or ``normal(0, 1/sqrt(shape[0]))``
(generator ``generator.py:116-123``, discriminator ``discriminator.py:79-86``)
— including biases and, notably, the whole (non-pretrained) ResNet.  We apply
the same post-init sweep over a parameter pytree so weight statistics match.
"""

from __future__ import annotations

import math

import jax


def init_param_tree(rng, params, strategy: str = "uniform",
                    skip_predicate=None):
    """Re-initialize every array leaf of ``params``.

    Args:
      rng: PRNG key.
      params: parameter pytree (nested dicts of jnp arrays).
      strategy: ``uniform`` → U(-0.05, 0.05) (reference default,
        ``generator.py:120-121``); ``normal`` → N(0, 1/sqrt(shape[0]))
        (``generator.py:122-123``).  Anything else leaves params untouched
        (the reference's silent fall-through for unknown strategies).
      skip_predicate: optional ``f(path, leaf) -> bool``; leaves for which it
        returns True keep their original values (used for frozen backbones
        and non-trainable stats like BatchNorm running moments, which torch
        marks ``requires_grad=False`` and the reference therefore skips,
        ``generator.py:118``).
    """
    if strategy not in ("uniform", "normal"):
        return params

    leaves, treedef = jax.tree_util.tree_flatten_with_path(params)
    keys = jax.random.split(rng, max(len(leaves), 1))
    new_leaves = []
    for (path, leaf), key in zip(leaves, keys):
        if (not hasattr(leaf, "shape") or leaf.ndim == 0
                or (skip_predicate is not None and skip_predicate(path, leaf))):
            new_leaves.append(leaf)
            continue
        if strategy == "uniform":
            new = jax.random.uniform(key, leaf.shape, leaf.dtype, -0.05, 0.05)
        else:
            stddev = 1.0 / math.sqrt(leaf.shape[0])
            new = stddev * jax.random.normal(key, leaf.shape, leaf.dtype)
        new_leaves.append(new)
    return jax.tree_util.tree_unflatten(
        treedef, [l for l in new_leaves])
