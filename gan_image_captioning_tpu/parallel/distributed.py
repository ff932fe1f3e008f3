"""Multi-host / multi-slice initialization.

The reference is single-process (SURVEY §2.3).  For pods and multi-slice
topologies the rebuild uses JAX's runtime: ``jax.distributed.initialize``
wires the hosts (DCN), after which ``jax.devices()`` spans the full
topology and the same mesh/sharding code paths scale — XLA routes
collectives over ICI within a slice and DCN across slices.

Call :func:`maybe_initialize` first thing in an entry point; it no-ops for
single-process runs (the common case in this repo's tests/bench)."""

from __future__ import annotations

import os


def maybe_initialize() -> bool:
    """Initialize jax.distributed when launched by a multi-host runner.

    Triggers on the standard coordinator env vars (set by GKE/TPU-VM
    launchers or by hand):
      JAX_COORDINATOR_ADDRESS, JAX_NUM_PROCESSES, JAX_PROCESS_ID
    Returns True if distributed init ran."""
    addr = os.environ.get("JAX_COORDINATOR_ADDRESS")
    if not addr:
        return False
    import jax

    jax.distributed.initialize(
        coordinator_address=addr,
        num_processes=int(os.environ["JAX_NUM_PROCESSES"]),
        process_id=int(os.environ["JAX_PROCESS_ID"]),
    )
    return True


def process_local_batch_slice(global_batch: int):
    """(start, size) of this host's slice of a globally-sharded batch —
    per-host data loading feeds only the local shard of the ``data`` axis."""
    import jax

    n = jax.process_count()
    idx = jax.process_index()
    per = global_batch // n
    return idx * per, per
