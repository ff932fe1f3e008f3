"""Schedule sidecars: step-granular restart (SURVEY §5 checkpoint/resume).

A full ``TrainState`` checkpoint restores every DEVICE-side quantity
(params, the three Adam chains, step counters, temperature, PRNG key —
train/state.py), but not the HOST-side schedule position: which phase was
running, which epoch, how many train batches of it had completed, and the
data loaders' shuffle-epoch counters.  The reference has no resume at all
(``training.py:116-119,223-227`` write best-val ``state_dict``s that are
never read back); round-2 resume restored the TrainState but required the
user to hand-edit ``--pretrain-epochs``/``--adv-epochs`` to skip completed
phases, and an interrupt lost the in-progress epoch.

A *schedule sidecar* is a small JSON file written next to a resumable
checkpoint (``<ckpt>.schedule.json`` — a sibling, not inside the Orbax
directory) recording exactly that host state:

``phase``           "pretrain" | "scst" | "adv"
``epoch``           the epoch to (re-)enter in that phase
``batches_done``    train batches of that epoch already applied (the
                    TrainState reflects them); resume skips them via
                    ``Batcher.iter_from`` and replays the identical
                    seeded shuffle order for the rest of the epoch
``loader_epochs``   per-loader shuffle-epoch counters to restore BEFORE
                    the first resumed iteration (``Batcher._index_batches``
                    seeds its shuffle with ``seed + epoch``)
``pretrain_steps`` / ``adv_batch_steps`` / ``scst_step``
                    host-mirrored step counters
``best``            per-phase best-val loss / patience counters, so the
                    best-checkpoint selection and ``--early-stop-patience``
                    continue instead of resetting

Because the PRNG key threads through the TrainState (every step splits
``state.rng`` — train/steps.py), a resume that replays the same data order
from the same TrainState is BIT-EXACT: the resumed run's final parameters
equal the uninterrupted run's (tests/test_resume_schedule.py).
"""

from __future__ import annotations

import json
import os
from typing import Optional

SIDECAR_SUFFIX = ".schedule.json"

# order of the training phases (instructor._run): a sidecar at phase p means
# every earlier phase is complete and must be skipped on resume
PHASES = ("pretrain", "scst", "adv")


def sidecar_path(ckpt_path: str) -> str:
    return os.path.abspath(ckpt_path).rstrip("/") + SIDECAR_SUFFIX


def save_sidecar(ckpt_path: str, info: dict) -> str:
    """Write ``info`` next to ``ckpt_path`` (atomic rename — a torn sidecar
    must not corrupt a resume).  Multi-host: process 0 only, mirroring the
    checkpoint writer (train/checkpoint.py:save_params)."""
    if info.get("phase") not in PHASES:
        raise ValueError("sidecar phase must be one of %s, got %r"
                         % (PHASES, info.get("phase")))
    import jax

    if jax.process_count() > 1 and jax.process_index() != 0:
        return sidecar_path(ckpt_path)
    path = sidecar_path(ckpt_path)
    tmp = path + ".tmp"
    with open(tmp, "w") as f:
        json.dump(info, f, indent=1, sort_keys=True)
    os.replace(tmp, path)
    return path


def load_sidecar(ckpt_path: str) -> Optional[dict]:
    """The sidecar dict for ``ckpt_path``, or None if absent/unreadable
    (an unreadable sidecar degrades to params-only resume, never a crash)."""
    path = sidecar_path(ckpt_path)
    if not os.path.exists(path):
        return None
    try:
        with open(path) as f:
            info = json.load(f)
    except (OSError, ValueError):
        return None
    if info.get("phase") not in PHASES:
        return None
    return info


def phase_completed(info: Optional[dict], phase: str) -> bool:
    """True if ``phase`` finished before the sidecar was written (resume
    must skip it entirely)."""
    if info is None:
        return False
    return PHASES.index(info["phase"]) > PHASES.index(phase)


def phase_start(info: Optional[dict], phase: str) -> tuple:
    """``(start_epoch, start_batch)`` for ``phase`` under ``info``."""
    if info is None or info["phase"] != phase:
        return 0, 0
    return int(info.get("epoch", 0)), int(info.get("batches_done", 0))
