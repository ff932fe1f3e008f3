"""Async checkpointing (SURVEY §5: "async save, resume").

Saves must not block the step loop: ``save_params`` returns after the
device→host snapshot while the Orbax write runs on a background writer
thread; ``wait_for_checkpoints`` is the barrier.
"""

import os
import threading

import jax.numpy as jnp
import numpy as np
import pytest

from gan_image_captioning_tpu.train import checkpoint as ckpt_lib


def test_async_save_then_load_roundtrip(tmp_path):
    tree = {"w": jnp.arange(12.0).reshape(3, 4), "b": jnp.ones((7,))}
    path = os.path.join(str(tmp_path), "p.ckpt")
    ckpt_lib.save_params(path, tree)          # async
    ckpt_lib.wait_for_checkpoints()
    restored = ckpt_lib.load_params(path, tree)
    np.testing.assert_array_equal(np.asarray(restored["w"]), np.asarray(tree["w"]))
    np.testing.assert_array_equal(np.asarray(restored["b"]), np.asarray(tree["b"]))


def test_save_does_not_block_caller(tmp_path, monkeypatch):
    # Deterministic non-blocking proof: gate the background Orbax write on
    # an event; save_params must return while the write is still blocked.
    gate = threading.Event()
    started = threading.Event()
    real_write = ckpt_lib._orbax_write

    def gated_write(path, host_tree):
        started.set()
        assert gate.wait(30), "test gate never opened"
        real_write(path, host_tree)

    monkeypatch.setattr(ckpt_lib, "_orbax_write", gated_write)
    tree = {"w": jnp.zeros((4, 4))}
    path = os.path.join(str(tmp_path), "nb.ckpt")

    ckpt_lib.save_params(path, tree)  # must NOT wait for gated_write
    # caller-side: we are here while the writer is blocked
    assert started.wait(30)
    assert not os.path.isdir(path) or ckpt_lib.pending_checkpoints() >= 1
    assert ckpt_lib.pending_checkpoints() >= 1
    gate.set()
    ckpt_lib.wait_for_checkpoints()
    assert ckpt_lib.pending_checkpoints() == 0
    restored = ckpt_lib.load_params(path, tree)
    np.testing.assert_array_equal(np.asarray(restored["w"]), np.zeros((4, 4)))


def test_writer_error_surfaces_at_barrier(tmp_path, monkeypatch):
    def boom(path, host_tree):
        raise RuntimeError("disk on fire")

    monkeypatch.setattr(ckpt_lib, "_orbax_write", boom)
    ckpt_lib.save_params(os.path.join(str(tmp_path), "x.ckpt"), {"a": jnp.ones(2)})
    with pytest.raises(RuntimeError, match="disk on fire"):
        ckpt_lib.wait_for_checkpoints()
    # barrier drained the queue even on error
    assert ckpt_lib.pending_checkpoints() == 0


def test_sync_save_is_immediately_loadable(tmp_path):
    tree = {"w": jnp.full((2, 2), 3.0)}
    path = os.path.join(str(tmp_path), "s.ckpt")
    ckpt_lib.save_params(path, tree, sync=True)
    # no barrier needed — sync save has committed
    assert os.path.isdir(path)
    restored = ckpt_lib.load_params(path, tree)
    np.testing.assert_array_equal(np.asarray(restored["w"]), np.full((2, 2), 3.0))


def test_ordered_saves_last_writer_wins(tmp_path):
    # Same path saved twice: FIFO single-writer ordering means the second
    # tree is what loads back.
    path = os.path.join(str(tmp_path), "o.ckpt")
    ckpt_lib.save_params(path, {"v": jnp.zeros(3)})
    ckpt_lib.save_params(path, {"v": jnp.ones(3)})
    ckpt_lib.wait_for_checkpoints()
    restored = ckpt_lib.load_params(path, {"v": jnp.zeros(3)})
    np.testing.assert_array_equal(np.asarray(restored["v"]), np.ones(3))
