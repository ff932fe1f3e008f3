"""--mesh data:N must KEEP --decode-impl kernel (VERDICT r2 item 2).

The decode kernel, its fused-embed backward and the disc conv kernels are
wrapped in ``shard_map`` over the data axis (every tensor they touch is
batch-leading or replicated), so a data-only mesh runs them per-shard
instead of silently downgrading to the decoupled jnp path.

Equivalence is exact off-TPU: interpret-mode kernels stub the PRNG to
zeros, so the sharded and single-device steps see identical (zero) noise.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gan_image_captioning_tpu.config import Config
from gan_image_captioning_tpu.data.loader import make_batch
from gan_image_captioning_tpu.kernels import decode_sample as dsk
from gan_image_captioning_tpu.parallel.mesh import make_mesh
from gan_image_captioning_tpu.parallel.sharding import (shard_batch,
                                                        shard_train_state)
from gan_image_captioning_tpu.train.state import create_train_state
from gan_image_captioning_tpu.train.steps import make_adv_step

B, T, V, H, E, ED = 8, 6, 256, 32, 32, 16


def _config():
    return Config(vocab_size=V, gen_embed_dim=E, gen_hidden_dim=H,
                  gen_num_layers=2, max_seq_len=T - 2,
                  disc_embed_dim=ED, disc_num_rep=4,
                  disc_filter_sizes=(2, 3), disc_num_filters=(4, 4),
                  adv_train_batch_size=B, decode_impl="kernel")


def _batch(config):
    caps = [np.asarray([5 + i, 6, 7]) for i in range(B)]
    return {k: jnp.asarray(v)
            for k, v in make_batch(caps, None, config.seq_len).items()}


@pytest.mark.parametrize("disc_kernel", ["0", "2", "3"])
def test_sharded_kernel_step_equals_single_device(monkeypatch, disc_kernel):
    monkeypatch.setenv("GIC_KERNEL_INTERPRET", "1")
    monkeypatch.setenv("GIC_FUSE_EMBED", "1")
    if disc_kernel != "0":
        monkeypatch.setenv("GIC_DISC_KERNEL", disc_kernel)
    config = _config()
    batch = _batch(config)

    dsk.set_mesh(None)
    state = create_train_state(config, jax.random.PRNGKey(1008))
    s1, m1 = make_adv_step(config)(state, batch, 5.0)

    mesh = make_mesh("data:4", devices=jax.devices()[:4])
    dsk.set_mesh(mesh)
    try:
        state2 = create_train_state(config, jax.random.PRNGKey(1008))
        state2 = shard_train_state(state2, mesh)
        batch2 = shard_batch(batch, mesh)
        s2, m2 = make_adv_step(config)(state2, batch2, 5.0)
    finally:
        dsk.set_mesh(None)

    np.testing.assert_allclose(float(m1["gen_adv_loss"]),
                               float(m2["gen_adv_loss"]), atol=1e-5)
    np.testing.assert_allclose(float(m1["disc_adv_loss"]),
                               float(m2["disc_adv_loss"]), atol=1e-5)
    f1, _ = jax.tree_util.tree_flatten((s1.gen_params, s1.disc_params))
    f2, _ = jax.tree_util.tree_flatten((s2.gen_params, s2.disc_params))
    for a, b in zip(f1, f2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=2e-5, rtol=2e-4)


def test_instructor_keeps_kernel_on_data_mesh(tmp_path, monkeypatch):
    """The instructor must NOT downgrade decode_impl on a data-only mesh,
    must keep the kernel (vocab-parallel TP path) on a data×model mesh
    with divisible vocab (round 5), and must still downgrade for sp/pp."""
    monkeypatch.setenv("GIC_KERNEL_INTERPRET", "1")
    from gan_image_captioning_tpu.data.synthetic import SyntheticCaptions
    from gan_image_captioning_tpu.train.instructor import GANInstructor

    ds = SyntheticCaptions("train", num_items=8)
    base = dict(vocab_size=ds.vocab_size + (-ds.vocab_size % 8),
                gen_embed_dim=16,
                gen_hidden_dim=16, gen_num_layers=1, max_seq_len=6,
                disc_embed_dim=8, disc_num_rep=2, disc_filter_sizes=(2,),
                disc_num_filters=(4,), pre_train_batch_size=4,
                adv_train_batch_size=4, decode_impl="kernel")

    from gan_image_captioning_tpu.models import transformer as tf_lib
    from gan_image_captioning_tpu.train import steps as steps_mod

    try:
        cfg = Config(save_dir=str(tmp_path / "a"), mesh="data:8", **base)
        inst = GANInstructor(cfg, ds, ds, silent=True)
        assert inst.config.decode_impl == "kernel"
        assert dsk._data_mesh() is not None

        # data×model: the kernel stays, routed through the TP decode path
        cfg2 = Config(save_dir=str(tmp_path / "b"), mesh="data:4,model:2",
                      **base)
        inst2 = GANInstructor(cfg2, ds, ds, silent=True)
        assert inst2.config.decode_impl == "kernel"
        assert dsk._data_mesh() is None      # not the data-only replication
        assert dsk._tp_mesh() is not None    # ... but the TP path

        # sp still downgrades (the kernel holds the sequence whole)
        cfg3 = Config(save_dir=str(tmp_path / "c"), mesh="sp:8", **base)
        inst3 = GANInstructor(cfg3, ds, ds, silent=True)
        assert inst3.config.decode_impl == "decoupled"
        assert dsk._tp_mesh() is None and dsk._data_mesh() is None
    finally:
        # instructor construction installs process-wide mesh state (kernel
        # mesh, activation sharding for sp, state shardings) — clear ALL
        # of it or later test modules fail under a stale mesh
        dsk.set_mesh(None)
        tf_lib.set_activation_sharding(None)
        tf_lib.set_context_parallel(None)
        tf_lib.set_pipeline(None)
        steps_mod.set_state_shardings(None)


def _tp_mesh_or_skip(spec, n):
    if len(jax.devices()) < n:
        pytest.skip(f"needs {n} virtual devices")
    return make_mesh(spec, devices=jax.devices()[:n])


@pytest.mark.parametrize("spec,n", [("model:2", 2), ("data:2,model:2", 4),
                                    ("model:4", 4)])
def test_tp_greedy_decode_equals_single(monkeypatch, spec, n):
    """Vocab-parallel greedy decode (argmax-of-partials combine + masked
    psum embedding feedback) must match the single-device kernel exactly
    (interpret mode: both zero-noise)."""
    monkeypatch.setenv("GIC_KERNEL_INTERPRET", "1")
    from gan_image_captioning_tpu.models import generator as gen_lib

    config = _config()
    dec = gen_lib.init_decoder_params(jax.random.PRNGKey(3), config)
    feats = jax.random.normal(jax.random.PRNGKey(4), (B, E))

    dsk.set_mesh(None)
    ids1 = dsk.decode_sample(feats, dec["lstm"], dec["linear"]["w"],
                             dec["linear"]["b"], dec["embed"], T,
                             mode="greedy")
    mesh = _tp_mesh_or_skip(spec, n)
    dsk.set_mesh(mesh)
    try:
        ids2 = dsk.decode_sample(feats, dec["lstm"], dec["linear"]["w"],
                                 dec["linear"]["b"], dec["embed"], T,
                                 mode="greedy")
    finally:
        dsk.set_mesh(None)
    np.testing.assert_array_equal(np.asarray(ids1), np.asarray(ids2))


def test_tp_sample_resid_and_grads_equal_single(monkeypatch):
    """sample_resid under model:2 — ids, soft, residuals AND the manual
    VJP's gradients must match the single-device kernel (zero noise in
    interpret mode ⇒ deterministic)."""
    monkeypatch.setenv("GIC_KERNEL_INTERPRET", "1")
    from gan_image_captioning_tpu.models import generator as gen_lib

    config = _config()
    dec = gen_lib.init_decoder_params(jax.random.PRNGKey(3), config)
    feats = jax.random.normal(jax.random.PRNGKey(4), (B, E))
    probe = jax.random.normal(jax.random.PRNGKey(5), (T, B, V))

    def loss(dec_p):
        soft, _ = gen_lib._kernel_sample_soft(dec_p, feats,
                                              jnp.float32(2.0),
                                              jnp.int32(5), T)
        return jnp.sum(soft.astype(jnp.float32) * probe)

    dsk.set_mesh(None)
    (s1, i1), _ = gen_lib._kernel_sample_soft_fwd(dec, feats,
                                                  jnp.float32(2.0),
                                                  jnp.int32(5), T)
    g1 = jax.grad(loss)(dec)
    mesh = _tp_mesh_or_skip("model:2", 2)
    dsk.set_mesh(mesh)
    try:
        (s2, i2), _ = gen_lib._kernel_sample_soft_fwd(dec, feats,
                                                      jnp.float32(2.0),
                                                      jnp.int32(5), T)
        g2 = jax.grad(loss)(dec)
    finally:
        dsk.set_mesh(None)
    np.testing.assert_array_equal(np.asarray(i1), np.asarray(i2))
    np.testing.assert_allclose(np.asarray(s1, dtype=np.float32),
                               np.asarray(s2, dtype=np.float32), atol=1e-5)
    for a, b in zip(jax.tree_util.tree_leaves(g1),
                    jax.tree_util.tree_leaves(g2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=2e-5, rtol=2e-4)


def test_tp_adv_step_equals_single_device(monkeypatch):
    """The FULL adversarial step under a data:2,model:2 mesh with the
    kernel decode (TP path) must match the single-device step."""
    monkeypatch.setenv("GIC_KERNEL_INTERPRET", "1")
    config = _config()
    batch = _batch(config)

    dsk.set_mesh(None)
    state = create_train_state(config, jax.random.PRNGKey(1008))
    s1, m1 = make_adv_step(config)(state, batch, 5.0)

    mesh = _tp_mesh_or_skip("data:2,model:2", 4)
    dsk.set_mesh(mesh)
    try:
        state2 = create_train_state(config, jax.random.PRNGKey(1008))
        state2 = shard_train_state(state2, mesh)
        batch2 = shard_batch(batch, mesh)
        s2, m2 = make_adv_step(config)(state2, batch2, 5.0)
    finally:
        dsk.set_mesh(None)

    np.testing.assert_allclose(float(m1["gen_adv_loss"]),
                               float(m2["gen_adv_loss"]), atol=1e-5)
    np.testing.assert_allclose(float(m1["disc_adv_loss"]),
                               float(m2["disc_adv_loss"]), atol=1e-5)
    f1, _ = jax.tree_util.tree_flatten((s1.gen_params, s1.disc_params))
    f2, _ = jax.tree_util.tree_flatten((s2.gen_params, s2.disc_params))
    for a, b in zip(f1, f2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=2e-5, rtol=2e-4)
