"""Sharding: mesh parsing, dp/tp placement, sharded-step == single-device."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import PartitionSpec as P

from gan_image_captioning_tpu.config import Config
from gan_image_captioning_tpu.data.loader import Batcher
from gan_image_captioning_tpu.data.synthetic import SyntheticCaptions
from gan_image_captioning_tpu.parallel.mesh import make_mesh, parse_mesh_spec
from gan_image_captioning_tpu.parallel.sharding import (
    shard_batch, shard_train_state)
from gan_image_captioning_tpu.train.state import create_train_state
from gan_image_captioning_tpu.train.steps import make_adv_step, make_mle_step


def small_config(**kw):
    ds = SyntheticCaptions("train", num_items=64)
    base = dict(vocab_size=ds.vocab_size, gen_embed_dim=16, gen_hidden_dim=32,
                max_seq_len=9, disc_embed_dim=8, disc_num_rep=4,
                disc_filter_sizes=(2, 3), disc_num_filters=(16, 16),
                pre_train_batch_size=16, adv_train_batch_size=16)
    base.update(kw)
    return Config(**base), ds


def _one_batch(cfg, ds):
    return next(iter(Batcher(ds, cfg.pre_train_batch_size, cfg.seq_len,
                             shuffle=False, num_workers=1, drop_last=True)))


def test_parse_mesh_spec():
    assert parse_mesh_spec("", 8) == (("data",), (8,))
    assert parse_mesh_spec("data:4,model:2", 8) == (("data", "model"), (4, 2))
    assert parse_mesh_spec("data:-1,model:2", 8) == (("data", "model"), (4, 2))
    with pytest.raises(ValueError):
        parse_mesh_spec("data:3,model:2", 8)
    with pytest.raises(ValueError):
        parse_mesh_spec("data:-1,model:-1", 8)


def test_shard_placement(devices8):
    cfg, ds = small_config(vocab_size=64)  # divisible by model axis
    mesh = make_mesh("data:4,model:2", devices8)
    state = create_train_state(cfg, jax.random.PRNGKey(0))
    sharded = shard_train_state(state, mesh)
    embed_sharding = sharded.gen_params["decoder"]["embed"].sharding
    assert embed_sharding.spec == P("model", None)
    lstm_sharding = sharded.gen_params["decoder"]["lstm"][0]["w_ih"].sharding
    assert lstm_sharding.spec == P()
    disc_emb = sharded.disc_params["embeddings"]["w"].sharding
    assert disc_emb.spec == P(None, "model")
    # Adam mu mirrors its param spec
    adam = sharded.gen_opt_state[1][0]
    assert adam.mu["decoder"]["embed"].sharding.spec == P("model", None)

    batch = shard_batch(_one_batch(cfg, ds), mesh)
    assert batch["captions"].sharding.spec == P("data", None)


@pytest.mark.parametrize("mesh_spec", ["data:8", "data:4,model:2", "data:2,model:4"])
def test_sharded_step_equals_single_device(devices8, mesh_spec):
    """GSPMD-partitioned fused steps must reproduce single-device numerics."""
    cfg, ds = small_config(vocab_size=64)
    batch = _one_batch(cfg, ds)

    state_ref = create_train_state(cfg, jax.random.PRNGKey(0))
    mle = make_mle_step(cfg)
    adv = make_adv_step(cfg)
    state_ref, m_ref = mle(state_ref, batch)
    state_ref, a_ref = adv(state_ref, batch, 2.0)

    mesh = make_mesh(mesh_spec, devices8)
    state_sh = shard_train_state(create_train_state(cfg, jax.random.PRNGKey(0)),
                                 mesh)
    sharded_batch = shard_batch(batch, mesh)
    # NamedSharding-placed operands carry the mesh; no ambient context needed.
    state_sh, m_sh = mle(state_sh, sharded_batch)
    state_sh, a_sh = adv(state_sh, sharded_batch, 2.0)

    np.testing.assert_allclose(float(m_ref["gen_pretrain_loss"]),
                               float(m_sh["gen_pretrain_loss"]), rtol=2e-5)
    np.testing.assert_allclose(float(a_ref["gen_adv_loss"]),
                               float(a_sh["gen_adv_loss"]), rtol=2e-4, atol=2e-5)
    np.testing.assert_allclose(float(a_ref["disc_adv_loss"]),
                               float(a_sh["disc_adv_loss"]), rtol=2e-4, atol=2e-5)
    # updated params match too (same trajectory under sharding)
    w_ref = np.asarray(state_ref.gen_params["decoder"]["linear"]["w"])
    w_sh = np.asarray(jax.device_get(state_sh.gen_params["decoder"]["linear"]["w"]))
    np.testing.assert_allclose(w_ref, w_sh, atol=1e-5)


def test_sharded_conditional_step(devices8):
    """Conditional (image encoder) train step under dp sharding: images
    shard over the data axis through the conv stack."""
    from gan_image_captioning_tpu.data.loader import make_batch
    import numpy as np

    ds_imgs = [np.random.RandomState(s).randn(3, 32, 32).astype(np.float32)
               for s in range(8)]
    caps = [np.arange(4, 9 + (s % 3)) for s in range(8)]
    cfg, _ = small_config(vocab_size=64)
    cfg = cfg.replace(conditional_gan=1, image_size=32,
                      pre_train_batch_size=8)
    batch = make_batch(caps, ds_imgs, cfg.seq_len)

    state_ref = create_train_state(cfg, jax.random.PRNGKey(0))
    mle = make_mle_step(cfg)
    state_ref, m_ref = mle(state_ref, batch)

    mesh = make_mesh("data:4,model:2", devices8)
    state_sh = shard_train_state(create_train_state(cfg, jax.random.PRNGKey(0)),
                                 mesh)
    state_sh, m_sh = mle(state_sh, shard_batch(batch, mesh))
    np.testing.assert_allclose(float(m_ref["gen_pretrain_loss"]),
                               float(m_sh["gen_pretrain_loss"]), rtol=2e-4)


def test_tp_sharded_greedy_decode(devices8):
    """Greedy decode with vocab-dim tensor parallelism == single device
    (the projection/argmax compute sharded over 'model')."""
    from gan_image_captioning_tpu.eval import decode as dec_lib
    from gan_image_captioning_tpu.parallel.sharding import generator_param_spec
    from jax.sharding import NamedSharding

    cfg, _ = small_config(vocab_size=64)
    from gan_image_captioning_tpu.models import api

    params = api.init_generator(jax.random.PRNGKey(0), cfg)
    feats = jax.random.normal(jax.random.PRNGKey(1), (4, cfg.gen_embed_dim))
    ids_ref = dec_lib.greedy(params, feats, cfg)

    mesh = make_mesh("model:2", devices8[:2])
    spec = generator_param_spec(params, mesh)
    params_sh = jax.tree_util.tree_map(
        lambda x, s: jax.device_put(x, NamedSharding(mesh, s)), params, spec)
    feats_sh = jax.device_put(feats, NamedSharding(mesh, P()))
    ids_sh = jax.jit(lambda p, f: dec_lib.greedy(p, f, cfg))(params_sh,
                                                             feats_sh)
    np.testing.assert_array_equal(np.asarray(ids_ref),
                                  np.asarray(jax.device_get(ids_sh)))


def test_sequence_parallel_transformer_mle(devices8):
    """GSPMD sequence parallelism: transformer MLE step with block
    activations constrained to (data, sp) reproduces single-device numerics
    (XLA inserts the attention all-gathers)."""
    from gan_image_captioning_tpu.models import transformer as tf_lib
    from jax.sharding import NamedSharding

    ds = SyntheticCaptions("train", num_items=16)
    cfg = Config(vocab_size=64, gen_arch="transformer", gen_embed_dim=16,
                 gen_hidden_dim=32, gen_num_layers=2, gen_num_heads=4,
                 max_seq_len=10, disc_embed_dim=8, disc_num_rep=4,
                 disc_filter_sizes=(2,), disc_num_filters=(8,),
                 pre_train_batch_size=8)
    batch = next(iter(Batcher(ds, 8, cfg.seq_len, num_workers=1,
                              drop_last=True)))

    state_ref = create_train_state(cfg, jax.random.PRNGKey(0))
    mle = make_mle_step(cfg)
    state_ref, m_ref = mle(state_ref, batch)

    mesh = make_mesh("data:2,sp:2", devices8[:4])
    try:
        tf_lib.set_activation_sharding(NamedSharding(mesh, P("data", "sp", None)))
        state_sh = create_train_state(cfg, jax.random.PRNGKey(0))
        state_sh = jax.tree_util.tree_map(
            lambda x: jax.device_put(x, NamedSharding(mesh, P())), state_sh)
        batch_sh = {k: jax.device_put(np.asarray(v),
                                      NamedSharding(mesh, P(
                                          "data", *([None] * (np.asarray(v).ndim - 1)))))
                    for k, v in batch.items()}
        mle_sh = make_mle_step(cfg)
        state_sh, m_sh = mle_sh(state_sh, batch_sh)
    finally:
        tf_lib.set_activation_sharding(None)

    np.testing.assert_allclose(float(m_ref["gen_pretrain_loss"]),
                               float(m_sh["gen_pretrain_loss"]), rtol=2e-5)
    w_ref = np.asarray(state_ref.gen_params["decoder"]["linear"]["w"])
    w_sh = np.asarray(jax.device_get(state_sh.gen_params["decoder"]["linear"]["w"]))
    np.testing.assert_allclose(w_ref, w_sh, atol=2e-5)


def test_mesh_kernel_decode_falls_back(tmp_path):
    """--mesh data-only + --decode-impl kernel now KEEPS the kernel
    (shard_map over the data axis, round 3); the decoupled fallback
    remains for model/pp/sp meshes (tests/test_kernel_mesh.py covers
    both directions)."""
    from gan_image_captioning_tpu.config import Config
    from gan_image_captioning_tpu.data.synthetic import SyntheticCaptions
    from gan_image_captioning_tpu.train.instructor import GANInstructor

    config = Config(vocab_size=0, gen_embed_dim=16, gen_hidden_dim=32,
                    gen_num_layers=1, max_seq_len=8, disc_embed_dim=8,
                    disc_num_rep=4, disc_filter_sizes=(2, 3),
                    disc_num_filters=(4, 4), pre_train_batch_size=8,
                    adv_train_batch_size=8, pretrain_epochs=1, adv_epochs=1,
                    conditional_gan=0, mesh="data:8", decode_impl="kernel",
                    save_dir=str(tmp_path), model_dir=str(tmp_path),
                    dataset="synthetic")
    train = SyntheticCaptions("train", num_items=32, conditional=False)
    val = SyntheticCaptions("val", num_items=16, conditional=False)
    config = config.replace(vocab_size=train.vocab_size)
    inst = GANInstructor(config, train, val)
    assert inst.config.decode_impl == "kernel"
    inst._run()


def test_zero1_moment_placement(devices8):
    """--zero1: Adam mu/nu shard their first free dim over 'data'; params
    stay replicated; TP-sharded moments gain 'data' on the free dim."""
    from gan_image_captioning_tpu.parallel.sharding import (
        train_state_shardings)

    cfg, _ = small_config(vocab_size=64)
    mesh = make_mesh("data:4,model:2", devices8)
    state = shard_train_state(create_train_state(cfg, jax.random.PRNGKey(0)),
                              mesh, zero1=True)
    adam = state.pretrain_opt_state[1][0]
    # replicated param -> moment sharded over data on dim 0
    assert adam.mu["decoder"]["lstm"][0]["w_ih"].sharding.spec == P("data", None)
    assert adam.nu["decoder"]["lstm"][0]["w_ih"].sharding.spec == P("data", None)
    # TP-sharded [V, E] embedding -> moment P('model', 'data') (E=16 % 4 == 0)
    assert adam.mu["decoder"]["embed"].sharding.spec == P("model", "data")
    # params themselves replicated / TP only — never data-sharded
    assert state.gen_params["decoder"]["lstm"][0]["w_ih"].sharding.spec == P()
    assert state.gen_params["decoder"]["embed"].sharding.spec == P("model",
                                                                   None)
    # the shardings twin matches the placed state leaf-for-leaf
    ns = train_state_shardings(state, mesh, zero1=True)
    placed = jax.tree_util.tree_map(lambda x: x.sharding.spec, state)
    want = jax.tree_util.tree_map(lambda s: s.spec, ns)
    assert jax.tree_util.tree_all(
        jax.tree_util.tree_map(lambda a, b: a == b, placed, want))


def test_zero1_step_equals_single_device(devices8):
    """ZeRO-1-sharded fused steps == single-device numerics, and the output
    state keeps the pinned layout (moments sharded, params replicated)."""
    from gan_image_captioning_tpu.parallel.sharding import (
        train_state_shardings)
    from gan_image_captioning_tpu.train import steps as steps_mod

    cfg, ds = small_config(vocab_size=64)
    batch = _one_batch(cfg, ds)

    state_ref = create_train_state(cfg, jax.random.PRNGKey(0))
    mle = make_mle_step(cfg)
    adv = make_adv_step(cfg)
    state_ref, m_ref = mle(state_ref, batch)
    state_ref, a_ref = adv(state_ref, batch, 2.0)

    mesh = make_mesh("data:4,model:2", devices8)
    state_sh = shard_train_state(create_train_state(cfg, jax.random.PRNGKey(0)),
                                 mesh, zero1=True)
    steps_mod.set_state_shardings(
        train_state_shardings(state_sh, mesh, zero1=True))
    try:
        mle_z = make_mle_step(cfg)
        adv_z = make_adv_step(cfg)
        sharded_batch = shard_batch(batch, mesh)
        state_sh, m_sh = mle_z(state_sh, sharded_batch)
        state_sh, a_sh = adv_z(state_sh, sharded_batch, 2.0)
    finally:
        steps_mod.set_state_shardings(None)

    np.testing.assert_allclose(float(m_ref["gen_pretrain_loss"]),
                               float(m_sh["gen_pretrain_loss"]), rtol=2e-5)
    np.testing.assert_allclose(float(a_ref["gen_adv_loss"]),
                               float(a_sh["gen_adv_loss"]), rtol=2e-4,
                               atol=2e-5)
    np.testing.assert_allclose(float(a_ref["disc_adv_loss"]),
                               float(a_sh["disc_adv_loss"]), rtol=2e-4,
                               atol=2e-5)
    w_ref = np.asarray(state_ref.gen_params["decoder"]["linear"]["w"])
    w_sh = np.asarray(
        jax.device_get(state_sh.gen_params["decoder"]["linear"]["w"]))
    np.testing.assert_allclose(w_ref, w_sh, atol=2e-5)
    # output layout held: moments sharded over data, params replicated
    adam = state_sh.pretrain_opt_state[1][0]
    assert "data" in (adam.mu["decoder"]["lstm"][0]["w_ih"].sharding.spec
                      or ())
    assert state_sh.gen_params["decoder"]["lstm"][0]["w_ih"].sharding.spec \
        == P()


def test_zero1_instructor_e2e(tmp_path, devices8):
    """--zero1 through the full instructor: pretrain + adversarial epochs
    run under a data:8 mesh with sharded moments."""
    from gan_image_captioning_tpu.data.synthetic import SyntheticCaptions
    from gan_image_captioning_tpu.train.instructor import GANInstructor

    cfg, _ = small_config(vocab_size=0)
    cfg = cfg.replace(pretrain_epochs=1, adv_epochs=1, conditional_gan=0,
                      mesh="data:8", zero1=True, save_dir=str(tmp_path),
                      model_dir=str(tmp_path), dataset="synthetic",
                      pre_train_batch_size=16, adv_train_batch_size=16)
    train = SyntheticCaptions("train", num_items=32, conditional=False)
    val = SyntheticCaptions("val", num_items=16, conditional=False)
    cfg = cfg.replace(vocab_size=train.vocab_size)
    inst = GANInstructor(cfg, train, val)
    adam = inst.state.pretrain_opt_state[1][0]
    assert adam.mu["decoder"]["lstm"][0]["w_ih"].sharding.spec == P("data", None)
    inst._run()
