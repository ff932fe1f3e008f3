"""--steps-per-call: K scanned train steps == K sequential step calls.

The multi-step program (train/steps.py:make_multi_step) exists to amortize
per-dispatch host RTT (reference dispatches one eager graph per batch,
training.py:53,136); it must not change the math: the scan body IS the
single-step function, consuming the same per-step batch, scalar and PRNG
stream, so params/metrics must match the sequential path bit-exactly.
"""

import jax
import numpy as np

from gan_image_captioning_tpu.config import Config
from gan_image_captioning_tpu.data.loader import Batcher, stack_batches
from gan_image_captioning_tpu.data.synthetic import SyntheticCaptions
from gan_image_captioning_tpu.ops.temperature import get_fixed_temperature
from gan_image_captioning_tpu.train.state import create_train_state
from gan_image_captioning_tpu.train.steps import (
    make_adv_step, make_mle_step, make_multi_step)


def small_config(**kw):
    ds = SyntheticCaptions("train", num_items=64)
    base = dict(vocab_size=ds.vocab_size, gen_embed_dim=16, gen_hidden_dim=32,
                max_seq_len=9, disc_embed_dim=8, disc_num_rep=4,
                disc_filter_sizes=(2, 3), disc_num_filters=(16, 16),
                pre_train_batch_size=8, adv_train_batch_size=8)
    base.update(kw)
    return Config(**base), ds


def _batches(cfg, ds, n):
    b = Batcher(ds, cfg.pre_train_batch_size, cfg.seq_len, shuffle=True,
                seed=0, num_workers=1, drop_last=True)
    out = []
    while len(out) < n:
        out.extend(list(b))
    return out[:n]


def _stack(batches):
    return {k: np.stack([b[k] for b in batches]) for k in batches[0]}


def _assert_trees_equal(a, b, atol=0.0):
    # atol > 0 admits one-ULP fp32 reassociation: the standalone jitted step
    # and the scan body compile to differently-fused programs (measured max
    # divergence 4e-9 over 4 adv steps); losses/counters still match exactly
    la, lb = jax.tree_util.tree_leaves(a), jax.tree_util.tree_leaves(b)
    assert len(la) == len(lb)
    for x, y in zip(la, lb):
        if atol:
            np.testing.assert_allclose(np.asarray(x), np.asarray(y),
                                       rtol=0.0, atol=atol)
        else:
            np.testing.assert_array_equal(np.asarray(x), np.asarray(y))


def test_multi_mle_matches_sequential():
    cfg, ds = small_config()
    batches = _batches(cfg, ds, 4)
    probs = np.asarray([0.0, 0.1, 0.2, 0.3], np.float32)

    seq_state = create_train_state(cfg, jax.random.PRNGKey(0))
    step = make_mle_step(cfg)
    seq_losses = []
    for b, p in zip(batches, probs):
        seq_state, m = step(seq_state, b, p)
        seq_losses.append(float(m["gen_pretrain_loss"]))

    multi_state = create_train_state(cfg, jax.random.PRNGKey(0))
    multi = make_multi_step(cfg, "mle")
    multi_state, metrics = multi(multi_state, _stack(batches), probs)

    np.testing.assert_array_equal(
        np.asarray(metrics["gen_pretrain_loss"], np.float32),
        np.asarray(seq_losses, np.float32))
    _assert_trees_equal(seq_state.gen_params, multi_state.gen_params)
    _assert_trees_equal(seq_state.pretrain_opt_state,
                        multi_state.pretrain_opt_state)
    np.testing.assert_array_equal(np.asarray(seq_state.rng),
                                  np.asarray(multi_state.rng))


def test_multi_adv_matches_sequential():
    cfg, ds = small_config(disc_train_freq=2)  # gating must survive the scan
    batches = _batches(cfg, ds, 4)
    temps = np.asarray(
        [get_fixed_temperature(cfg.temperature, (i + 1) / 4, cfg.adv_epochs,
                               cfg.temp_adpt) for i in range(4)], np.float32)

    seq_state = create_train_state(cfg, jax.random.PRNGKey(1))
    step = make_adv_step(cfg)
    seq_g, seq_d = [], []
    for b, t in zip(batches, temps):
        seq_state, m = step(seq_state, b, t)
        seq_g.append(float(m["gen_adv_loss"]))
        seq_d.append(float(m["disc_adv_loss"]))

    multi_state = create_train_state(cfg, jax.random.PRNGKey(1))
    multi = make_multi_step(cfg, "adv")
    multi_state, metrics = multi(multi_state, _stack(batches), temps)

    np.testing.assert_array_equal(
        np.asarray(metrics["gen_adv_loss"], np.float32),
        np.asarray(seq_g, np.float32))
    np.testing.assert_array_equal(
        np.asarray(metrics["disc_adv_loss"], np.float32),
        np.asarray(seq_d, np.float32))
    assert int(multi_state.gen_steps) == int(seq_state.gen_steps) == 4
    assert int(multi_state.disc_steps) == int(seq_state.disc_steps) == 2
    _assert_trees_equal(seq_state.gen_params, multi_state.gen_params,
                        atol=1e-7)
    _assert_trees_equal(seq_state.disc_params, multi_state.disc_params,
                        atol=1e-7)


def test_multi_step_under_data_mesh(devices8):
    """Stacked [K, B, ...] batches shard over the data axis at axis 1
    (parallel/sharding.py:shard_batch step_axis=True); the GSPMD-partitioned
    multi-step reproduces single-device numerics."""
    from gan_image_captioning_tpu.parallel.mesh import make_mesh
    from gan_image_captioning_tpu.parallel.sharding import (
        shard_batch, shard_train_state)
    from jax.sharding import PartitionSpec as P

    cfg, ds = small_config(vocab_size=64)
    batches = _batches(cfg, ds, 3)
    stacked = _stack(batches)
    temps = np.asarray([1.0, 2.0, 4.0], np.float32)
    multi = make_multi_step(cfg, "adv")

    state_ref = create_train_state(cfg, jax.random.PRNGKey(3))
    state_ref, m_ref = multi(state_ref, stacked, temps)

    mesh = make_mesh("data:8", devices8)
    state_sh = shard_train_state(create_train_state(cfg, jax.random.PRNGKey(3)),
                                 mesh)
    sh_batch = shard_batch(stacked, mesh, step_axis=True)
    assert sh_batch["captions"].sharding.spec == P(None, "data", None)
    state_sh, m_sh = multi(state_sh, sh_batch, temps)

    np.testing.assert_allclose(np.asarray(m_ref["gen_adv_loss"]),
                               np.asarray(m_sh["gen_adv_loss"]),
                               rtol=2e-4, atol=2e-5)
    np.testing.assert_allclose(np.asarray(m_ref["disc_adv_loss"]),
                               np.asarray(m_sh["disc_adv_loss"]),
                               rtol=2e-4, atol=2e-5)
    w_ref = np.asarray(state_ref.gen_params["decoder"]["linear"]["w"])
    w_sh = np.asarray(jax.device_get(
        state_sh.gen_params["decoder"]["linear"]["w"]))
    np.testing.assert_allclose(w_ref, w_sh, atol=1e-5)


def test_multi_step_composes_with_grad_accum():
    """--steps-per-call (outer scan over steps) composes with --grad-accum
    (inner scan over microbatches): K scanned accum-steps == K sequential
    accum-step calls."""
    cfg, ds = small_config(grad_accum=2, pre_train_batch_size=8)
    batches = _batches(cfg, ds, 2)
    probs = np.asarray([0.0, 0.0], np.float32)

    seq_state = create_train_state(cfg, jax.random.PRNGKey(4))
    step = make_mle_step(cfg)
    seq_losses = []
    for b, p in zip(batches, probs):
        seq_state, m = step(seq_state, b, p)
        seq_losses.append(float(m["gen_pretrain_loss"]))

    multi_state = create_train_state(cfg, jax.random.PRNGKey(4))
    multi = make_multi_step(cfg, "mle")
    multi_state, metrics = multi(multi_state, _stack(batches), probs)

    np.testing.assert_array_equal(
        np.asarray(metrics["gen_pretrain_loss"], np.float32),
        np.asarray(seq_losses, np.float32))
    _assert_trees_equal(seq_state.gen_params, multi_state.gen_params,
                        atol=1e-7)


def test_multi_adv_transformer_matches_sequential():
    """make_multi_step is arch-agnostic: the transformer G/D pair (dropout
    rng, KV-cache decode) scans identically to sequential stepping."""
    ds = SyntheticCaptions("train", num_items=64)
    cfg = Config(vocab_size=ds.vocab_size, gen_arch="transformer",
                 gen_embed_dim=16, gen_hidden_dim=32, gen_num_layers=2,
                 gen_num_heads=2, disc_arch="transformer", disc_embed_dim=8,
                 disc_num_heads=2, disc_hidden_dim=16, disc_num_layers=2,
                 max_seq_len=6, adv_train_batch_size=8,
                 pre_train_batch_size=8)
    batches = _batches(cfg, ds, 3)
    temps = np.asarray([1.0, 2.0, 3.0], np.float32)

    seq_state = create_train_state(cfg, jax.random.PRNGKey(2))
    step = make_adv_step(cfg)
    seq_g = []
    for b, t in zip(batches, temps):
        seq_state, m = step(seq_state, b, t)
        seq_g.append(float(m["gen_adv_loss"]))

    multi_state = create_train_state(cfg, jax.random.PRNGKey(2))
    multi = make_multi_step(cfg, "adv")
    multi_state, metrics = multi(multi_state, _stack(batches), temps)

    np.testing.assert_array_equal(
        np.asarray(metrics["gen_adv_loss"], np.float32),
        np.asarray(seq_g, np.float32))
    _assert_trees_equal(seq_state.gen_params, multi_state.gen_params,
                        atol=1e-6)
    _assert_trees_equal(seq_state.disc_params, multi_state.disc_params,
                        atol=1e-6)


def test_interrupt_resume_under_steps_per_call(tmp_path):
    """Interrupt granularity under --steps-per-call is one K-group: a
    SIGTERM landing mid-sweep checkpoints at the group boundary and the
    resumed run (same K) reproduces the uninterrupted multi-step
    trajectory bit-exactly (groups re-align because _sweep_break is always
    a multiple of K into the sweep)."""
    import os

    from gan_image_captioning_tpu.train.instructor import GANInstructor

    train = SyntheticCaptions("train", num_items=32)
    val = SyntheticCaptions("val", num_items=16)

    def make(tag, **kw):
        tmp = os.path.join(str(tmp_path), tag)
        cfg = Config(vocab_size=train.vocab_size, gen_embed_dim=12,
                     gen_hidden_dim=16, max_seq_len=9, disc_embed_dim=8,
                     disc_num_rep=4, disc_filter_sizes=(2, 3),
                     disc_num_filters=(6, 6), pre_train_batch_size=8,
                     pre_eval_batch_size=8, adv_train_batch_size=8,
                     adv_eval_batch_size=8, pretrain_epochs=1, adv_epochs=2,
                     num_workers=1, steps_per_call=3, save_dir=tmp,
                     model_dir=os.path.join(tmp, "models"),
                     log_file=os.path.join(tmp, "log"), **kw)
        return cfg, GANInstructor(cfg, train, val, silent=True)

    _, ia = make("a")
    ia._run()

    cfg_b, ib = make("b")
    orig = ib.adv_multi
    calls = [0]

    def wrapped(*args):
        out = orig(*args)
        calls[0] += 1
        if calls[0] == 1:            # interrupt after adv group 1 (3 of 4)
            ib._request_interrupt()
        return out

    ib.adv_multi = wrapped
    ib._run()
    ckpt = os.path.join(cfg_b.model_dir, "interrupt_state.ckpt")
    assert os.path.isdir(ckpt)
    import json

    side = json.load(open(ckpt + ".schedule.json"))
    assert side["phase"] == "adv" and side["epoch"] == 0
    assert side["batches_done"] == 3   # one K=3 group applied

    cfg_c, ic = make("b", resume=ckpt)
    ic._run()
    assert int(ic.state.gen_steps) == int(ia.state.gen_steps)
    _assert_trees_equal(ia.state.gen_params, ic.state.gen_params)
    _assert_trees_equal(ia.state.disc_params, ic.state.disc_params)


def test_instructor_steps_per_call_matches(tmp_path):
    """The full instructor schedule under --steps-per-call 3 (with a tail
    group: 4 batches/epoch → groups of 3+1) reproduces the per-batch path:
    same counters, same temperature, same final params (ULP-level — the
    scan and the standalone step compile to differently-fused programs)."""
    import os

    from gan_image_captioning_tpu.train.instructor import GANInstructor

    train = SyntheticCaptions("train", num_items=32)
    val = SyntheticCaptions("val", num_items=16)

    def run(tag, **kw):
        tmp = os.path.join(str(tmp_path), tag)
        cfg = Config(vocab_size=train.vocab_size, gen_embed_dim=12,
                     gen_hidden_dim=16, max_seq_len=9, disc_embed_dim=8,
                     disc_num_rep=4, disc_filter_sizes=(2, 3),
                     disc_num_filters=(6, 6), pre_train_batch_size=8,
                     pre_eval_batch_size=8, adv_train_batch_size=8,
                     adv_eval_batch_size=8, pretrain_epochs=1, adv_epochs=2,
                     num_workers=1, save_dir=tmp,
                     model_dir=os.path.join(tmp, "models"),
                     log_file=os.path.join(tmp, "log"), **kw)
        inst = GANInstructor(cfg, train, val, silent=True)
        inst._run()
        return inst

    ref = run("seq")
    multi = run("multi", steps_per_call=3)
    assert multi.pretrain_steps == ref.pretrain_steps == 4
    assert int(multi.state.gen_steps) == int(ref.state.gen_steps) == 8
    assert int(multi.state.disc_steps) == int(ref.state.disc_steps)
    np.testing.assert_allclose(float(multi.state.temperature),
                               float(ref.state.temperature), rtol=1e-6)
    _assert_trees_equal(ref.state.gen_params, multi.state.gen_params,
                        atol=1e-6)
    _assert_trees_equal(ref.state.disc_params, multi.state.disc_params,
                        atol=1e-6)


def test_stack_batches_groups_and_tail():
    batches = [{"a": np.full((2, 3), i)} for i in range(5)]
    groups = list(stack_batches(iter(batches), 2))
    assert [count for _, count in groups] == [2, 2, 1]
    np.testing.assert_array_equal(groups[0][0]["a"][1],
                                  np.full((2, 3), 1))
    assert groups[2][0]["a"].shape == (1, 2, 3)


def test_stack_batches_flushes_on_shape_change():
    # length-bucketed loaders emit mixed widths: a group must flush early
    batches = [{"a": np.zeros((2, 3))}, {"a": np.zeros((2, 5))},
               {"a": np.zeros((2, 5))}]
    groups = list(stack_batches(iter(batches), 2))
    assert [count for _, count in groups] == [1, 2]
    assert groups[0][0]["a"].shape == (1, 2, 3)
    assert groups[1][0]["a"].shape == (2, 2, 5)
