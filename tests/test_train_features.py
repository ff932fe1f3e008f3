"""LR schedules, gradient accumulation, and generator EMA
(train/state.py:lr_schedule_fn, --grad-accum, --ema-decay) — framework
features beyond the reference's fixed-LR single-batch loop
(training.py:24-26,194-199)."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gan_image_captioning_tpu.config import Config, build_parser, \
    config_from_args
from gan_image_captioning_tpu.data.synthetic import SyntheticCaptions
from gan_image_captioning_tpu.train import steps as steps_lib
from gan_image_captioning_tpu.train.state import (create_train_state,
                                                  lr_schedule_fn,
                                                  make_optimizer)


def _cfg(**kw):
    ds = SyntheticCaptions("train", num_items=16)
    base = dict(vocab_size=ds.vocab_size, gen_embed_dim=8, gen_hidden_dim=12,
                max_seq_len=6, disc_embed_dim=8, disc_num_rep=2,
                disc_filter_sizes=(2,), disc_num_filters=(6,),
                conditional_gan=0, num_workers=1)
    base.update(kw)
    return Config(**base)


def _batch(cfg, n=8, seed=0):
    rng = np.random.RandomState(seed)
    caps = rng.randint(4, cfg.vocab_size, size=(n, cfg.seq_len))
    caps[:, 0] = 1
    caps[:, -1] = 2
    return {"captions": jnp.asarray(caps, jnp.int32),
            "weights": jnp.ones((n,), jnp.float32)}


# ------------------------------------------------------------ LR schedules

def test_schedule_constant_default_is_plain_float():
    assert lr_schedule_fn(3e-4, None) == 3e-4
    assert lr_schedule_fn(3e-4, _cfg()) == 3e-4


def test_schedule_cosine_endpoints():
    cfg = _cfg(lr_schedule="cosine", lr_decay_steps=100, lr_min_ratio=0.1)
    s = lr_schedule_fn(1.0, cfg)
    assert float(s(0)) == pytest.approx(1.0)
    assert float(s(50)) == pytest.approx((1.0 + 0.1) / 2.0, rel=1e-5)
    assert float(s(100)) == pytest.approx(0.1, rel=1e-5)
    assert float(s(10_000)) == pytest.approx(0.1, rel=1e-5)   # clamps


def test_schedule_linear_and_exponential():
    lin = lr_schedule_fn(2.0, _cfg(lr_schedule="linear", lr_decay_steps=10,
                                   lr_min_ratio=0.5))
    assert float(lin(0)) == pytest.approx(2.0)
    assert float(lin(5)) == pytest.approx(1.5)
    assert float(lin(10)) == pytest.approx(1.0)
    exp = lr_schedule_fn(1.0, _cfg(lr_schedule="exponential",
                                   lr_decay_steps=100, lr_min_ratio=0.01))
    assert float(exp(0)) == pytest.approx(1.0)
    assert float(exp(100)) == pytest.approx(0.01, rel=1e-4)


def test_schedule_warmup_ramp():
    cfg = _cfg(lr_schedule="cosine", lr_warmup_steps=10, lr_decay_steps=20,
               lr_min_ratio=0.0)
    s = lr_schedule_fn(1.0, cfg)
    assert float(s(0)) == pytest.approx(0.0)
    assert float(s(5)) == pytest.approx(0.5)
    assert float(s(10)) == pytest.approx(1.0)
    assert float(s(30)) == pytest.approx(0.0, abs=1e-6)


def test_schedule_validation_errors():
    with pytest.raises(ValueError):
        lr_schedule_fn(1.0, _cfg(lr_schedule="cosine"))   # no decay horizon
    with pytest.raises(ValueError):
        lr_schedule_fn(1.0, _cfg(lr_schedule="exponential",
                                 lr_decay_steps=10, lr_min_ratio=0.0))


def test_scheduled_optimizer_steps_shrink():
    """A linear-to-zero schedule must make later Adam updates smaller for
    the same repeated gradient."""
    cfg = _cfg(lr_schedule="linear", lr_decay_steps=4, lr_min_ratio=0.0)
    tx = make_optimizer(0.1, 5.0, cfg)
    params = {"w": jnp.ones((3,))}
    grads = {"w": jnp.full((3,), 0.5)}
    opt = tx.init(params)
    sizes = []
    for _ in range(4):
        upd, opt = tx.update(grads, opt, params)
        sizes.append(float(jnp.abs(upd["w"]).max()))
    assert sizes[0] > sizes[1] > sizes[2] > sizes[3]


def test_cli_flags_reach_config():
    args = build_parser().parse_args(
        ["--lr-schedule", "cosine", "--lr-warmup-steps", "7",
         "--lr-decay-steps", "50", "--lr-min-ratio", "0.2",
         "--grad-accum", "4", "--ema-decay", "0.99"])
    args.vocab_size = 32
    cfg = config_from_args(args)
    assert cfg.lr_schedule == "cosine" and cfg.lr_warmup_steps == 7
    assert cfg.lr_decay_steps == 50 and cfg.lr_min_ratio == 0.2
    assert cfg.grad_accum == 4 and cfg.ema_decay == 0.99


# ----------------------------------------------------- gradient accumulation

def test_mle_grad_accum_matches_manual_mean():
    """--grad-accum 2 must equal: per-microbatch grads with the SAME derived
    rngs, averaged, then one Adam update (exact plumbing check)."""
    cfg = _cfg(grad_accum=2)
    state = create_train_state(cfg, jax.random.PRNGKey(3))
    batch = _batch(cfg, n=8)

    # the jitted step donates its input state — keep a host-side copy
    state = jax.tree_util.tree_map(np.asarray, state)
    step = steps_lib.make_mle_step(cfg)
    new_state, metrics = step(state, batch)

    # manual expectation, mirroring the step's rng derivation
    rng, rng_step = jax.random.split(state.rng)
    rngs = jax.random.split(rng_step, 2)
    micro = steps_lib._split_micro(batch, 2)
    grads_sum = None
    losses = []
    for i in range(2):
        mb = jax.tree_util.tree_map(lambda x: x[i], micro)
        (loss, _), g = jax.value_and_grad(
            lambda gp: steps_lib.mle_loss(cfg, gp, mb, rngs[i], train=True),
            has_aux=True)(state.gen_params)
        losses.append(float(loss))
        grads_sum = g if grads_sum is None else jax.tree_util.tree_map(
            jnp.add, grads_sum, g)
    grads = jax.tree_util.tree_map(lambda g: g / 2, grads_sum)
    tx = make_optimizer(cfg.pretrain_lr, cfg.clip_norm, cfg)
    upd, _ = tx.update(grads, state.pretrain_opt_state, state.gen_params)
    want = jax.tree_util.tree_map(lambda p, u: p + u, state.gen_params, upd)

    got_flat = jax.tree_util.tree_leaves(new_state.gen_params)
    want_flat = jax.tree_util.tree_leaves(want)
    for g, w in zip(got_flat, want_flat):
        np.testing.assert_allclose(np.asarray(g), np.asarray(w),
                                   rtol=2e-5, atol=2e-6)
    assert float(metrics["gen_pretrain_loss"]) == pytest.approx(
        float(np.mean(losses)), rel=1e-5)


def test_mle_grad_accum_rejects_indivisible_batch():
    cfg = _cfg(grad_accum=3)
    state = create_train_state(cfg, jax.random.PRNGKey(0))
    with pytest.raises(ValueError, match="grad-accum"):
        steps_lib.make_mle_step(cfg)(state, _batch(cfg, n=8))


def test_adv_grad_accum_runs_and_updates_both_models():
    cfg = _cfg(grad_accum=2)
    state = create_train_state(cfg, jax.random.PRNGKey(1))
    state = jax.tree_util.tree_map(np.asarray, state)   # step donates input
    step = steps_lib.make_adv_step(cfg)
    new_state, metrics = step(state, _batch(cfg, n=8), 1.0)
    for key in ("gen_adv_loss", "disc_adv_loss", "d_real_mean",
                "d_fake_mean"):
        assert np.isfinite(float(metrics[key])), key
    # both parameter sets moved
    g0 = jax.tree_util.tree_leaves(state.gen_params)[0]
    g1 = jax.tree_util.tree_leaves(new_state.gen_params)[0]
    d0 = jax.tree_util.tree_leaves(state.disc_params)[0]
    d1 = jax.tree_util.tree_leaves(new_state.disc_params)[0]
    assert not np.allclose(np.asarray(g0), np.asarray(g1))
    assert not np.allclose(np.asarray(d0), np.asarray(d1))
    assert int(new_state.gen_steps) == 1


# ----------------------------------------------------------------------- EMA

def test_ema_initialized_and_blended():
    cfg = _cfg(ema_decay=0.5)
    state = create_train_state(cfg, jax.random.PRNGKey(2))
    state = jax.tree_util.tree_map(np.asarray, state)   # step donates input
    # init: shadow == params
    e0 = jax.tree_util.tree_leaves(state.ema_gen_params)[0]
    p0 = jax.tree_util.tree_leaves(state.gen_params)[0]
    np.testing.assert_array_equal(np.asarray(e0), np.asarray(p0))

    new_state, _ = steps_lib.make_mle_step(cfg)(state, _batch(cfg, n=8))
    for e, p_old, p_new in zip(
            jax.tree_util.tree_leaves(new_state.ema_gen_params),
            jax.tree_util.tree_leaves(state.gen_params),
            jax.tree_util.tree_leaves(new_state.gen_params)):
        want = 0.5 * np.asarray(p_old) + 0.5 * np.asarray(p_new)
        np.testing.assert_allclose(np.asarray(e), want, rtol=1e-5, atol=1e-7)


def test_ema_off_keeps_none():
    cfg = _cfg()
    state = create_train_state(cfg, jax.random.PRNGKey(2))
    assert state.ema_gen_params is None
    new_state, _ = steps_lib.make_mle_step(cfg)(state, _batch(cfg, n=8))
    assert new_state.ema_gen_params is None


def test_instructor_writes_ema_checkpoints(tmp_path):
    from gan_image_captioning_tpu.train.instructor import GANInstructor

    cfg = _cfg(ema_decay=0.9, pretrain_epochs=1, adv_epochs=1,
               pre_train_batch_size=8, pre_eval_batch_size=8,
               adv_train_batch_size=8, adv_eval_batch_size=8,
               save_dir=os.path.join(str(tmp_path), "save"),
               model_dir=os.path.join(str(tmp_path), "save", "models"),
               log_file=os.path.join(str(tmp_path), "save", "log"))
    inst = GANInstructor(cfg, SyntheticCaptions("train", num_items=16),
                         SyntheticCaptions("val", num_items=8), silent=True)
    inst._run()
    assert os.path.isdir(os.path.join(cfg.model_dir,
                                      "pretrained_model_ema.ckpt"))
    assert os.path.isdir(os.path.join(cfg.model_dir, "adv_model_ema.ckpt"))
    # the EMA twin is loadable with the generator template and differs from
    # the raw params (it lags the trained weights)
    from gan_image_captioning_tpu.models import api
    from gan_image_captioning_tpu.train import checkpoint as ckpt_lib

    template = api.init_generator(jax.random.PRNGKey(0), cfg)
    ema = ckpt_lib.load_params(
        os.path.join(cfg.model_dir, "adv_model_ema.ckpt"), template)
    raw = inst.state.gen_params
    diffs = [float(np.abs(np.asarray(a) - np.asarray(b)).max())
             for a, b in zip(jax.tree_util.tree_leaves(ema),
                             jax.tree_util.tree_leaves(raw))]
    assert max(diffs) > 0.0
