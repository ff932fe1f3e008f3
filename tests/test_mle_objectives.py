"""--mle-objective {free, teacher, scheduled}: the LSTM MLE forward
(models/api.py:generator_mle_outputs, models/generator.py:scheduled_sample).

``free`` is the reference's actual pretrain objective (training.py:71);
``teacher`` is its unused Decoder.forward semantics (generator.py:39-53);
``scheduled`` (Bengio et al. 2015) interpolates: p=0 ≡ teacher, p=1 ≡ free.
"""

import jax
import jax.numpy as jnp
import numpy as np

from gan_image_captioning_tpu.config import Config, build_parser, \
    config_from_args
from gan_image_captioning_tpu.data.synthetic import SyntheticCaptions
from gan_image_captioning_tpu.models import api
from gan_image_captioning_tpu.models import generator as gen_lstm
from gan_image_captioning_tpu.train import steps as steps_lib


def _cfg(**kw):
    ds = SyntheticCaptions("train", num_items=16)
    base = dict(vocab_size=ds.vocab_size, gen_embed_dim=8, gen_hidden_dim=12,
                max_seq_len=6, conditional_gan=0)
    base.update(kw)
    return Config(**base)


def _setup(cfg, n=4, seed=0):
    params = api.init_generator(jax.random.PRNGKey(seed), cfg)
    rng = np.random.RandomState(seed)
    caps = rng.randint(4, cfg.vocab_size, size=(n, cfg.seq_len)).astype(
        np.int32)
    batch = {"captions": jnp.asarray(caps),
             "weights": jnp.ones((n,), jnp.float32)}
    cond, _ = api.generator_condition(cfg, params, batch, train=False)
    return params, batch, cond


def test_teacher_objective_uses_teacher_forced_pass():
    cfg = _cfg(mle_objective="teacher")
    params, batch, cond = _setup(cfg)
    got = api.generator_mle_outputs(params, cond, batch["captions"],
                                    jax.random.PRNGKey(1), cfg)
    want, _ = gen_lstm.teacher_forced(params["decoder"], cond["features"],
                                      batch["captions"], pretrain=True)
    np.testing.assert_allclose(np.asarray(got),
                               np.asarray(want[:, :cfg.seq_len]), rtol=1e-6)


def test_scheduled_p0_equals_teacher():
    cfg = _cfg(mle_objective="scheduled")
    params, batch, cond = _setup(cfg, seed=1)
    got = api.generator_mle_outputs(params, cond, batch["captions"],
                                    jax.random.PRNGKey(2), cfg,
                                    sample_prob=jnp.float32(0.0))
    want, _ = gen_lstm.teacher_forced(params["decoder"], cond["features"],
                                      batch["captions"], pretrain=True)
    np.testing.assert_allclose(np.asarray(got),
                               np.asarray(want[:, :cfg.seq_len]),
                               rtol=1e-5, atol=1e-6)


def test_scheduled_p1_equals_free_running():
    cfg_s = _cfg(mle_objective="scheduled")
    cfg_f = _cfg(mle_objective="free")
    params, batch, cond = _setup(cfg_s, seed=2)
    got = api.generator_mle_outputs(params, cond, batch["captions"],
                                    jax.random.PRNGKey(3), cfg_s,
                                    sample_prob=jnp.float32(1.0))
    want = api.generator_mle_outputs(params, cond, batch["captions"],
                                     jax.random.PRNGKey(3), cfg_f)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-6)


def test_scheduled_mid_p_differs_and_is_seed_deterministic():
    cfg = _cfg(mle_objective="scheduled")
    params, batch, cond = _setup(cfg, seed=3)
    a = api.generator_mle_outputs(params, cond, batch["captions"],
                                  jax.random.PRNGKey(4), cfg,
                                  sample_prob=jnp.float32(0.5))
    a2 = api.generator_mle_outputs(params, cond, batch["captions"],
                                   jax.random.PRNGKey(4), cfg,
                                   sample_prob=jnp.float32(0.5))
    teacher = api.generator_mle_outputs(params, cond, batch["captions"],
                                        jax.random.PRNGKey(4), cfg,
                                        sample_prob=jnp.float32(0.0))
    np.testing.assert_array_equal(np.asarray(a), np.asarray(a2))
    assert not np.allclose(np.asarray(a), np.asarray(teacher))


def test_mle_step_trains_under_each_objective():
    for objective in ("free", "teacher", "scheduled"):
        cfg = _cfg(mle_objective=objective)
        from gan_image_captioning_tpu.train.state import create_train_state

        state = create_train_state(cfg, jax.random.PRNGKey(5))
        state = jax.tree_util.tree_map(np.asarray, state)  # step donates
        _, batch, _ = _setup(cfg, n=8, seed=5)
        step = steps_lib.make_mle_step(cfg)
        new_state, metrics = step(state, batch, np.float32(0.5))
        assert np.isfinite(float(metrics["gen_pretrain_loss"])), objective
        p0 = jax.tree_util.tree_leaves(state.gen_params)[0]
        p1 = jax.tree_util.tree_leaves(new_state.gen_params)[0]
        assert not np.allclose(np.asarray(p0), np.asarray(p1)), objective


def test_cli_flags_and_config1_preset():
    args = build_parser().parse_args(["--mle-objective", "scheduled",
                                      "--ss-max-prob", "0.7"])
    args.vocab_size = 32
    cfg = config_from_args(args)
    assert cfg.mle_objective == "scheduled" and cfg.ss_max_prob == 0.7

    args = build_parser().parse_args(["--preset", "config1"])
    args.vocab_size = 32
    assert config_from_args(args).mle_objective == "teacher"
