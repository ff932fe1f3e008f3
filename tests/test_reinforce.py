"""Policy-gradient (REINFORCE) adversarial objective with rollout rewards.

Covers BASELINE.json config 4's "adversarial training with rollout-based
rewards" — a capability the committed reference does NOT have (it uses the
Gumbel relaxation, generator.py:84-96); see train/reinforce.py.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gan_image_captioning_tpu.config import Config
from gan_image_captioning_tpu.models import api
from gan_image_captioning_tpu.train import reinforce
from gan_image_captioning_tpu.train.state import create_train_state
from gan_image_captioning_tpu.train.steps import make_adv_step


def small_config(**kw):
    base = dict(vocab_size=61, gen_embed_dim=12, gen_hidden_dim=16,
                gen_num_layers=1, max_seq_len=6, disc_embed_dim=8,
                disc_num_rep=4, disc_filter_sizes=(2, 3),
                disc_num_filters=(5, 5), adv_train_batch_size=4,
                adv_objective="reinforce")
    base.update(kw)
    return Config(**base)


def make_parts(config, seed=0):
    rng = jax.random.PRNGKey(seed)
    k1, k2, k3 = jax.random.split(rng, 3)
    gp = api.init_generator(k1, config)
    dp = api.init_discriminator(k2, config)
    caps = jax.random.randint(k3, (4, config.seq_len), 0, config.vocab_size)
    return gp, dp, {"captions": caps}


@pytest.mark.parametrize("rollout_num", [0, 2])
def test_reinforce_losses_finite_lstm(rollout_num):
    config = small_config(rollout_num=rollout_num, rollout_stride=3)
    gp, dp, batch = make_parts(config)
    g_loss, d_loss, aux = reinforce.reinforce_losses(
        config, gp, dp, batch, jax.random.PRNGKey(5), 1.0, train=False)
    assert np.isfinite(float(g_loss)) and np.isfinite(float(d_loss))
    assert aux["gen_ids"].shape == batch["captions"].shape
    assert 0.0 <= float(aux["mean_reward"]) <= 1.0


def test_reinforce_transformer_pair():
    """Config 4's pairing: transformer generator + transformer disc."""
    config = small_config(gen_arch="transformer", disc_arch="transformer",
                          gen_num_heads=2, disc_num_heads=2,
                          disc_hidden_dim=16, disc_num_layers=1,
                          gen_num_layers=1, rollout_num=2, rollout_stride=4)
    gp, dp, batch = make_parts(config, seed=1)
    g_loss, d_loss, aux = reinforce.reinforce_losses(
        config, gp, dp, batch, jax.random.PRNGKey(6), 1.0, train=False)
    assert np.isfinite(float(g_loss)) and np.isfinite(float(d_loss))


def test_position_reward_index_mapping():
    """Position t (prefix length t+1) maps to the first stride point ≥ t+1,
    and the tail past the last stride point to the full-sequence row."""
    # t_len=9, stride=3 → positions [3, 6], full-seq row = 2
    idx = np.asarray(reinforce.position_reward_index(9, 3, 2))
    np.testing.assert_array_equal(idx, [0, 0, 0, 1, 1, 1, 2, 2, 2])
    # stride not dividing t_len: t_len=7, stride=3 → positions [3, 6]
    idx = np.asarray(reinforce.position_reward_index(7, 3, 2))
    np.testing.assert_array_equal(idx, [0, 0, 0, 1, 1, 1, 2])
    # stride larger than sequence → every position uses the full-seq score
    idx = np.asarray(reinforce.position_reward_index(4, 8, 0))
    np.testing.assert_array_equal(idx, [0, 0, 0, 0])


def test_rollout_rewards_piecewise_constant():
    """Rewards are constant within a stride segment (near-exact — XLA may
    recompute the gathered rows through differently-fused reductions) and
    bounded in [0, 1] (sigmoid rewards)."""
    config = small_config(rollout_num=2, rollout_stride=3, max_seq_len=7)
    gp, dp, batch = make_parts(config, seed=2)
    cond, _ = api.generator_condition(config, gp, batch, train=False)
    ids = batch["captions"]
    r = reinforce.rollout_rewards(config, gp, dp, cond, ids,
                                  jax.random.PRNGKey(7))
    r = np.asarray(r)
    assert r.shape == ids.shape
    assert (r >= 0.0).all() and (r <= 1.0).all()
    t_len = ids.shape[1]  # 9; stride points at 3, 6 → segments [0:3),[3:6),[6:9)
    for seg_start in range(0, t_len, 3):
        seg = r[:, seg_start:seg_start + 3]
        np.testing.assert_allclose(
            seg, np.broadcast_to(seg[:, :1], seg.shape),
            rtol=1e-4, atol=1e-6)


def test_rollout_num_zero_is_terminal_reward():
    config = small_config(rollout_num=0)
    gp, dp, batch = make_parts(config, seed=3)
    cond, _ = api.generator_condition(config, gp, batch, train=False)
    ids = batch["captions"]
    r = np.asarray(reinforce.rollout_rewards(config, gp, dp, cond, ids,
                                             jax.random.PRNGKey(8)))
    # one score broadcast over time (tiny tolerance: XLA may recompute the
    # broadcast source through differently-fused reductions)
    np.testing.assert_allclose(r, np.broadcast_to(r[:, :1], r.shape),
                               rtol=1e-5, atol=1e-7)


def test_sequence_log_probs_match_teacher_forced():
    from gan_image_captioning_tpu.models import generator as gen_lstm

    config = small_config()
    gp, dp, batch = make_parts(config, seed=4)
    cond, _ = api.generator_condition(config, gp, batch, train=False)
    ids = batch["captions"]
    logp = reinforce.sequence_log_probs(config, gp, cond, ids)
    # oracle: full teacher-forced logits → log_softmax → gather
    logits, _ = gen_lstm.teacher_forced(gp["decoder"], cond["features"],
                                        ids, pretrain=True)
    ref = jax.nn.log_softmax(logits[:, :ids.shape[1]], axis=-1)
    ref = jnp.take_along_axis(ref, ids[..., None], axis=-1)[..., 0]
    np.testing.assert_allclose(np.asarray(logp), np.asarray(ref),
                               rtol=1e-5, atol=1e-6)


@pytest.mark.parametrize("baseline", ["greedy", "batch_mean"])
def test_full_reinforce_adv_step(baseline):
    """One fused adversarial step end-to-end: params move, losses finite."""
    config = small_config(rollout_num=2, rollout_stride=4,
                          rl_baseline=baseline)
    state = create_train_state(config, jax.random.PRNGKey(9))
    caps = jax.random.randint(jax.random.PRNGKey(10),
                              (config.adv_train_batch_size, config.seq_len),
                              0, config.vocab_size)
    step = make_adv_step(config)
    # materialize BEFORE the step: the fused step donates the state buffers
    before = np.asarray(jax.tree_util.tree_leaves(state.gen_params)[0])
    state, metrics = step(state, {"captions": caps}, 1.0)
    after = jax.tree_util.tree_leaves(state.gen_params)[0]
    assert np.isfinite(float(metrics["gen_adv_loss"]))
    assert np.isfinite(float(metrics["disc_adv_loss"]))
    assert not np.allclose(np.asarray(before), np.asarray(after))
