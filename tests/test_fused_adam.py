"""GIC_FUSED_ADAM=1 (one-pass clip→Adam→apply) must match the optax
chain bit-for-bit in structure and to float tolerance in values."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gan_image_captioning_tpu.config import Config
from gan_image_captioning_tpu.data.loader import make_batch
from gan_image_captioning_tpu.train.state import (create_train_state,
                                                  make_fused_update,
                                                  make_optimizer)
from gan_image_captioning_tpu.train.steps import make_adv_step


def _toy_config(**kw):
    return Config(vocab_size=64, gen_embed_dim=16, gen_hidden_dim=16,
                  gen_num_layers=2, max_seq_len=6, disc_embed_dim=8,
                  disc_num_rep=4, disc_filter_sizes=(3,),
                  disc_num_filters=(8,), adv_train_batch_size=4, **kw)


def test_fused_update_matches_optax_chain():
    config = _toy_config()
    tx = make_optimizer(config.gen_lr, config.clip_norm, config)
    fused = make_fused_update(config.gen_lr, config.clip_norm, config)
    assert fused is not None
    params = {"a": jnp.linspace(-1, 1, 48).reshape(6, 8),
              "b": [jnp.ones((5,)), {"c": jnp.full((3, 4), 0.5)}]}
    opt = tx.init(params)
    grads = jax.tree_util.tree_map(
        lambda p: jnp.sin(p * 13.0) * 7.0, params)  # norm > clip → clipping

    p_ref, o_ref = params, opt
    p_fused, o_fused = params, opt
    for _ in range(3):
        u, o_ref = tx.update(jax.tree_util.tree_map(jnp.copy, grads),
                             o_ref, p_ref)
        p_ref = jax.tree_util.tree_map(lambda p, du: p + du, p_ref, u)
        p_fused, o_fused = fused(grads, o_fused, p_fused)

    assert (jax.tree_util.tree_structure(o_ref)
            == jax.tree_util.tree_structure(o_fused))
    for a, b in zip(jax.tree_util.tree_leaves(p_ref),
                    jax.tree_util.tree_leaves(p_fused)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-6, rtol=1e-6)
    for a, b in zip(jax.tree_util.tree_leaves(o_ref),
                    jax.tree_util.tree_leaves(o_fused)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-6, rtol=1e-6)


def test_fused_update_bf16_mu(monkeypatch):
    monkeypatch.setenv("GIC_BF16_MU", "1")
    config = _toy_config()
    tx = make_optimizer(config.gen_lr, config.clip_norm, config)
    fused = make_fused_update(config.gen_lr, config.clip_norm, config)
    params = {"w": jnp.linspace(-2, 2, 64).reshape(8, 8)}
    opt = tx.init(params)
    grads = {"w": jnp.cos(params["w"]) * 3.0}
    u, o_ref = tx.update(grads, opt, params)
    p_ref = jax.tree_util.tree_map(lambda p, du: p + du, params, u)
    p_f, o_f = fused(grads, opt, params)
    assert o_f[1][0].mu["w"].dtype == jnp.bfloat16
    np.testing.assert_allclose(np.asarray(p_ref["w"]),
                               np.asarray(p_f["w"]), atol=1e-6)
    np.testing.assert_allclose(
        np.asarray(o_ref[1][0].mu["w"]).astype(np.float32),
        np.asarray(o_f[1][0].mu["w"]).astype(np.float32), atol=1e-6)


def test_fused_update_none_under_schedule():
    config = _toy_config(lr_schedule="cosine", lr_warmup_steps=2,
                         lr_decay_steps=10)
    assert make_fused_update(config.gen_lr, config.clip_norm, config) is None


def test_adv_step_matches_with_fused_adam(monkeypatch):
    """Full adversarial step: fused vs optax must produce the same state
    trajectory (3 steps, float32)."""
    config = _toy_config()
    caps = [jax.random.randint(jax.random.PRNGKey(i), (4,), 4, 60)
            for i in range(4)]
    batch = {k: jnp.asarray(v)
             for k, v in make_batch(caps, None, config.seq_len).items()}

    outs = {}
    for flag in ("0", "1"):
        monkeypatch.setenv("GIC_FUSED_ADAM", flag)
        state = create_train_state(config, jax.random.PRNGKey(0))
        step = make_adv_step(config, _raw=True)
        for _ in range(3):
            state, metrics = step(state, batch, 5.0)
        outs[flag] = (state, metrics)
        monkeypatch.delenv("GIC_FUSED_ADAM")

    sa, sb = outs["0"][0], outs["1"][0]
    for a, b in zip(jax.tree_util.tree_leaves(sa._replace(rng=None)),
                    jax.tree_util.tree_leaves(sb._replace(rng=None))):
        np.testing.assert_allclose(np.asarray(a, dtype=np.float32),
                                   np.asarray(b, dtype=np.float32),
                                   atol=2e-6, rtol=2e-6)
