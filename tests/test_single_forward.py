"""Single-forward adversarial gradients (GIC_SINGLE_FWD).

The fused adversarial step originally computed the two gradient sets from
two closures, each carrying its own forward, and relied on XLA CSE to merge
the identical forwards.  That holds for pure-XLA graphs but NOT for Pallas
custom-calls (Mosaic kernels never CSE): a real-chip trace of the flagship
step showed the decode kernel and every disc-conv bank kernel executing
twice per step.  train/steps.py `_single_forward_grads` restructures the
step as ONE `jax.vjp` over the joint `(g_loss, d_loss)` output, pulled back
twice — these tests pin that the restructure is a pure program-structure
change: losses, gradients and the post-Adam parameters match the
two-closure reference structure exactly (same functions, same PRNG
streams; reference semantics `training.py:150-169`).
"""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gan_image_captioning_tpu.config import Config
from gan_image_captioning_tpu.data.loader import make_batch
from gan_image_captioning_tpu.train import steps as steps_mod
from gan_image_captioning_tpu.train.state import create_train_state


def _tiny_config(**kw):
    base = dict(vocab_size=97, gen_embed_dim=16, gen_hidden_dim=24,
                gen_num_layers=2, max_seq_len=10, disc_embed_dim=16,
                disc_num_rep=4, disc_filter_sizes=(3, 4),
                disc_num_filters=(8, 8), adv_train_batch_size=6)
    base.update(kw)
    return Config(**base)


def _batch(config, n=6, with_images=False):
    rs = np.random.RandomState(7)
    caps = [rs.randint(4, config.vocab_size - 1, size=(7,)) for _ in range(n)]
    images = rs.rand(n, 3, 32, 32).astype(np.float32) if with_images else None
    return {k: jnp.asarray(v)
            for k, v in make_batch(caps, images, config.seq_len).items()}


def _one_step(config, batch, flag, env=()):
    old = {}
    sets = dict(env)
    sets["GIC_SINGLE_FWD"] = flag
    for k, v in sets.items():
        old[k] = os.environ.get(k)
        os.environ[k] = v
    try:
        state = create_train_state(config, jax.random.PRNGKey(0))
        step = steps_mod.make_adv_step(config)
        new_state, metrics = step(state, batch, 5.0)
        params = jax.device_get((new_state.gen_params, new_state.disc_params))
        return jax.device_get(metrics), params
    finally:
        for k, v in old.items():
            if v is None:
                os.environ.pop(k, None)
            else:
                os.environ[k] = v


def _assert_same(config, batch, env=(), atol=0.0):
    # "0" two-closure reference, "1" joint single pullback (default),
    # "2" two pullbacks (the r3c6 structure) — all three must agree.
    m0, p0 = _one_step(config, batch, "0", env)
    for flag in ("1", "2"):
        m1, p1 = _one_step(config, batch, flag, env)
        for k in m0:
            np.testing.assert_allclose(np.asarray(m0[k]), np.asarray(m1[k]),
                                       rtol=0, atol=atol,
                                       err_msg=f"{k} (mode {flag})")
        for a, b in zip(jax.tree_util.tree_leaves(p0),
                        jax.tree_util.tree_leaves(p1)):
            np.testing.assert_allclose(np.asarray(a, np.float32),
                                       np.asarray(b, np.float32),
                                       rtol=0, atol=atol,
                                       err_msg=f"mode {flag}")


def test_default_active():
    assert steps_mod._single_forward_active(_tiny_config())


def test_inactive_for_reinforce():
    cfg = _tiny_config(adv_objective="reinforce")
    assert not steps_mod._single_forward_active(cfg)


def test_float32_exact():
    cfg = _tiny_config()
    _assert_same(cfg, _batch(cfg))


def test_bfloat16_exact():
    cfg = _tiny_config(dtype="bfloat16")
    _assert_same(cfg, _batch(cfg))


def test_bf16_grad_boundary():
    cfg = _tiny_config(dtype="bfloat16")
    _assert_same(cfg, _batch(cfg), env={"GIC_BF16_GRADS": "1"})


def test_grad_accum():
    cfg = _tiny_config(grad_accum=2, adv_train_batch_size=6)
    _assert_same(cfg, _batch(cfg))


def test_conditional_mode():
    cfg = _tiny_config(conditional_gan=True, image_size=32)
    _assert_same(cfg, _batch(cfg, with_images=True))


@pytest.mark.parametrize("loss_type", ["rsgan", "hinge"])
def test_loss_variants(loss_type):
    # rsgan/hinge g_loss also touches d_real, so the pulled-back graph
    # reassociates float sums (weight grads verified bit-exact; the only
    # raw-grad deltas are ~3e-8 around exactly-zero bias grads) — Adam's
    # 1/sqrt(v) normalization amplifies that to ~1e-5 on the params.
    cfg = _tiny_config(adv_loss_type=loss_type)
    _assert_same(cfg, _batch(cfg), atol=1e-4)


def test_stabilization_tricks():
    cfg = _tiny_config(label_smoothing=0.1, noisy_labels=0.2)
    _assert_same(cfg, _batch(cfg))


def test_disc_train_freq_gating():
    cfg = _tiny_config(disc_train_freq=2)
    _assert_same(cfg, _batch(cfg))
