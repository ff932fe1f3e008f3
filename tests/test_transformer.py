"""Transformer generator + discriminators (the report-only variants)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gan_image_captioning_tpu.config import Config
from gan_image_captioning_tpu.models import api
from gan_image_captioning_tpu.models import discriminator_transformer as disc_tf
from gan_image_captioning_tpu.models import transformer as tf_lib


def tf_config(**kw):
    base = dict(vocab_size=43, gen_embed_dim=16, gen_hidden_dim=32,
                gen_num_layers=2, gen_num_heads=4, max_seq_len=8,
                gen_arch="transformer", disc_arch="transformer",
                disc_embed_dim=8, disc_hidden_dim=16, disc_num_heads=4,
                disc_num_layers=2)
    base.update(kw)
    return Config(**base)


def test_kv_cache_decode_matches_parallel():
    """Greedy scan decode (KV cache) must match position-by-position what the
    parallel teacher-forced pass predicts on its own output — the KV-cache
    correctness invariant."""
    cfg = tf_config()
    params = api.init_generator(jax.random.PRNGKey(0), cfg)
    B = 3
    feats = jax.random.normal(jax.random.PRNGKey(1), (B, cfg.gen_embed_dim))

    logits_scan, ids = tf_lib.sample(params["decoder"], feats,
                                     jax.random.PRNGKey(2), 1.0, cfg.seq_len,
                                     pretrain=True, config=cfg)
    # teacher-force the sampled ids through the parallel path
    logits_par = tf_lib.teacher_forced(params["decoder"], feats, ids, cfg,
                                       pretrain=True)
    np.testing.assert_allclose(np.asarray(logits_scan),
                               np.asarray(logits_par[:, :cfg.seq_len]),
                               atol=2e-4)
    # and the greedy ids are self-consistent
    np.testing.assert_array_equal(
        np.asarray(ids), np.asarray(jnp.argmax(logits_scan, -1)))


def test_causal_mask_no_future_leak():
    """Changing caption token t must not affect logits at positions <= t."""
    cfg = tf_config()
    params = api.init_generator(jax.random.PRNGKey(0), cfg)
    B, T = 2, cfg.seq_len
    feats = jax.random.normal(jax.random.PRNGKey(1), (B, cfg.gen_embed_dim))
    caps = jax.random.randint(jax.random.PRNGKey(2), (B, T), 0, cfg.vocab_size)
    logits_a = tf_lib.teacher_forced(params["decoder"], feats, caps, cfg)
    caps_b = caps.at[:, 5].set((caps[:, 5] + 1) % cfg.vocab_size)
    logits_b = tf_lib.teacher_forced(params["decoder"], feats, caps_b, cfg)
    # positions 0..5 see only tokens < their index → unchanged
    np.testing.assert_allclose(np.asarray(logits_a[:, :6]),
                               np.asarray(logits_b[:, :6]), atol=1e-5)
    assert not np.allclose(np.asarray(logits_a[:, 6]),
                           np.asarray(logits_b[:, 6]))


def test_padding_mask_blocks_pad_keys():
    cfg = tf_config()
    params = api.init_generator(jax.random.PRNGKey(0), cfg)
    B, T = 2, cfg.seq_len
    feats = jax.random.normal(jax.random.PRNGKey(1), (B, cfg.gen_embed_dim))
    caps = jax.random.randint(jax.random.PRNGKey(2), (B, T), 4, cfg.vocab_size)
    lengths = jnp.asarray([4, 6])
    logits_a = tf_lib.teacher_forced(params["decoder"], feats, caps, cfg,
                                     lengths=lengths)
    # mutate tokens beyond the length: masked keys must not change outputs
    # at positions that can only attend within the valid prefix
    caps_b = caps.at[0, 6].set((caps[0, 6] + 3) % cfg.vocab_size)
    logits_b = tf_lib.teacher_forced(params["decoder"], feats, caps_b, cfg,
                                     lengths=lengths)
    np.testing.assert_allclose(np.asarray(logits_a[0, :5]),
                               np.asarray(logits_b[0, :5]), atol=1e-5)


def test_cross_attention_context_changes_output():
    cfg = tf_config()
    params = api.init_generator(jax.random.PRNGKey(0), cfg)
    B = 2
    feats = jax.random.normal(jax.random.PRNGKey(1), (B, cfg.gen_embed_dim))
    ctx_a = jax.random.normal(jax.random.PRNGKey(2), (B, 5, cfg.gen_embed_dim))
    ctx_b = ctx_a + 1.0
    outs_a, _ = tf_lib.sample(params["decoder"], feats, jax.random.PRNGKey(3),
                              1.0, cfg.seq_len, True, cfg, context=ctx_a)
    outs_a2, _ = tf_lib.sample(params["decoder"], feats, jax.random.PRNGKey(3),
                               1.0, cfg.seq_len, True, cfg, context=ctx_a)
    outs_b, _ = tf_lib.sample(params["decoder"], feats, jax.random.PRNGKey(3),
                              1.0, cfg.seq_len, True, cfg, context=ctx_b)
    np.testing.assert_allclose(np.asarray(outs_a), np.asarray(outs_a2))
    assert not np.allclose(np.asarray(outs_a), np.asarray(outs_b))


@pytest.mark.parametrize("disc_arch,expected_per_sample",
                         [("transformer", 1), ("ar_transformer", None)])
def test_transformer_disc_shapes_and_hard_soft(disc_arch, expected_per_sample):
    cfg = tf_config(disc_arch=disc_arch)
    params = api.init_discriminator(jax.random.PRNGKey(0), cfg)
    B, L, V = 3, cfg.seq_len, cfg.vocab_size
    ids = jax.random.randint(jax.random.PRNGKey(1), (B, L), 0, V)
    onehot = jax.nn.one_hot(ids, V)
    out_ids = api.discriminator_apply(params, ids, cfg, train=False)
    out_oh = api.discriminator_apply(params, onehot, cfg, train=False)
    per = expected_per_sample or L
    assert out_ids.shape == (B * per,)
    np.testing.assert_allclose(np.asarray(out_ids), np.asarray(out_oh),
                               atol=1e-5)


def test_ar_disc_per_prefix_causality():
    """Prefix scores must not depend on later tokens (PatchGAN-for-text)."""
    cfg = tf_config(disc_arch="ar_transformer")
    params = api.init_discriminator(jax.random.PRNGKey(0), cfg)
    B, L, V = 2, cfg.seq_len, cfg.vocab_size
    ids = jax.random.randint(jax.random.PRNGKey(1), (B, L), 0, V)
    out_a = disc_tf.apply_autoregressive(params, ids, cfg).reshape(B, L)
    ids_b = ids.at[:, -1].set((ids[:, -1] + 1) % V)
    out_b = disc_tf.apply_autoregressive(params, ids_b, cfg).reshape(B, L)
    np.testing.assert_allclose(np.asarray(out_a[:, :-1]),
                               np.asarray(out_b[:, :-1]), atol=1e-5)
    assert not np.allclose(np.asarray(out_a[:, -1]), np.asarray(out_b[:, -1]))


@pytest.mark.parametrize("gen_arch,disc_arch", [
    ("transformer", "cnn"),
    ("transformer", "transformer"),
    ("transformer", "ar_transformer"),
    ("lstm", "transformer"),
    ("lstm", "ar_transformer"),
])
def test_all_arch_pairs_train(gen_arch, disc_arch):
    """Every generator–discriminator pair of the report's Table 5 grid must
    run one fused MLE + adversarial step with finite losses and updates."""
    from gan_image_captioning_tpu.data.loader import Batcher
    from gan_image_captioning_tpu.data.synthetic import SyntheticCaptions
    from gan_image_captioning_tpu.train.state import create_train_state
    from gan_image_captioning_tpu.train.steps import make_adv_step, make_mle_step

    ds = SyntheticCaptions("train", num_items=8)
    cfg = tf_config(gen_arch=gen_arch, disc_arch=disc_arch,
                    vocab_size=ds.vocab_size, disc_filter_sizes=(2, 3),
                    disc_num_filters=(8, 8), disc_num_rep=4,
                    pre_train_batch_size=4, adv_train_batch_size=4)
    state = create_train_state(cfg, jax.random.PRNGKey(0))
    batch = next(iter(Batcher(ds, 4, cfg.seq_len, num_workers=1,
                              drop_last=True)))
    state, m1 = make_mle_step(cfg)(state, batch)
    state, m2 = make_adv_step(cfg)(state, batch, 2.0)
    assert np.isfinite(float(m1["gen_pretrain_loss"]))
    assert np.isfinite(float(m2["gen_adv_loss"]))
    assert np.isfinite(float(m2["disc_adv_loss"]))
    assert int(state.gen_steps) == 1


def test_conditional_transformer_uses_image_grid():
    """Conditional transformer: the cross-attention grid must flow — two
    different images give different captions under the same rng."""
    from gan_image_captioning_tpu.data.loader import make_batch

    cfg = tf_config(conditional_gan=1, image_size=32, vocab_size=43)
    params = api.init_generator(jax.random.PRNGKey(3), cfg)
    caps = [np.arange(4, 9), np.arange(5, 10)]
    imgs = [np.random.RandomState(s).randn(3, 32, 32).astype(np.float32)
            for s in (0, 1)]
    batch = make_batch(caps, imgs, cfg.seq_len)
    cond, stats = api.generator_condition(cfg, params, batch, train=False)
    assert cond["context"] is not None and cond["context"].shape[0] == 2
    assert stats is not None
    logits = api.generator_mle_outputs(params, cond, jnp.asarray(batch["captions"]),
                                       jax.random.PRNGKey(0), cfg)
    assert logits.shape == (2, cfg.seq_len, cfg.vocab_size)


def test_tf_remat_grads_identical(monkeypatch):
    """GIC_TF_REMAT=1 (per-block jax.checkpoint) changes memory, not math:
    MLE loss and generator grads match the default path exactly."""
    import numpy as np

    from gan_image_captioning_tpu.models import api
    from gan_image_captioning_tpu.ops.losses import cross_entropy_loss

    cfg = Config(vocab_size=40, gen_embed_dim=16, gen_hidden_dim=32,
                 gen_arch="transformer", gen_num_layers=2, gen_num_heads=2,
                 max_seq_len=8)
    params = api.init_generator(jax.random.PRNGKey(2), cfg)
    caps = jax.random.randint(jax.random.PRNGKey(3), (4, cfg.seq_len), 0, 40)
    batch = {"captions": caps, "weights": jnp.ones((4,), jnp.float32)}

    def loss_fn(p):
        cond, _ = api.generator_condition(cfg, p, batch, train=False)
        logits = api.generator_mle_outputs(p, cond, caps,
                                           jax.random.PRNGKey(0), cfg)
        return cross_entropy_loss(logits, caps, None)

    base_l, base_g = jax.value_and_grad(loss_fn)(params)
    monkeypatch.setenv("GIC_TF_REMAT", "1")
    remat_l, remat_g = jax.value_and_grad(loss_fn)(params)
    np.testing.assert_allclose(float(remat_l), float(base_l), rtol=1e-6)
    for a, b in zip(jax.tree_util.tree_leaves(base_g),
                    jax.tree_util.tree_leaves(remat_g)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-7)
