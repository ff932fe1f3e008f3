"""Bi-LSTM discriminator (``--disc-arch bilstm``) — the report §4.2
bidirectional-LSTM setting wired as a sequence discriminator.

Oracle: torch ``nn.LSTM(bidirectional=True)`` with converted weights, plus
max-pool + linear head — same math, independent implementation.
"""

import jax
import jax.numpy as jnp
import numpy as np
import torch

from gan_image_captioning_tpu.config import Config
from gan_image_captioning_tpu.models import api
from gan_image_captioning_tpu.models import discriminator_bilstm as db


def _config(**kw):
    base = dict(vocab_size=37, max_seq_len=8, disc_embed_dim=6,
                disc_hidden_dim=5, disc_num_layers=1, disc_arch="bilstm",
                gen_embed_dim=8, gen_hidden_dim=8)
    base.update(kw)
    return Config(**base)


def test_bilstm_disc_shapes_and_hard_soft_equivalence():
    cfg = _config()
    params = api.init_discriminator(jax.random.PRNGKey(0), cfg)
    B, L, V = 3, cfg.seq_len, cfg.vocab_size
    ids = jax.random.randint(jax.random.PRNGKey(1), (B, L), 0, V)
    onehot = jax.nn.one_hot(ids, V)
    out_ids = api.discriminator_apply(params, ids, cfg, train=False)
    out_oh = api.discriminator_apply(params, onehot, cfg, train=False)
    assert out_ids.shape == (B,)
    assert api.disc_logits_per_sample(cfg) == 1
    np.testing.assert_allclose(np.asarray(out_ids), np.asarray(out_oh),
                               atol=1e-5)


def test_bilstm_disc_matches_torch_oracle():
    cfg = _config(disc_init="normal")
    params = api.init_discriminator(jax.random.PRNGKey(2), cfg)
    B, L, V = 2, cfg.seq_len, cfg.vocab_size
    H = cfg.disc_hidden_dim
    soft = np.asarray(jax.nn.softmax(
        jax.random.normal(jax.random.PRNGKey(3), (B, L, V)) * 2.0))

    t_lstm = torch.nn.LSTM(cfg.disc_embed_dim, H, num_layers=1,
                           batch_first=True, bidirectional=True)
    with torch.no_grad():
        for direction, name in ((params["fwd"][0], ""),
                                (params["bwd"][0], "_reverse")):
            getattr(t_lstm, "weight_ih_l0" + name).copy_(
                torch.tensor(np.asarray(direction["w_ih"])))
            getattr(t_lstm, "weight_hh_l0" + name).copy_(
                torch.tensor(np.asarray(direction["w_hh"])))
            getattr(t_lstm, "bias_ih_l0" + name).copy_(
                torch.tensor(np.asarray(direction["b_ih"])))
            getattr(t_lstm, "bias_hh_l0" + name).copy_(
                torch.tensor(np.asarray(direction["b_hh"])))
        emb_w = torch.tensor(np.asarray(params["embeddings"]["w"]))  # [E, V]
        head_w = torch.tensor(np.asarray(params["head"]["w"]))       # [2H, 1]
        head_b = torch.tensor(np.asarray(params["head"]["b"]))
        emb = torch.tensor(soft) @ emb_w.T
        feats, _ = t_lstm(emb)                      # [B, L, 2H]
        pooled = feats.max(dim=1).values
        ref = (pooled @ head_w + head_b)[:, 0].numpy()

    out = np.asarray(api.discriminator_apply(params, jnp.asarray(soft), cfg,
                                             train=False))
    np.testing.assert_allclose(out, ref, atol=1e-5)


def test_bilstm_disc_uses_both_directions():
    # Gradient must flow to both the forward and backward stacks.
    cfg = _config()
    params = api.init_discriminator(jax.random.PRNGKey(4), cfg)
    ids = jax.random.randint(jax.random.PRNGKey(5), (4, cfg.seq_len), 0,
                             cfg.vocab_size)

    grads = jax.grad(lambda p: jnp.sum(
        api.discriminator_apply(p, ids, cfg, train=False)))(params)
    for stack in ("fwd", "bwd"):
        total = sum(float(jnp.sum(jnp.abs(g)))
                    for lp in grads[stack] for g in lp.values())
        assert total > 0.0, f"no gradient into {stack} LSTM"


def test_bilstm_disc_trains_one_fused_step():
    from gan_image_captioning_tpu.data.loader import Batcher
    from gan_image_captioning_tpu.data.synthetic import SyntheticCaptions
    from gan_image_captioning_tpu.train.state import create_train_state
    from gan_image_captioning_tpu.train.steps import make_adv_step, make_mle_step

    ds = SyntheticCaptions("train", num_items=8)
    cfg = _config(vocab_size=ds.vocab_size, pre_train_batch_size=4,
                  adv_train_batch_size=4, noisy_labels=0.2)
    state = create_train_state(cfg, jax.random.PRNGKey(0))
    batch = next(iter(Batcher(ds, 4, cfg.seq_len, num_workers=1,
                              drop_last=True)))
    state, m1 = make_mle_step(cfg)(state, batch)
    state, m2 = make_adv_step(cfg)(state, batch, 2.0)
    assert np.isfinite(float(m1["gen_pretrain_loss"]))
    assert np.isfinite(float(m2["gen_adv_loss"]))
    assert np.isfinite(float(m2["disc_adv_loss"]))


def test_bilstm_disc_apply_three_matches_separate():
    cfg = _config()
    params = api.init_discriminator(jax.random.PRNGKey(6), cfg)
    B, L, V = 3, cfg.seq_len, cfg.vocab_size
    ids = jax.random.randint(jax.random.PRNGKey(7), (B, L), 0, V)
    fake = jax.nn.softmax(jax.random.normal(jax.random.PRNGKey(8), (B, L, V)))
    soft = jax.nn.softmax(jax.random.normal(jax.random.PRNGKey(9), (B, L, V)))
    d_r, d_f, g_o = api.discriminator_apply_three(params, ids, fake, soft,
                                                  cfg, train=False)
    np.testing.assert_allclose(
        np.asarray(d_r),
        np.asarray(api.discriminator_apply(params, ids, cfg, train=False)),
        atol=1e-5)
    np.testing.assert_allclose(
        np.asarray(d_f),
        np.asarray(api.discriminator_apply(params, fake, cfg, train=False)),
        atol=1e-5)
    np.testing.assert_allclose(
        np.asarray(g_o),
        np.asarray(api.discriminator_apply(params, soft, cfg, train=False)),
        atol=1e-5)
