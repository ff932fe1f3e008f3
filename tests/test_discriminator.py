"""RelGAN CNN discriminator vs. a PyTorch functional oracle replicating
reference discriminator.py:34-62 weight-for-weight."""

import jax
import jax.numpy as jnp
import numpy as np
import torch
import torch.nn.functional as F

from gan_image_captioning_tpu.config import Config
from gan_image_captioning_tpu.models import discriminator as disc_lib


def tiny_config(**kw):
    base = dict(vocab_size=53, disc_embed_dim=16, disc_num_rep=4,
                disc_filter_sizes=(2, 3), disc_num_filters=(8, 8),
                max_seq_len=9)
    base.update(kw)
    return Config(**base)


def _torch_disc_forward(params, inp, cfg):
    """Oracle for the reference forward pass (discriminator.py:40-60),
    eval mode (no dropout), built from our params with functional torch."""
    inp = torch.tensor(np.asarray(inp))
    emb_w = torch.tensor(np.asarray(params["embeddings"]["w"]))
    emb = (inp @ emb_w.T).unsqueeze(1)  # [B,1,L,E]
    eds = cfg.emb_dim_single
    pools = []
    for cp in params["convs"]:
        w = torch.tensor(np.asarray(cp["w"]))
        b = torch.tensor(np.asarray(cp["b"]))
        con = F.relu(F.conv2d(emb, w, b, stride=(1, eds)))
        pools.append(F.max_pool2d(con, (con.size(2), 1)).squeeze(2))
    pred = torch.cat(pools, 1)
    pred = pred.permute(0, 2, 1).contiguous().view(-1, cfg.disc_feature_dim)
    hw_w = torch.tensor(np.asarray(params["highway"]["w"]))
    hw_b = torch.tensor(np.asarray(params["highway"]["b"]))
    highway = pred @ hw_w.T + hw_b
    pred = torch.sigmoid(highway) * F.relu(highway) + (1.0 - torch.sigmoid(highway)) * pred
    f2o_w = torch.tensor(np.asarray(params["feature2out"]["w"]))
    f2o_b = torch.tensor(np.asarray(params["feature2out"]["b"]))
    o2l_w = torch.tensor(np.asarray(params["out2logits"]["w"]))
    o2l_b = torch.tensor(np.asarray(params["out2logits"]["b"]))
    pred = pred @ f2o_w.T + f2o_b
    return (pred @ o2l_w.T + o2l_b).squeeze(1).numpy()


def test_forward_matches_torch_soft_input():
    cfg = tiny_config()
    disc = disc_lib.Discriminator(cfg)
    params = disc.init(jax.random.PRNGKey(0))
    B, L, V = 3, cfg.seq_len, cfg.vocab_size
    soft = jax.nn.softmax(jax.random.normal(jax.random.PRNGKey(1), (B, L, V)))
    ours = disc(params, soft, train=False)
    ref = _torch_disc_forward(params, soft, cfg)
    assert ours.shape == (B * cfg.disc_num_rep,)  # discriminator.py:60-62
    np.testing.assert_allclose(np.asarray(ours), ref, atol=1e-5)


def test_int_ids_equal_onehot():
    """The fused embedding gather for real captions must equal the
    reference's one_hot → Linear path (training.py:158 + discriminator.py:40)."""
    cfg = tiny_config()
    disc = disc_lib.Discriminator(cfg)
    params = disc.init(jax.random.PRNGKey(0))
    B, L, V = 4, cfg.seq_len, cfg.vocab_size
    ids = jax.random.randint(jax.random.PRNGKey(2), (B, L), 0, V)
    onehot = jax.nn.one_hot(ids, V, dtype=jnp.float32)
    out_ids = disc(params, ids, train=False)
    out_onehot = disc(params, onehot, train=False)
    np.testing.assert_allclose(np.asarray(out_ids), np.asarray(out_onehot),
                               atol=1e-6)
    ref = _torch_disc_forward(params, onehot, cfg)
    np.testing.assert_allclose(np.asarray(out_ids), ref, atol=1e-5)


def test_dropout_train_vs_eval():
    cfg = tiny_config()
    disc = disc_lib.Discriminator(cfg)
    params = disc.init(jax.random.PRNGKey(0))
    soft = jax.nn.softmax(
        jax.random.normal(jax.random.PRNGKey(1), (2, cfg.seq_len, cfg.vocab_size)))
    eval_out = disc(params, soft, train=False)
    train_out = disc(params, soft, rng=jax.random.PRNGKey(3), train=True)
    assert not np.allclose(np.asarray(eval_out), np.asarray(train_out))
    # same rng → same dropout mask
    train_out2 = disc(params, soft, rng=jax.random.PRNGKey(3), train=True)
    np.testing.assert_allclose(np.asarray(train_out), np.asarray(train_out2))


def test_get_feature_shape():
    cfg = tiny_config()
    disc = disc_lib.Discriminator(cfg)
    params = disc.init(jax.random.PRNGKey(0))
    soft = jax.nn.softmax(
        jax.random.normal(jax.random.PRNGKey(1), (5, cfg.seq_len, cfg.vocab_size)))
    feat = disc.get_feature(params, soft)
    assert feat.shape == (5, cfg.disc_feature_dim)  # discriminator.py:64-77


def test_default_config_shapes():
    """Default RelGAN geometry: E=64, num_rep=64 → emb_dim_single=1
    (args.py:34-42, discriminator.py:17)."""
    cfg = Config(vocab_size=211)
    assert cfg.emb_dim_single == 1
    assert cfg.disc_feature_dim == 900
    disc = disc_lib.Discriminator(cfg)
    params = disc.init(jax.random.PRNGKey(0))
    ids = jax.random.randint(jax.random.PRNGKey(1), (2, cfg.seq_len), 0, 211)
    out = disc(params, ids, train=False)
    assert out.shape == (2 * 64,)


def test_apply_three_matches_separate_passes():
    """The concatenated-trunk utility (kept for study; the train step uses
    separate passes after it measured slower on v5e — docs/benchmarks.md)
    must stay numerically identical to three applies in eval mode."""
    from gan_image_captioning_tpu.models import api

    cfg = tiny_config()
    params = disc_lib.init_discriminator_params(jax.random.PRNGKey(0), cfg)
    B, L, V = 3, cfg.seq_len, cfg.vocab_size
    real = jax.random.randint(jax.random.PRNGKey(1), (B, L), 0, V)
    fake = jax.nn.softmax(jax.random.normal(jax.random.PRNGKey(2), (B, L, V)))
    soft = jax.nn.softmax(jax.random.normal(jax.random.PRNGKey(3), (B, L, V)))
    d_r, d_f, g_o = api.discriminator_apply_three(params, real, fake, soft,
                                                  cfg, train=False)
    np.testing.assert_allclose(np.asarray(d_r),
                               np.asarray(disc_lib.apply(params, real, cfg)),
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(d_f),
                               np.asarray(disc_lib.apply(params, fake, cfg)),
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(g_o),
                               np.asarray(disc_lib.apply(params, soft, cfg)),
                               atol=1e-5)


def test_conv_layout_nhwc_matches_nchw(monkeypatch):
    """The channels-last conv formulation (GIC_DISC_CONV_LAYOUT=nhwc) is
    numerics-identical (values + grads) to the reference-layout NCHW path."""
    import numpy as np

    from gan_image_captioning_tpu.config import Config
    from gan_image_captioning_tpu.models import discriminator as d

    config = Config(vocab_size=64, disc_embed_dim=8, disc_num_rep=4,
                    max_seq_len=6, disc_filter_sizes=(2, 3),
                    disc_num_filters=(4, 5))
    params = d.init_discriminator_params(jax.random.PRNGKey(0), config)
    emb = jax.random.normal(jax.random.PRNGKey(1), (3, config.seq_len, 8))

    def run():
        def loss(p):
            return jnp.sum(d.conv_pooled(p, emb, config) ** 2)
        return jax.value_and_grad(loss)(params)

    monkeypatch.setenv("GIC_DISC_CONV_LAYOUT", "nchw")
    l1, g1 = run()
    monkeypatch.setenv("GIC_DISC_CONV_LAYOUT", "nhwc")
    l2, g2 = run()
    np.testing.assert_allclose(float(l1), float(l2), rtol=1e-5)
    jax.tree_util.tree_map(lambda a, b: np.testing.assert_allclose(
        np.asarray(a), np.asarray(b), atol=1e-5), g1, g2)
