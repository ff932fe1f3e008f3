"""Generator decode vs. a PyTorch oracle replicating the reference decode
semantics (generator.py:55-81): free-running greedy LSTM decode with the
image-feature/<S> t=0 input and embed-argmax feedback.

The greedy (pretrain-mode) decode must match the oracle token-for-token —
the north-star "bit-matching greedy captions" criterion at test scale.
"""

import jax
import jax.numpy as jnp
import numpy as np
import torch

from gan_image_captioning_tpu.config import Config
from gan_image_captioning_tpu.models import generator as gen_lib
from gan_image_captioning_tpu.models import lstm


def tiny_config(**kw):
    base = dict(vocab_size=37, gen_embed_dim=8, gen_hidden_dim=16,
                gen_num_layers=1, max_seq_len=10, conditional_gan=0)
    base.update(kw)
    return Config(**base)


def _torch_greedy_decode(params, features, T):
    """Oracle: the reference's sample() loop in pretrain mode
    (generator.py:60-76) built from our params with torch functional ops."""
    dec = params["decoder"]
    embed_w = torch.tensor(np.asarray(dec["embed"]))
    lin_w = torch.tensor(np.asarray(dec["linear"]["w"]))
    lin_b = torch.tensor(np.asarray(dec["linear"]["b"]))
    num_layers = len(dec["lstm"])
    E = embed_w.shape[1]
    H = dec["lstm"][0]["w_hh"].shape[1]
    m = torch.nn.LSTM(E, H, num_layers, batch_first=True)
    with torch.no_grad():
        for layer, lp in enumerate(dec["lstm"]):
            getattr(m, f"weight_ih_l{layer}").copy_(torch.tensor(np.asarray(lp["w_ih"])))
            getattr(m, f"weight_hh_l{layer}").copy_(torch.tensor(np.asarray(lp["w_hh"])))
            getattr(m, f"bias_ih_l{layer}").copy_(torch.tensor(np.asarray(lp["b_ih"])))
            getattr(m, f"bias_hh_l{layer}").copy_(torch.tensor(np.asarray(lp["b_hh"])))

    inputs = torch.tensor(np.asarray(features)).unsqueeze(1)
    states = None
    all_logits, all_ids = [], []
    with torch.no_grad():
        for _ in range(T):
            hiddens, states = m(inputs, states)
            logits = hiddens.squeeze(1) @ lin_w.T + lin_b
            all_logits.append(logits)
            ids = torch.softmax(logits, dim=-1).max(1)[1]
            all_ids.append(ids)
            inputs = embed_w[ids].unsqueeze(1)
    return torch.stack(all_logits, 1).numpy(), torch.stack(all_ids, 1).numpy()


def test_greedy_decode_bitmatch_torch():
    cfg = tiny_config(gen_num_layers=2)
    gen = gen_lib.Generator(cfg)
    params = gen.init(jax.random.PRNGKey(0))
    B = 4
    features = jax.random.normal(jax.random.PRNGKey(1), (B, cfg.gen_embed_dim))

    outs, ids = gen.sample(params, features, jax.random.PRNGKey(2),
                           temperature=1.0, pretrain=True)
    ref_logits, ref_ids = _torch_greedy_decode(params, features, cfg.seq_len)

    # Token-exact greedy match (the north-star criterion at test scale).
    np.testing.assert_array_equal(np.asarray(ids), ref_ids)
    np.testing.assert_allclose(np.asarray(outs), ref_logits, atol=1e-4)


def test_sample_shapes_and_modes():
    cfg = tiny_config()
    gen = gen_lib.Generator(cfg)
    params = gen.init(jax.random.PRNGKey(0))
    B, T, V = 5, cfg.seq_len, cfg.vocab_size
    features = gen_lib.start_token_features(params["decoder"], B)

    outs, ids = gen.sample(params, features, jax.random.PRNGKey(1),
                           temperature=1.0, pretrain=True)
    assert outs.shape == (B, T, V) and ids.shape == (B, T)

    soft, ids2 = gen.sample(params, features, jax.random.PRNGKey(1),
                            temperature=5.0, pretrain=False)
    assert soft.shape == (B, T, V)
    # adversarial outputs are probability distributions (generator.py:69)
    np.testing.assert_allclose(np.asarray(soft.sum(-1)), np.ones((B, T)),
                               atol=1e-5)
    # soft argmax agrees with returned hard ids (generator.py:73)
    np.testing.assert_array_equal(np.asarray(soft.argmax(-1)), np.asarray(ids2))


def test_adversarial_sampling_is_stochastic_but_reproducible():
    cfg = tiny_config()
    gen = gen_lib.Generator(cfg)
    params = gen.init(jax.random.PRNGKey(0))
    features = gen_lib.start_token_features(params["decoder"], 8)
    _, ids_a = gen.sample(params, features, jax.random.PRNGKey(7), 1.0)
    _, ids_b = gen.sample(params, features, jax.random.PRNGKey(7), 1.0)
    _, ids_c = gen.sample(params, features, jax.random.PRNGKey(8), 1.0)
    np.testing.assert_array_equal(np.asarray(ids_a), np.asarray(ids_b))
    assert not np.array_equal(np.asarray(ids_a), np.asarray(ids_c))


def test_teacher_forced_matches_manual():
    cfg = tiny_config()
    gen = gen_lib.Generator(cfg)
    params = gen.init(jax.random.PRNGKey(0))
    B, T = 3, 6
    caps = jax.random.randint(jax.random.PRNGKey(1), (B, T), 0, cfg.vocab_size)
    features = gen_lib.start_token_features(params["decoder"], B)

    logits, _ = gen_lib.teacher_forced(params["decoder"], features, caps,
                                       pretrain=True)
    assert logits.shape == (B, T + 1, cfg.vocab_size)

    # manual: embed, prepend features, run lstm, project
    dec = params["decoder"]
    xs = jnp.concatenate([features[:, None, :], dec["embed"][caps]], axis=1)
    hs, _ = lstm.lstm_forward(dec["lstm"], xs)
    manual = hs @ dec["linear"]["w"].T + dec["linear"]["b"]
    np.testing.assert_allclose(np.asarray(logits), np.asarray(manual), atol=1e-6)


def test_init_strategies():
    cfg_u = tiny_config(gen_init="uniform")
    params = gen_lib.Generator(cfg_u).init(jax.random.PRNGKey(0))
    leaves = jax.tree_util.tree_leaves(params)
    # uniform sweep: every leaf within [-0.05, 0.05] (generator.py:120-121)
    assert all(float(jnp.max(jnp.abs(l))) <= 0.05 for l in leaves)

    cfg_n = tiny_config(gen_init="normal")
    params_n = gen_lib.Generator(cfg_n).init(jax.random.PRNGKey(0))
    embed = params_n["decoder"]["embed"]
    # normal: std 1/sqrt(shape[0]) (generator.py:119,122-123)
    expected = 1.0 / np.sqrt(embed.shape[0])
    assert abs(float(jnp.std(embed)) - expected) < 0.3 * expected
