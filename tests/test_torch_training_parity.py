"""Training-dynamics parity vs. a live PyTorch replica.

The north star demands "loss curves within tolerance" of the reference.
This test builds the reference's exact training step in torch (free-running
pretrain-mode sample → CrossEntropyLoss over all positions → clip_grad_norm
5.0 → Adam, training.py:71-88,194-199) from OUR initial weights, runs
several optimizer steps on the SAME batch in both frameworks, and compares
the loss trajectory step by step.
"""

import jax
import numpy as np
import pytest
import torch
import torch.nn as nn

from gan_image_captioning_tpu.config import Config
from gan_image_captioning_tpu.data.loader import make_batch
from gan_image_captioning_tpu.train.state import create_train_state
from gan_image_captioning_tpu.train.steps import make_mle_step


def _torch_modules_from(params, cfg):
    dec = params["decoder"]
    V, E, H = cfg.vocab_size, cfg.gen_embed_dim, cfg.gen_hidden_dim
    embed = nn.Embedding(V, E)
    lstm = nn.LSTM(E, H, cfg.gen_num_layers, batch_first=True)
    linear = nn.Linear(H, V)
    with torch.no_grad():
        embed.weight.copy_(torch.tensor(np.asarray(dec["embed"])))
        for k, lp in enumerate(dec["lstm"]):
            getattr(lstm, f"weight_ih_l{k}").copy_(torch.tensor(np.asarray(lp["w_ih"])))
            getattr(lstm, f"weight_hh_l{k}").copy_(torch.tensor(np.asarray(lp["w_hh"])))
            getattr(lstm, f"bias_ih_l{k}").copy_(torch.tensor(np.asarray(lp["b_ih"])))
            getattr(lstm, f"bias_hh_l{k}").copy_(torch.tensor(np.asarray(lp["b_hh"])))
        linear.weight.copy_(torch.tensor(np.asarray(dec["linear"]["w"])))
        linear.bias.copy_(torch.tensor(np.asarray(dec["linear"]["b"])))
    return embed, lstm, linear


def _torch_pretrain_step(modules, opt, captions, clip):
    """The reference pretrain step: free-running sample (pretrain=True,
    training.py:71) → CE over all positions (:81-83) → optimize (:194-199)."""
    embed, lstm, linear = modules
    B, T = captions.shape
    # unconditional t=0 input: embed(<S>) (training.py:68)
    inputs = embed(torch.ones(B, dtype=torch.long)).unsqueeze(1)
    states = None
    outs = []
    for _ in range(T):
        h, states = lstm(inputs, states)
        logits = linear(h.squeeze(1))
        outs.append(logits)
        ids = torch.softmax(logits, -1).max(1)[1]
        inputs = embed(ids.detach()).unsqueeze(1)
    logits = torch.stack(outs, 1)
    loss = nn.CrossEntropyLoss()(logits.reshape(-1, logits.size(-1)),
                                 torch.tensor(captions).reshape(-1).long())
    opt.zero_grad()
    loss.backward()
    torch.nn.utils.clip_grad_norm_(
        [p for m in modules for p in m.parameters()], clip)
    opt.step()
    return float(loss)


@pytest.mark.parametrize("lr", [1e-2])
def test_mle_loss_trajectory_matches_torch(lr):
    cfg = Config(vocab_size=53, gen_embed_dim=12, gen_hidden_dim=20,
                 gen_num_layers=2, max_seq_len=8, pretrain_lr=lr,
                 pre_train_batch_size=8)
    state = create_train_state(cfg, jax.random.PRNGKey(0))
    step = make_mle_step(cfg)

    rng = np.random.RandomState(0)
    caps = [rng.randint(4, 50, size=rng.randint(3, 7)) for _ in range(8)]
    batch = make_batch(caps, None, cfg.seq_len)

    modules = _torch_modules_from(state.gen_params, cfg)
    opt = torch.optim.Adam([p for m in modules for p in m.parameters()], lr=lr)

    ours, theirs = [], []
    for _ in range(6):
        state, metrics = step(state, batch)
        ours.append(float(metrics["gen_pretrain_loss"]))
        theirs.append(_torch_pretrain_step(modules, opt, batch["captions"],
                                           cfg.clip_norm))

    # step-0 losses are the same forward pass → near bit-equal;
    # later steps accumulate fp differences through Adam but must track.
    np.testing.assert_allclose(ours[0], theirs[0], rtol=1e-5)
    np.testing.assert_allclose(ours, theirs, rtol=2e-2)
    # and both trajectories actually descend
    assert ours[-1] < ours[0] and theirs[-1] < theirs[0]


def test_disc_adam_step_matches_torch():
    """One discriminator update on identical inputs: d_loss and the
    post-Adam weights must match torch (the D half of the adversarial step,
    training.py:162-168; dropout off for determinism)."""
    import jax.numpy as jnp
    import torch.nn.functional as F

    from gan_image_captioning_tpu.models import discriminator as disc_lib
    from gan_image_captioning_tpu.ops.losses import gan_losses
    from gan_image_captioning_tpu.train.state import make_optimizer

    cfg = Config(vocab_size=31, disc_embed_dim=8, disc_num_rep=4,
                 disc_filter_sizes=(2, 3), disc_num_filters=(6, 6),
                 max_seq_len=7, disc_lr=1e-3)
    params = disc_lib.init_discriminator_params(jax.random.PRNGKey(0), cfg)
    rng = np.random.RandomState(1)
    real = rng.randint(0, 31, (4, cfg.seq_len))
    fake = np.asarray(jax.nn.softmax(
        jax.random.normal(jax.random.PRNGKey(2), (4, cfg.seq_len, 31))))

    # ---- ours: one optax step on d_loss
    tx = make_optimizer(cfg.disc_lr, cfg.clip_norm)
    opt_state = tx.init(params)

    def d_loss_fn(p):
        d_real = disc_lib.apply(p, jnp.asarray(real), cfg, train=False)
        d_fake = disc_lib.apply(p, jnp.asarray(fake), cfg, train=False)
        return gan_losses(d_real, d_fake, d_fake, "standard")[1]

    d_loss, grads = jax.value_and_grad(d_loss_fn)(params)
    updates, _ = tx.update(grads, opt_state, params)
    new_params = jax.tree_util.tree_map(lambda p, u: p + u, params, updates)

    # ---- torch replica from the same weights
    emb = nn.Linear(31, 8, bias=False)
    convs = nn.ModuleList([nn.Conv2d(1, 6, (2, 2), stride=(1, 2)),
                           nn.Conv2d(1, 6, (3, 2), stride=(1, 2))])
    highway, f2o, o2l = nn.Linear(12, 12), nn.Linear(12, 100), nn.Linear(100, 1)
    with torch.no_grad():
        emb.weight.copy_(torch.tensor(np.asarray(params["embeddings"]["w"])))
        for c, cp in zip(convs, params["convs"]):
            c.weight.copy_(torch.tensor(np.asarray(cp["w"])))
            c.bias.copy_(torch.tensor(np.asarray(cp["b"])))
        highway.weight.copy_(torch.tensor(np.asarray(params["highway"]["w"])))
        highway.bias.copy_(torch.tensor(np.asarray(params["highway"]["b"])))
        f2o.weight.copy_(torch.tensor(np.asarray(params["feature2out"]["w"])))
        f2o.bias.copy_(torch.tensor(np.asarray(params["feature2out"]["b"])))
        o2l.weight.copy_(torch.tensor(np.asarray(params["out2logits"]["w"])))
        o2l.bias.copy_(torch.tensor(np.asarray(params["out2logits"]["b"])))
    mods = [emb, *convs, highway, f2o, o2l]

    def fwd(x):
        e = emb(x).unsqueeze(1)
        pools = [F.max_pool2d(F.relu(c(e)), (e.size(2) - c.kernel_size[0] + 1, 1)
                              ).squeeze(2) for c in convs]
        pred = torch.cat(pools, 1).permute(0, 2, 1).reshape(-1, 12)
        hw = highway(pred)
        pred = torch.sigmoid(hw) * F.relu(hw) + (1 - torch.sigmoid(hw)) * pred
        return o2l(f2o(pred)).squeeze(1)

    opt = torch.optim.Adam([p for m in mods for p in m.parameters()],
                           lr=cfg.disc_lr)
    bce = nn.BCEWithLogitsLoss()
    real_oh = F.one_hot(torch.tensor(real).long(), 31).float()
    d_real_t = fwd(real_oh)
    d_fake_t = fwd(torch.tensor(fake))
    loss_t = (bce(d_real_t, torch.ones_like(d_real_t))
              + bce(d_fake_t, torch.zeros_like(d_fake_t)))
    opt.zero_grad()
    loss_t.backward()
    torch.nn.utils.clip_grad_norm_([p for m in mods for p in m.parameters()],
                                   cfg.clip_norm)
    opt.step()

    np.testing.assert_allclose(float(d_loss), float(loss_t), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(new_params["embeddings"]["w"]),
                               emb.weight.detach().numpy(), atol=2e-6)
    np.testing.assert_allclose(np.asarray(new_params["out2logits"]["w"]),
                               o2l.weight.detach().numpy(), atol=2e-6)
