"""ResNet-18 backbone + encoder vs. a torch functional oracle
(weight-for-weight; torchvision is not in this image, so the oracle runs the
same ResNet-18 topology with torch.nn.functional ops from our params)."""

import jax
import jax.numpy as jnp
import numpy as np
import torch
import torch.nn.functional as F

from gan_image_captioning_tpu.config import Config
from gan_image_captioning_tpu.models import resnet as resnet_lib
from gan_image_captioning_tpu.models import encoder as encoder_lib


def _t(x):
    return torch.tensor(np.asarray(x))


def _torch_bn(x, bw, bs, train, momentum=0.1):
    rm, rv = _t(bs["mean"]).clone(), _t(bs["var"]).clone()
    y = F.batch_norm(x, rm, rv, _t(bw["scale"]), _t(bw["bias"]),
                     training=train, momentum=momentum)
    return y, {"mean": rm, "var": rv}


def _torch_resnet18(weights, stats, x, train):
    """Torch-functional oracle for the standard ResNet-18 trunk + pool."""
    new_stats = {}
    x = F.conv2d(x, _t(weights["conv1"]["w"]), stride=2, padding=3)
    x, new_stats["bn1"] = _torch_bn(x, weights["bn1"], stats["bn1"], train)
    x = F.relu(x)
    x = F.max_pool2d(x, 3, stride=2, padding=1)
    for s, (_, blocks, stride) in enumerate(resnet_lib.STAGES, start=1):
        for b in range(blocks):
            st = stride if b == 0 else 1
            bw, bs = weights[f"layer{s}"][b], stats[f"layer{s}"][b]
            out = F.conv2d(x, _t(bw["conv1"]["w"]), stride=st, padding=1)
            out, _ = _torch_bn(out, bw["bn1"], bs["bn1"], train)
            out = F.relu(out)
            out = F.conv2d(out, _t(bw["conv2"]["w"]), padding=1)
            out, _ = _torch_bn(out, bw["bn2"], bs["bn2"], train)
            if "downsample" in bw:
                idn = F.conv2d(x, _t(bw["downsample"]["w"]), stride=st)
                idn, _ = _torch_bn(idn, bw["downsample_bn"],
                                   bs["downsample_bn"], train)
            else:
                idn = x
            x = F.relu(out + idn)
    return F.adaptive_avg_pool2d(x, 1).flatten(1), new_stats


def test_resnet18_matches_torch_eval():
    weights, stats = resnet_lib.init_resnet18_params(jax.random.PRNGKey(0))
    x = np.random.RandomState(0).randn(2, 3, 64, 64).astype(np.float32)
    ours, _ = resnet_lib.resnet18(weights, stats, jnp.asarray(x), train=False)
    with torch.no_grad():
        ref, _ = _torch_resnet18(weights, stats, torch.tensor(x), False)
    np.testing.assert_allclose(np.asarray(ours), ref.numpy(), atol=2e-4)


def test_resnet18_train_mode_matches_torch_bn():
    """Train-mode BN (batch stats + running-stat update) must match torch."""
    weights, stats = resnet_lib.init_resnet18_params(jax.random.PRNGKey(1))
    x = np.random.RandomState(1).randn(4, 3, 32, 32).astype(np.float32)
    ours, new_stats = resnet_lib.resnet18(weights, stats, jnp.asarray(x),
                                          train=True)
    with torch.no_grad():
        ref, t_stats = _torch_resnet18(weights, stats, torch.tensor(x), True)
    np.testing.assert_allclose(np.asarray(ours), ref.numpy(), atol=2e-4)
    # running stats updated like torch's (momentum 0.1, unbiased var)
    np.testing.assert_allclose(np.asarray(new_stats["bn1"]["mean"]),
                               t_stats["bn1"]["mean"].numpy(), atol=1e-5)
    np.testing.assert_allclose(np.asarray(new_stats["bn1"]["var"]),
                               t_stats["bn1"]["var"].numpy(), atol=1e-4)


def test_resnet18_grid_shape():
    weights, stats = resnet_lib.init_resnet18_params(jax.random.PRNGKey(0))
    x = jnp.zeros((2, 3, 64, 64))
    grid, _ = resnet_lib.resnet18_grid(weights, stats, x)
    assert grid.shape == (2, 4, 512)  # 64/32 = 2 → 2x2 grid


def small_cfg(**kw):
    base = dict(vocab_size=50, gen_embed_dim=24, gen_hidden_dim=32,
                max_seq_len=8, image_size=32, conditional_gan=1,
                disc_embed_dim=8, disc_num_rep=4, disc_filter_sizes=(2, 3),
                disc_num_filters=(8, 8))
    base.update(kw)
    return Config(**base)


def test_encoder_frozen_vs_trainable_gradients():
    cfg = small_cfg()
    params = encoder_lib.init_encoder_params(jax.random.PRNGKey(0), cfg)
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 3, 32, 32))

    def loss(p, c):
        feats, _ = encoder_lib.encode(p, x, c, train=True)
        return jnp.sum(feats ** 2)

    g_frozen = jax.grad(loss)(params, cfg)
    assert float(jnp.abs(g_frozen["backbone"]["conv1"]["w"]).max()) == 0.0
    assert float(jnp.abs(g_frozen["proj"]["w"]).max()) > 0.0  # head trains

    cfg_t = small_cfg(trainable_backbone=1)
    g_train = jax.grad(loss)(params, cfg_t)
    assert float(jnp.abs(g_train["backbone"]["conv1"]["w"]).max()) > 0.0


def test_conditional_mle_step_runs_and_updates_bn_stats():
    from gan_image_captioning_tpu.data.loader import Batcher
    from gan_image_captioning_tpu.data.synthetic import SyntheticCaptions
    from gan_image_captioning_tpu.train.state import create_train_state
    from gan_image_captioning_tpu.train.steps import make_adv_step, make_mle_step

    ds = SyntheticCaptions("train", num_items=8, image_size=32,
                           conditional=True)
    cfg = small_cfg(vocab_size=ds.vocab_size, pre_train_batch_size=4,
                    adv_train_batch_size=4)
    state = create_train_state(cfg, jax.random.PRNGKey(0))
    batch = next(iter(Batcher(ds, 4, cfg.seq_len, num_workers=1,
                              drop_last=True)))
    assert batch["images"].shape == (4, 3, 32, 32)

    stats_before = np.asarray(
        state.gen_params["encoder"]["bn_stats"]["head"]["mean"])
    step = make_mle_step(cfg)
    state, metrics = step(state, batch)
    assert np.isfinite(float(metrics["gen_pretrain_loss"]))
    stats_after = np.asarray(
        state.gen_params["encoder"]["bn_stats"]["head"]["mean"])
    assert not np.array_equal(stats_before, stats_after)  # BN stats threaded

    adv = make_adv_step(cfg)
    state, am = adv(state, batch, 2.0)
    assert np.isfinite(float(am["gen_adv_loss"]))


def test_generator_forward_conditional():
    from gan_image_captioning_tpu.models.generator import Generator

    cfg = small_cfg()
    gen = Generator(cfg)
    params = gen.init(jax.random.PRNGKey(0))
    assert "encoder" in params
    images = jax.random.normal(jax.random.PRNGKey(1), (2, 3, 32, 32))
    caps = jax.random.randint(jax.random.PRNGKey(2), (2, 6), 0, cfg.vocab_size)
    pred, hidden = gen.forward(params, images, caps, pretrain=True)
    assert pred.shape == (2, 7, cfg.vocab_size)
