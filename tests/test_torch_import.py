"""Torch checkpoint conversion: build reference-shaped state_dicts with
torch modules, convert, and check numerical equivalence of the forward."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import torch
import torch.nn as nn

from gan_image_captioning_tpu.config import Config
from gan_image_captioning_tpu.models import discriminator as disc_lib
from gan_image_captioning_tpu.models import generator as gen_lib
from gan_image_captioning_tpu.models.torch_import import (
    discriminator_from_torch, generator_from_torch)


def _torch_decoder_sd(V, E, H, layers):
    """A reference-shaped generator state_dict (decoder only —
    generator.py:31-33 module names)."""
    torch.manual_seed(0)
    sd = {}
    embed = nn.Embedding(V, E)
    lstm = nn.LSTM(E, H, layers, batch_first=True)
    linear = nn.Linear(H, V)
    sd["decoder.embed.weight"] = embed.weight
    for k in range(layers):
        sd[f"decoder.lstm.weight_ih_l{k}"] = getattr(lstm, f"weight_ih_l{k}")
        sd[f"decoder.lstm.weight_hh_l{k}"] = getattr(lstm, f"weight_hh_l{k}")
        sd[f"decoder.lstm.bias_ih_l{k}"] = getattr(lstm, f"bias_ih_l{k}")
        sd[f"decoder.lstm.bias_hh_l{k}"] = getattr(lstm, f"bias_hh_l{k}")
    sd["decoder.linear.weight"] = linear.weight
    sd["decoder.linear.bias"] = linear.bias
    return sd, (embed, lstm, linear)


def test_generator_conversion_bitmatch_decode():
    V, E, H, L = 31, 8, 12, 2
    sd, (embed, lstm, linear) = _torch_decoder_sd(V, E, H, L)
    params = generator_from_torch(sd, num_lstm_layers=L, with_encoder=False)

    feats = jax.random.normal(jax.random.PRNGKey(0), (3, E))
    outs, ids = gen_lib.sample(params["decoder"], feats, jax.random.PRNGKey(1),
                               1.0, 6, pretrain=True)

    # torch free-running greedy oracle with the SAME modules
    inputs = torch.tensor(np.asarray(feats)).unsqueeze(1)
    states = None
    ref_ids = []
    with torch.no_grad():
        for _ in range(6):
            h, states = lstm(inputs, states)
            logits = linear(h.squeeze(1))
            ids_t = torch.softmax(logits, -1).max(1)[1]
            ref_ids.append(ids_t)
            inputs = embed(ids_t).unsqueeze(1)
    np.testing.assert_array_equal(np.asarray(ids),
                                  torch.stack(ref_ids, 1).numpy())


def test_discriminator_conversion_matches():
    cfg = Config(vocab_size=29, disc_embed_dim=8, disc_num_rep=4,
                 disc_filter_sizes=(2, 3), disc_num_filters=(6, 6),
                 max_seq_len=7)
    torch.manual_seed(1)
    emb = nn.Linear(29, 8, bias=False)
    convs = nn.ModuleList([nn.Conv2d(1, 6, (2, 2), stride=(1, 2)),
                           nn.Conv2d(1, 6, (3, 2), stride=(1, 2))])
    highway = nn.Linear(12, 12)
    f2o = nn.Linear(12, 100)
    o2l = nn.Linear(100, 1)
    sd = {"embeddings.weight": emb.weight,
          "highway.weight": highway.weight, "highway.bias": highway.bias,
          "feature2out.weight": f2o.weight, "feature2out.bias": f2o.bias,
          "out2logits.weight": o2l.weight, "out2logits.bias": o2l.bias}
    for i, c in enumerate(convs):
        sd[f"convs.{i}.weight"] = c.weight
        sd[f"convs.{i}.bias"] = c.bias

    params = discriminator_from_torch(sd, num_conv_banks=2)
    soft = jax.nn.softmax(jax.random.normal(jax.random.PRNGKey(2),
                                            (2, cfg.seq_len, 29)))
    ours = disc_lib.apply(params, soft, cfg, train=False)

    # torch oracle (reference forward, discriminator.py:40-60)
    import torch.nn.functional as F

    x = torch.tensor(np.asarray(soft))
    e = emb(x).unsqueeze(1)
    with torch.no_grad():
        pools = [F.max_pool2d(F.relu(c(e)), (e.size(2) - c.kernel_size[0] + 1, 1)
                              ).squeeze(2) for c in convs]
        pred = torch.cat(pools, 1).permute(0, 2, 1).reshape(-1, 12)
        hw = highway(pred)
        pred = torch.sigmoid(hw) * F.relu(hw) + (1 - torch.sigmoid(hw)) * pred
        ref = o2l(f2o(pred)).squeeze(1).numpy()
    np.testing.assert_allclose(np.asarray(ours), ref, atol=1e-5)


def test_convert_checkpoint_cli(tmp_path):
    V, E, H, L = 31, 8, 12, 1
    sd, _ = _torch_decoder_sd(V, E, H, L)
    torch_path = os.path.join(str(tmp_path), "pretrained_model.ckpt")
    torch.save({k: v.detach() for k, v in sd.items()}, torch_path)

    out_path = os.path.join(str(tmp_path), "converted.ckpt")
    import importlib

    mod = importlib.import_module("src.convert_checkpoint")
    mod.main(["--torch-ckpt", torch_path, "--output", out_path,
              "--vocab-size", str(V), "--gen-num-layers", str(L)])
    assert os.path.exists(out_path)

    from gan_image_captioning_tpu.train import checkpoint as ckpt_lib

    cfg = Config(vocab_size=V, gen_embed_dim=E, gen_hidden_dim=H,
                 gen_num_layers=L)
    template = gen_lib.init_generator_params(jax.random.PRNGKey(0), cfg,
                                             with_encoder=False)
    restored = ckpt_lib.load_params(out_path, template)
    np.testing.assert_allclose(np.asarray(restored["decoder"]["embed"]),
                               sd["decoder.embed.weight"].detach().numpy())
