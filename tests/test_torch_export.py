"""Torch export (models/torch_export.py, src/export_torch.py): round-trip
through torch_import must be exact, and exported key sets must match the
reference module layout (generator.py:8-36, discriminator.py:9-33)."""

import jax
import numpy as np
import pytest

torch = pytest.importorskip("torch")

from gan_image_captioning_tpu.config import Config
from gan_image_captioning_tpu.data.synthetic import SyntheticCaptions
from gan_image_captioning_tpu.models import api
from gan_image_captioning_tpu.models.torch_export import (
    discriminator_to_torch, generator_to_torch)
from gan_image_captioning_tpu.models.torch_import import (
    discriminator_from_torch, generator_from_torch)


def _cfg(conditional=0):
    ds = SyntheticCaptions("train", num_items=16)
    return Config(vocab_size=ds.vocab_size, gen_embed_dim=8,
                  gen_hidden_dim=12, gen_num_layers=2, max_seq_len=6,
                  disc_embed_dim=8, disc_num_rep=2, disc_filter_sizes=(2, 3),
                  disc_num_filters=(6, 6), conditional_gan=conditional,
                  image_size=16)


def _trees_equal(a, b):
    la, lb = jax.tree_util.tree_leaves(a), jax.tree_util.tree_leaves(b)
    assert len(la) == len(lb)
    for x, y in zip(la, lb):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))


def test_generator_roundtrip_unconditional():
    cfg = _cfg()
    params = api.init_generator(jax.random.PRNGKey(0), cfg)
    sd = generator_to_torch(params)
    back = generator_from_torch(sd, num_lstm_layers=cfg.gen_num_layers,
                                with_encoder=False)
    _trees_equal(params["decoder"], back["decoder"])
    # reference decoder key names exactly
    assert set(sd) == {
        "decoder.embed.weight", "decoder.linear.weight",
        "decoder.linear.bias",
        "decoder.lstm.weight_ih_l0", "decoder.lstm.weight_hh_l0",
        "decoder.lstm.bias_ih_l0", "decoder.lstm.bias_hh_l0",
        "decoder.lstm.weight_ih_l1", "decoder.lstm.weight_hh_l1",
        "decoder.lstm.bias_ih_l1", "decoder.lstm.bias_hh_l1"}


def test_generator_roundtrip_with_encoder():
    cfg = _cfg(conditional=1)
    params = api.init_generator(jax.random.PRNGKey(1), cfg)
    sd = generator_to_torch(params)
    back = generator_from_torch(sd, num_lstm_layers=cfg.gen_num_layers,
                                with_encoder=True)
    _trees_equal(params["decoder"], back["decoder"])
    _trees_equal(params["encoder"]["backbone"], back["encoder"]["backbone"])
    _trees_equal(params["encoder"]["bn_stats"], back["encoder"]["bn_stats"])
    _trees_equal(params["encoder"]["proj"], back["encoder"]["proj"])
    _trees_equal(params["encoder"]["head_bn"], back["encoder"]["head_bn"])
    # sequential numbering (generator.py:13-14) + strict-load BN counters
    assert "encoder.resnet.0.weight" in sd          # conv1 → index 0
    assert "encoder.resnet.4.0.conv1.weight" in sd  # layer1 → index 4
    assert "encoder.resnet.1.num_batches_tracked" in sd
    assert "encoder.bn.running_mean" in sd


def test_discriminator_roundtrip():
    cfg = _cfg()
    params = api.init_discriminator(jax.random.PRNGKey(2), cfg)
    sd = discriminator_to_torch(params)
    back = discriminator_from_torch(sd, num_conv_banks=2)
    _trees_equal(params, back)
    assert {"embeddings.weight", "convs.0.weight", "convs.1.bias",
            "highway.weight", "feature2out.bias",
            "out2logits.weight"} <= set(sd)


def test_strict_load_into_reference_shaped_module():
    """The exported dict must satisfy ``load_state_dict(strict=True)`` on a
    torch module mirroring the reference's exact structure (Encoder =
    Sequential(resnet18 children[:-1]) + Linear + BatchNorm1d,
    generator.py:8-16; Decoder = Embedding + LSTM + Linear,
    generator.py:27-36)."""
    import os
    import sys as _sys

    import torch.nn as nn

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    _sys.path.insert(0, os.path.join(repo, "scripts"))
    from train_reference import install_stubs

    install_stubs()
    import torchvision.models as tvm  # the real-ResNet stub

    cfg = _cfg(conditional=1)
    params = api.init_generator(jax.random.PRNGKey(5), cfg)
    sd = generator_to_torch(params)

    class Encoder(nn.Module):
        def __init__(self):
            super().__init__()
            self.resnet = nn.Sequential(*list(tvm.resnet18().children())[:-1])
            self.linear = nn.Linear(512, cfg.gen_embed_dim)
            self.bn = nn.BatchNorm1d(cfg.gen_embed_dim, momentum=0.01)

    class Decoder(nn.Module):
        def __init__(self):
            super().__init__()
            self.embed = nn.Embedding(cfg.vocab_size, cfg.gen_embed_dim)
            self.lstm = nn.LSTM(cfg.gen_embed_dim, cfg.gen_hidden_dim,
                                cfg.gen_num_layers, batch_first=True)
            self.linear = nn.Linear(cfg.gen_hidden_dim, cfg.vocab_size)

    class Generator(nn.Module):
        def __init__(self):
            super().__init__()
            self.encoder = Encoder()
            self.decoder = Decoder()

    gen = Generator()
    gen.load_state_dict(sd, strict=True)   # raises on any key/shape skew


def test_export_cli_roundtrip(tmp_path):
    cfg = _cfg()
    from gan_image_captioning_tpu.train import checkpoint as ckpt_lib

    gen = api.init_generator(jax.random.PRNGKey(3), cfg)
    disc = api.init_discriminator(jax.random.PRNGKey(4), cfg)
    src_ckpt = str(tmp_path / "adv_model.ckpt")
    ckpt_lib.save_params(src_ckpt, {"generator": gen, "discriminator": disc},
                         sync=True)
    out = str(tmp_path / "adv_torch.ckpt")

    from src.export_torch import main

    main(["--checkpoint", src_ckpt, "--output", out,
          "--dataset", "synthetic", "--max-seq-len", "6",
          "--gen-embed-dim", "8", "--gen-hidden-dim", "12",
          "--gen-num-layers", "2", "--disc-embed-dim", "8",
          "--disc-num-rep", "2", "--disc-filter-sizes", "2,3",
          "--disc-num-filters", "6,6"])

    loaded = torch.load(out, weights_only=True)
    assert set(loaded) == {"generator", "discriminator"}
    back = generator_from_torch(loaded["generator"], num_lstm_layers=2,
                                with_encoder=False)
    _trees_equal(gen["decoder"], back["decoder"])
    back_d = discriminator_from_torch(loaded["discriminator"],
                                      num_conv_banks=2)
    _trees_equal(disc, back_d)
