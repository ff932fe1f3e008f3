"""In-process smoke tests for the CLI tools (caption, evaluate, bitmatch,
build_vocab) — each invoked through its main(argv)."""

import json
import os
import sys

import jax
import numpy as np
import pytest
import torch

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from gan_image_captioning_tpu.config import Config
from gan_image_captioning_tpu.models import api
from gan_image_captioning_tpu.train import checkpoint as ckpt_lib

DIMS = ["--dataset", "synthetic", "--max-seq-len", "9",
        "--gen-embed-dim", "12", "--gen-hidden-dim", "16",
        "--pre-eval-batch-size", "8", "--num-workers", "1"]


@pytest.fixture(scope="module")
def gen_ckpt(tmp_path_factory):
    tmp = str(tmp_path_factory.mktemp("cli"))
    cfg = Config(vocab_size=35, gen_embed_dim=12, gen_hidden_dim=16,
                 max_seq_len=9)
    params = api.init_generator(jax.random.PRNGKey(0), cfg)
    path = os.path.join(tmp, "gen.ckpt")
    ckpt_lib.save_params(path, params)
    return path


def test_caption_cli(gen_ckpt, tmp_path, capsys):
    from src.caption import main

    out = os.path.join(str(tmp_path), "caps.jsonl")
    main(["--checkpoint", gen_ckpt, *DIMS, "--num-samples", "4",
          "--beam-size", "2", "--output", out])
    lines = [json.loads(l) for l in open(out)]
    assert len(lines) == 4
    assert all("caption" in l and "logprob" in l for l in lines)


def test_evaluate_cli(gen_ckpt, capsys):
    from src.evaluate import main

    main(["--checkpoint", gen_ckpt, *DIMS, "--max-batches", "1"])
    result = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert np.isfinite(result["nll_gen"]) and 0 <= result["bleu4"] <= 1
    assert result["num_samples"] > 0


def test_bitmatch_cli(tmp_path, capsys):
    import torch.nn as nn

    from src.bitmatch import main

    torch.manual_seed(0)
    V, E, H = 35, 12, 16
    embed, lstm, lin = (nn.Embedding(V, E),
                        nn.LSTM(E, H, 1, batch_first=True), nn.Linear(H, V))
    sd = {"decoder.embed.weight": embed.weight.detach(),
          "decoder.linear.weight": lin.weight.detach(),
          "decoder.linear.bias": lin.bias.detach()}
    for n in ("weight_ih", "weight_hh", "bias_ih", "bias_hh"):
        sd[f"decoder.lstm.{n}_l0"] = getattr(lstm, f"{n}_l0").detach()
    ckpt = os.path.join(str(tmp_path), "ref.ckpt")
    torch.save(sd, ckpt)

    match = main(["--torch-ckpt", ckpt, *DIMS, "--num-samples", "16"])
    assert match == 1.0


def test_build_vocab_cli(tmp_path, capsys):
    from src.build_vocab import main
    from tests.test_data import _mini_karpathy

    _mini_karpathy(str(tmp_path))
    main(["--data-dir", str(tmp_path), "--captions-per-image", "2",
          "--splits", "train,val"])
    out = [json.loads(l) for l in capsys.readouterr().out.strip().splitlines()]
    assert out[0]["split"] == "train" and out[0]["vocab_size"] > 4
    assert os.path.exists(os.path.join(str(tmp_path), "train_2.pkl"))


@pytest.mark.slow
def test_bitmatch_cli_conditional(tmp_path, capsys):
    """Conditional bit-match: fabricated reference checkpoint with a REAL
    ResNet-18 encoder (scripts/train_reference stubs) — our functional
    encoder + jitted decode must reproduce the reference Encoder+decode
    loop token-for-token on mini-COCO val images."""
    import sys as _sys

    import torch.nn as nn

    from src.bitmatch import main

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    _sys.path.insert(0, os.path.join(repo, "scripts"))
    from train_reference import install_stubs

    install_stubs()
    import torchvision.models as tvm  # the real-ResNet stub

    torch.manual_seed(0)
    V, E, H = 31, 16, 24
    resnet = tvm.resnet18()
    resnet_seq = nn.Sequential(*list(resnet.children())[:-1])
    proj = nn.Linear(512, E)
    bn = nn.BatchNorm1d(E, momentum=0.01)
    embed, lstm, lin = (nn.Embedding(V, E),
                        nn.LSTM(E, H, 1, batch_first=True), nn.Linear(H, V))
    sd = {"decoder.embed.weight": embed.weight.detach(),
          "decoder.linear.weight": lin.weight.detach(),
          "decoder.linear.bias": lin.bias.detach(),
          "encoder.linear.weight": proj.weight.detach(),
          "encoder.linear.bias": proj.bias.detach()}
    for n in ("weight_ih", "weight_hh", "bias_ih", "bias_hh"):
        sd[f"decoder.lstm.{n}_l0"] = getattr(lstm, f"{n}_l0").detach()
    for k, v in resnet_seq.state_dict().items():
        sd[f"encoder.resnet.{k}"] = v
    for k, v in bn.state_dict().items():
        if "num_batches" not in k:
            sd[f"encoder.bn.{k}"] = v
    ckpt = os.path.join(str(tmp_path), "ref_cond.ckpt")
    torch.save(sd, ckpt)

    match = main(["--torch-ckpt", ckpt, "--dataset", "coco",
                  "--data-dir", os.path.join(repo, "data", "mini_coco"),
                  "--conditional-gan", "1", "--image-size", "64",
                  "--gen-embed-dim", str(E), "--gen-hidden-dim", str(H),
                  "--gen-num-layers", "1", "--max-seq-len", "7",
                  "--captions-per-image", "5", "--num-samples", "8"])
    assert match == 1.0
