"""Greedy-decode bit-match harness vs. a reference PyTorch checkpoint.

The north star requires "bit-matching greedy captions on the val set".
This tool loads a reference ``pretrained_model.ckpt`` (torch state_dict),
runs greedy decode through BOTH frameworks from the same weights — this
framework's jitted ``lax.scan`` and a live torch replica of the reference's
decode loop (``generator.py:55-81``) — and reports the token-level match
rate over the requested dataset split.

    python src/bitmatch.py --torch-ckpt pretrained_model.ckpt \
        --dataset synthetic --gen-num-layers 2 --num-samples 64

Prints one JSON line: {"sequences": N, "token_match": …, "seq_match": …}.
(Exact match expected in float32 on CPU; see tests/test_torch_import.py for
the function-level version of this check.)
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def parse_args(argv=None):
    from gan_image_captioning_tpu.config import (apply_device_flag,
                                                 build_parser)

    parser = build_parser()
    parser.add_argument("--torch-ckpt", required=True,
                        help="reference generator state_dict (.ckpt)")
    parser.add_argument("--num-samples", type=int, default=64)
    args = parser.parse_args(argv)
    apply_device_flag(args)
    return args


def main(argv=None):
    args = parse_args(argv)

    import jax
    import torch
    import torch.nn as nn

    from gan_image_captioning_tpu.config import config_from_args
    from gan_image_captioning_tpu.models import generator as gen_lib
    from gan_image_captioning_tpu.models.torch_import import generator_from_torch
    from src.main import build_datasets, inject_vocab_size

    train_ds, val_ds = build_datasets(args)
    inject_vocab_size(args, train_ds)
    config = config_from_args(args)

    sd = torch.load(args.torch_ckpt, map_location="cpu", weights_only=True)
    if "generator" in sd:
        sd = sd["generator"]
    params = generator_from_torch(sd, config.gen_num_layers,
                                  with_encoder=bool(config.cgan))

    batch = min(args.num_samples, 64)
    if config.cgan:
        # conditional: identical val images through BOTH encoders — ours
        # (functional JAX ResNet-18, eval-mode BN) vs the reference's own
        # Encoder module (generator.py:8-25, real-ResNet torchvision stub
        # from scripts/train_reference.py) — then greedy-decode from each
        # framework's own features.
        import jax.numpy as jnp

        from gan_image_captioning_tpu.models import encoder as enc_lib

        batch = min(batch, len(val_ds))
        imgs = np.stack([np.asarray(val_ds.sample(i)[1])
                         for i in range(batch)])
        feats_j, _ = enc_lib.encode(params["encoder"], jnp.asarray(imgs),
                                    config, train=False)
        feats = np.asarray(feats_j)

        scripts_dir = os.path.join(os.path.dirname(
            os.path.dirname(os.path.abspath(__file__))), "scripts")
        sys.path.insert(0, scripts_dir)
        from train_reference import REF_SRC, install_stubs

        install_stubs()
        sys.path.insert(0, REF_SRC)
        from generator import Encoder as RefEncoder  # reference module

        import argparse as _ap

        ref_enc = RefEncoder(_ap.Namespace(gen_embed_dim=config.gen_embed_dim))
        enc_sd = {k[len("encoder."):]: v for k, v in sd.items()
                  if k.startswith("encoder.")}
        ref_enc.load_state_dict(enc_sd)
        ref_enc.eval()
        with torch.no_grad():
            feats_torch = ref_enc(torch.tensor(imgs)).numpy()
        feat_maxdiff = float(np.abs(feats - feats_torch).max())
    else:
        feats = gen_lib.start_token_features(params["decoder"], batch)
        feats_torch = np.asarray(feats)
        feat_maxdiff = 0.0
    import jax.numpy as jnp

    _, ours = gen_lib.sample_jit(params["decoder"], jnp.asarray(feats),
                                 jax.random.PRNGKey(0), 1.0, config.seq_len,
                                 True)
    ours = np.asarray(ours)

    # --- torch replica of the reference decode loop (generator.py:55-81)
    V, E, H = config.vocab_size, config.gen_embed_dim, config.gen_hidden_dim
    embed = nn.Embedding(V, E)
    lstm = nn.LSTM(E, H, config.gen_num_layers, batch_first=True)
    linear = nn.Linear(H, V)
    with torch.no_grad():
        embed.weight.copy_(torch.tensor(np.asarray(params["decoder"]["embed"])))
        for k, lp in enumerate(params["decoder"]["lstm"]):
            getattr(lstm, f"weight_ih_l{k}").copy_(torch.tensor(np.asarray(lp["w_ih"])))
            getattr(lstm, f"weight_hh_l{k}").copy_(torch.tensor(np.asarray(lp["w_hh"])))
            getattr(lstm, f"bias_ih_l{k}").copy_(torch.tensor(np.asarray(lp["b_ih"])))
            getattr(lstm, f"bias_hh_l{k}").copy_(torch.tensor(np.asarray(lp["b_hh"])))
        linear.weight.copy_(torch.tensor(np.asarray(params["decoder"]["linear"]["w"])))
        linear.bias.copy_(torch.tensor(np.asarray(params["decoder"]["linear"]["b"])))

    inputs = torch.tensor(np.asarray(feats_torch)).unsqueeze(1)
    states, theirs = None, []
    with torch.no_grad():
        for _ in range(config.seq_len):
            h, states = lstm(inputs, states)
            logits = linear(h.squeeze(1))
            ids = torch.softmax(logits, -1).max(1)[1]
            theirs.append(ids)
            inputs = embed(ids).unsqueeze(1)
    theirs = torch.stack(theirs, 1).numpy()

    token_match = float((ours == theirs).mean())
    seq_match = float((ours == theirs).all(axis=1).mean())
    print(json.dumps({"sequences": int(ours.shape[0]),
                      "token_match": round(token_match, 6),
                      "seq_match": round(seq_match, 6),
                      "feature_maxdiff": round(feat_maxdiff, 8),
                      "conditional": int(config.cgan)}))
    return token_match


if __name__ == "__main__":
    main()
