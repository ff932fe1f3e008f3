"""Convert a reference PyTorch checkpoint into this framework's format.

    python src/convert_checkpoint.py --torch-ckpt pretrained_model.ckpt \
        --output converted.ckpt --vocab-size 11327 --gen-num-layers 2

Handles both reference files (``training.py:118,225-226``):
  * ``pretrained_model.ckpt`` — a generator ``state_dict``,
  * ``adv_model.ckpt`` — ``{"generator": …, "discriminator": …}``.

Layouts convert 1:1 (this framework keeps torch-compatible weight shapes);
output is an Orbax checkpoint loadable by ``src/caption.py`` / ``--resume``.
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv=None):
    parser = argparse.ArgumentParser("reference-checkpoint converter")
    parser.add_argument("--torch-ckpt", required=True)
    parser.add_argument("--output", required=True)
    parser.add_argument("--vocab-size", type=int, required=True)
    parser.add_argument("--gen-num-layers", type=int, default=1)
    parser.add_argument("--num-conv-banks", type=int, default=3)
    parser.add_argument("--skip-encoder", action="store_true",
                        help="drop the encoder weights (the reference "
                        "constructs and checkpoints its Encoder even in "
                        "unconditional runs, generator.py:102; an "
                        "unconditional target model has no encoder tree)")
    args = parser.parse_args(argv)

    import torch

    from gan_image_captioning_tpu.models.torch_import import (
        discriminator_from_torch, generator_from_torch)
    from gan_image_captioning_tpu.train import checkpoint as ckpt_lib

    sd = torch.load(args.torch_ckpt, map_location="cpu", weights_only=True)

    if "generator" in sd and "discriminator" in sd:
        out = {
            "generator": generator_from_torch(
                sd["generator"], args.gen_num_layers,
                with_encoder=not args.skip_encoder),
            "discriminator": discriminator_from_torch(sd["discriminator"],
                                                      args.num_conv_banks),
        }
        kind = "adversarial (generator + discriminator)"
    else:
        out = generator_from_torch(sd, args.gen_num_layers,
                                   with_encoder=not args.skip_encoder)
        kind = "generator"

    # a one-shot CLI tool: write synchronously (the async writer targets
    # the training step loop; orbax commits at interpreter exit are fragile)
    ckpt_lib.save_params(os.path.abspath(args.output), out, sync=True)
    print(f"converted {kind} checkpoint → {args.output}")


if __name__ == "__main__":
    main()
