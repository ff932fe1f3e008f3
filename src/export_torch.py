"""Export a framework checkpoint to the reference's PyTorch format.

The inverse of ``src/convert_checkpoint.py`` (torch → orbax): weights
trained here flow BACK into the reference codebase as ``torch.save``-d
``state_dict`` files with the reference's exact names and file shapes —
``pretrained_model.ckpt`` style (generator state_dict) or
``adv_model.ckpt`` style (``{"generator": ..., "discriminator": ...}``,
reference ``training.py:118,225-226``).

    python src/export_torch.py --checkpoint save/e_1/models/adv_model.ckpt \
        --output /tmp/adv_model_torch.ckpt --dataset synthetic [model flags]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

from gan_image_captioning_tpu.config import (apply_device_flag,
                                             build_parser,
                                             config_from_args)


def parse_args(argv=None):
    parser = build_parser()
    parser.add_argument("--checkpoint", type=str, required=True,
                        help="framework checkpoint (generator params or "
                             "adv {generator, discriminator} dict)")
    parser.add_argument("--output", type=str, required=True,
                        help="where to torch.save the state_dict")
    args = parser.parse_args(argv)
    apply_device_flag(args)
    return args


def main(argv=None):
    args = parse_args(argv)

    from gan_image_captioning_tpu.utils.runtime import setup

    setup()
    from src.main import build_datasets, inject_vocab_size

    train_ds, _ = build_datasets(args)
    inject_vocab_size(args, train_ds)
    config = config_from_args(args)
    if config.gen_arch != "lstm" or config.disc_arch != "cnn":
        raise SystemExit("torch export targets the reference's module "
                         "structure: LSTM generator / CNN discriminator "
                         "(the reference has no other architectures)")

    import torch

    from gan_image_captioning_tpu.models import api
    from gan_image_captioning_tpu.models.torch_export import (
        discriminator_to_torch, generator_to_torch)
    from gan_image_captioning_tpu.train import checkpoint as ckpt_lib

    gen_t = api.init_generator(jax.random.PRNGKey(0), config)
    try:
        gen_params = ckpt_lib.load_params(args.checkpoint, gen_t)
        disc_params = None
    except Exception:
        disc_t = api.init_discriminator(jax.random.PRNGKey(1), config)
        both = ckpt_lib.load_params(args.checkpoint,
                                    {"generator": gen_t,
                                     "discriminator": disc_t})
        gen_params, disc_params = both["generator"], both["discriminator"]

    gen_sd = generator_to_torch(gen_params)
    if disc_params is not None:
        torch.save({"generator": gen_sd,
                    "discriminator": discriminator_to_torch(disc_params)},
                   args.output)
        print(f"wrote adv-style torch checkpoint (gen {len(gen_sd)} keys) "
              f"to {args.output}")
    else:
        torch.save(gen_sd, args.output)
        print(f"wrote generator torch state_dict ({len(gen_sd)} keys) "
              f"to {args.output}")


if __name__ == "__main__":
    main()
