"""Import pretrained ViT weights into this framework's image encoder
(BASELINE.json config 5: "ViT-B encoder + GPT-2-small generator").

    python src/import_vit.py --hf-dir /path/to/vit-base-patch16-224 \
        --output vit_gen.ckpt [--image-size 256] [--base-ckpt gpt2_gen.ckpt]

``--hf-dir`` is a LOCAL HuggingFace ViTModel checkpoint directory (zero
egress — must already be on disk); ``--state-dict`` alternatively points at
a bare torch ``state_dict``.  Mapping oracle-tested against
``transformers.ViTModel`` (tests/test_vit_import.py: identical CLS/grid
features through our block stack, position-embedding resize covered).

The output is a generator params checkpoint for ``--init-gen-ckpt`` with
the ViT backbone imported and everything else (projection head, decoder)
either freshly initialized or — with ``--base-ckpt`` — taken from an
existing checkpoint (e.g. the ``src/import_gpt2.py`` output, completing
the full config-5 recipe):

    python src/import_gpt2.py --hf-dir gpt2/ --output gpt2_gen.ckpt \
        --conditional-gan 1 --encoder-arch vit
    python src/import_vit.py --hf-dir vit/ --base-ckpt gpt2_gen.ckpt \
        --output vit_gpt2_gen.ckpt --conditional-gan 1
    python src/main.py --gen-arch gpt2 --encoder-arch vit --tokenizer bpe \
        --init-gen-ckpt vit_gpt2_gen.ckpt --conditional-gan 1 ...
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def load_state_dict(args):
    import torch

    if args.state_dict:
        return torch.load(args.state_dict, map_location="cpu",
                          weights_only=True)
    from transformers import ViTModel

    model = ViTModel.from_pretrained(args.hf_dir, add_pooling_layer=False)
    return model.state_dict()


def main(argv=None):
    from gan_image_captioning_tpu.config import build_parser

    parser = build_parser()
    parser.add_argument("--hf-dir", type=str, default="",
                        help="local HF ViTModel checkpoint directory")
    parser.add_argument("--state-dict", type=str, default="",
                        help="bare torch state_dict file (alternative)")
    parser.add_argument("--base-ckpt", type=str, default="",
                        help="existing generator ckpt to graft the ViT "
                        "backbone into (e.g. the import_gpt2.py output); "
                        "default: fresh init")
    parser.add_argument("--output", type=str, required=True)
    args = parser.parse_args(argv)
    assert args.hf_dir or args.state_dict, "--hf-dir or --state-dict required"

    import jax

    from gan_image_captioning_tpu.config import config_from_args
    from gan_image_captioning_tpu.models import api
    from gan_image_captioning_tpu.models.torch_import import vit_from_torch
    from gan_image_captioning_tpu.train import checkpoint as ckpt_lib

    sd = load_state_dict(args)
    args.conditional_gan = True
    args.encoder_arch = "vit"
    if getattr(args, "vocab_size", -1) is None or \
            getattr(args, "vocab_size", -1) <= 0:
        args.vocab_size = 256  # placeholder; --init-gen-ckpt loads shapes
    config = config_from_args(args)
    weights, stats = vit_from_torch(sd, image_size=config.image_size)

    params = api.init_generator(jax.random.PRNGKey(config.seed), config)
    if args.base_ckpt:
        params = ckpt_lib.load_params(args.base_ckpt, params)
    params["encoder"]["backbone"] = weights
    params["encoder"]["bn_stats"]["backbone"] = stats
    ckpt_lib.save_params(args.output, params)
    ckpt_lib.wait_for_checkpoints()
    print(args.output)


if __name__ == "__main__":
    main()
