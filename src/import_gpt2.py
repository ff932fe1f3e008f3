"""Import pretrained GPT-2 weights into this framework's transformer
generator (BASELINE.json config 5: "ViT-B encoder + GPT-2-small generator").

    python src/import_gpt2.py --hf-dir /path/to/gpt2 --output gpt2_gen.ckpt \
        [--max-seq-len 34] [--conditional-gan 1]

``--hf-dir`` is a LOCAL HuggingFace checkpoint directory (config.json +
pytorch_model.bin / model.safetensors) — this environment has zero egress,
so the directory must already be on disk; ``--state-dict`` alternatively
points at a bare ``state_dict`` .bin/.pt.  Mapping oracle-tested against
``transformers.GPT2LMHeadModel`` (tests/test_gpt2_import.py: identical
logits through our block stack).

The output is a generator params checkpoint for ``--init-gen-ckpt`` with:
  * all GPT-2 weights mapped 1:1 (wte→embed+tied head with 4 special rows
    prepended for <PAD>/<S>/<E>/<UNK>, wpe→pos, blocks, ln_f);
  * cross-attention blocks + ctx_proj (and the image encoder when
    ``--conditional-gan 1``) freshly initialized — GPT-2 has no
    cross-attention; they train during captioning fine-tuning.

Full fine-tune recipe (once GPT-2-small files are on disk):

    python src/import_gpt2.py --hf-dir gpt2/ --output gpt2_gen.ckpt \
        --gen-arch gpt2 --conditional-gan 1
    python src/main.py --gen-arch gpt2 --tokenizer bpe \
        --bpe-vocab gpt2/vocab.json --bpe-merges gpt2/merges.txt \
        --init-gen-ckpt gpt2_gen.ckpt --conditional-gan 1 ...
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
    from transformers import GPT2LMHeadModel

    model = GPT2LMHeadModel.from_pretrained(args.hf_dir)
    return model.state_dict()


def main(argv=None):
    from gan_image_captioning_tpu.config import build_parser

    parser = build_parser()
    parser.add_argument("--hf-dir", type=str, default="",
                        help="local HF GPT-2 checkpoint directory")
    parser.add_argument("--state-dict", type=str, default="",
                        help="bare torch state_dict file (alternative)")
    parser.add_argument("--output", type=str, required=True)
    args = parser.parse_args(argv)
    assert args.hf_dir or args.state_dict, "--hf-dir or --state-dict required"

    import jax

    from gan_image_captioning_tpu.config import config_from_args
    from gan_image_captioning_tpu.models import api
    from gan_image_captioning_tpu.models.torch_import import (
        gpt2_decoder_from_torch)
    from gan_image_captioning_tpu.train import checkpoint as ckpt_lib

    sd = load_state_dict(args)
    dec = gpt2_decoder_from_torch(sd, seq_len_plus_1=args.max_seq_len + 3)

    # graft framework-only parts (cross-attention, ctx projection, encoder)
    # from a freshly initialized tree of the matching geometry
    args.vocab_size = int(dec["embed"].shape[0])
    if args.gen_arch == "lstm":
        args.gen_arch = "gpt2"  # default to the GPT-2 preset geometry
    config = config_from_args(args)
    d = int(dec["embed"].shape[1])
    n_layers = len(dec["blocks"])
    d_mlp = int(dec["blocks"][0]["mlp"]["fc1"]["w"].shape[1])
    config = config.replace(gen_arch="transformer", gen_embed_dim=d,
                            gen_num_layers=n_layers, gen_hidden_dim=d_mlp)
    fresh = api.init_generator(jax.random.PRNGKey(config.seed), config)
    fresh_dec = fresh["decoder"]
    dec["ctx_proj"] = fresh_dec["ctx_proj"]
    for blk, fresh_blk in zip(dec["blocks"], fresh_dec["blocks"]):
        blk["cross"] = fresh_blk["cross"]
        blk["ln_cross"] = fresh_blk["ln_cross"]
    out = {"decoder": dec}
    if "encoder" in fresh:
        out["encoder"] = fresh["encoder"]

    ckpt_lib.save_params(os.path.abspath(args.output), out, sync=True)
    print(f"imported GPT-2 ({n_layers} layers, d={d}, "
          f"vocab={args.vocab_size} incl. 4 specials) → {args.output}")
    print(f"fine-tune: python src/main.py --gen-arch gpt2 --tokenizer bpe "
          f"--init-gen-ckpt {args.output} ...")


if __name__ == "__main__":
    main()
