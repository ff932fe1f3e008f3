"""Training entry point — CLI-compatible with the reference ``src/main.py``.

The canonical invocation (reference ``sbatch_script.s:16``) runs unchanged:

    python3 src/main.py --data-dir ../coco_data --gen-embed-dim 512 \
        --pretrain-epochs 50 --gen-num-layers 2 --adv-epochs 50 \
        --pretrain-lr 1e-2 --gen-lr 1e-4 --disc-lr 1e-4 \
        --dataset_percent 0.1 --captions-per-image 5

Sequence (reference ``main.py:10-48``): parse flags + create experiment dirs
→ seed RNGs (1008, ``main.py:14``) → build train/val datasets → inject
``vocab_size`` (``main.py:38``) → construct the instructor → run.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from gan_image_captioning_tpu.config import config_from_args, get_args


def build_datasets(args):
    if args.dataset == "synthetic":
        from gan_image_captioning_tpu.data.synthetic import SyntheticCaptions

        conditional = args.conditional_gan == 1
        n = getattr(args, "synthetic_items", 512)
        train = SyntheticCaptions("train", num_items=n,
                                  image_size=args.image_size,
                                  conditional=conditional, seed=args.seed)
        val = SyntheticCaptions("val", num_items=max(n // 4, 16),
                                image_size=args.image_size,
                                conditional=conditional, seed=args.seed)
        return train, val

    from gan_image_captioning_tpu.data.coco import CocoCaptions

    captions_path = os.path.join(args.data_dir, "dataset_coco.json")
    conditional = args.conditional_gan == 1
    device_pre = bool(getattr(args, "device_preprocess", 0))
    bpe = None
    if getattr(args, "tokenizer", "word") == "bpe":
        from gan_image_captioning_tpu.data.bpe import BPETokenizer

        assert args.bpe_vocab and args.bpe_merges, (
            "--tokenizer bpe needs --bpe-vocab and --bpe-merges")
        bpe = BPETokenizer(args.bpe_vocab, args.bpe_merges)
    train = CocoCaptions(captions_path, args.data_dir, "train",
                         args.image_size, args.captions_per_image,
                         dataset_percent=args.dataset_percent,
                         conditional=conditional,
                         device_preprocess=device_pre, bpe_tokenizer=bpe)
    val = CocoCaptions(captions_path, args.data_dir, "val", args.image_size,
                       args.captions_per_image,
                       vocab_dicts=(train.word_to_index, train.index_to_word),
                       dataset_percent=args.dataset_percent,
                       conditional=conditional,
                       device_preprocess=device_pre, bpe_tokenizer=bpe)
    return train, val


def inject_vocab_size(args, train_dataset):
    """Reference ``main.py:38`` + the TPU vocab padding: align the vocab dim
    to the MXU's 128-lane tiling / make vocab-dim tensor parallelism
    divisible (``--vocab-multiple``; padded ids are inert).  Every CLI that
    loads a checkpoint must apply the SAME padding the training run did, or
    the param templates won't match the stored shapes."""
    args.vocab_size = train_dataset.vocab_size
    if getattr(args, "vocab_multiple", 1) > 1:
        m = args.vocab_multiple
        args.vocab_size = ((args.vocab_size + m - 1) // m) * m
    return args


def main(argv=None):
    args = get_args(argv)

    from gan_image_captioning_tpu.utils.runtime import setup

    setup()

    train_dataset, val_dataset = build_datasets(args)
    inject_vocab_size(args, train_dataset)

    config = config_from_args(args)

    # Reproducibility: dump the fully-resolved flag namespace (including the
    # post-dataset vocab_size and any --preset expansion) into the run dir.
    import json

    with open(os.path.join(args.save_dir, "config.json"), "w") as f:
        json.dump({k: (v if isinstance(v, (int, float, str, bool, list,
                                           type(None))) else str(v))
                   for k, v in sorted(vars(args).items())}, f, indent=1)

    from gan_image_captioning_tpu.train.instructor import GANInstructor

    inst = GANInstructor(config, train_dataset, val_dataset)
    inst._run()
    return inst


if __name__ == "__main__":
    main()
