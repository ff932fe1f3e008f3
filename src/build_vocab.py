"""One-shot vocabulary/caption-cache builder.

The reference builds its vocab lazily inside the Dataset constructor on
first run (``tasks.py:30-88``); this CLI does the same work up front as an
explicit preprocessing step, writing the identical, reference-compatible
pickle caches (``{split}_{cpi}.pkl``) so training startup is instant:

    python src/build_vocab.py --data-dir ../coco_data --captions-per-image 5

Prints one JSON summary line per split.
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from gan_image_captioning_tpu.data.vocab import build_coco_records


def main(argv=None):
    parser = argparse.ArgumentParser("vocab/caption-cache builder")
    parser.add_argument("--data-dir", required=True,
                        help="dir with dataset_coco.json and image folders")
    parser.add_argument("--captions-per-image", type=int, default=5)
    parser.add_argument("--splits", type=str, default="train,val,test")
    args = parser.parse_args(argv)

    captions_path = os.path.join(args.data_dir, "dataset_coco.json")
    vocab = None
    for split in [s for s in args.splits.split(",") if s]:
        caps, w2i, i2w = build_coco_records(
            captions_path, args.data_dir, split, args.captions_per_image,
            vocab_dicts=vocab, use_cache=True)
        if vocab is None:
            vocab = (w2i, i2w)  # train vocab reused read-only (tasks.py:50-51)
        print(json.dumps({"split": split, "captions": len(caps),
                          "vocab_size": len(w2i),
                          "cache": f"{split}_{args.captions_per_image}.pkl"}))


if __name__ == "__main__":
    main()
