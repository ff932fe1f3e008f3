"""Human-evaluation harness — the report's Table 6 protocol as a tool.

The reference's human study (NLP_Report.pdf §4.4, Table 6: Real 4.445 /
Generated 2.048 / MLE 4.013 on 100 images, 1-5 scale) was run by hand with
no committed tooling.  This CLI makes that workflow reproducible:

  # 1. Build a BLIND rating sheet (systems shuffled per image; the mapping
  #    goes into a separate key file the rater never sees):
  python src/human_eval.py --checkpoint …/adv_model.ckpt \
      --mle-checkpoint …/pretrained_model.ckpt --dataset synthetic \
      --num-images 100 --sheet sheet.csv --key key.json

  # 2. A human fills the empty ``rating`` column with 1-5 scores.

  # 3. Aggregate Table-6-style means per system:
  python src/human_eval.py --score-sheet sheet_filled.csv --key key.json

The sheet carries one row per (image, system) with only the caption text;
``image_id`` groups rows so raters judge captions of the same image
together, exactly as the report's raters saw Real / Generated / MLE
side-by-side without labels.  When ``--checkpoint`` is an adv_model.ckpt
(generator + discriminator) the key file also records the discriminator's
sigmoid realism score per caption — the automatic counterpart the report
reports alongside the human means (Table 6 row "Discriminator score").
"""

import argparse
import csv
import json
import os
import random
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import numpy as np

from gan_image_captioning_tpu.config import (apply_device_flag,
                                             build_parser,
                                             config_from_args)


def parse_args(argv=None):
    parser = build_parser()
    parser.add_argument("--checkpoint", type=str, default="",
                        help="generator to rate as 'generated' "
                        "(adv_model.ckpt also yields disc scores)")
    parser.add_argument("--mle-checkpoint", type=str, default="",
                        help="optional second system rated as 'mle' "
                        "(the report compares Real/Generated/MLE)")
    parser.add_argument("--split", type=str, default="val",
                        choices=["train", "val", "test"])
    parser.add_argument("--num-images", type=int, default=100,
                        help="images to sample (the report used 100)")
    parser.add_argument("--sheet", type=str, default="human_eval_sheet.csv",
                        help="output rating sheet (CSV, blind)")
    parser.add_argument("--key", type=str, default="human_eval_key.json",
                        help="output row→system key (keep away from raters)")
    parser.add_argument("--shuffle-seed", type=int, default=1008,
                        help="seed for the per-image system shuffle")
    parser.add_argument("--score-sheet", type=str, default="",
                        help="score mode: path to a FILLED sheet; aggregates "
                        "mean rating per system using --key")
    args = parser.parse_args(argv)
    if not args.score_sheet and not args.checkpoint:
        parser.error("--checkpoint is required (unless scoring a filled "
                     "sheet with --score-sheet)")
    apply_device_flag(args)
    return args


def score_sheet(sheet_path: str, key_path: str):
    """Aggregate a filled sheet into Table-6-style per-system means."""
    with open(key_path) as f:
        key = json.load(f)
    rows = key["rows"]
    ratings = {}
    n_blank = 0
    bad_rows = []
    with open(sheet_path) as f:
        for rec in csv.DictReader(f):
            row_id = rec["row_id"]
            val = (rec.get("rating") or "").strip()
            if not val:
                n_blank += 1
                continue
            try:
                score = float(val.replace(",", "."))  # hand-edited CSVs:
            except ValueError:                        # tolerate 3,5 = 3.5
                bad_rows.append(row_id)               # skip n/a etc., but
                continue                              # report which rows
            system = rows[row_id]["system"]
            ratings.setdefault(system, []).append(score)
    result = {"num_rated": sum(len(v) for v in ratings.values()),
              "num_blank": n_blank}
    if bad_rows:
        result["unparsable_rows"] = bad_rows
    for system, vals in sorted(ratings.items()):
        result[f"rating_{system}"] = round(float(np.mean(vals)), 3)
    for system, vals in sorted(key.get("disc_scores", {}).items()):
        if vals:
            result[f"disc_score_{system}"] = round(float(np.mean(vals)), 4)
    return result


def main(argv=None):
    args = parse_args(argv)

    if args.score_sheet:
        print(json.dumps(score_sheet(args.score_sheet, args.key)))
        return

    from gan_image_captioning_tpu.utils.runtime import setup

    setup()

    from src.main import build_datasets, inject_vocab_size

    train_ds, val_ds = build_datasets(args)
    ds = {"train": train_ds, "val": val_ds, "test": val_ds}[args.split]
    inject_vocab_size(args, train_ds)
    config = config_from_args(args)

    from gan_image_captioning_tpu.data.loader import Batcher
    from gan_image_captioning_tpu.eval import decode as decode_lib
    from gan_image_captioning_tpu.eval.metrics import (ids_to_words,
                                                       strip_caption)
    from gan_image_captioning_tpu.models import api
    from gan_image_captioning_tpu.train import checkpoint as ckpt_lib

    systems = {}   # name -> generator params
    gen_params, disc_params = ckpt_lib.load_generator_checkpoint(
        args.checkpoint, config)
    systems["generated"] = gen_params
    if args.mle_checkpoint:
        systems["mle"], _ = ckpt_lib.load_generator_checkpoint(
            args.mle_checkpoint, config)

    beam = max(1, config.beam_size)

    def decode_batch(params, batch):
        cond, _ = api.generator_condition(config, params, batch, train=False)
        if beam > 1:
            ids, _ = decode_lib.beam_search(
                params, cond["features"], config, beam_size=beam,
                context=cond["context"],
                length_penalty=config.length_penalty)
        else:
            ids = decode_lib.greedy(params, cond["features"], config,
                                    context=cond["context"])
        return ids

    def disc_score_batch(ids):
        import jax.numpy as jnp

        return jax.nn.sigmoid(api.discriminator_apply(
            disc_params, jnp.asarray(ids), config, train=False))

    decode_jit = decode_batch if config.no_jit else jax.jit(decode_batch)
    score_jit = (None if disc_params is None else
                 (disc_score_batch if config.no_jit
                  else jax.jit(disc_score_batch)))

    # Collect the first --num-images real rows, then decode each system on
    # the SAME batches so every image has one caption per system.
    batch_size = min(args.num_images, config.pre_eval_batch_size)
    loader = Batcher(ds, batch_size, config.seq_len, shuffle=False,
                     num_workers=config.num_workers)
    batches, kept = [], 0
    for batch in loader:
        batches.append(batch)
        kept += int(batch["weights"].sum())
        if kept >= args.num_images:
            break

    def words(ids_row):
        return " ".join(ids_to_words(strip_caption(ids_row),
                                     ds.index_to_word))

    captions = {name: [] for name in systems}  # system -> [str]
    captions["real"] = []
    disc_scores = {name: [] for name in list(systems) + ["real"]}
    n = 0
    for batch in batches:
        per_system_ids = {"real": np.asarray(batch["captions"])}
        for name, params in systems.items():
            per_system_ids[name] = np.asarray(decode_jit(params, batch))
        per_system_d = {}
        if score_jit is not None:
            for name, ids in per_system_ids.items():
                per_system_d[name] = np.asarray(score_jit(ids))
        for i in range(per_system_ids["real"].shape[0]):
            if batch["weights"][i] == 0 or n >= args.num_images:
                continue
            for name, ids in per_system_ids.items():
                captions[name].append(words(ids[i]))
                if name in per_system_d:
                    disc_scores[name].append(float(per_system_d[name][i]))
            n += 1

    # Blind sheet: per image, rows for each system in shuffled order.
    rng = random.Random(args.shuffle_seed)
    key_rows = {}
    with open(args.sheet, "w", newline="") as f:
        writer = csv.writer(f)
        writer.writerow(["row_id", "image_id", "caption", "rating"])
        for img in range(n):
            names = sorted(captions)
            rng.shuffle(names)
            for k, name in enumerate(names):
                row_id = f"r{img:04d}_{k}"
                writer.writerow([row_id, f"img{img:04d}",
                                 captions[name][img], ""])
                key_rows[row_id] = {"image_id": f"img{img:04d}",
                                    "system": name}
    with open(args.key, "w") as f:
        json.dump({"rows": key_rows,
                   "disc_scores": {k: v for k, v in disc_scores.items()
                                   if v},
                   "num_images": n,
                   "systems": sorted(captions),
                   "checkpoint": args.checkpoint,
                   "mle_checkpoint": args.mle_checkpoint}, f, indent=1)
    print(json.dumps({"sheet": args.sheet, "key": args.key,
                      "num_images": n,
                      "rows": len(key_rows),
                      "systems": sorted(captions)}))


if __name__ == "__main__":
    main()
