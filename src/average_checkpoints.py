"""Checkpoint averaging — write the elementwise mean of N checkpoints.

Polyak/SWA-style post-hoc averaging of saved snapshots (the framework's
periodic ``state_{epoch}.ckpt`` files from ``--checkpoint-every``, or any
best-val checkpoints).  The reference has no counterpart (it only ever
writes two best-val files, ``training.py:116-119,223-227``); averaging the
tail of a run is a standard cheap win on top of the EMA shadow
(``--ema-decay``), usable when the decision to average is made AFTER
training.

    python src/average_checkpoints.py \
        --checkpoints save/e_1/models/state_10.ckpt save/e_1/models/state_20.ckpt \
        --output save/e_1/models/avg_model.ckpt \
        --dataset synthetic  [model-geometry flags matching the run]

Accepts any mix of checkpoint forms and averages what they share:

  * ``pretrained_model.ckpt``       — generator params
  * ``adv_model.ckpt``              — ``{generator, discriminator}``
  * ``state_{N}.ckpt``              — full TrainState (generator +
                                      discriminator extracted)

Output: generator-only params ckpt (loadable by ``src/evaluate.py`` /
``src/caption.py`` / ``src/serve.py``), or an ``adv_model.ckpt``-shaped
dict when EVERY input provides a discriminator.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import numpy as np

from gan_image_captioning_tpu.config import (apply_device_flag,
                                             build_parser,
                                             config_from_args)


def parse_args(argv=None):
    parser = build_parser()
    parser.add_argument("--checkpoints", type=str, nargs="+", required=True,
                        help="two or more checkpoint paths to average")
    parser.add_argument("--output", type=str, required=True,
                        help="where to write the averaged checkpoint")
    args = parser.parse_args(argv)
    apply_device_flag(args)
    return args


def _load_any(path, gen_template, disc_template, state_template):
    """Return ``(gen_params, disc_params | None)`` from any checkpoint form."""
    from gan_image_captioning_tpu.train import checkpoint as ckpt_lib

    try:
        return ckpt_lib.load_params(path, gen_template), None
    except Exception:
        pass
    try:
        both = ckpt_lib.load_params(path, {"generator": gen_template,
                                           "discriminator": disc_template})
        return both["generator"], both["discriminator"]
    except Exception:
        pass
    state = ckpt_lib.load_state(path, state_template)
    return state.gen_params, state.disc_params


def _mean_trees(trees):
    return jax.tree_util.tree_map(
        lambda *leaves: np.mean(np.stack([np.asarray(l) for l in leaves],
                                         axis=0), axis=0, dtype=np.float64)
        .astype(np.asarray(leaves[0]).dtype),
        *trees)


def main(argv=None):
    args = parse_args(argv)
    if len(args.checkpoints) < 2:
        raise SystemExit("--checkpoints needs at least two paths")

    from gan_image_captioning_tpu.utils.runtime import setup

    setup()
    from src.main import build_datasets, inject_vocab_size

    train_ds, _ = build_datasets(args)
    inject_vocab_size(args, train_ds)
    config = config_from_args(args)

    from gan_image_captioning_tpu.models import api
    from gan_image_captioning_tpu.train import checkpoint as ckpt_lib
    from gan_image_captioning_tpu.train.state import create_train_state

    gen_t = api.init_generator(jax.random.PRNGKey(0), config)
    disc_t = api.init_discriminator(jax.random.PRNGKey(1), config)
    state_t = create_train_state(config, jax.random.PRNGKey(2),
                                 gen_params=gen_t, disc_params=disc_t)

    gens, discs = [], []
    for path in args.checkpoints:
        g, d = _load_any(path, gen_t, disc_t, state_t)
        gens.append(g)
        discs.append(d)
        print(f"loaded {path}" + ("" if d is None else " (with disc)"))

    avg_gen = _mean_trees(gens)
    if all(d is not None for d in discs):
        out = {"generator": avg_gen, "discriminator": _mean_trees(discs)}
        kind = "generator+discriminator"
    else:
        out = avg_gen
        kind = "generator"
    ckpt_lib.save_params(args.output, out, sync=True)
    print(f"wrote averaged {kind} checkpoint ({len(gens)} inputs) "
          f"to {args.output}")


if __name__ == "__main__":
    main()
