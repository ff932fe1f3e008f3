"""Caption inference CLI — the standalone decode entry point the reference
never had (its evaluation was commented out, ``main.py:49``).

    python src/caption.py --checkpoint save/expt_1/models/pretrained_model.ckpt \
        --dataset synthetic --beam-size 4 --num-samples 16

Loads a generator checkpoint (``pretrained_model.ckpt`` or the generator half
of ``adv_model.ckpt``), runs batched greedy or beam decode as one jitted
program, and prints/saves the captions with per-sequence log-probabilities.
"""

import argparse
import json
import os
import sys

_PKG_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if os.path.isdir(os.path.join(_PKG_ROOT, "gan_image_captioning_tpu")):
    # Running from a checkout (src/ next to the package): make the package
    # importable.  When pip-installed (this file ships as
    # gan_image_captioning_tpu.scripts.*) the package is already on the
    # path and _PKG_ROOT would be the package dir itself -- do NOT add it
    # (its modules would shadow top-level names like `config`).
    sys.path.insert(0, _PKG_ROOT)

import jax
import jax.numpy as jnp
import numpy as np

from gan_image_captioning_tpu.config import (apply_device_flag,
                                             build_parser,
                                             config_from_args)


def parse_args(argv=None):
    parser = build_parser()
    parser.add_argument("--checkpoint", type=str, default="",
                        help="path to pretrained_model.ckpt or adv_model.ckpt")
    parser.add_argument("--exported", type=str, default="",
                        help="decode from an AOT .gic artifact "
                             "(src/export_model.py) instead of a checkpoint "
                             "— no model code or tracing; vocab comes from "
                             "the artifact")
    parser.add_argument("--split", type=str, default="val",
                        choices=["train", "val", "test"])
    parser.add_argument("--num-samples", type=int, default=32,
                        help="how many captions to generate")
    parser.add_argument("--output", type=str, default="",
                        help="write captions as JSONL here (default: stdout)")
    parser.add_argument("--decode-mode", type=str, default="auto",
                        choices=["auto", "greedy", "beam", "sample",
                                 "speculative"],
                        help="'auto' = beam when --beam-size > 1 else greedy; "
                             "'sample' draws from the temperature/top-k/top-p "
                             "filtered distribution; 'speculative' = "
                             "greedy-exact ids via an int8 draft + "
                             "deferred-projection verify (LSTM only, "
                             "eval/speculative.py)")
    parser.add_argument("--draft-len", type=int, default=4,
                        help="speculative mode: tokens proposed per draft "
                             "block (K)")
    parser.add_argument("--beam-groups", type=int, default=1,
                        help="beam mode: diverse beam search with G groups "
                             "(beam-size/G beams each, Hamming diversity "
                             "between groups) — emits G distinct captions "
                             "per sample (1 = vanilla beam)")
    parser.add_argument("--diversity-strength", type=float, default=0.5,
                        help="diverse beam: penalty per same-step token "
                             "reuse across groups")
    parser.add_argument("--adaptive-chunk", type=int, default=0,
                        help="greedy mode: decode K-step blocks that stop "
                             "once every row emitted <E> (0 = fixed "
                             "full-T program)")
    parser.add_argument("--top-k", type=int, default=0,
                        help="sample mode: keep only the k highest-probability "
                             "tokens per step (0 = no top-k filter)")
    parser.add_argument("--top-p", type=float, default=1.0,
                        help="sample mode: nucleus filtering — keep the "
                             "smallest token prefix whose probability mass "
                             "reaches p (1.0 = off)")
    parser.add_argument("--sample-temperature", type=float, default=1.0,
                        help="sample mode: softmax temperature (<1 sharpens, "
                             ">1 flattens)")
    parser.add_argument("--repetition-penalty", type=float, default=1.0,
                        help="sample mode: CTRL-style penalty on already-"
                             "emitted tokens (>1; with --top-k 1 this is "
                             "penalized greedy)")
    parser.add_argument("--no-repeat-ngram", type=int, default=0,
                        choices=[0, 2, 3],
                        help="sample mode: forbid completing an n-gram the "
                             "caption already contains")
    parser.add_argument("--min-length", type=int, default=0,
                        help="beam/sample modes: forbid <E> until this many "
                             "tokens stand (selection-only)")
    parser.add_argument("--sample-seed", type=int, default=0,
                        help="PRNG seed for sample mode")
    args = parser.parse_args(argv)
    if not args.checkpoint and not args.exported:
        parser.error("one of --checkpoint or --exported is required")
    apply_device_flag(args)
    return args


def _run_exported(args):
    """Decode via an AOT artifact (gan_image_captioning_tpu/export_api.py):
    the compiled program + params + vocab all come from the .gic file —
    no checkpoint templates, no tracing.  Conditional artifacts pull
    images from ``--dataset``; unconditional ones need no dataset at all."""
    from gan_image_captioning_tpu import export_api

    cap = export_api.load_artifact(args.exported)
    meta = cap.meta
    fixed_b = None if meta.get("symbolic_batch") else meta["export_batch_size"]
    out_f = open(args.output, "w") if args.output else sys.stdout
    emitted = 0
    if meta.get("conditional"):
        # the artifact's meta drives the dataset geometry (conditional
        # batches with images at the exported image size)
        args.conditional_gan = 1
        if meta.get("image_size"):
            args.image_size = meta["image_size"]
        from src.main import build_datasets

        train_ds, val_ds = build_datasets(args)
        ds = {"train": train_ds, "val": val_ds, "test": val_ds}[args.split]
        from gan_image_captioning_tpu.data.loader import Batcher

        batch_size = fixed_b or min(args.num_samples, 32)
        loader = Batcher(ds, batch_size, meta["seq_len"], shuffle=False,
                         num_workers=1)
        batches = ({"anchor": b["images"], "weights": b["weights"]}
                   for b in loader)
    else:
        batch_size = fixed_b or min(args.num_samples, 32)

        def _uncond():
            left = args.num_samples
            while left > 0:
                yield {"anchor": np.zeros((batch_size,), np.int32),
                       "weights": (np.arange(batch_size) < left).astype(int)}
                left -= batch_size
        batches = _uncond()
    for batch in batches:
        captions, scores = cap.captions(batch["anchor"])
        for i, caption in enumerate(captions):
            if batch["weights"][i] == 0 or emitted >= args.num_samples:
                break
            score = scores[i]
            score = float(score[0]) if np.ndim(score) else float(score)
            out_f.write(json.dumps({"caption": caption,
                                    "logprob": score}) + "\n")
            emitted += 1
        if emitted >= args.num_samples:
            break
    if args.output:
        out_f.close()
        print(f"wrote {emitted} captions to {args.output}")


def main(argv=None):
    args = parse_args(argv)

    from gan_image_captioning_tpu.utils.runtime import setup

    setup()

    if args.exported:
        return _run_exported(args)

    from src.main import build_datasets, inject_vocab_size

    args_ds = args
    train_ds, val_ds = build_datasets(args_ds)
    ds = {"train": train_ds, "val": val_ds, "test": val_ds}[args.split]
    inject_vocab_size(args, train_ds)
    config = config_from_args(args)

    from gan_image_captioning_tpu.data.loader import Batcher
    from gan_image_captioning_tpu.eval import decode as decode_lib
    from gan_image_captioning_tpu.eval.metrics import ids_to_words, strip_caption
    from gan_image_captioning_tpu.models import api
    from gan_image_captioning_tpu.train import checkpoint as ckpt_lib

    gen_params, _ = ckpt_lib.load_generator_checkpoint(args.checkpoint,
                                                       config)

    beam = max(1, config.beam_size)
    mode = args.decode_mode
    if mode == "auto":
        mode = "beam" if beam > 1 else "greedy"
    sample_rng = jax.random.PRNGKey(args.sample_seed)

    # --quantize int8: conditioning (encoder) stays full-precision, every
    # decode-loop weight read comes from the int8 decoder (ops/quantize.py)
    dec_params = gen_params
    if config.quantize != "none":
        from gan_image_captioning_tpu.ops.quantize import quantize_generator
        dec_params = quantize_generator(gen_params, config)

    # --decode-mode speculative: full-precision target + int8 draft twin
    # (greedy-exact ids, eval/speculative.py); the draft plays the
    # dec_params role so --quantize int8 reuses its quantized decoder.
    if mode == "speculative":
        if config.gen_arch != "lstm":
            raise SystemExit("--decode-mode speculative requires the LSTM "
                             "generator (deferred-projection verify)")
        if dec_params is gen_params:
            from gan_image_captioning_tpu.ops.quantize import (
                quantize_generator)
            dec_params = quantize_generator(gen_params, config)

    # --mesh — distributed decode: batches shard over 'data', params take
    # the training-side TP layout over 'model' (src/evaluate.py pattern).
    mesh = None
    if config.mesh:
        from gan_image_captioning_tpu.parallel.mesh import (
            inference_mesh_setup)
        from gan_image_captioning_tpu.serving import shard_serving_params

        mesh, config = inference_mesh_setup(config)
        shared = dec_params is gen_params
        gen_params = shard_serving_params(gen_params, mesh)
        dec_params = (gen_params if shared else
                      shard_serving_params(dec_params, mesh))

    def decode_batch(params, dparams, batch, rng):
        cond, _ = api.generator_condition(config, params, batch, train=False)
        if mode == "beam" and args.beam_groups > 1:
            # diverse beam: [B, G, T] ids — G distinct captions per sample
            ids, scores = decode_lib.diverse_beam_search(
                dparams, cond["features"], config, beam_size=beam,
                num_groups=args.beam_groups,
                diversity_strength=args.diversity_strength,
                context=cond["context"],
                length_penalty=config.length_penalty,
                min_length=args.min_length)
        elif mode == "beam":
            ids, scores = decode_lib.beam_search(
                dparams, cond["features"], config, beam_size=beam,
                context=cond["context"],
                length_penalty=config.length_penalty,
                min_length=args.min_length)
        elif mode == "sample":
            ids, scores = decode_lib.sample_decode(
                dparams, cond["features"], config, rng,
                context=cond["context"],
                temperature=args.sample_temperature,
                top_k=args.top_k, top_p=args.top_p,
                repetition_penalty=args.repetition_penalty,
                no_repeat_ngram=args.no_repeat_ngram,
                min_length=args.min_length)
        elif mode == "speculative":
            from gan_image_captioning_tpu.eval.speculative import (
                speculative_greedy)

            ids = speculative_greedy(params, dparams, cond["features"],
                                     config, draft_len=args.draft_len)
            scores = decode_lib.sequence_logprob(
                params, cond["features"], ids, config, cond["context"])
        elif args.adaptive_chunk > 0:
            # early-stopping greedy: same captions/logprobs, the program
            # ends once every row emitted <E> (<PAD> tail); TP axes force
            # the scan chunks (the kernel holds whole vocab blocks)
            tp_mesh = mesh is not None and any(
                n != "data" and s > 1 for n, s in mesh.shape.items())
            ids, scores = decode_lib.greedy_with_logprobs_adaptive(
                dparams, cond["features"], config, context=cond["context"],
                chunk=args.adaptive_chunk, allow_kernel=not tp_mesh)
        else:
            ids = decode_lib.greedy(dparams, cond["features"], config,
                                    context=cond["context"])
            scores = decode_lib.sequence_logprob(
                dparams, cond["features"], ids, config, cond["context"])
        return ids, scores

    decode_jit = decode_batch if config.no_jit else jax.jit(decode_batch)

    out_f = open(args.output, "w") if args.output else sys.stdout
    batch_size = min(args.num_samples, config.pre_eval_batch_size)
    if mesh is not None:
        n_data = dict(mesh.shape).get("data", 1)
        if batch_size % n_data:
            # round up so the fixed-shape batch splits over 'data'
            batch_size += n_data - batch_size % n_data
    loader = Batcher(ds, batch_size, config.seq_len, shuffle=False,
                     num_workers=config.num_workers)
    emitted = 0
    for batch in loader:
        dev_batch = batch
        if mesh is not None:
            from gan_image_captioning_tpu.parallel.sharding import shard_batch

            # the emit loop below reads weights/captions row-by-row — keep
            # the host batch for that, ship only dev_batch to the program
            dev_batch = shard_batch(batch, mesh)
        sample_rng, batch_rng = jax.random.split(sample_rng)
        ids, scores = decode_jit(gen_params, dec_params, dev_batch,
                                 batch_rng)
        ids, scores = np.asarray(ids), np.asarray(scores)
        for i in range(ids.shape[0]):
            if batch["weights"][i] == 0 or emitted >= args.num_samples:
                break
            reference = " ".join(ids_to_words(
                strip_caption(batch["captions"][i]), ds.index_to_word))
            if ids.ndim == 3:
                # diverse beam: one row per sample, G captions in it
                caps = [" ".join(ids_to_words(strip_caption(row),
                                              ds.index_to_word))
                        for row in ids[i]]
                out_f.write(json.dumps({
                    "caption": caps[0], "captions": caps,
                    "logprobs": [float(s) for s in scores[i]],
                    "reference": reference}) + "\n")
            else:
                caption = " ".join(ids_to_words(strip_caption(ids[i]),
                                                ds.index_to_word))
                out_f.write(json.dumps({"caption": caption, "logprob":
                                        float(scores[i]),
                                        "reference": reference}) + "\n")
            emitted += 1
        if emitted >= args.num_samples:
            break
    if args.output:
        out_f.close()
        print(f"wrote {emitted} captions to {args.output}")


if __name__ == "__main__":
    main()
