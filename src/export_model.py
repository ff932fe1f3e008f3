"""AOT export CLI — serialize the compiled decode program to a ``.gic``
deployment artifact (StableHLO + params + vocab; ``export_api.py``).

    python src/export_model.py --checkpoint save/expt_1/models/adv_model.ckpt \
        --dataset synthetic --output model.gic --symbolic-batch \
        --platforms cpu,tpu

A server then loads the artifact with ``export_api.load_artifact`` (or
``python src/caption.py --exported model.gic``) and decodes WITHOUT model
code, checkpoint templates, or tracing — compile once, serve many.  The
reference has no deployment story at all (inference was commented out,
``main.py:49``).
"""

import argparse
import json
import os
import sys

_PKG_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if os.path.isdir(os.path.join(_PKG_ROOT, "gan_image_captioning_tpu")):
    sys.path.insert(0, _PKG_ROOT)

import numpy as np

from gan_image_captioning_tpu.config import (apply_device_flag,
                                             build_parser,
                                             config_from_args)


def parse_args(argv=None):
    parser = build_parser()
    parser.add_argument("--checkpoint", type=str, required=True,
                        help="path to pretrained_model.ckpt or adv_model.ckpt")
    parser.add_argument("--output", type=str, required=True,
                        help="artifact path to write (convention: .gic)")
    parser.add_argument("--decode-mode", type=str, default="greedy",
                        choices=["greedy", "beam"],
                        help="the program to export (beam uses --beam-size)")
    parser.add_argument("--export-batch-size", type=int, default=8,
                        help="batch dimension of the exported program "
                             "(ignored at call time with --symbolic-batch)")
    parser.add_argument("--symbolic-batch", action="store_true",
                        help="export with a symbolic leading dim: one "
                             "artifact serves ANY batch size")
    parser.add_argument("--anchor", type=str, default="auto",
                        choices=["auto", "features"],
                        help="'auto' = self-contained captioning program "
                             "(anchor = images or a batch-size placeholder; "
                             "conditioning runs inside the artifact); "
                             "'features' = the [B, E] feature-batch program "
                             "the serving engines dispatch — export this "
                             "for `serve.py --exported`")
    parser.add_argument("--platforms", type=str, default="",
                        help="comma-separated lowering targets, e.g. "
                             "'cpu,tpu' (default: current backend only)")
    parser.add_argument("--check", action="store_true",
                        help="reload the artifact and verify its captions "
                             "match the direct decode before exiting")
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

    from gan_image_captioning_tpu import export_api
    from gan_image_captioning_tpu.train import checkpoint as ckpt_lib

    gen_params, _ = ckpt_lib.load_generator_checkpoint(args.checkpoint,
                                                       config)

    # --quantize int8|int4: the artifact ships the int-resident decoder
    # (ops/quantize.py) — halved/quartered weight payload AND decode-loop
    # HBM reads at serve time.  The <S> start-feature row is taken from
    # the FULL-precision embed first (production parity, src/caption.py)
    # and baked into the program as a constant.  int4 exports via the
    # row-packed int8 carrier (quantize_packed_int4 — npz cannot store
    # native jnp.int4, and the packed form is also what the serve kernel
    # and the axon client want); GIC_INT4_PACK=0 (native payloads) is
    # the one combination that still refuses.
    start_row = None
    if config.quantize == "int4" and os.environ.get("GIC_INT4_PACK") == "0":
        raise SystemExit("--quantize int4 with GIC_INT4_PACK=0 does not "
                         "export (npz cannot store jnp.int4 payloads); "
                         "drop GIC_INT4_PACK=0 to use the packed carrier")
    if config.quantize == "int4":
        os.environ.setdefault("GIC_INT4_PACK", "1")  # carrier, not jnp.int4
    if config.quantize in ("int8", "int4"):
        from gan_image_captioning_tpu.models.generator import (
            start_token_features)
        from gan_image_captioning_tpu.ops.quantize import quantize_generator

        if not config.cgan:
            dec = gen_params["decoder"]
            start_row = np.asarray(start_token_features(
                dec if config.gen_arch == "lstm"
                else {"embed": dec["embed"]}, 1))[0]
        gen_params = quantize_generator(gen_params, config)

    platforms = tuple(p for p in args.platforms.split(",") if p) or None
    beam = max(1, config.beam_size)
    exported = export_api.export_caption_program(
        gen_params, config, mode=args.decode_mode, beam_size=beam,
        batch_size=args.export_batch_size,
        symbolic_batch=args.symbolic_batch, platforms=platforms,
        length_penalty=config.length_penalty, anchor_kind=args.anchor,
        start_row=None if args.anchor == "features" else start_row)

    i2w = getattr(train_ds, "index_to_word", None)
    meta = {
        "mode": args.decode_mode,
        "anchor": args.anchor,
        "beam_size": beam if args.decode_mode == "beam" else 1,
        "conditional": bool(config.cgan),
        "gen_arch": config.gen_arch,
        "encoder_arch": config.encoder_arch if config.cgan else None,
        "vocab_size": config.vocab_size,
        "seq_len": config.seq_len,
        "feat_dim": config.gen_embed_dim,
        "image_size": config.image_size if config.cgan else None,
        "symbolic_batch": bool(args.symbolic_batch),
        "export_batch_size": args.export_batch_size,
        "quantize": config.quantize,
        "start_features": (None if start_row is None
                           else [float(x) for x in start_row]),
        "checkpoint": os.path.abspath(args.checkpoint),
        "index_to_word": ([i2w[i] for i in range(len(i2w))]
                          if isinstance(i2w, dict) else i2w),
    }
    export_api.save_artifact(args.output, exported, gen_params, meta)
    size_mb = os.path.getsize(args.output) / 1e6

    if args.check:
        cap = export_api.load_artifact(args.output)
        # symbolic exports accept any batch; fixed exports only their own
        nb = 2 if args.symbolic_batch else args.export_batch_size
        if args.anchor == "features":
            anchor = np.zeros((nb, config.gen_embed_dim), np.float32)
        elif config.cgan:
            anchor = np.zeros((nb, 3, config.image_size, config.image_size),
                              np.float32)
        else:
            anchor = np.zeros((nb,), np.int32)
        ids, scores = cap(anchor)
        fn = export_api.build_caption_fn(
            config, args.decode_mode, beam, config.length_penalty,
            args.anchor,
            start_row=None if args.anchor == "features" else start_row)
        ids_ref, _ = fn(gen_params, anchor)
        np.testing.assert_array_equal(np.asarray(ids), np.asarray(ids_ref))
        print("check ok: exported ids == direct decode")

    print(json.dumps({
        "artifact": os.path.abspath(args.output),
        "size_mb": round(size_mb, 2),
        "mode": args.decode_mode,
        "platforms": list(getattr(exported, "platforms", ()) or ()),
        "symbolic_batch": bool(args.symbolic_batch),
    }))


if __name__ == "__main__":
    main()
