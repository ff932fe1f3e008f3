"""Standalone evaluation CLI: NLL_gen + BLEU-4 from a checkpoint.

    python src/evaluate.py --checkpoint save/expt_1/models/pretrained_model.ckpt \
        --dataset synthetic --beam-size 1

Computes the report's two quality metrics (NLP_Report.pdf §4.3, Tables 1-5)
on the val split:
  * NLL_gen — free-running generator cross-entropy against real captions
    (identical math to the reference's pretrain val loss, training.py:81-83),
  * BLEU-4 — corpus BLEU of decoded captions (greedy or beam) vs references.
The reference planned but never wired this evaluation (``main.py:49``
commented out, BLEU imports dead at ``training.py:13,75-76``).

Prints one JSON line: {"nll_gen": …, "bleu4": …, "num_samples": N}.
"""

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
import numpy as np

from gan_image_captioning_tpu.config import (apply_device_flag,
                                             build_parser,
                                             config_from_args)


def parse_args(argv=None):
    parser = build_parser()
    parser.add_argument("--checkpoint", type=str, required=True)
    parser.add_argument("--split", type=str, default="val",
                        choices=["train", "val", "test"])
    parser.add_argument("--max-batches", type=int, default=0,
                        help="0 = full split")
    parser.add_argument("--disc-score", action="store_true",
                        help="also report the discriminator's mean sigmoid "
                        "score on generated vs real captions (the automatic "
                        "counterpart of the report's Table 6 'Discriminator "
                        "score' row; needs an adv_model.ckpt)")
    parser.add_argument("--diversity", action="store_true",
                        help="also report self-BLEU (collapse probe: 1.0 = "
                        "all captions identical) and distinct-1/2 over the "
                        "generated corpus (eval/diversity.py — the RelGAN "
                        "literature's diversity metrics)")
    parser.add_argument("--cider", action="store_true",
                        help="also report CIDEr-D vs the (single) reference "
                        "caption per sample (eval/cider.py — the COCO "
                        "leaderboard metric the report omits)")
    parser.add_argument("--rouge", action="store_true",
                        help="also report ROUGE-L (LCS F-measure, "
                        "eval/rouge.py — coco-caption variant, beta=1.2)")
    parser.add_argument("--meteor", action="store_true",
                        help="also report METEOR (exact-match stage, "
                        "eval/meteor.py — alignment F-mean with "
                        "fragmentation penalty)")
    parser.add_argument("--multi-ref", action="store_true",
                        help="coco-caption protocol for BLEU/CIDEr/ROUGE/"
                        "METEOR: group rows by image (the dataset is "
                        "flattened per-caption) and score ONE candidate "
                        "per image against ALL of its reference captions; "
                        "default scores each row against its own single "
                        "reference")
    parser.add_argument("--beam-groups", type=int, default=1,
                        help="with --beam-size > 1: diverse beam search "
                             "with G groups; adds bleu4_oracle (best-of-G "
                             "per sample — how good a reranker could do "
                             "over the diverse set)")
    parser.add_argument("--diversity-strength", type=float, default=0.5,
                        help="diverse beam Hamming penalty")
    parser.add_argument("--adaptive-chunk", type=int, default=0,
                        help="greedy decode in K-step blocks that stop "
                        "once every row in the batch emitted <E> "
                        "(0 = fixed full-T program); captions are "
                        "unchanged after <E>-stripping")
    args = parser.parse_args(argv)
    apply_device_flag(args)
    return args


def main(argv=None):
    args = parse_args(argv)

    from gan_image_captioning_tpu.utils.runtime import setup

    setup()

    from src.main import build_datasets, inject_vocab_size

    train_ds, val_ds = build_datasets(args)
    ds = {"train": train_ds, "val": val_ds, "test": val_ds}[args.split]
    inject_vocab_size(args, train_ds)
    config = config_from_args(args)

    from gan_image_captioning_tpu.data.loader import Batcher
    from gan_image_captioning_tpu.eval import decode as decode_lib
    from gan_image_captioning_tpu.eval.metrics import bleu4_from_batches
    from gan_image_captioning_tpu.models import api
    from gan_image_captioning_tpu.ops.losses import cross_entropy_loss
    from gan_image_captioning_tpu.train import checkpoint as ckpt_lib

    gen_params, disc_params = ckpt_lib.load_generator_checkpoint(
        args.checkpoint, config)
    if args.disc_score and disc_params is None:
        print("warning: --disc-score needs an adv_model.ckpt "
              "(generator+discriminator); skipping", file=sys.stderr)
    if not args.disc_score:
        disc_params = None

    # --quantize int8: decode (BLEU/diversity) runs against the int8
    # decoder; NLL stays full-precision (teacher-forced scoring is a
    # training-path computation). ops/quantize.py.
    dec_params = gen_params
    if config.quantize != "none":
        from gan_image_captioning_tpu.ops.quantize import quantize_generator
        dec_params = quantize_generator(gen_params, config)

    # --mesh — distributed evaluation: batches shard over 'data', params
    # take the training-side TP layout over 'model' (vocab-dim); the same
    # jitted eval program runs SPMD via GSPMD, like serving (src/serve.py).
    mesh = None
    if config.mesh:
        from jax.sharding import NamedSharding, PartitionSpec as P

        from gan_image_captioning_tpu.parallel.mesh import (
            inference_mesh_setup)
        from gan_image_captioning_tpu.parallel.sharding import (
            discriminator_param_spec)
        from gan_image_captioning_tpu.serving import shard_serving_params

        mesh, config = inference_mesh_setup(config)
        n_data = dict(mesh.shape).get("data", 1)
        if config.pre_eval_batch_size % n_data:
            raise SystemExit(f"--pre-eval-batch-size "
                             f"{config.pre_eval_batch_size} must divide by "
                             f"the data axis ({n_data})")
        shared = dec_params is gen_params
        gen_params = shard_serving_params(gen_params, mesh)
        dec_params = (gen_params if shared else
                      shard_serving_params(dec_params, mesh))
        if disc_params is not None:
            disc_spec = discriminator_param_spec(disc_params, mesh)
            disc_params = jax.tree_util.tree_map(
                lambda a, s: jax.device_put(a, NamedSharding(mesh, s)),
                disc_params, disc_spec)

    adaptive = int(getattr(args, "adaptive_chunk", 0))
    tp_mesh = mesh is not None and any(
        n != "data" and s > 1 for n, s in mesh.shape.items())

    def eval_batch(params, dparams, batch, rng):
        cond, _ = api.generator_condition(config, params, batch, train=False)
        logits = api.generator_mle_outputs(params, cond, batch["captions"],
                                           rng, config,
                                           lengths=batch.get("lengths"))
        import jax.numpy as jnp

        w = batch.get("weights")
        mask = (None if w is None
                else jnp.broadcast_to(w[:, None], batch["captions"].shape))
        nll = cross_entropy_loss(logits, batch["captions"], mask)
        ids_groups = None
        if config.beam_size > 1 and args.beam_groups > 1:
            # diverse beam: group 0 feeds the headline metrics; all G
            # groups feed bleu4_oracle on the host
            ids_groups, _ = decode_lib.diverse_beam_search(
                dparams, cond["features"], config,
                beam_size=config.beam_size, num_groups=args.beam_groups,
                diversity_strength=args.diversity_strength,
                context=cond["context"],
                length_penalty=config.length_penalty)
            ids = ids_groups[:, 0]
        elif config.beam_size > 1:
            ids, _ = decode_lib.beam_search(dparams, cond["features"], config,
                                            beam_size=config.beam_size,
                                            context=cond["context"],
                                            length_penalty=config
                                            .length_penalty)
        elif adaptive > 0:
            # early-stopping program: stops once every row emitted <E>
            # (ids get a <PAD> tail — BLEU strips at <E> either way; the
            # disc score then reads <PAD> instead of post-<E> argmax noise).
            # TP-sharded params force the scan chunks: the weights-resident
            # kernel holds whole vocab blocks (same gate as serve.py)
            ids, _ = decode_lib.greedy_with_logprobs_adaptive(
                dparams, cond["features"], config, context=cond["context"],
                chunk=adaptive, allow_kernel=not tp_mesh)
        else:
            ids = decode_lib.greedy(dparams, cond["features"], config,
                                    context=cond["context"])
        # Discriminator realism score (the report's Table 6 row
        # "Discriminator score": mean sigmoid over generated captions).
        if disc_params is not None:
            d_gen = jnp.mean(jax.nn.sigmoid(api.discriminator_apply(
                disc_params, ids, config, train=False)))
            d_real = jnp.mean(jax.nn.sigmoid(api.discriminator_apply(
                disc_params, batch["captions"], config, train=False)))
        else:
            d_gen = d_real = jnp.float32(0.0)
        return nll, ids, d_gen, d_real, ids_groups

    fn = eval_batch if config.no_jit else jax.jit(eval_batch)
    loader = Batcher(ds, config.pre_eval_batch_size, config.seq_len,
                     shuffle=False, num_workers=config.num_workers)
    pending, real_b, w_b, n = [], [], [], 0
    for i, batch in enumerate(loader):
        if args.max_batches and i >= args.max_batches:
            break
        dev_batch = batch
        if mesh is not None:
            from gan_image_captioning_tpu.parallel.sharding import shard_batch

            dev_batch = shard_batch(batch, mesh)
        pending.append(fn(gen_params, dec_params, dev_batch,
                          jax.random.PRNGKey(i)))
        # bookkeeping reads the HOST batch — per-batch syncs on sharded
        # arrays would serialize the async dispatch pipeline below
        real_b.append(batch["captions"])
        w_b.append(batch.get("weights"))
        n += int(batch["weights"].sum())
    # one batched fetch: per-batch float()/asarray() syncs serialize
    # dispatch and pay a transfer RTT per array (docs/benchmarks.md r3)
    fetched = jax.device_get(pending)
    nlls = [float(nll) for nll, _, _, _, _ in fetched]
    gen_b = [np.asarray(ids) for _, ids, _, _, _ in fetched]
    d_gen_scores = [float(d) for _, _, d, _, _ in fetched]
    d_real_scores = [float(d) for _, _, _, d, _ in fetched]
    bleu = bleu4_from_batches(gen_b, real_b, w_b)
    result = {"nll_gen": round(float(np.mean(nlls)), 4),
              "bleu4": round(bleu, 5), "num_samples": n}
    if args.beam_groups > 1 and config.beam_size > 1:
        # oracle (best-of-G) BLEU over the diverse candidate sets
        from gan_image_captioning_tpu.eval.bleu import oracle_bleu4
        from gan_image_captioning_tpu.eval.metrics import strip_caption

        cand_groups, refs_o = [], []
        for (_, _, _, _, g3), real_ids, w in zip(fetched, real_b, w_b):
            g3 = np.asarray(g3)
            for j in range(g3.shape[0]):
                if w is not None and w[j] == 0:
                    continue
                cand_groups.append([strip_caption(g3[j, k])
                                    for k in range(g3.shape[1])])
                refs_o.append([strip_caption(real_ids[j])])
        result["bleu4_oracle"] = round(oracle_bleu4(cand_groups, refs_o), 5)
    if disc_params is not None:
        result["disc_score_generated"] = round(float(np.mean(d_gen_scores)), 4)
        result["disc_score_real"] = round(float(np.mean(d_real_scores)), 4)
    if (args.diversity or args.cider or args.rouge or args.meteor
            or args.multi_ref):
        from gan_image_captioning_tpu.eval.metrics import strip_caption

        if args.multi_ref:
            # coco-caption protocol: one candidate per IMAGE against all
            # of its references.  Rows arrive in dataset order (shuffle
            # off, pad rows zero-weighted), so the running row counter
            # maps each row to ds.image_key.
            by_img = {}          # key → [cand, [refs...]] (insertion order)
            row = 0
            for gen_ids, real_ids, w in zip(gen_b, real_b, w_b):
                for j in range(gen_ids.shape[0]):
                    if w is not None and w[j] == 0:
                        row += 1
                        continue
                    key = ds.image_key(row)
                    row += 1
                    ref = strip_caption(real_ids[j])
                    if key in by_img:
                        by_img[key][1].append(ref)
                    else:
                        by_img[key] = [strip_caption(gen_ids[j]), [ref]]
            cands = [c for c, _ in by_img.values()]
            refs = [r for _, r in by_img.values()]
            result["num_images"] = len(cands)
            from gan_image_captioning_tpu.eval.bleu import corpus_bleu

            result["bleu4_multiref"] = round(corpus_bleu(cands, refs), 5)
        else:
            cands, refs = [], []
            for gen_ids, real_ids, w in zip(gen_b, real_b, w_b):
                for j in range(gen_ids.shape[0]):
                    if w is not None and w[j] == 0:
                        continue
                    cands.append(strip_caption(gen_ids[j]))
                    refs.append([strip_caption(real_ids[j])])
    if args.diversity:
        from gan_image_captioning_tpu.eval.diversity import (distinct_n,
                                                             self_bleu)

        result["self_bleu4"] = round(self_bleu(cands), 5)
        result["distinct1"] = round(distinct_n(cands, 1), 5)
        result["distinct2"] = round(distinct_n(cands, 2), 5)
    if args.cider:
        from gan_image_captioning_tpu.eval.cider import cider_d

        result["cider_d"] = round(cider_d(cands, refs), 5)
    if args.rouge:
        from gan_image_captioning_tpu.eval.rouge import rouge_l

        result["rouge_l"] = round(rouge_l(cands, refs), 5)
    if args.meteor:
        from gan_image_captioning_tpu.eval.meteor import meteor

        result["meteor"] = round(meteor(cands, refs), 5)
    print(json.dumps(result))


if __name__ == "__main__":
    main()
