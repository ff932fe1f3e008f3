"""Config / flag system.

Reproduces the reference CLI surface flag-for-flag (same names, same
defaults — reference ``args.py:6-256``) so that the canonical sbatch
invocation (reference ``sbatch_script.s:16``) runs unchanged, then parses the
flat namespace into a frozen :class:`Config` dataclass whose hashable fields
can feed ``jax.jit`` static arguments.

Reference side effects reproduced:

* experiment-dir auto-increment ``save/{expt}_{n}`` plus ``models`` subdir
  (``args.py:261-273``),
* device-string resolution (``args.py:275-278``) — here ``cuda``/``tpu``
  means "the default JAX backend" and ``cpu`` forces the CPU backend.

New (additive) flags are grouped under "TPU extensions" and default to the
reference behavior.
"""

from __future__ import annotations

import argparse
import dataclasses
import os
from typing import Optional, Tuple


def _int_list(text):
    """Parse a comma-separated int list, e.g. ``3,4,5``.

    The reference declares ``--disc-filter-sizes`` with ``type=list``
    (``args.py:44-52``) which would split a CLI string into characters; the
    flag was only ever used at its default.  We keep the flag names and
    defaults but parse values sensibly.
    """
    if isinstance(text, (list, tuple)):
        return list(text)
    return [int(t) for t in str(text).split(",") if t != ""]


# Named experiment presets — one per BASELINE.json benchmark configuration.
# A preset is a bundle of flag DEFAULTS: `--preset configN` applies the
# bundle, and any flag given explicitly on the command line still wins
# (two-pass parse in _PresetParser.parse_known_args).  Geometries follow the
# report (NLP_Report.pdf §4.2) and the canonical sbatch invocation
# (reference ``sbatch_script.s:16``).
PRESETS = {
    # 1. MLE teacher-forcing pretrain of the LSTM generator on a small
    #    subset, greedy decode eval (CPU-runnable).
    "config1": dict(conditional_gan=1, pretrain_epochs=20, adv_epochs=0,
                    dataset_percent=0.01, captions_per_image=5, beam_size=1,
                    pre_train_batch_size=32, pre_eval_batch_size=32,
                    mle_objective="teacher"),
    # 2. Full MLE captioning on COCO: CNN encoder features + LSTM generator,
    #    beam-search eval.
    "config2": dict(conditional_gan=1, pretrain_epochs=50, adv_epochs=0,
                    captions_per_image=5, beam_size=4,
                    gen_embed_dim=512, gen_num_layers=2),
    # 3. SeqGAN adversarial loop (Gumbel-softmax LSTM generator vs. RelGAN
    #    CNN discriminator) at the canonical sbatch geometry
    #    (sbatch_script.s:16).
    "config3": dict(gen_embed_dim=512, gen_num_layers=2, pretrain_epochs=50,
                    adv_epochs=50, pretrain_lr=1e-2, gen_lr=1e-4,
                    disc_lr=1e-4, dataset_percent=0.1, captions_per_image=5),
    # 4. Transformer generator + transformer discriminator with
    #    rollout-based REINFORCE rewards (report §3.2.2/§4.2 geometry:
    #    gen 256emb/256hid/4L/8H, disc 64emb/128hid/4L/8H).
    "config4": dict(gen_arch="transformer", disc_arch="transformer",
                    gen_embed_dim=256, gen_hidden_dim=256, gen_num_layers=4,
                    gen_num_heads=8, disc_embed_dim=64, disc_hidden_dim=128,
                    disc_num_heads=8, disc_num_layers=4,
                    adv_objective="reinforce", rollout_num=4,
                    rollout_stride=4, pretrain_epochs=50, adv_epochs=50,
                    dataset_percent=0.1, captions_per_image=5),
    # 5. Stretch: ViT-B encoder + GPT-2-small generator on full COCO with
    #    the device-side image pipeline (BASELINE.json config 5).
    "config5": dict(encoder_arch="vit", gen_arch="gpt2", conditional_gan=1,
                    tokenizer="bpe", captions_per_image=5, dtype="bfloat16",
                    device_preprocess=1, pretrain_epochs=50, adv_epochs=50),
}


def _scan_preset(argv) -> Optional[str]:
    """Extract the ``--preset`` value from raw argv without a parser (the
    real parse happens afterwards with the preset applied as defaults)."""
    if argv is None:
        import sys

        argv = sys.argv[1:]
    for i, tok in enumerate(argv):
        if tok == "--preset":
            return argv[i + 1] if i + 1 < len(argv) else None
        if tok.startswith("--preset="):
            return tok.split("=", 1)[1]
    return None


class _PresetParser(argparse.ArgumentParser):
    """ArgumentParser that resolves ``--preset`` bundles as defaults.

    Two-pass: scan raw argv for ``--preset``, apply the bundle via
    ``set_defaults``, then parse normally — so explicitly passed flags
    always override the preset, regardless of argv order."""

    def parse_known_args(self, args=None, namespace=None):
        name = _scan_preset(args)
        if name is not None:
            if name not in PRESETS:
                self.error("unknown --preset %r (choose from %s)"
                           % (name, ", ".join(sorted(PRESETS))))
            self.set_defaults(**PRESETS[name])
        return super().parse_known_args(args, namespace)


def add_model_args(parser):
    """Model flags — reference ``args.py:6-69``."""
    g = parser.add_argument_group("model")
    # Generator (args.py:12-30)
    g.add_argument("--gen-hidden-dim", type=int, default=512,
                   help="hidden dimension of generator")
    g.add_argument("--gen-embed-dim", type=int, default=32,
                   help="embedding dimension of generator")
    g.add_argument("--gen-num-layers", type=int, default=1,
                   help="number of layers in generator")
    g.add_argument("--gen-init", type=str, default="uniform",
                   choices=["uniform", "normal"],
                   help="Initialization strategy for generator weights")
    # Discriminator (args.py:34-57)
    g.add_argument("--disc-embed-dim", type=int, default=64,
                   help="embeddings dimension to use in discriminator")
    g.add_argument("--disc-num-rep", type=int, default=64,
                   help="number of representations to use for CNN discriminator")
    g.add_argument("--disc-filter-sizes", type=_int_list, default=[3, 4, 5],
                   help="Layer wise filter sizes to use in discriminator")
    g.add_argument("--disc-num-filters", type=_int_list, default=[300, 300, 300],
                   help="number of filters to use in discriminator per layer")
    g.add_argument("--disc-init", type=str, default="uniform",
                   choices=["uniform", "normal"],
                   help="init strategy for discriminator weights")
    # Common (args.py:61-65)
    g.add_argument("--conditional-gan", type=int, default=0, choices=[0, 1],
                   help="is the gan conditional?")


def add_data_args(parser):
    """Data flags — reference ``args.py:72-111``."""
    g = parser.add_argument_group("data")
    g.add_argument("--vocab-size", type=int, default=-1,
                   help="vocab size for training (filled from the dataset)")
    g.add_argument("--max-seq-len", type=int, default=34,
                   help="maximum sequence length of captions")
    g.add_argument("--padding-idx", type=int, default=0,
                   help="index of padding token in vocab")
    g.add_argument("--image-size", type=int, default=256,
                   help="resize dim of images")
    g.add_argument("--captions-per-image", type=int, default=1,
                   help="no of captions to use per image")
    # NOTE: underscore spelling kept verbatim from the reference (args.py:108).
    g.add_argument("--dataset_percent", type=float, default=1.0,
                   help="percentage of dataset to use for training")


def add_training_args(parser):
    """Training flags — reference ``args.py:117-193``."""
    g = parser.add_argument_group("training")
    g.add_argument("--pretrain-lr", type=float, default=1e-2,
                   help="learning rate for pretraining generator")
    g.add_argument("--pretrain-epochs", type=int, default=0,
                   help="number of epochs for pretraining generator")
    g.add_argument("--pre-train-batch-size", type=int, default=64,
                   help="batch size for pretrain training")
    g.add_argument("--pre-eval-batch-size", type=int, default=64,
                   help="batch size for pretrain evaluation")
    g.add_argument("--gen-lr", type=float, default=1e-4,
                   help="learning rate for adversarial training of generator")
    g.add_argument("--disc-lr", type=float, default=1e-4,
                   help="learning rate for adversarial training of discriminator")
    g.add_argument("--disc-train-freq", type=int, default=1,
                   help="generator steps per discriminator step (the reference "
                        "parsed but never used this flag, args.py:155-158; the "
                        "report's Table 2 varied exactly this ratio, so here it "
                        "is honored: the discriminator updates on every k-th "
                        "step)")
    g.add_argument("--adv-epochs", type=int, default=30,
                   help="number of epochs for adversarial training")
    g.add_argument("--adv-train-batch-size", type=int, default=64,
                   help="batch size for adversarial training")
    g.add_argument("--adv-eval-batch-size", type=int, default=64,
                   help="batch size for adversarial evaluation")
    g.add_argument("--adv-loss-type", type=str, default="standard",
                   choices=["standard", "JS", "KL", "hinge", "tv", "rsgan"],
                   help="Loss function to use for adversarial training")
    g.add_argument("--temperature", type=int, default=100,
                   help="Maximum Gumbel temperature for RelGAN training")
    g.add_argument("--temp-adpt", type=str, default="exp",
                   choices=["no", "lin", "exp", "log", "sigmoid", "quad", "sqrt"],
                   help="Temperature adaption strategy")
    g.add_argument("--clip-norm", type=float, default=5.0,
                   help="Gradient clipping threshold (global norm)")


def add_global_args(parser):
    """Global flags — reference ``args.py:208-256``."""
    g = parser.add_argument_group("global")
    g.add_argument("--device", type=str, default="cuda",
                   help="device to use for training (cpu|cuda|tpu). 'cuda' and "
                        "'tpu' both mean the default JAX accelerator backend.")
    g.add_argument("--device-ids", type=int, default=0,
                   help="device id (i) to use for accelerator i")
    g.add_argument("--expt-name", type=str, default="debug",
                   help="Name of the experiment")
    g.add_argument("--model-dir", type=str, default="models",
                   help="directory to save models")
    g.add_argument("--data-dir", type=str, default="./data",
                   help="directory where data is stored")
    g.add_argument("--save-dir", type=str, default="./save",
                   help="directory to save the expt logs and tensorboard logs")
    g.add_argument("--adv-log-step", type=int, default=1,
                   help="Log step frequency for adversarial training")
    g.add_argument("--pre-log-step", type=int, default=1,
                   help="Log step frequency for pretraining")
    g.add_argument("--test-log-step", type=int, default=1,
                   help="Log step frequency for testing")
    g.add_argument("--log-file", type=str, default="log",
                   help="Log file to save logs")


def add_tpu_args(parser):
    """TPU-native extension flags (not in the reference; all additive)."""
    g = parser.add_argument_group("tpu extensions")
    g.add_argument("--gen-arch", type=str, default="lstm",
                   choices=["lstm", "transformer", "gpt2"],
                   help="generator architecture (report §3.2.2 adds the "
                        "transformer variant; 'gpt2' is the stretch config)")
    g.add_argument("--disc-arch", type=str, default="cnn",
                   choices=["cnn", "transformer", "ar_transformer", "bilstm"],
                   help="discriminator architecture (report §3.2.3-3.2.4; "
                        "'bilstm' is the report §4.2 bidirectional-LSTM "
                        "setting as a sequence discriminator)")
    g.add_argument("--encoder-arch", type=str, default="resnet18",
                   choices=["resnet18", "vit"],
                   help="image encoder backbone")
    g.add_argument("--trainable-backbone", type=int, default=0, choices=[0, 1],
                   help="train the image backbone instead of freezing it "
                        "(report §4.2 'two settings'; the reference code only "
                        "has frozen, generator.py:21-22)")
    g.add_argument("--gen-num-heads", type=int, default=8,
                   help="attention heads for the transformer generator "
                        "(report §4.2: 8)")
    g.add_argument("--disc-num-heads", type=int, default=8,
                   help="attention heads for the transformer discriminator")
    g.add_argument("--disc-hidden-dim", type=int, default=128,
                   help="hidden dim of the transformer discriminator "
                        "(report §4.2: 128)")
    g.add_argument("--disc-num-layers", type=int, default=4,
                   help="layers of the transformer discriminator")
    g.add_argument("--label-smoothing", type=float, default=0.0,
                   help="one-sided label smoothing for the discriminator's "
                        "real targets (report §4.3 stabilization trick)")
    g.add_argument("--noisy-labels", type=float, default=0.0,
                   help="probability of flipping real/fake labels for the "
                        "discriminator (report §4.3 stabilization trick)")
    g.add_argument("--lr-schedule", type=str, default="constant",
                   choices=["constant", "cosine", "linear", "exponential"],
                   help="learning-rate decay shape applied to all three "
                        "optimizers' base LRs (the reference runs fixed LRs "
                        "only, training.py:24-26); pairs with "
                        "--lr-warmup-steps/--lr-decay-steps/--lr-min-ratio")
    g.add_argument("--lr-warmup-steps", type=int, default=0,
                   help="linear warmup 0 → base LR over this many optimizer "
                        "steps before the decay shape starts")
    g.add_argument("--lr-decay-steps", type=int, default=0,
                   help="decay horizon in optimizer steps (required > 0 for "
                        "non-constant --lr-schedule)")
    g.add_argument("--lr-min-ratio", type=float, default=0.0,
                   help="final LR as a fraction of the base LR (cosine alpha "
                        "/ linear end / exponential per-horizon decay rate)")
    g.add_argument("--grad-accum", type=int, default=1,
                   help="split each batch into this many microbatches inside "
                        "the fused step (lax.scan) and apply ONE optimizer "
                        "update on the averaged grads — large effective "
                        "batches beyond device memory")
    g.add_argument("--ema-decay", type=float, default=0.0,
                   help="maintain an exponential moving average of generator "
                        "params with this decay (0 = off); best-val "
                        "checkpoints gain a *_ema.ckpt twin usable with "
                        "src/evaluate.py --checkpoint")
    g.add_argument("--length-penalty", type=float, default=0.0,
                   help="GNMT length-penalty alpha for beam-search final "
                        "ranking, ((5+len)/6)^alpha (0 = rank by pure "
                        "log-probability); used by every beam surface "
                        "(caption/evaluate/serve/instructor BLEU eval)")
    g.add_argument("--early-stop-patience", type=int, default=0,
                   help="stop a training phase when its best val loss has "
                        "not improved for this many epochs (0 = off; the "
                        "reference always runs the full epoch budget)")
    g.add_argument("--random-flip", type=int, default=0, choices=[0, 1],
                   help="train-time random horizontal image flip, applied "
                        "ON DEVICE inside the fused step (the reference's "
                        "transform chain is deterministic, tasks.py:92-100)")
    g.add_argument("--random-crop-pad", type=int, default=0,
                   help="train-time random translation: reflect-pad images "
                        "by N pixels then randomly crop back to size (on "
                        "device, shape-preserving; 0 = off)")
    g.add_argument("--mle-objective", type=str, default="free",
                   choices=["free", "teacher", "scheduled"],
                   help="LSTM pretrain forward: 'free' = the reference's "
                        "free-running sample objective (training.py:71), "
                        "'teacher' = teacher forcing (the reference's unused "
                        "Decoder.forward, generator.py:39-53), 'scheduled' = "
                        "scheduled sampling (Bengio et al. 2015) ramping the "
                        "model-feedback probability 0 → --ss-max-prob over "
                        "the pretrain epochs. Transformers always run the "
                        "report's parallel teacher-forced MLE (§3.2.2)")
    g.add_argument("--ss-max-prob", type=float, default=1.0,
                   help="scheduled sampling: final model-feedback "
                        "probability of the linear per-epoch ramp")
    g.add_argument("--preset", type=str, default=None,
                   choices=sorted(PRESETS),
                   help="apply a named BASELINE.json benchmark configuration "
                        "as flag DEFAULTS (config1: CPU-runnable mini-MLE; "
                        "config2: full MLE + beam eval; config3: SeqGAN "
                        "adversarial at the sbatch geometry; config4: "
                        "transformer GAN with rollout rewards; config5: "
                        "ViT + GPT-2 stretch). Explicit flags still win.")
    g.add_argument("--mesh", type=str, default="",
                   help="device mesh spec, e.g. 'data:4,model:2'. Empty = all "
                        "devices on the 'data' axis.")
    g.add_argument("--dtype", type=str, default="float32",
                   choices=["float32", "bfloat16"],
                   help="compute dtype for matmuls/convs")
    g.add_argument("--seed", type=int, default=1008,
                   help="global PRNG seed (reference main.py:14 hardcodes 1008)")
    g.add_argument("--resume", type=str, default="",
                   help="path to a full TrainState checkpoint to resume from "
                        "(the reference has no resume path at all), or "
                        "'auto' to pick the newest interrupt/snapshot "
                        "checkpoint under this experiment name's previous "
                        "run dirs (fresh start when none exists — the same "
                        "command line works for first submit and requeue)")
    g.add_argument("--resume-schedule", type=int, default=1,
                   help="when --resume finds a schedule sidecar "
                        "(<ckpt>.schedule.json, written by interrupt saves "
                        "and periodic snapshots) fast-forward the training "
                        "schedule to the recorded phase/epoch/batch instead "
                        "of replaying from the start (0 = params-only resume "
                        "— the pre-sidecar behavior)")
    g.add_argument("--init-gen-ckpt", type=str, default="",
                   help="warm-start the generator params from a params "
                        "checkpoint (optimizers fresh) — e.g. an imported "
                        "pretrained GPT-2 decoder from src/import_gpt2.py")
    g.add_argument("--checkpoint-every", type=int, default=0,
                   help="also save a full resumable TrainState every N "
                        "pretrain/adv epochs (0 = only best-val, like the "
                        "reference)")
    g.add_argument("--keep-checkpoints", type=int, default=0,
                   help="retention for --checkpoint-every snapshots: keep "
                        "only the N newest state_*.ckpt per phase "
                        "(0 = keep all); best-val checkpoints are never "
                        "pruned")
    g.add_argument("--scst-epochs", type=int, default=0,
                   help="self-critical sequence training epochs between "
                        "MLE pretraining and adversarial training "
                        "(Rennie et al. 2017): REINFORCE on a sentence "
                        "metric reward with the model's own greedy decode "
                        "as baseline (train/scst.py; 0 = off)")
    g.add_argument("--scst-reward", type=str, default="cider",
                   choices=["cider", "bleu"],
                   help="SCST reward metric: CIDEr-D with idf fit over the "
                        "training captions (the COCO leaderboard metric) "
                        "or smoothed sentence BLEU-4")
    g.add_argument("--scst-multi-ref", action="store_true",
                   help="SCST rewards score against ALL of the row's "
                        "image's reference captions (coco-caption "
                        "pairing) instead of the row's own caption only")
    g.add_argument("--scst-lr", type=float, default=0.0,
                   help="SCST learning rate (0 = reuse --gen-lr); the "
                        "update shares the adversarial generator Adam "
                        "chain")
    g.add_argument("--eval-bleu-every", type=int, default=0,
                   help="compute BLEU-4/NLL_gen on val every N epochs "
                        "(0 = off; the reference left BLEU commented out, "
                        "training.py:75-76)")
    g.add_argument("--beam-size", type=int, default=1,
                   help="beam width for caption decoding at eval (1 = greedy, "
                        "the reference's only mode, generator.py:55-81)")
    g.add_argument("--dataset", type=str, default="coco",
                   choices=["coco", "synthetic"],
                   help="'synthetic' runs on a deterministic tiny fixture "
                        "(useful for tests/benchmarks without COCO on disk)")
    g.add_argument("--synthetic-items", type=int, default=512,
                   help="train items for --dataset synthetic (val gets 1/4;"
                        " larger values scale the procedural grammar up for"
                        " flagship-geometry quality runs)")
    g.add_argument("--num-workers", type=int, default=4,
                   help="host-side data-loading worker threads")
    g.add_argument("--precollate", type=str, default="auto",
                   choices=["auto", "on", "off"],
                   help="collate the whole dataset into dense arrays once "
                        "so every epoch batch is a numpy row-gather "
                        "(removes the per-batch Python collation that "
                        "contends with step dispatch on the GIL). auto = "
                        "on when captions + decoded images fit "
                        "$GIC_PRECOLLATE_BUDGET bytes (default 1 GiB); "
                        "host augmentation never exists here (augmentation "
                        "is on-device, ops/augment.py), so this is lossless. "
                        "Multi-host: every host pins the FULL collation "
                        "(the shuffle precedes the host stride), so budget "
                        "per host accordingly")
    g.add_argument("--device-prefetch", type=int, default=2,
                   help="device-resident batch queue depth: a background "
                        "thread jax.device_put's upcoming batches so "
                        "host→device uploads overlap the running step "
                        "(0 = synchronous per-batch transfer, the "
                        "reference's .to(device) behavior)")
    g.add_argument("--steps-per-call", type=int, default=1,
                   help="train steps fused into ONE device program via "
                        "lax.scan over K stacked batches (MaxText-style "
                        "multi-step): amortizes the per-dispatch host RTT "
                        "that caps in-run throughput on remote/tunneled "
                        "chips. Interrupt/mid-epoch-checkpoint granularity "
                        "becomes K batches. 1 = reference per-batch stepping")
    g.add_argument("--profile-dir", type=str, default="",
                   help="if set, dump a jax.profiler trace for the first adv "
                        "epoch into this directory")
    g.add_argument("--no-jit", action="store_true",
                   help="disable jit (debugging)")
    g.add_argument("--vocab-multiple", type=int, default=1,
                   help="round the dataset vocab size up to a multiple of "
                        "this (128 recommended on TPU: aligns the vocab dim "
                        "to the 128-lane MXU tiling and makes vocab-dim "
                        "tensor parallelism divisible). Padded ids are never "
                        "produced by data and decode maps them to <UNK>. "
                        "1 = reference parity (main.py:38 uses the raw size).")
    g.add_argument("--tokenizer", type=str, default="word",
                   choices=["word", "bpe"],
                   help="'word' = the reference's first-appearance word "
                        "vocab (tasks.py:39-51). 'bpe' = GPT-2 byte-level "
                        "BPE (data/bpe.py) over --bpe-vocab/--bpe-merges — "
                        "the data path for pretrained GPT-2 generators "
                        "(src/import_gpt2.py).")
    g.add_argument("--bpe-vocab", type=str, default="",
                   help="path to a GPT-2-format vocab.json (--tokenizer bpe)")
    g.add_argument("--bpe-merges", type=str, default="",
                   help="path to a GPT-2-format merges.txt (--tokenizer bpe)")
    g.add_argument("--encoder-init", type=str, default="sweep",
                   choices=["sweep", "natural"],
                   help="'sweep' = reference parity: the init sweep "
                        "overwrites EVERY encoder weight incl. BatchNorm "
                        "scales with U(-0.05,0.05) (generator.py:116-123), "
                        "which measurably kills the backbone's signal "
                        "(~1e-9 cross-image feature variance — likely why "
                        "the report's Table 4 shows conditioning not "
                        "helping). 'natural' keeps kaiming/BN-ones init "
                        "for the encoder so conditioning works.")
    g.add_argument("--cache-features", type=int, default=0, choices=[0, 1],
                   help="precompute frozen-backbone features once per image "
                        "instead of re-running the CNN every epoch (the "
                        "reference recomputes it, training.py:65-66; implies "
                        "eval-mode backbone BatchNorm). Conditional + frozen "
                        "backbone + lstm generator only.")
    g.add_argument("--device-preprocess", type=int, default=0, choices=[0, 1],
                   help="ship resized uint8 images to the device and "
                        "normalize there (4× smaller host→device batches; "
                        "the fused image-pipeline path)")
    g.add_argument("--use-pallas", type=str, default="auto",
                   choices=["auto", "on", "off"],
                   help="route Gumbel sampling through the fused Pallas "
                        "kernel (auto = on when running on TPU). Its PRNG "
                        "stream differs from jax.random's, so runs are not "
                        "bit-comparable with --use-pallas off.")
    g.add_argument("--cp-mode", type=str, default="gspmd",
                   choices=["gspmd", "ring", "ulysses"],
                   help="sequence-parallel attention mode when the --mesh "
                        "has an 'sp' axis: 'gspmd' = compiler-managed "
                        "activation sharding; 'ring'/'ulysses' = the "
                        "explicit shard_map kernels "
                        "(parallel/context_parallel.py) inside the fused "
                        "train steps")
    g.add_argument("--pp-microbatches", type=int, default=4,
                   help="GPipe microbatches when the --mesh has a 'pp' "
                        "axis (batch must divide evenly)")
    g.add_argument("--zero1", action="store_true",
                   help="ZeRO-1: shard the Adam moments (mu/nu) over the "
                        "--mesh 'data' axis instead of replicating them — "
                        "each device holds 1/N of the optimizer state and "
                        "runs 1/N of the update math; XLA inserts the "
                        "reduce-scatter/all-gather (parallel/sharding.py). "
                        "Params stay replicated (ZeRO-1, not 2/3). No-op "
                        "without a data axis > 1.")
    g.add_argument("--adv-objective", type=str, default="gumbel",
                   choices=["gumbel", "reinforce"],
                   help="adversarial generator objective: 'gumbel' = the "
                        "reference's Gumbel-softmax relaxation "
                        "(generator.py:84-96); 'reinforce' = SeqGAN-style "
                        "policy gradient with rollout-based rewards "
                        "(BASELINE.json config 4 — not present in the "
                        "committed reference code)")
    g.add_argument("--rollout-num", type=int, default=0,
                   help="Monte-Carlo completions per prefix for rollout "
                        "rewards (reinforce objective). 0 = terminal-only "
                        "reward (one D score per sequence)")
    g.add_argument("--rollout-stride", type=int, default=4,
                   help="evaluate rollout rewards every N prefix positions "
                        "(bounds the O(T²·K) rollout cost; SeqGAN uses 1)")
    g.add_argument("--rl-baseline", type=str, default="greedy",
                   choices=["greedy", "batch_mean"],
                   help="REINFORCE variance-reduction baseline: 'greedy' = "
                        "self-critical (the greedy decode's discriminator "
                        "score), 'batch_mean' = batch average reward")
    g.add_argument("--quantize", type=str, default="none",
                   choices=["none", "int8", "int4"],
                   help="weight-only quantization of the DECODE path "
                        "(evaluate/caption/serve): int8 stores the decoder "
                        "— embedding, LSTM stack, vocab projection — as "
                        "symmetric per-channel int8, halving per-step HBM "
                        "weight reads vs bf16 (ops/quantize.py); int4 "
                        "(native jnp.int4, packed on TPU) quarters them — "
                        "measure quality per model (per-channel 4-bit is "
                        "lossier). Training and NLL eval stay "
                        "full-precision; transformer decoders get "
                        "fake-quant (storage-fidelity only)")
    g.add_argument("--decode-impl", type=str, default="fused",
                   choices=["fused", "decoupled", "kernel"],
                   help="LSTM free-running decode implementation. 'fused' "
                        "(default) = one differentiable scan. 'decoupled' "
                        "splits a gradient-free sampling scan from a "
                        "batched teacher-forced rescore; 'kernel' replaces "
                        "the sampling scan with the weights-resident "
                        "Pallas decode kernel (TPU). (Valid because the "
                        "feedback is detached, reference generator.py:75; "
                        "identical ids/outputs/gradients — tested). "
                        "MEASURED on v5e: decoupled moves MORE HBM bytes "
                        "(12.1 vs 10.9 GB/step — XLA already defers scan "
                        "weight grads; the rescore adds [T,B,V] "
                        "materializations and a second forward), so fused "
                        "stays the default (benchmarks/step_cost.py).")
    g.add_argument("--disc-engine", type=str, default="auto",
                   choices=["auto", "xla", "pallas", "hybrid", "mxu"],
                   help="Discriminator conv/relu/maxpool engine "
                        "(kernels/disc_conv.py; all numerics-equivalent, "
                        "gradient-tested). 'auto' (default) = 'mxu' on "
                        "TPU — the MXU-matmul Pallas fwd+bwd engine, "
                        "fastest measured (+11%% full-step vs hybrid) — "
                        "and plain XLA elsewhere. 'xla' forces the pure "
                        "XLA path (bit-parity with the r1/r2 training "
                        "default). The GIC_DISC_KERNEL env var (bench/"
                        "test knob) overrides this flag. Pallas engines "
                        "require the data-only kernel mesh when --mesh "
                        "is set; otherwise they stay off.")
    g.add_argument("--skip-nonfinite-grads", type=int, default=0,
                   help="skip an optimizer update (params/opt-state/EMA "
                        "unchanged; counters still advance) when that "
                        "side's gradient global norm is non-finite — the "
                        "production guard for long bf16 adversarial runs "
                        "where one poisoned batch would destroy the run. "
                        "0 = reference behavior (apply whatever came back)")
    g.add_argument("--debug-nans", action="store_true",
                   help="enable jax_debug_nans: fail loudly at the op that "
                        "first produces a NaN (the functional-purity "
                        "equivalent of a sanitizer — SURVEY §5)")
    g.add_argument("--length-buckets", type=str, default="",
                   help="comma-separated caption-length bucket upper bounds "
                        "(e.g. '12,20,36'); batches are grouped per bucket "
                        "so short captions don't pay full-width compute. "
                        "Empty = single fixed width (max_seq_len+2).")


def build_parser():
    """The full argparse surface: reference groups + TPU extensions.

    Returns a :class:`_PresetParser` so every CLI entry point gets
    ``--preset configN`` resolution for free."""
    parser = _PresetParser("NLP GAN args (TPU-native rebuild)")
    # Registration order mirrors the reference (args.py:204-206).
    add_training_args(parser)
    add_data_args(parser)
    add_model_args(parser)
    add_global_args(parser)
    add_tpu_args(parser)
    return parser


@dataclasses.dataclass(frozen=True)
class Config:
    """Frozen, hashable view of the flag namespace.

    Static model/sequence fields are safe to close over in jitted code.
    Mutable run-time state (vocab size is filled post-dataset-build, mirroring
    reference ``main.py:38``) is carried by replacing the dataclass.
    """

    # model — generator
    gen_hidden_dim: int = 512
    gen_embed_dim: int = 32
    gen_num_layers: int = 1
    gen_init: str = "uniform"
    # model — discriminator
    disc_embed_dim: int = 64
    disc_num_rep: int = 64
    disc_filter_sizes: Tuple[int, ...] = (3, 4, 5)
    disc_num_filters: Tuple[int, ...] = (300, 300, 300)
    disc_init: str = "uniform"
    conditional_gan: int = 0
    # data
    vocab_size: int = -1
    max_seq_len: int = 34
    padding_idx: int = 0
    image_size: int = 256
    captions_per_image: int = 1
    dataset_percent: float = 1.0
    # training
    pretrain_lr: float = 1e-2
    pretrain_epochs: int = 0
    pre_train_batch_size: int = 64
    pre_eval_batch_size: int = 64
    gen_lr: float = 1e-4
    disc_lr: float = 1e-4
    disc_train_freq: int = 1
    adv_epochs: int = 30
    adv_train_batch_size: int = 64
    adv_eval_batch_size: int = 64
    adv_loss_type: str = "standard"
    temperature: int = 100
    temp_adpt: str = "exp"
    clip_norm: float = 5.0
    # global
    device: str = "cuda"
    device_ids: int = 0
    expt_name: str = "debug"
    model_dir: str = "models"
    data_dir: str = "./data"
    save_dir: str = "./save"
    adv_log_step: int = 1
    pre_log_step: int = 1
    test_log_step: int = 1
    log_file: str = "log"
    # tpu extensions
    gen_arch: str = "lstm"
    disc_arch: str = "cnn"
    encoder_arch: str = "resnet18"
    trainable_backbone: int = 0
    gen_num_heads: int = 8
    disc_num_heads: int = 8
    disc_hidden_dim: int = 128
    disc_num_layers: int = 4
    label_smoothing: float = 0.0
    noisy_labels: float = 0.0
    mesh: str = ""
    dtype: str = "float32"
    seed: int = 1008
    resume: str = ""
    resume_schedule: int = 1
    checkpoint_every: int = 0
    keep_checkpoints: int = 0
    scst_epochs: int = 0
    scst_reward: str = "cider"
    scst_multi_ref: bool = False
    scst_lr: float = 0.0
    eval_bleu_every: int = 0
    beam_size: int = 1
    dataset: str = "coco"
    num_workers: int = 4
    precollate: str = "auto"
    device_prefetch: int = 2
    steps_per_call: int = 1
    profile_dir: str = ""
    no_jit: bool = False
    vocab_multiple: int = 1
    init_gen_ckpt: str = ""
    tokenizer: str = "word"
    bpe_vocab: str = ""
    bpe_merges: str = ""
    encoder_init: str = "sweep"
    cache_features: int = 0
    device_preprocess: int = 0
    use_pallas: str = "auto"
    quantize: str = "none"
    decode_impl: str = "fused"
    disc_engine: str = "auto"
    cp_mode: str = "gspmd"
    pp_microbatches: int = 4
    zero1: bool = False
    adv_objective: str = "gumbel"
    rollout_num: int = 0
    rollout_stride: int = 4
    rl_baseline: str = "greedy"
    skip_nonfinite_grads: int = 0
    debug_nans: bool = False
    length_buckets: str = ""
    lr_schedule: str = "constant"
    lr_warmup_steps: int = 0
    lr_decay_steps: int = 0
    lr_min_ratio: float = 0.0
    grad_accum: int = 1
    ema_decay: float = 0.0
    mle_objective: str = "free"
    ss_max_prob: float = 1.0
    random_flip: int = 0
    random_crop_pad: int = 0
    length_penalty: float = 0.0
    early_stop_patience: int = 0

    def resolve_use_pallas(self) -> bool:
        """'auto' → True on TPU backends only."""
        if self.use_pallas == "auto":
            import jax

            return jax.default_backend() == "tpu"
        return self.use_pallas == "on"

    # ------------------------------------------------------------------ props
    @property
    def cgan(self) -> bool:
        """Conditional mode (the reference reads a never-set ``args.cgan`` in
        ``Generator.forward``, generator.py:109 — a latent bug; the working
        spelling is ``conditional_gan==1``, training.py:45)."""
        return self.conditional_gan == 1

    @property
    def seq_len(self) -> int:
        """Static decode length: captions are wrapped ``<S> … <E>`` so padded
        batches are ``max_seq_len + 2`` long (reference ``tasks.py:147,155``
        pads to the *batch* max + 2; XLA needs one static shape)."""
        return self.max_seq_len + 2

    @property
    def disc_feature_dim(self) -> int:
        """sum(num_filters) — reference ``discriminator.py:16``."""
        return int(sum(self.disc_num_filters))

    @property
    def emb_dim_single(self) -> int:
        """Per-representation embedding width — ``discriminator.py:17``."""
        return self.disc_embed_dim // self.disc_num_rep

    def replace(self, **kw) -> "Config":
        return dataclasses.replace(self, **kw)


def config_from_args(args: argparse.Namespace) -> Config:
    """Convert a parsed namespace into a frozen Config."""
    fields = {f.name for f in dataclasses.fields(Config)}
    kw = {}
    for key, val in vars(args).items():
        key = key.replace("-", "_")
        if key in fields:
            if isinstance(val, list):
                val = tuple(val)
            kw[key] = val
    config = Config(**kw)
    if config.gen_arch == "gpt2":
        # GPT-2-small preset (the stretch config, BASELINE.json config 5):
        # the transformer generator at d=768, 12 layers, 12 heads, MLP 3072.
        config = config.replace(gen_arch="transformer", gen_embed_dim=768,
                                gen_hidden_dim=3072, gen_num_layers=12,
                                gen_num_heads=12)
    return config


def resolve_auto_resume(args: argparse.Namespace) -> argparse.Namespace:
    """``--resume auto``: turnkey preemption recovery.

    Finds the newest resumable TrainState among THIS experiment name's
    previous run dirs (``{save_dir}/{expt_name}_{n}/{model_dir}``) —
    candidates are ``interrupt_state.ckpt`` (SIGTERM saves) and
    ``state_*.ckpt`` / ``state_pre_*.ckpt`` (``--checkpoint-every``
    snapshots, which cover hard crashes); newest mtime wins.  No candidate
    → fresh start.  A requeued cluster job therefore reruns the IDENTICAL
    command line for the first submission and every restart, and the
    schedule sidecar (train/schedule.py) fast-forwards to the exact
    phase/epoch/batch.  Must run BEFORE :func:`make_experiment_dirs`
    rewrites ``save_dir``/``expt_name`` into the new run dir.
    """
    if getattr(args, "resume", "") != "auto":
        return args
    import re

    # os.listdir + regex, NOT glob: a save_dir like 'runs[2026]/out' must
    # not be interpreted as a character class (a silent no-match would
    # restart training from scratch on requeue)
    run_re = re.compile(re.escape(args.expt_name) + r"_\d+$")
    ckpt_re = re.compile(r"(interrupt_state|state_(pre_)?\d+)\.ckpt$")
    candidates = []
    try:
        run_dirs = os.listdir(args.save_dir)
    except OSError:
        run_dirs = []
    for run in run_dirs:
        if not run_re.fullmatch(run):
            continue
        mdir = os.path.join(args.save_dir, run, args.model_dir)
        try:
            names = os.listdir(mdir)
        except OSError:
            continue
        candidates.extend(os.path.join(mdir, n) for n in names
                          if ckpt_re.fullmatch(n))
    args.resume = (max(candidates, key=os.path.getmtime)
                   if candidates else "")
    return args


def make_experiment_dirs(args: argparse.Namespace) -> argparse.Namespace:
    """Experiment-dir side effects — reference ``args.py:261-273``.

    Auto-increments ``{save_dir}/{expt_name}_{n}``, creates it plus the
    ``{model_dir}`` subdir, and rewrites ``args.save_dir`` / ``args.model_dir``
    / ``args.log_file`` to point inside it.
    """
    resolve_auto_resume(args)
    expt_no = 1
    while os.path.exists(os.path.join(args.save_dir, f"{args.expt_name}_{expt_no}")):
        expt_no += 1
    args.expt_name = f"{args.expt_name}_{expt_no}"
    args.save_dir = os.path.join(args.save_dir, args.expt_name)
    os.makedirs(args.save_dir)
    args.model_dir = os.path.join(args.save_dir, args.model_dir)
    os.makedirs(args.model_dir)
    args.log_file = os.path.join(args.save_dir, args.log_file)
    return args


def get_args(argv: Optional[list] = None, make_dirs: bool = True) -> argparse.Namespace:
    """Parse flags and apply the reference's side effects (``args.py:200-280``)."""
    parser = build_parser()
    args = parser.parse_args(argv)
    if make_dirs:
        make_experiment_dirs(args)
    apply_device_flag(args)
    return args


def apply_device_flag(args: argparse.Namespace) -> None:
    """Honor ``--device cpu`` before any computation runs.

    Restricting ``jax_platforms`` (not just ``jax_platform_name``) stops jax
    from even initializing accelerator plugins — platform-name selection
    still initializes every registered backend, and a TPU plugin whose
    tunnel is unreachable blocks that init for many minutes.  Every CLI
    entry point that builds its own parser must call this after parsing.
    """
    if getattr(args, "device", None) == "cpu":
        import jax

        jax.config.update("jax_platforms", "cpu")
