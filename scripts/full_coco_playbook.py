"""Turnkey full-COCO playbook: one command that reproduces a Table-1 row.

The reference's entire purpose is the NLP_Report.pdf Table-1 pipeline
(``/root/reference/src/tasks.py:18-136``, canonical launch
``/root/reference/sbatch_script.s:16``): MLE-pretrain a captioning
generator on 10%-COCO (Karpathy split), adversarially fine-tune it against
the RelGAN CNN discriminator, then report NLL_gen / BLEU-4 on val.  COCO
is not on this disk, so this script is the committed, DRY-RUN-PROVEN
playbook: the *identical* command runs end-to-end on the committed
``data/mini_coco`` fixture today, and on the real dataset the day
``dataset_coco.json`` + images are present — only ``--data-dir`` and
``--scale full`` change.

Usage (proof run, committed transcript in docs/results.md):

    python scripts/full_coco_playbook.py --workdir /tmp/playbook \
        --data-dir data/mini_coco --scale mini

Usage (real data, flagship recipe — docs/results.md run-3 hyperparameters):

    python scripts/full_coco_playbook.py --workdir /path/to/out \
        --data-dir /path/to/coco --scale full [--device tpu] \
        [--gpt2-ckpt gpt2.pt --vit-ckpt vit.pt]   # BASELINE config 5

Phases (each restartable; --resume auto carries interrupted runs):
  1. train: ``src/main.py`` MLE pretrain -> adversarial fine-tune
     (one process, same as the reference's tasks.py sequencing).
  2. evaluate: ``src/evaluate.py`` on the val split -> NLL_gen + BLEU-4
     for BOTH checkpoints (pretrained + adversarial).
  3. report: ``playbook_table.md`` — the Table-1-row layout
     (model, NLL_gen, BLEU-4) next to the reference's published row.

Optional pretrained-weight legs (BASELINE config 5): pass ``--gpt2-ckpt``
(a HF GPT-2 torch checkpoint dir/file — imported via src/import_gpt2.py)
and/or ``--vit-ckpt`` (ViT-B — src/import_vit.py); the trained generator
then starts from those weights exactly as the report's "pretrained" rows.
"""

import argparse
import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
PY = sys.executable

# docs/results.md run-3 recipe: the stable 30-epoch adversarial
# configuration at the reference's canonical sbatch geometry.
FULL_FLAGS = [
    "--gen-embed-dim", "512", "--gen-hidden-dim", "512",
    "--gen-num-layers", "2",
    "--pretrain-epochs", "30", "--adv-epochs", "30",
    "--pretrain-lr", "1e-2", "--gen-lr", "1e-5", "--disc-lr", "5e-5",
    "--dataset_percent", "0.1", "--captions-per-image", "5",
    "--dtype", "bfloat16", "--decode-impl", "kernel",
    "--disc-train-freq", "2", "--label-smoothing", "0.1",
    "--noisy-labels", "0.05",
    "--eval-bleu-every", "5", "--checkpoint-every", "10",
    "--pre-train-batch-size", "64", "--adv-train-batch-size", "64",
]

# Same pipeline at fixture scale: bounded minutes on one CPU core.
MINI_FLAGS = [
    "--gen-embed-dim", "32", "--gen-hidden-dim", "64",
    "--gen-num-layers", "2",
    "--pretrain-epochs", "4", "--adv-epochs", "3",
    "--pretrain-lr", "1e-2", "--gen-lr", "1e-5", "--disc-lr", "5e-5",
    "--captions-per-image", "5", "--max-seq-len", "7",
    "--image-size", "64", "--disc-train-freq", "2",
    "--label-smoothing", "0.1", "--noisy-labels", "0.05",
    "--pre-train-batch-size", "16", "--pre-eval-batch-size", "16",
    "--adv-train-batch-size", "16", "--adv-eval-batch-size", "16",
    "--eval-bleu-every", "2",
]


def run(cmd, tail=8):
    print(f"$ {' '.join(cmd)}", flush=True)
    p = subprocess.run(cmd, cwd=REPO, capture_output=True, text=True)
    out = p.stdout + p.stderr
    if p.returncode != 0:
        sys.stderr.write(out[-6000:])
        raise RuntimeError(f"command failed: {' '.join(cmd)}")
    lines = [ln for ln in p.stdout.strip().splitlines() if ln.strip()]
    for ln in lines[-tail:]:
        print(f"  | {ln}", flush=True)
    return p.stdout


def evaluate(ckpt, args, shared_flags, extra=()):
    # evaluate.py rebuilds datasets + model geometry from the same flag
    # surface, so the train run's model/data flags ride along verbatim
    out = run([PY, "src/evaluate.py", "--checkpoint", ckpt,
               "--split", "val", "--device", args.device,
               *shared_flags, *extra], tail=4)
    # evaluate.py prints one JSON line: {"nll_gen": …, "bleu4": …, …}
    for ln in reversed(out.strip().splitlines()):
        try:
            return json.loads(ln)
        except ValueError:
            continue
    return {}


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--workdir", required=True)
    ap.add_argument("--data-dir", default="./data")
    ap.add_argument("--scale", choices=["mini", "full"], default="full")
    ap.add_argument("--device", default="cpu" if os.environ.get(
        "PALLAS_AXON_POOL_IPS", "x") == "" else "tpu")
    ap.add_argument("--gpt2-ckpt", default="",
                    help="HF GPT-2 torch checkpoint: generator starts "
                         "pretrained (BASELINE config 5)")
    ap.add_argument("--vit-ckpt", default="",
                    help="ViT-B torch checkpoint: conditional encoder "
                         "starts pretrained")
    ap.add_argument("--extra", nargs=argparse.REMAINDER, default=[],
                    help="passed through to src/main.py verbatim")
    args = ap.parse_args(argv)
    os.makedirs(args.workdir, exist_ok=True)

    flags = FULL_FLAGS if args.scale == "full" else MINI_FLAGS
    expt = f"playbook_{args.scale}"

    # optional pretrained-weight imports (BASELINE config 5); each import
    # CLI accepts --hf-dir (a HF snapshot dir) or --state-dict (a torch
    # .pt/.bin file) — pass whichever the user has
    def _src_flag(path):
        return ["--hf-dir", path] if os.path.isdir(path) else \
               ["--state-dict", path]

    base_ckpt = ""
    if args.gpt2_ckpt:
        base_ckpt = os.path.join(args.workdir, "gpt2_base.ckpt")
        run([PY, "src/import_gpt2.py", *_src_flag(args.gpt2_ckpt),
             "--output", base_ckpt])
    if args.vit_ckpt:
        vit_out = os.path.join(args.workdir, "vit_base.ckpt")
        cmd = [PY, "src/import_vit.py", *_src_flag(args.vit_ckpt),
               "--output", vit_out]
        if base_ckpt:
            cmd += ["--base-ckpt", base_ckpt]
        run(cmd)
        base_ckpt = vit_out

    # model/data flags shared verbatim between the train and eval legs
    # (evaluate.py rebuilds datasets + geometry from the same surface)
    shared = ["--dataset", "coco", "--data-dir", args.data_dir, *flags]
    if args.gpt2_ckpt:
        shared += ["--gen-arch", "gpt2", "--tokenizer", "bpe"]
    if args.vit_ckpt or args.scale == "mini":
        shared += ["--conditional-gan", "1"]
    shared += args.extra

    # Phase 1: MLE pretrain -> adversarial (one process, reference
    # sequencing; --resume auto makes re-running this command a resume).
    train_cmd = [PY, "src/main.py", *shared,
                 "--save-dir", args.workdir, "--expt-name", expt,
                 "--device", args.device, "--resume", "auto"]
    if base_ckpt:
        train_cmd += ["--init-gen-ckpt", base_ckpt]
    run(train_cmd, tail=12)

    # run dir = newest {expt}_N under workdir (main.py auto-increments).
    # Sort numerically: lexicographic would rank "_9" after "_10".
    def _run_index(d):
        tail = d.rsplit("_", 1)[-1]
        return int(tail) if tail.isdigit() else -1

    runs = sorted((d for d in os.listdir(args.workdir)
                   if d.startswith(expt)), key=_run_index)
    run_dir = os.path.join(args.workdir, runs[-1])
    models = os.path.join(run_dir, "models")

    # Phase 2: one fixed evaluator for both checkpoints
    rows = {}
    for name, fname in (("MLE (pretrained)", "pretrained_model.ckpt"),
                        ("adversarial", "adv_model.ckpt")):
        ckpt = os.path.join(models, fname)
        if os.path.exists(ckpt):
            rows[name] = evaluate(ckpt, args, shared)

    # Phase 3: Table-1-row report
    table = ["| model | NLL_gen | BLEU-4 |", "|---|---|---|"]
    for name, m in rows.items():
        table.append(f"| {name} ({args.scale}) | "
                     f"{m.get('nll_gen', float('nan')):.4g} | "
                     f"{m.get('bleu4', float('nan')):.4g} |")
    table.append("| reference 'pretrained LSTM' (published, 10%-COCO) "
                 "| 2.07 | 0.008 |")
    md = "\n".join(table)
    with open(os.path.join(args.workdir, "playbook_table.md"), "w") as f:
        f.write(md + "\n")
    with open(os.path.join(args.workdir, "playbook_results.json"), "w") as f:
        json.dump(rows, f, indent=2)
    print(md)
    print(f"\nplaybook complete: {run_dir}")


if __name__ == "__main__":
    main()
