"""Reproduce the report's Table 2/3/5 sweeps at fixture scale (VERDICT r4
missing #1).

The reference report's headline experiments are the G:D step-ratio sweep
(NLP_Report.pdf Table 2: best = 2), the max-Gumbel-temperature sweep
(Table 3: best = 100) and the generator-discriminator architecture
comparison (Table 5: TF+TF best, TF+AR-TF middle, LSTM+TF-disc worst).
This driver runs all three through ``src/sweep.py`` on the synthetic
grammar fixture (CPU-runnable, same recipe as docs/results.md's
"Synthetic-grammar transformer GAN"), writing per-sweep results.jsonl +
markdown tables under ``--out`` (default docs/artifacts/sweeps_r5/).

    python scripts/report_sweeps_r5.py [--out DIR] [--adv-epochs 8]

Each cell is a full MLE-pretrain → adversarial → evaluate run in a fresh
subprocess; expect ~1-2 h wall for the 12 cells on the 1-core box.
"""

import argparse
import os
import subprocess
import sys

HERE = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.dirname(HERE)
SWEEP = os.path.join(REPO, "src", "sweep.py")

# docs/results.md fixture recipe (transformer dims; the CNN/biLSTM discs
# get matching small dims).  --device cpu: fixture-scale runs must not
# time-share the chip.
BASE = [
    "--dataset", "synthetic", "--device", "cpu",
    "--max-seq-len", "10",
    "--gen-embed-dim", "48", "--gen-hidden-dim", "96",
    "--gen-num-layers", "2", "--gen-num-heads", "4",
    "--disc-embed-dim", "16", "--disc-hidden-dim", "32",
    "--disc-num-heads", "4", "--disc-num-layers", "2",
    "--disc-num-rep", "8", "--disc-num-filters", "32,32,32",
    "--pretrain-lr", "3e-3",
    # Adversarial pressure: the first r5 pass (8 adv epochs, 1e-4 lrs)
    # produced identical NLL/BLEU across every cell — the adversarial
    # phase barely moved the MLE solution, so the sweep had no power.
    # The report's orderings come from training where bad settings
    # DEGRADE the model; 30 epochs at 1e-3 lets the dynamics bite at
    # fixture scale.
    "--gen-lr", "1e-3", "--disc-lr", "1e-3",
]

SWEEPS = [
    # (name, grid, extra flags)
    ("table2_gd_ratio", "disc-train-freq=1,2,5",
     ["--gen-arch", "transformer", "--disc-arch", "cnn"]),
    ("table3_max_temp", "temperature=1,10,100,1000",
     ["--gen-arch", "transformer", "--disc-arch", "transformer"]),
    ("table5_arch_tfgen", "disc-arch=cnn,transformer,ar_transformer,bilstm",
     ["--gen-arch", "transformer"]),
    ("table5_arch_lstmgen", "gen-arch=lstm;disc-arch=transformer", []),
]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default=os.path.join(REPO, "docs", "artifacts",
                                                  "sweeps_r5"))
    ap.add_argument("--pretrain-epochs", default="12")
    ap.add_argument("--adv-epochs", default="30")
    ap.add_argument("--only", default="",
                    help="comma-separated sweep names to run (default all)")
    args = ap.parse_args()
    only = {s for s in args.only.split(",") if s}

    os.makedirs(args.out, exist_ok=True)
    for name, grid, extra in SWEEPS:
        if only and name not in only:
            continue
        sweep_dir = os.path.join(args.out, name)
        cmd = [sys.executable, SWEEP, "--grid", grid,
               "--sweep-dir", sweep_dir,
               *BASE, *extra,
               "--pretrain-epochs", args.pretrain_epochs,
               "--adv-epochs", args.adv_epochs]
        print(f"[sweeps] {name}: {grid}", flush=True)
        table_path = os.path.join(args.out, f"{name}.md")
        with open(table_path, "w") as f:
            r = subprocess.run(cmd, stdout=f, stderr=subprocess.DEVNULL)
        print(f"[sweeps] {name} rc={r.returncode} -> {table_path}",
              flush=True)
    print("[sweeps] done")


if __name__ == "__main__":
    main()
