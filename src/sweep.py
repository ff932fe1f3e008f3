"""Experiment sweep runner: train + evaluate a cartesian grid of flags.

The reference's report is built on exactly these sweeps — G:D step ratio
(NLP_Report.pdf Table 2), maximum Gumbel temperature (Table 3), conditional
vs unconditional (Table 4), architecture pairings (Table 5) — all run by
hand-editing the sbatch line.  This makes them one command:

    python src/sweep.py --grid "disc-train-freq=1,2,5" \
        --dataset synthetic --pretrain-epochs 30 --adv-epochs 30 … \
        --sweep-dir /tmp/sweep_ratio

For every cell of the (cartesian) grid it runs ``src/main.py`` with the
base flags plus the cell's overrides in a SUBPROCESS (fresh jit caches, no
state bleed between cells), then ``src/evaluate.py`` on the cell's best
checkpoints (pretrained + adversarial when ``--adv-epochs > 0``), and
appends one JSON line per cell to ``{sweep_dir}/results.jsonl``.  At the
end it prints a markdown table in the report's format (rows = cells,
columns = NLL_gen / BLEU-4).

Cells run sequentially — one device, one process at a time (the chip is
the bottleneck; parallel cells would timeshare it and corrupt timing).
A cell that crashes is recorded with its error and the sweep continues.
"""

import itertools
import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def parse_grid(spec: str):
    """``"a=1,2;b=x,y"`` → list of override dicts (cartesian product).

    Flag names accept either spelling (``disc-train-freq`` or
    ``disc_train_freq``); values stay strings (argparse re-parses them).
    """
    axes = []
    for part in spec.split(";"):
        part = part.strip()
        if not part:
            continue
        name, _, vals = part.partition("=")
        if not vals:
            raise SystemExit(f"--grid axis '{part}' has no values")
        axes.append((name.strip().replace("_", "-"),
                     [v.strip() for v in vals.split(",")]))
    cells = []
    for combo in itertools.product(*[vals for _, vals in axes]):
        cells.append({name: v for (name, _), v in zip(axes, combo)})
    return cells


def cell_name(overrides: dict) -> str:
    return "__".join(f"{k.replace('-', '')}{v}" for k, v in
                     overrides.items()) or "base"


def main(argv=None):
    argv = list(sys.argv[1:] if argv is None else argv)

    # Sweep-level flags are peeled off; everything else passes through to
    # src/main.py / src/evaluate.py verbatim.
    def peel(flag, default=None, required=False):
        if flag in argv:
            i = argv.index(flag)
            val = argv[i + 1]
            del argv[i:i + 2]
            return val
        if required:
            raise SystemExit(f"{flag} is required")
        return default

    grid = peel("--grid", required=True)
    sweep_dir = peel("--sweep-dir", required=True)
    timeout = int(peel("--cell-timeout", "7200"))
    eval_extra = peel("--eval-flags", "")

    cells = parse_grid(grid)
    os.makedirs(sweep_dir, exist_ok=True)
    results_path = os.path.join(sweep_dir, "results.jsonl")
    results = []

    # flags meaningful only to training — never forward to evaluate.py
    train_only = {"--pretrain-epochs", "--adv-epochs", "--pretrain-lr",
                  "--gen-lr", "--disc-lr", "--disc-train-freq",
                  "--label-smoothing", "--noisy-labels", "--ema-decay",
                  "--lr-schedule", "--lr-warmup-steps", "--lr-decay-steps",
                  "--lr-min-ratio", "--eval-bleu-every", "--temperature",
                  "--temp-adpt", "--early-stop-patience", "--grad-accum",
                  "--checkpoint-every", "--mle-objective", "--ss-max-prob"}

    def split_eval_base(train_argv):
        out, skip = [], False
        for i, a in enumerate(train_argv):
            if skip:
                skip = False
                continue
            if a in train_only:
                skip = (i + 1 < len(train_argv)
                        and not train_argv[i + 1].startswith("--"))
                continue
            out.append(a)
        return out

    adv = "--adv-epochs" in argv and argv[argv.index("--adv-epochs") + 1] != "0"

    for idx, overrides in enumerate(cells):
        name = f"cell{idx}_{cell_name(overrides)}"
        run_dir = os.path.join(sweep_dir, f"{name}_1")
        train_argv = argv + sum([[f"--{k}", v] for k, v in
                                 overrides.items()], [])
        train_cmd = [sys.executable, "src/main.py", *train_argv,
                     "--save-dir", sweep_dir, "--expt-name", name]
        row = {"cell": idx, "overrides": overrides, "run_dir": run_dir}
        t0 = time.time()
        print(f"[sweep] cell {idx + 1}/{len(cells)}: {overrides}",
              file=sys.stderr, flush=True)
        try:
            r = subprocess.run(train_cmd, capture_output=True, text=True,
                               timeout=timeout)
            if r.returncode != 0:
                raise RuntimeError(r.stderr[-1500:])
            eval_base = split_eval_base(train_argv)
            for tag, ckpt in (
                    [("pretrained", "pretrained_model.ckpt")]
                    + ([("adv", "adv_model.ckpt")] if adv else [])):
                path = os.path.join(run_dir, "models", ckpt)
                if not os.path.exists(path):
                    row[tag] = {"error": "checkpoint missing"}
                    continue
                ev = subprocess.run(
                    [sys.executable, "src/evaluate.py", "--checkpoint", path,
                     *eval_base, *eval_extra.split(),
                     "--save-dir", sweep_dir, "--expt-name", f"{name}_ev"],
                    capture_output=True, text=True, timeout=timeout)
                if ev.returncode != 0:
                    raise RuntimeError(ev.stderr[-1500:])
                row[tag] = json.loads(ev.stdout.strip().splitlines()[-1])
        except Exception as e:  # record and continue — a sweep survives cells
            row["error"] = str(e)[:2000]
        row["wall_s"] = round(time.time() - t0, 1)
        results.append(row)
        with open(results_path, "a") as f:
            f.write(json.dumps(row) + "\n")

    # ---- report's table format
    cols = ["pretrained"] + (["adv"] if adv else [])
    header = "| " + " | ".join(
        list(cells[0].keys())
        + [f"{c} NLL_gen / BLEU-4" for c in cols]) + " |"
    print(header)
    print("|" + "---|" * (len(cells[0]) + len(cols)))
    for row in results:
        vals = [str(v) for v in row["overrides"].values()]
        for c in cols:
            m = row.get(c, {})
            if "nll_gen" in m:
                vals.append(f"{m['nll_gen']} / {m['bleu4']}")
            else:
                vals.append("ERROR" if "error" in {**row, **m} else "—")
        print("| " + " | ".join(vals) + " |")
    return results


if __name__ == "__main__":
    main()
