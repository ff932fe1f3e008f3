#!/bin/bash
# Kill-and-resume proof at flagship geometry on the REAL chip (VERDICT r4
# item 8): SIGTERM mid-adversarial-epoch, `--resume auto`, and the
# continued run's loss trajectory must equal an uninterrupted control.
#
#   bash scripts/resume_proof_r5.sh [workdir]
#
# Writes control/interrupted run dirs + a comparison verdict to
# $workdir/verdict.txt and prints it.
set -uo pipefail
cd "$(dirname "$0")/.."

WORK=${1:-/tmp/resume_proof_r5}
rm -rf "$WORK"; mkdir -p "$WORK"

FLAGS=(--dataset synthetic --synthetic-items 64000 --vocab-multiple 11008
       --gen-embed-dim 512 --gen-hidden-dim 512 --gen-num-layers 2
       --max-seq-len 34 --dtype bfloat16 --decode-impl kernel
       --disc-embed-dim 64 --disc-num-rep 64 --disc-filter-sizes 3,4,5
       --disc-num-filters 300,300,300
       --pre-train-batch-size 64 --adv-train-batch-size 64
       --pretrain-epochs 1 --adv-epochs 4 --device tpu
       --steps-per-call 4
       --checkpoint-every 1 --seed 1008)

echo "[proof] control run (uninterrupted)..."
python src/main.py "${FLAGS[@]}" --save-dir "$WORK" --expt-name control \
    > "$WORK/control.log" 2>&1
rc=$?
echo "[proof] control rc=$rc"

echo "[proof] interrupted run: SIGTERM ~10s into the adversarial phase..."
python src/main.py "${FLAGS[@]}" --save-dir "$WORK" --expt-name victim \
    --resume auto > "$WORK/victim1.log" 2>&1 &
PID=$!
# wait until the adversarial phase starts, then a bit into it
# wait for epoch 0's END line, then land the kill ~30% into epoch 1
for i in $(seq 1 600); do
  grep -q "\[ADV\] epoch 0" "$WORK/victim_1/log.txt" 2>/dev/null && break
  sleep 2
done
sleep 30
kill -TERM "$PID" 2>/dev/null
wait "$PID"
echo "[proof] victim first leg rc=$? (SIGTERM checkpoint expected)"

echo "[proof] resuming with the IDENTICAL command line (--resume auto)..."
python src/main.py "${FLAGS[@]}" --save-dir "$WORK" --expt-name victim \
    --resume auto > "$WORK/victim2.log" 2>&1
echo "[proof] resume leg rc=$?"

python - "$WORK" << 'EOF'
import glob
import json
import os
import sys

work = sys.argv[1]

TAGS = ("Generator_train_loss", "Discriminator_train_loss")


def stream(pattern):
    """Merge metrics.jsonl rows from all run dirs matching pattern
    (victim leg 1 + resumed leg), keyed (tag, step) — later rows win."""
    rows = {}
    for d in sorted(glob.glob(os.path.join(work, pattern)),
                    key=lambda p: int(p.rsplit("_", 1)[-1])):
        path = os.path.join(d, "metrics.jsonl")
        if not os.path.exists(path):
            continue
        with open(path) as f:
            for line in f:
                r = json.loads(line)
                if r["tag"] in TAGS:
                    rows[(r["tag"], r["step"])] = r["value"]
    return rows


ctrl = stream("control_*")
vict = stream("victim_*")
verdict = []
ok = True
for tag in TAGS:
    c_steps = sorted(s for t, s in ctrl if t == tag)
    v_steps = sorted(s for t, s in vict if t == tag)
    if not c_steps:
        ok = False
        verdict.append(f"{tag}: control stream empty")
        continue
    if c_steps[-1] != (v_steps[-1] if v_steps else None):
        ok = False
        verdict.append(f"{tag}: final step mismatch control {c_steps[-1]} "
                       f"vs victim {v_steps[-1] if v_steps else None}")
    missing = [s for s in c_steps if (tag, s) not in vict]
    if missing:
        ok = False
        verdict.append(f"{tag}: victim missing {len(missing)} steps "
                       f"(first {missing[:5]})")
    worst, worst_s, n = 0.0, None, 0
    for s in c_steps:
        if (tag, s) in vict:
            d = abs(ctrl[(tag, s)] - vict[(tag, s)])
            n += 1
            if d > worst:
                worst, worst_s = d, s
    same = worst < 1e-4
    ok &= same
    verdict.append(f"{tag}: {n} steps compared, worst |d|={worst:.2e} at "
                   f"step {worst_s} {'OK' if same else 'MISMATCH'}")
verdict.append("RESULT: " + (
    "interrupted+resumed trajectory EQUALS the uninterrupted control "
    "(every step, |d|<1e-4) — resume proof PASSES" if ok else "FAILED"))
out = "\n".join(verdict)
print(out)
open(os.path.join(work, "verdict.txt"), "w").write(out + "\n")
sys.exit(0 if ok else 1)
EOF
rc=$?
echo "[proof] overall rc=$rc"
exit $rc
