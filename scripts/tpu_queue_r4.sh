#!/usr/bin/env bash
# Round-4 TPU work queue (VERDICT r3 items 1-4, 6).  Run serialized, with
# NO concurrent CPU-heavy work (1 host core; dispatch starvation costs
# ~10% of measured steps/s — .claude/skills/verify/SKILL.md).
#
#   bash scripts/tpu_queue_r4.sh [outdir]   # default docs/artifacts/tpu_queue_r4
#
# Ordered by value-per-minute: floor session 2 first (the round's #1
# deliverable), then the in-run instructor ladder at the new operating
# point, the profiler trace for the MFU attribution, the int8-kernel
# decode A/B, and the speculative decode numbers.

set -u
cd "$(dirname "$0")/.."
OUT="${1:-docs/artifacts/tpu_queue_r4}"
mkdir -p "$OUT"

log() { echo "[tpu_queue_r4 $(date +%H:%M:%S)] $*"; }

# 0. relay probe (fail fast when wedged)
log "probing TPU relay..."
if ! timeout 120 python -c "import jax; assert jax.default_backend() == 'tpu', jax.default_backend(); print(jax.devices())" > "$OUT/probe.txt" 2>&1; then
  log "relay wedged or non-TPU backend (see $OUT/probe.txt) — aborting"
  exit 2
fi
log "relay up: $(cat "$OUT/probe.txt")"

# 1. floor session 2: 3 fresh-process bench reps (adds to session 1 run
# earlier — the committed floor is the WORST rep across both sessions)
for rep in 1 2 3; do
  log "floor session-2 rep $rep/3..."
  timeout 2700 python bench.py >> "$OUT/floor_s2.jsonl" 2> "$OUT/floor_s2_rep${rep}.err"
done
log "session-2 reps: $(tail -3 "$OUT/floor_s2.jsonl" 2>/dev/null)"

# 2. in-run instructor ladder with the CURRENT default stack (stale at
# ~98 steps/s from when the bench was 107.5 — VERDICT r3 item 2)
for spc in 1 2 4 8; do
  log "instructor_throughput GIC_SPC=$spc..."
  GIC_SPC=$spc timeout 2700 python benchmarks/instructor_throughput.py \
    >> "$OUT/instructor_spc.jsonl" 2> "$OUT/instructor_spc${spc}.err" \
    || log "spc=$spc failed"
done
log "spc ladder: $(cat "$OUT/instructor_spc.jsonl" 2>/dev/null)"

# 3. profiler trace of the CURRENT default adv step (per-phase wall-time
# attribution for the MFU/roofline section — VERDICT r3 item 3)
log "profiler capture..."
timeout 2700 python benchmarks/profile_step.py > "$OUT/profile_step.log" 2>&1 \
  || log "profile_step failed (see log)"

# 4. int8-in-kernel decode A/B at flagship (VERDICT r3 item 4: bar is
# int8-kernel >= bf16 scan 32.8k cps; ideally >= bf16 kernel 43.0k)
log "quant decode bench (kernel legs)..."
GIC_QB_PAYLOADS=bf16,bf16-kernel,int8,int8-kernel GIC_QB_BATCHES=1,8,64 \
  timeout 2700 python benchmarks/quant_decode_bench.py \
  > "$OUT/quant_decode.jsonl" 2> "$OUT/quant_decode.err" \
  || log "quant bench failed"
log "quant: $(cat "$OUT/quant_decode.jsonl" 2>/dev/null | tail -8)"

# 5. speculative decode on-chip (VERDICT r3 item 6): acceptance rate +
# device captions/s vs greedy kernel baseline
log "speculative decode bench..."
GIC_SPEC_BASELINE=kernel timeout 2700 python benchmarks/spec_decode_bench.py \
  > "$OUT/spec_decode.jsonl" 2> "$OUT/spec_decode.err" \
  || log "spec bench failed"
log "spec: $(cat "$OUT/spec_decode.jsonl" 2>/dev/null | tail -4)"

log "queue complete -> $OUT"
