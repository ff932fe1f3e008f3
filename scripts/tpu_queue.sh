#!/usr/bin/env bash
# TPU work queue — the on-chip measurements blocked behind the wedged axon
# relay (NEXT_STEPS.md "TPU work queue").  Run when the relay recovers:
#
#   bash scripts/tpu_queue.sh [outdir]       # default runs/tpu_queue
#
# Each item runs with its own timeout and appends one JSON/log artifact;
# a wedged relay makes item 0's probe fail fast and the script exits 2
# without burning the timeouts.  Items are ordered by value-per-minute:
# the bench floor re-capture first (the north-star gate), then the
# profiler trace (feeds the next perf hunt), then the ladders.
#
# NOTE: never run CPU-heavy work (pytest, parity) concurrently — one host
# core; dispatch starvation silently costs ~10% of measured steps/s
# (.claude/skills/verify/SKILL.md).

set -u
cd "$(dirname "$0")/.."
OUT="${1:-runs/tpu_queue}"
mkdir -p "$OUT"

log() { echo "[tpu_queue $(date +%H:%M:%S)] $*"; }

# 0. relay probe (fail fast when wedged)
log "probing TPU relay..."
if ! timeout 90 python -c "import jax; assert jax.default_backend() == 'tpu', jax.default_backend(); print(jax.devices())" > "$OUT/probe.txt" 2>&1; then
  log "relay wedged or non-TPU backend (see $OUT/probe.txt) — aborting"
  exit 2
fi
log "relay up: $(cat "$OUT/probe.txt")"

# 1. bench floor: 3 back-to-back reps of the default program (worst rep is
# the number that matters — VERDICT r2 item 1).  Fresh Pallas compiles
# miss the persistent cache: first rep can take 10-15 min.
for rep in 1 2 3; do
  log "bench rep $rep/3..."
  timeout 1800 python bench.py >> "$OUT/bench_reps.jsonl" 2> "$OUT/bench_rep${rep}.err"
done
log "bench reps: $(cat "$OUT/bench_reps.jsonl" 2>/dev/null | tail -3)"

# 2. profiler trace of the flagship adv step (feeds the r4 perf hunt)
log "profiler capture..."
timeout 1800 python benchmarks/profile_step.py > "$OUT/profile_step.log" 2>&1 \
  || log "profile_step failed (see log)"

# 3. in-run instructor ladder: --steps-per-call K (RTT amortization)
for spc in 1 2 4 8; do
  log "instructor_throughput GIC_SPC=$spc..."
  GIC_SPC=$spc timeout 1800 python benchmarks/instructor_throughput.py \
    >> "$OUT/instructor_spc.jsonl" 2> "$OUT/instructor_spc${spc}.err" \
    || log "spc=$spc failed"
done
log "spc ladder: $(cat "$OUT/instructor_spc.jsonl" 2>/dev/null)"

# 4. adaptive decode + beam early-stop at flagship V (trained-length
# captions end early; random-init ones don't — see NEXT_STEPS note)
log "decode bench (adaptive)..."
timeout 1800 python benchmarks/decode_bench.py > "$OUT/decode_bench.json" 2> "$OUT/decode_bench.err" \
  || log "decode_bench failed"

# 5. serving load on-chip (early slot release + buckets)
log "serving load..."
GIC_LOAD_RATE=800 GIC_LOAD_N=1000 timeout 1800 python benchmarks/serving_load.py \
  > "$OUT/serving_load.json" 2> "$OUT/serving_load.err" || log "serving_load failed"

# 5b. multi-platform AOT artifact on-chip: a cpu,tpu .gic exported on the
# CPU host must decode on the TPU (docs/benchmarks.md AOT section)
log "AOT artifact on-chip check..."
timeout 1800 python - > "$OUT/aot_onchip.log" 2>&1 <<'PYEOF' || log "aot check failed"
import numpy as np, jax, time
from gan_image_captioning_tpu.config import Config
from gan_image_captioning_tpu.models import api
from gan_image_captioning_tpu import export_api
assert jax.default_backend() == "tpu"
cfg = Config(vocab_size=512, gen_embed_dim=64, gen_hidden_dim=128, max_seq_len=12)
params = api.init_generator(jax.random.PRNGKey(0), cfg)
exp = export_api.export_caption_program(params, cfg, batch_size=8,
                                        platforms=("cpu", "tpu"))
export_api.save_artifact("/tmp/aot_tpu.gic", exp, params, {"mode": "greedy"})
cap = export_api.load_artifact("/tmp/aot_tpu.gic")
t0 = time.perf_counter()
ids, sc = cap(np.zeros((8,), np.int32))
ids = np.asarray(ids)
fn = export_api.build_caption_fn(cfg)
ref, _ = fn(params, np.zeros((8,), np.int32))
match = bool((ids == np.asarray(ref)).all())
print({"backend": "tpu", "first_call_ms": round((time.perf_counter()-t0)*1e3, 1),
       "ids_match_direct": match})
assert match
PYEOF

# 6. GIC_TF_REMAT memory probe at GPT-2 depth (CPU cannot answer it)
log "remat memory probe..."
timeout 1800 python benchmarks/remat_memory.py > "$OUT/remat_memory.json" 2> "$OUT/remat_memory.err" \
  || log "remat_memory failed"

log "queue complete — artifacts in $OUT/"
