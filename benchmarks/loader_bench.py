"""Host data-pipeline benchmark: conditional COCO-geometry batch production.

VERDICT r2 weakness 4: one producer thread starves a ~100 steps/s device on
conditional data (per-image JPEG decode + resize + normalize).  This
measures Batcher throughput (batches/s at B=64, 256² images) across worker
counts and decode paths, against the device demand.

    python benchmarks/loader_bench.py           # both paths, 1/2/4/8 workers
    GIC_LOADER_BATCHES=30 ... (iterations override)

Prints one JSON line per (path, workers) combo:
  {"path": "native|pil", "workers": N, "batches_per_sec": X,
   "samples_per_sec": Y, "keeps_up_at_steps_per_sec": X}
(a training step consumes exactly one batch, so batches/s IS the max
steps/s the host can feed).
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
N_BATCHES = int(os.environ.get("GIC_LOADER_BATCHES", "20"))
BATCH = int(os.environ.get("GIC_BENCH_BATCH", "64"))


class _Repeat:
    """Cycle a small dataset so the benchmark sees full-epoch volumes."""

    def __init__(self, base, times: int):
        self.base = base
        self.times = times

    def __len__(self):
        return len(self.base) * self.times

    def caption_length(self, i):
        return self.base.caption_length(i % len(self.base))

    def sample(self, i):
        return self.base.sample(i % len(self.base))


def measure(ds, workers: int, precollate="off") -> float:
    from gan_image_captioning_tpu.data.loader import Batcher

    loader = Batcher(ds, BATCH, 36, shuffle=True, seed=1, drop_last=True,
                     num_workers=workers, prefetch=8, precollate=precollate)
    it = iter(loader)
    next(it)                                   # warm caches / thread spinup
    t0 = time.perf_counter()
    n = 0
    for _ in range(N_BATCHES):
        try:
            next(it)
            n += 1
        except StopIteration:
            break
    dt = time.perf_counter() - t0
    return n / dt


def main():
    from gan_image_captioning_tpu.data.coco import CocoCaptions

    for use_native in (True, False):
        ds = CocoCaptions(
            os.path.join(REPO, "data", "mini_coco", "dataset_coco.json"),
            os.path.join(REPO, "data", "mini_coco"), "train",
            image_size=256, captions_per_image=5, conditional=True,
            use_native=use_native)
        reps = max(1, (N_BATCHES + 2) * BATCH // max(len(ds), 1) + 1)
        big = _Repeat(ds, reps)
        path = "native" if (use_native and ds._native is not None) else "pil"
        for workers in (1, 2, 4, 8):
            bps = measure(big, workers)
            print(json.dumps({
                "path": path, "workers": workers,
                "batches_per_sec": round(bps, 2),
                "samples_per_sec": round(bps * BATCH, 1),
                "keeps_up_at_steps_per_sec": round(bps, 2),
            }), flush=True)
        # precollate fast path (VERDICT r3 item 8): pay sample+collate once,
        # then every batch is a numpy row-gather — no worker pool at all
        bps = measure(big, 4, precollate="on")   # 4 threads build the
        print(json.dumps({                        # one-time collation;
            "path": f"{path}+precollate", "workers": 0,  # gather needs none
            "batches_per_sec": round(bps, 2),
            "samples_per_sec": round(bps * BATCH, 1),
            "keeps_up_at_steps_per_sec": round(bps, 2),
        }), flush=True)
        if use_native and ds._native is None:
            continue  # pil rows will follow in the next loop iteration


if __name__ == "__main__":
    main()
