"""Weight-only-quantized decode: bandwidth A/B across batch sizes.

The int4/int8 decoders quarter/halve per-step HBM weight reads
(ops/quantize.py) — but at B=64 the on-chip A/B showed int8 compute-bound
on the upcast matmuls (docs/benchmarks.md r3c4: no win at flagship batch).
The quantized path's bandwidth claim lives at SMALL batch, where a greedy
step is weight-read-bound: every step streams the full decoder (embed +
LSTM + [H, V] projection) to produce B rows.  This harness measures that
regime directly — device-side captions/s for the SAME scan-stepper greedy
program over bf16 / int8 / int4 payloads at B ∈ {1, 8, 64}, interleaved
within one process (house rule: chip/tunnel drift makes cross-run
comparison void), plus the int-vs-bf16 greedy token match at each batch.

Run:   python benchmarks/quant_decode_bench.py
Env:   GIC_QB_BATCHES=1,8,64  GIC_QB_ITERS=30  GIC_QB_REPS=3
       GIC_QB_PAYLOADS=bf16,int8,int4
       GIC_QB_VOCAB/EMBED/HIDDEN/LAYERS/T — geometry (flagship default)

int4 caveat: the current axon TPU backend cannot take native ``jnp.int4``
jit arguments (``device_put`` recurses relaying out ``S4[...]`` arrays —
a backend bug, reproduced 2026-08-19; in-jit quantize compile hangs too),
so on TPU the default payload set is bf16,int8 and an int4 leg that
fails this way is reported as ``{"payload": "int4", "skipped": ...}``
instead of killing the harness.  int4 correctness is covered on CPU
(tests/test_quantize.py).
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

BATCHES = [int(b) for b in
           os.environ.get("GIC_QB_BATCHES", "1,8,64").split(",")]
ITERS = int(os.environ.get("GIC_QB_ITERS", "30"))
REPS = int(os.environ.get("GIC_QB_REPS", "3"))


def main():
    from gan_image_captioning_tpu.utils.runtime import setup

    setup()
    from gan_image_captioning_tpu.config import Config
    from gan_image_captioning_tpu.eval import decode as decode_lib
    from gan_image_captioning_tpu.models import api
    from gan_image_captioning_tpu.models.generator import start_token_features
    from gan_image_captioning_tpu.ops.quantize import quantize_generator

    config = Config(
        vocab_size=int(os.environ.get("GIC_QB_VOCAB", "11008")),
        gen_embed_dim=int(os.environ.get("GIC_QB_EMBED", "512")),
        gen_hidden_dim=int(os.environ.get("GIC_QB_HIDDEN", "512")),
        gen_num_layers=int(os.environ.get("GIC_QB_LAYERS", "2")),
        max_seq_len=int(os.environ.get("GIC_QB_T", "34")),
        dtype="bfloat16", decode_impl="fused")  # scan-vs-scan everywhere
    gen = api.init_generator(jax.random.PRNGKey(0), config)
    gen = jax.tree_util.tree_map(
        lambda x: x.astype(jnp.bfloat16)
        if jnp.issubdtype(x.dtype, jnp.floating) else x, gen)
    default_payloads = ("bf16,int8" if jax.default_backend() == "tpu"
                        else "bf16,int8,int4")   # int4 backend bug, see top
    payloads = [p for p in os.environ.get(
        "GIC_QB_PAYLOADS", default_payloads).split(",") if p]
    variants = {}
    for p in payloads:
        base = p.replace("-kernel", "")
        variants[p] = (gen if base == "bf16" else
                       quantize_generator(gen, config.replace(quantize=base)))
    greedy_scan = jax.jit(lambda p, f: decode_lib.greedy(p, f, config))
    # the "-kernel" legs route through greedy_with_logprobs: the serve-mode
    # weights-resident kernel for bf16, the int8-resident variant for
    # quantized payloads (VERDICT r3 item 4) — ids only, drop the logprobs
    greedy_kernel = jax.jit(
        lambda p, f: decode_lib.greedy_with_logprobs(p, f, config)[0])

    def fn_for(name):
        return greedy_kernel if name.endswith("-kernel") else greedy_scan

    for b in BATCHES:
        feats = start_token_features(gen["decoder"], b)
        ids = {}
        for k, p in list(variants.items()):      # warm + correctness ref
            try:
                ids[k] = np.asarray(fn_for(k)(p, feats))
            except RecursionError:
                print(json.dumps({"payload": k, "batch": b,
                                  "skipped": "int4 device_put recursion "
                                             "(axon backend bug)"}),
                      flush=True)
                variants.pop(k)
        times = {k: [] for k in variants}
        for _ in range(REPS):                        # interleaved timing
            for k, p in variants.items():
                fn = fn_for(k)
                np.asarray(fn(p, feats))
                t0 = time.perf_counter()
                for _ in range(ITERS):               # async chain,
                    out = fn(p, feats)               # one final fetch
                np.asarray(out)
                times[k].append(time.perf_counter() - t0)
        ref = ids.get("bf16", next(iter(ids.values())))
        for k in variants:
            dt = min(times[k])
            print(json.dumps({
                "batch": b, "payload": k,
                "device_captions_per_sec": round(b * ITERS / dt, 1),
                "ms_per_decode": round(dt / ITERS * 1e3, 3),
                "token_match_vs_bf16":
                    round(float((ids[k] == ref).mean()), 4),
            }), flush=True)


if __name__ == "__main__":
    main()
