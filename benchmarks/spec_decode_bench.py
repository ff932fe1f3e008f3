"""Speculative-decode A/B: greedy scan vs int8-draft speculative decode.

Interleaved in-process reps (chip/tunnel drift defeats cross-process
A/Bs — docs/benchmarks.md round-3 method note) at flagship geometry.
Speculation targets the SCAN decode path: the [H, V] projection is read
once per accepted block instead of once per token (eval/speculative.py);
the weights-resident Pallas kernel avoids those re-reads differently, so
the honest comparison is scan-vs-speculative (GIC_SPEC_BASELINE=kernel
compares against the kernel too).

Prints one JSON line per measurement, plus the measured acceptance rate
(draft tokens kept per block — int8 drafts match greedy ~1.0, so blocks
should emit close to K+1 tokens).

Env: GIC_SPEC_BATCH (64), GIC_SPEC_K (4), GIC_SPEC_ITERS (20),
GIC_SPEC_BASELINE (fused|kernel).
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def main():
    from gan_image_captioning_tpu.utils.runtime import setup

    setup()
    from gan_image_captioning_tpu.config import Config
    from gan_image_captioning_tpu.eval import decode as decode_lib
    from gan_image_captioning_tpu.eval.speculative import speculative_greedy
    from gan_image_captioning_tpu.models import api
    from gan_image_captioning_tpu.models.generator import start_token_features
    from gan_image_captioning_tpu.ops.quantize import quantize_generator

    B = int(os.environ.get("GIC_SPEC_BATCH", "64"))
    K = int(os.environ.get("GIC_SPEC_K", "4"))
    iters = int(os.environ.get("GIC_SPEC_ITERS", "20"))
    baseline_impl = os.environ.get("GIC_SPEC_BASELINE", "fused")

    config = Config(
        vocab_size=11008, gen_embed_dim=512, gen_hidden_dim=512,
        gen_num_layers=2, max_seq_len=34, dtype="bfloat16",
        decode_impl=baseline_impl)
    gen_params = api.init_generator(jax.random.PRNGKey(0), config)
    draft = quantize_generator(gen_params, config)
    feats = start_token_features(gen_params["decoder"], B)

    greedy = jax.jit(lambda p, f: decode_lib.greedy(p, f, config))
    spec = jax.jit(lambda p, d, f: speculative_greedy(p, d, f, config,
                                                      draft_len=K))

    # warmup + exactness check + acceptance rate (VERDICT r3 item 6)
    base_ids = np.asarray(greedy(gen_params, feats))
    spec_ids = np.asarray(spec(gen_params, draft, feats))
    match = float((base_ids == spec_ids).mean())
    _, stats = jax.jit(lambda p, d, f: speculative_greedy(
        p, d, f, config, draft_len=K, return_stats=True))(
        gen_params, draft, feats)
    stats = jax.device_get(stats)
    acceptance = float(stats["accepted"]) / max(float(stats["proposed"]), 1)

    lat_base, lat_spec = [], []
    for _ in range(iters):
        t0 = time.perf_counter()
        np.asarray(greedy(gen_params, feats))
        lat_base.append(time.perf_counter() - t0)
        t0 = time.perf_counter()
        np.asarray(spec(gen_params, draft, feats))
        lat_spec.append(time.perf_counter() - t0)

    cb = B / float(np.mean(lat_base))
    cs = B / float(np.mean(lat_spec))
    print(json.dumps({"metric": f"greedy_{baseline_impl}_captions_per_sec",
                      "value": round(cb, 1), "unit": "captions/s",
                      "batch": B}))
    print(json.dumps({"metric": "speculative_captions_per_sec",
                      "value": round(cs, 1), "unit": "captions/s",
                      "batch": B, "draft_len": K,
                      "token_match": round(match, 4),
                      "acceptance_rate": round(acceptance, 4),
                      "speedup_vs_baseline": round(cs / cb, 3)}))


if __name__ == "__main__":
    main()
