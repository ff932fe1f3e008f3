"""Decode-path benchmark: captions/sec (batched greedy) + latency percentiles.

The BASELINE.json metrics the reference never published (its decode is the
34-iteration Python loop, ``generator.py:55-81``, one cuDNN launch per
token).  Here the whole batched greedy decode is a single jitted scan, and
beam search a single jitted program.

Prints one JSON line per measurement:
  {"metric": "greedy_captions_per_sec", ...}
  {"metric": "greedy_p50_latency_ms", ...}
  {"metric": "beam4_captions_per_sec", ...}
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def main(batch_size: int = 64, iters: int = 30):
    from gan_image_captioning_tpu.utils.runtime import setup

    setup()
    from gan_image_captioning_tpu.config import Config
    from gan_image_captioning_tpu.eval import decode as decode_lib
    from gan_image_captioning_tpu.models import api
    from gan_image_captioning_tpu.models.generator import start_token_features

    config = Config(
        vocab_size=11008, gen_embed_dim=512, gen_hidden_dim=512,
        gen_num_layers=2, max_seq_len=34, dtype="bfloat16",
        # greedy decode routes through the weights-resident Pallas kernel
        # when decode_impl == "kernel" (GIC_DECODE_IMPL=fused opts out)
        decode_impl=os.environ.get(
            "GIC_DECODE_IMPL",
            "kernel" if jax.default_backend() == "tpu" else "fused"))
    gen_params = api.init_generator(jax.random.PRNGKey(0), config)
    gen_params = jax.tree_util.tree_map(
        lambda x: x.astype(jnp.bfloat16)
        if jnp.issubdtype(x.dtype, jnp.floating) else x, gen_params)
    feats = start_token_features(gen_params["decoder"], batch_size)

    greedy = jax.jit(lambda p, f: decode_lib.greedy(p, f, config))
    beam = jax.jit(lambda p, f: decode_lib.beam_search(p, f, config,
                                                       beam_size=4))

    # -- greedy
    ids = np.asarray(greedy(gen_params, feats))
    lat = []
    for _ in range(iters):
        t0 = time.perf_counter()
        # time to RESULT ON HOST — block_until_ready under-reports over the
        # remote-execution tunnel, so fetch the ids to host each iteration.
        ids = np.asarray(greedy(gen_params, feats))
        lat.append(time.perf_counter() - t0)
    lat = np.asarray(lat)
    print(json.dumps({"metric": "greedy_captions_per_sec",
                      "value": round(batch_size / float(np.mean(lat)), 1),
                      "unit": "captions/s", "batch": batch_size}))
    print(json.dumps({"metric": "greedy_p50_latency_ms",
                      "value": round(float(np.percentile(lat, 50)) * 1e3, 2),
                      "unit": "ms", "batch": batch_size}))
    print(json.dumps({"metric": "greedy_p99_latency_ms",
                      "value": round(float(np.percentile(lat, 99)) * 1e3, 2),
                      "unit": "ms", "batch": batch_size}))

    def device_cps(fn, params, label):
        # async-dispatch ITERS independent decodes, ONE final host fetch —
        # the tunnel RTT amortizes over the batch (bench.py's timing mode),
        # so this is the device-side decode throughput, not RTT
        out = fn(params, feats)
        np.asarray(out)
        t0 = time.perf_counter()
        for _ in range(iters):
            out = fn(params, feats)
        np.asarray(out)
        dt = time.perf_counter() - t0
        print(json.dumps({"metric": label,
                          "value": round(batch_size * iters / dt, 1),
                          "unit": "captions/s", "batch": batch_size}))

    device_cps(greedy, gen_params, "greedy_device_captions_per_sec")

    # -- int8 weight-only decode (ops/quantize.py): same greedy program
    # against the int8-resident decoder (scan stepper — the quantized path
    # does not use the Pallas kernel, so compare against GIC_DECODE_IMPL=
    # fused for the apples-to-apples scan-vs-scan number)
    from gan_image_captioning_tpu.ops.quantize import quantize_generator

    qparams = quantize_generator(gen_params, config)
    q_greedy = jax.jit(lambda p, f: decode_lib.greedy(p, f, config))
    ids_q = np.asarray(q_greedy(qparams, feats))
    lat = []
    for _ in range(iters):
        t0 = time.perf_counter()
        ids_q = np.asarray(q_greedy(qparams, feats))
        lat.append(time.perf_counter() - t0)
    lat = np.asarray(lat)
    print(json.dumps({"metric": "int8_greedy_captions_per_sec",
                      "value": round(batch_size / float(np.mean(lat)), 1),
                      "unit": "captions/s", "batch": batch_size}))
    print(json.dumps({"metric": "int8_greedy_p50_latency_ms",
                      "value": round(float(np.percentile(lat, 50)) * 1e3, 2),
                      "unit": "ms", "batch": batch_size}))
    match = float((ids_q == np.asarray(greedy(gen_params, feats))).mean())
    print(json.dumps({"metric": "int8_greedy_token_match",
                      "value": round(match, 4), "unit": "fraction",
                      "batch": batch_size}))
    device_cps(q_greedy, qparams, "int8_greedy_device_captions_per_sec")
    # scan-vs-scan control: the fp16/bf16 fused scan (what int8 replaces
    # when the Pallas kernel is NOT available, e.g. non-TPU backends)
    scan_config = config.replace(decode_impl="fused")
    scan_greedy = jax.jit(lambda p, f: decode_lib.greedy(p, f, scan_config))
    device_cps(scan_greedy, gen_params, "scan_greedy_device_captions_per_sec")

    # -- beam 4
    out = jax.device_get(beam(gen_params, feats))
    lat = []
    for _ in range(max(iters // 3, 5)):
        t0 = time.perf_counter()
        out = jax.device_get(beam(gen_params, feats))
        lat.append(time.perf_counter() - t0)
    lat = np.asarray(lat)
    print(json.dumps({"metric": "beam4_captions_per_sec",
                      "value": round(batch_size / float(np.mean(lat)), 1),
                      "unit": "captions/s", "batch": batch_size}))
    print(json.dumps({"metric": "beam4_p50_latency_ms",
                      "value": round(float(np.percentile(lat, 50)) * 1e3, 2),
                      "unit": "ms", "batch": batch_size}))


if __name__ == "__main__":
    main()
