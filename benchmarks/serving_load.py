"""Serving-engine load test: Poisson arrivals → captions/s + latency tails.

Drives BOTH dispatch engines (gan_image_captioning_tpu/serving.py) with
concurrent single-caption requests at a configurable offered load and
reports achieved throughput + p50/p99 end-to-end latency per engine:

  * coalescing — requests drain into shared fixed-shape batch decodes
    (full-T program per batch; beam-capable);
  * continuous — slot pool advancing chunk_steps per program (greedy LSTM;
    requests join at chunk boundaries).

    python benchmarks/serving_load.py               # flagship geometry
    GIC_LOAD_RATE=2000 GIC_LOAD_N=2000 ...          # offered load override
    GIC_LOAD_BEAM=4 ...                             # beam through coalescing
    GIC_LOAD_EXPORTED=1 ...                         # coalescing dispatches the
                                                    # serialize->deserialize AOT
                                                    # program (serve --exported)

Prints one JSON line per engine:
  {"engine": "...", "offered_cps": R, "achieved_cps": X,
   "p50_ms": a, "p99_ms": b, "device_programs": k}
"""

import json
import os
import sys
import threading
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

RATE = float(os.environ.get("GIC_LOAD_RATE", "1500"))   # offered captions/s
N_REQ = int(os.environ.get("GIC_LOAD_N", "1500"))
BATCH = int(os.environ.get("GIC_BENCH_BATCH", "64"))
BEAM = int(os.environ.get("GIC_LOAD_BEAM", "1"))
# GIC_LOAD_CKPT: serve a TRAINED generator checkpoint instead of random
# init — trained captions emit <E> early, which is what the continuous
# engine's early slot release monetizes (GIC_LOAD_EXACT=1 disables the
# release for the A/B).  Geometry must match the checkpoint: set
# GIC_LOAD_VOCAB/EMBED/HIDDEN/LAYERS/T accordingly.
CKPT = os.environ.get("GIC_LOAD_CKPT", "")
EXACT = os.environ.get("GIC_LOAD_EXACT", "0") == "1"
# GIC_LOAD_MAX_PENDING=N: engine admission control — overload sheds
# (EngineOverloaded) instead of queueing toward timeout; the harness then
# reports goodput over ACCEPTED requests + the reject count, showing the
# bounded-tail tradeoff vs the unbounded queue.
MAX_PENDING = int(os.environ.get("GIC_LOAD_MAX_PENDING", "0"))


def _flagship_config():
    from gan_image_captioning_tpu.config import Config

    small = jax.default_backend() != "tpu"
    return Config(
        vocab_size=int(os.environ.get("GIC_LOAD_VOCAB",
                                      "1024" if small else "11008")),
        gen_embed_dim=int(os.environ.get("GIC_LOAD_EMBED",
                                         "64" if small else "512")),
        gen_hidden_dim=int(os.environ.get("GIC_LOAD_HIDDEN",
                                          "64" if small else "512")),
        gen_num_layers=int(os.environ.get("GIC_LOAD_LAYERS", "2")),
        max_seq_len=int(os.environ.get("GIC_LOAD_T",
                                       "10" if small else "34")),
        beam_size=BEAM)


def run_load(engine_name: str, submit, n_req: int, rate: float,
             device_calls) -> dict:
    """Fire ``n_req`` single-caption requests with Poisson (exponential
    inter-arrival) timing at ``rate``/s; gather per-request latency."""
    from gan_image_captioning_tpu.serving import EngineOverloaded

    rng = np.random.default_rng(1008)
    gaps = rng.exponential(1.0 / rate, size=n_req)
    futs = [None] * n_req
    rejected = 0

    t0 = time.perf_counter()
    next_t = 0.0
    for i in range(n_req):
        next_t += gaps[i]
        now = time.perf_counter() - t0
        if now < next_t:
            time.sleep(next_t - now)
        try:
            futs[i] = submit(i)
        except EngineOverloaded:
            rejected += 1        # shed immediately (admission control)
    accepted = n_req - rejected
    for fut in futs:
        if fut is not None:
            fut.result(timeout=300)
        # latency recorded by completion callback would race; resolve here
    t_end = time.perf_counter()
    # re-derive per-request latency from future completion wall times
    # captured via add_done_callback below
    out = {"engine": engine_name, "offered_cps": round(rate, 1),
           "achieved_cps": round(accepted / (t_end - t0), 1),
           "device_programs": device_calls()}
    if rejected:
        out["rejected"] = rejected
        out["accepted"] = accepted
    return out


def main():
    from gan_image_captioning_tpu.eval import decode as decode_lib
    from gan_image_captioning_tpu.models import generator as gen_lib
    from gan_image_captioning_tpu.serving import (CoalescingBatcher,
                                                  ContinuousBatcher)
    from gan_image_captioning_tpu.utils.runtime import setup

    setup()
    config = _flagship_config()
    if CKPT:
        from gan_image_captioning_tpu.train import checkpoint as ckpt_lib

        gen_params, _ = ckpt_lib.load_generator_checkpoint(CKPT, config)
        dec = gen_params["decoder"]
    else:
        dec = gen_lib.init_decoder_params(jax.random.PRNGKey(0), config,
                                          jnp.float32)
        gen_params = {"decoder": dec}
    feat = np.asarray(gen_lib.start_token_features(dec, 1))[0]

    def timed_submit(engine_submit, lat_list):
        def submit(i):
            t0 = time.perf_counter()
            fut = engine_submit(i)
            fut.add_done_callback(
                lambda f, t0=t0: lat_list.append(time.perf_counter() - t0))
            return fut
        return submit

    results = []

    # ---- coalescing (full-T batch programs; greedy, beam, or
    # GIC_LOAD_SPEC=K speculative int8-draft blocks) -----------------------
    spec_k = int(os.environ.get("GIC_LOAD_SPEC", "0"))
    exported_leg = False
    if BEAM > 1:
        def decode_fn(feats):
            return decode_lib.beam_search(gen_params, feats, config,
                                          beam_size=BEAM)
    elif int(os.environ.get("GIC_LOAD_ADAPTIVE", "0")) > 0:
        ak = int(os.environ.get("GIC_LOAD_ADAPTIVE", "0"))

        def decode_fn(feats):
            return decode_lib.greedy_with_logprobs_adaptive(
                gen_params, feats, config, chunk=ak)
    elif spec_k > 0:
        from gan_image_captioning_tpu.eval.speculative import (
            speculative_greedy)
        from gan_image_captioning_tpu.ops.quantize import quantize_generator

        draft = quantize_generator(gen_params, config)

        def decode_fn(feats):
            ids = speculative_greedy(gen_params, draft, feats, config,
                                     draft_len=spec_k,
                                     early_stop=not EXACT)
            return ids, decode_lib.sequence_logprob(gen_params, feats, ids,
                                                    config)
    elif os.environ.get("GIC_LOAD_EXPORTED", "0") == "1":
        # AOT-artifact path (serve.py --exported): round-trip the program
        # through serialize→deserialize so the measured dispatcher runs
        # exactly what a .gic-loaded server runs
        from jax import export as jax_export

        from gan_image_captioning_tpu import export_api

        exp = export_api.export_caption_program(
            gen_params, config, batch_size=BATCH, symbolic_batch=True,
            anchor_kind="features")
        exp = jax_export.deserialize(bytearray(exp.serialize()))

        def decode_fn(feats):
            return exp.call(gen_params, feats)
        exported_leg = True
    else:
        def decode_fn(feats):
            return decode_lib.greedy_with_logprobs(gen_params, feats, config)
    decode_jit = decode_fn if exported_leg else jax.jit(decode_fn)
    co = CoalescingBatcher(decode_jit, BATCH, config.gen_embed_dim,
                           max_pending=MAX_PENDING)
    co.submit(feat[None, :]).result(timeout=600)         # warm compile
    lat = []
    adaptive_k = int(os.environ.get("GIC_LOAD_ADAPTIVE", "0"))
    tag = ("coalescing" + (f"_beam{BEAM}" if BEAM > 1 else "")
           + ("_exported" if exported_leg else "")
           + (f"_adaptive{adaptive_k}" if BEAM == 1 and adaptive_k else "")
           + (f"_spec{spec_k}" if BEAM == 1 and spec_k > 0
              and not adaptive_k else "")
           + (f"_mp{MAX_PENDING}" if MAX_PENDING else ""))
    r = run_load(tag,
                 timed_submit(lambda i: co.submit(feat[None, :]), lat),
                 N_REQ, RATE, lambda: co.device_calls)
    co.close()
    lat_ms = np.sort(np.asarray(lat)) * 1e3
    if lat_ms.size:
        r["p50_ms"] = round(float(np.percentile(lat_ms, 50)), 2)
        r["p99_ms"] = round(float(np.percentile(lat_ms, 99)), 2)
    results.append(r)
    print(json.dumps(r), flush=True)

    # ---- continuous (slot pool, chunked kernel advance; greedy only) ----
    if BEAM == 1 and not exported_leg:
        draft = None
        if spec_k > 0:
            from gan_image_captioning_tpu.ops.quantize import (
                quantize_generator)

            draft = quantize_generator(gen_params, config)
        cb = ContinuousBatcher(gen_params, config, num_slots=BATCH,
                               chunk_steps=(spec_k if draft is not None else
                                            int(os.environ.get(
                                                "GIC_LOAD_CHUNK", "8"))),
                               early_exit=not EXACT, draft_params=draft,
                               max_pending=MAX_PENDING)
        cb.submit(feat).result(timeout=600)              # warm compile
        lat = []
        r = run_load("continuous" + (f"_spec{spec_k}" if draft is not None
                                     else "") + ("_exact" if EXACT else "")
                     + (f"_mp{MAX_PENDING}" if MAX_PENDING else ""),
                     timed_submit(lambda i: cb.submit(feat), lat),
                     N_REQ, RATE, lambda: cb.device_calls)
        st = cb.stats()
        r["occupancy"] = st["occupancy"]
        if "tokens_per_slot_chunk" in st:
            r["tokens_per_slot_chunk"] = st["tokens_per_slot_chunk"]
        cb.close()
        lat_ms = np.sort(np.asarray(lat)) * 1e3
        if lat_ms.size:
            r["p50_ms"] = round(float(np.percentile(lat_ms, 50)), 2)
            r["p99_ms"] = round(float(np.percentile(lat_ms, 99)), 2)
        results.append(r)
        print(json.dumps(r), flush=True)


if __name__ == "__main__":
    main()
