"""In-process A/B of the int8 decode stepper variants: compute dtype
(float32 vs bfloat16) x loop-dependent dequant token (on/off), interleaved
reps so chip drift cancels (the round-3 A/B lesson, docs/benchmarks.md).

Prints one JSON line per variant with device-side captions/s.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def main(batch=64, iters=20, reps=3):
    from gan_image_captioning_tpu.utils.runtime import setup

    setup()
    from gan_image_captioning_tpu.config import Config
    from gan_image_captioning_tpu.eval import decode as decode_lib
    from gan_image_captioning_tpu.models import api
    from gan_image_captioning_tpu.models.generator import start_token_features
    from gan_image_captioning_tpu.ops.quantize import quantize_generator

    config = Config(vocab_size=11008, gen_embed_dim=512, gen_hidden_dim=512,
                    gen_num_layers=2, max_seq_len=34, dtype="bfloat16")
    gen_params = api.init_generator(jax.random.PRNGKey(0), config)
    gen_params = jax.tree_util.tree_map(
        lambda x: x.astype(jnp.bfloat16)
        if jnp.issubdtype(x.dtype, jnp.floating) else x, gen_params)
    qparams = quantize_generator(gen_params, config)
    feats = start_token_features(gen_params["decoder"], batch)

    def build(dtype_env, loopdep):
        os.environ["GIC_INT8_DTYPE"] = dtype_env
        os.environ["GIC_INT8_LOOPDEP"] = "1" if loopdep else "0"

        def run(p, f):
            return decode_lib.greedy(p, f, config)

        fn = jax.jit(run)
        np.asarray(fn(qparams, feats))  # trace under current env
        return fn

    variants = {}
    for dt in ("float32", "bfloat16"):
        for ld in (False, True):
            variants[f"{dt}_loopdep{int(ld)}"] = build(dt, ld)

    times = {k: [] for k in variants}
    for _ in range(reps):
        for name, fn in variants.items():
            out = None
            t0 = time.perf_counter()
            for _ in range(iters):
                out = fn(qparams, feats)
            np.asarray(out)
            times[name].append(time.perf_counter() - t0)

    for name, ts in times.items():
        best = min(ts)
        print(json.dumps({"variant": name,
                          "device_captions_per_sec":
                              round(batch * iters / best, 1),
                          "reps_cps": [round(batch * iters / t, 1)
                                       for t in ts]}))


if __name__ == "__main__":
    main()
