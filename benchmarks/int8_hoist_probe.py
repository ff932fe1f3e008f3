"""Probe: does XLA hoist the int8->float dequant out of the decode scan?

If the convert is loop-invariant XLA may materialize a dequantized copy in
HBM once and the scan reads floats — int8 then saves nothing per step.
Variant B makes the int8 payload loop-DEPENDENT (adds a zero derived from
the step counter) so the convert must happen per step; if B is faster than
A, the hoisted copy was the bottleneck and the stepper should adopt the
trick.  Prints one JSON line per variant.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def main(batch=64, hidden=512, vocab=11008, steps=34, iters=30):
    from gan_image_captioning_tpu.utils.runtime import setup

    setup()
    rng = np.random.RandomState(0)
    w = jnp.asarray(rng.randn(hidden, vocab) * 0.05, jnp.float32)
    from gan_image_captioning_tpu.ops.quantize import quantize

    qt = quantize(w, channel_axis=-1)
    q8, scale = qt.q, qt.scale.astype(jnp.bfloat16)
    wb = (q8.astype(jnp.bfloat16) * scale)  # plain bf16 control
    h0 = jnp.asarray(rng.randn(batch, hidden), jnp.bfloat16)

    def run_bf16(h):
        def body(carry, t):
            h = carry
            logits = h @ wb
            h = jnp.tanh(logits[:, :hidden])
            return h, jnp.max(logits)

        return jax.lax.scan(body, h, jnp.arange(steps))[1]

    def run_int8_hoistable(h):
        def body(carry, t):
            h = carry
            logits = (h @ q8.astype(jnp.bfloat16)) * scale
            h = jnp.tanh(logits[:, :hidden])
            return h, jnp.max(logits)

        return jax.lax.scan(body, h, jnp.arange(steps))[1]

    def run_int8_loopdep(h):
        def body(carry, t):
            h = carry
            q = q8 + (t * 0).astype(jnp.int8)   # loop-dependent: no hoist
            logits = (h @ q.astype(jnp.bfloat16)) * scale
            h = jnp.tanh(logits[:, :hidden])
            return h, jnp.max(logits)

        return jax.lax.scan(body, h, jnp.arange(steps))[1]

    for name, fn in [("bf16", run_bf16),
                     ("int8_hoistable", run_int8_hoistable),
                     ("int8_loopdep", run_int8_loopdep)]:
        f = jax.jit(fn)
        np.asarray(f(h0))
        t0 = time.perf_counter()
        out = None
        for _ in range(iters):
            out = f(h0)
        np.asarray(out)
        dt = time.perf_counter() - t0
        print(json.dumps({"variant": name,
                          "ms_per_decode": round(dt / iters * 1e3, 3)}))


if __name__ == "__main__":
    main()
