"""Capture a jax.profiler trace of the flagship adversarial step (real chip).

NEXT_STEPS r4 #4: the remaining step phases (disc conv backward ~3.4 ms,
decode-kernel transcendentals ~1 ms) resisted four blind kernel-variant
attempts — the next move is a REAL trace, not more variants.  This harness
makes that a one-command capture once the axon relay is healthy:

    python benchmarks/profile_step.py            # default: bench config
    GIC_PROFILE_VARIANTS=kernel,fused python benchmarks/profile_step.py

It builds the same flagship step bench.py times (V=11008, 2x512 LSTM,
B=64, RelGAN CNN disc, bfloat16, hybrid disc engine), warms it, then
traces GIC_PROFILE_STEPS chained steps per variant into
``--out`` (default /tmp/gic_profile/<variant>).  Open the dump with
TensorBoard's profile plugin or ui.perfetto.dev (the trace.json.gz under
plugins/profile/*/).

What to look for (per docs/benchmarks.md roofline):
  * the [T,B,V] soft-sample HBM write + disc embed read (fused-embed A/B
    measured -8.3%/-3.4% — the trace shows whether the remaining copy is
    the dominant gap);
  * d-bwd conv kernels (3.2-3.6 ms band) — XLA fusion boundaries around
    the filter-size banks;
  * optimizer-phase HBM traffic (bf16 mu already shipped, +0.6%).
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

STEPS = int(os.environ.get("GIC_PROFILE_STEPS", "10"))
WARMUP = int(os.environ.get("GIC_PROFILE_WARMUP", "3"))
OUT = os.environ.get("GIC_PROFILE_OUT", "/tmp/gic_profile")


def build_step(decode_impl: str):
    import jax
    import jax.numpy as jnp

    from gan_image_captioning_tpu.config import Config
    from gan_image_captioning_tpu.data.loader import make_batch
    from gan_image_captioning_tpu.train.state import create_train_state
    from gan_image_captioning_tpu.train.steps import make_adv_step

    config = Config(
        vocab_size=11008, gen_embed_dim=512, gen_hidden_dim=512,
        gen_num_layers=2, max_seq_len=34, disc_embed_dim=64, disc_num_rep=64,
        disc_filter_sizes=(3, 4, 5), disc_num_filters=(300, 300, 300),
        adv_train_batch_size=int(os.environ.get("GIC_BENCH_BATCH", "64")),
        dtype="bfloat16", decode_impl=decode_impl)
    state = create_train_state(config, jax.random.PRNGKey(1008))
    caps = [jax.random.randint(jax.random.PRNGKey(i), (30,), 4, 11000)
            for i in range(config.adv_train_batch_size)]
    batch = {k: jnp.asarray(v)
             for k, v in make_batch(caps, None, config.seq_len).items()}
    return make_adv_step(config), state, batch


def main():
    from gan_image_captioning_tpu.utils.relay import probe_relay

    if not probe_relay(2, log=lambda m: print(f"[profile] {m}",
                                              file=sys.stderr)):
        print("[profile] axon relay wedged — a CPU trace answers nothing "
              "about the TPU step; aborting", file=sys.stderr)
        return 1

    import jax

    from gan_image_captioning_tpu.utils.runtime import setup

    setup()
    on_tpu = jax.default_backend() == "tpu"
    if on_tpu:
        os.environ.setdefault("GIC_DISC_KERNEL", "3")   # bench defaults
        os.environ.setdefault("GIC_BF16_MU", "1")
    variants = os.environ.get(
        "GIC_PROFILE_VARIANTS",
        "kernel" if on_tpu else "fused").split(",")

    for variant in variants:
        step, state, batch = build_step(variant.strip())
        for _ in range(WARMUP):
            state, metrics = step(state, batch, 10.0)
        if WARMUP > 0:
            float(metrics["gen_adv_loss"])              # hard sync
        out = os.path.join(OUT, variant.strip())
        os.makedirs(out, exist_ok=True)
        t0 = time.perf_counter()
        with jax.profiler.trace(out):
            for _ in range(STEPS):
                state, metrics = step(state, batch, 10.0)
            float(metrics["gen_adv_loss"])              # bound the trace
        dt = time.perf_counter() - t0
        print(f"[profile] {variant}: {STEPS} steps in {dt:.3f}s "
              f"({STEPS / dt:.1f} steps/s) -> {out}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
