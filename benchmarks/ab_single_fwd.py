"""Back-to-back A/B of the single-forward adversarial step restructure.

GIC_SINGLE_FWD=1 (train/steps.py `_single_forward_grads`) computes both
gradient sets from ONE `jax.vjp` forward; =0 is the original two-closure
structure, whose identical forwards XLA CSEs for pure-XLA graphs but NOT
for Pallas custom-calls — the flagship trace showed the decode kernel
(2×~0.47 ms) and the disc-conv bank kernels executing twice per step.

Chip/tunnel state drifts ±8% across hours, so variants are interleaved
within one process (same methodology as ab_disc_engine.py).

    python benchmarks/ab_single_fwd.py
    GIC_AB_REPS=3 GIC_BENCH_ITERS=40 ...
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

ITERS = int(os.environ.get("GIC_BENCH_ITERS", "40"))
WARMUP = int(os.environ.get("GIC_BENCH_WARMUP", "3"))
REPS = int(os.environ.get("GIC_AB_REPS", "3"))
VARIANTS = os.environ.get("GIC_AB_VARIANTS", "0,2,1").split(",")
NAMES = {"0": "two-closure", "1": "single-fwd-joint-pullback",
         "2": "single-fwd-two-pullbacks"}


def build(flag: str):
    os.environ["GIC_SINGLE_FWD"] = flag
    from gan_image_captioning_tpu.config import Config
    from gan_image_captioning_tpu.data.loader import make_batch
    from gan_image_captioning_tpu.train.state import create_train_state
    from gan_image_captioning_tpu.train.steps import make_adv_step

    config = Config(
        vocab_size=11008, gen_embed_dim=512, gen_hidden_dim=512,
        gen_num_layers=2, max_seq_len=34, disc_embed_dim=64, disc_num_rep=64,
        disc_filter_sizes=(3, 4, 5), disc_num_filters=(300, 300, 300),
        adv_train_batch_size=int(os.environ.get("GIC_BENCH_BATCH", "64")),
        dtype="bfloat16",
        decode_impl=os.environ.get("GIC_DECODE_IMPL", "kernel"))
    state = create_train_state(config, jax.random.PRNGKey(1008))
    caps = [jax.random.randint(jax.random.PRNGKey(i), (30,), 4, 11000)
            for i in range(config.adv_train_batch_size)]
    batch = {k: jnp.asarray(v)
             for k, v in make_batch(caps, None, config.seq_len).items()}
    step = make_adv_step(config)
    for _ in range(WARMUP):
        state, metrics = step(state, batch, 10.0)
    float(metrics["gen_adv_loss"])
    return step, state, batch


def measure(step, state, batch):
    t0 = time.perf_counter()
    for _ in range(ITERS):
        state, metrics = step(state, batch, 10.0)
    float(metrics["gen_adv_loss"])
    return ITERS / (time.perf_counter() - t0), state


def main():
    from gan_image_captioning_tpu.ops import gumbel as gumbel_ops
    from gan_image_captioning_tpu.utils.runtime import setup

    setup()
    gumbel_ops.set_use_pallas(jax.default_backend() == "tpu")
    os.environ.setdefault("GIC_BF16_MU", "1")
    if jax.default_backend() == "tpu":
        os.environ.setdefault("GIC_DISC_KERNEL", "3")

    progs = {v: build(v) for v in VARIANTS}
    for rep in range(REPS):
        for v in VARIANTS:
            step, state, batch = progs[v]
            sps, state = measure(step, state, batch)
            progs[v] = (step, state, batch)
            print(json.dumps({"variant": NAMES.get(v, v), "rep": rep,
                              "steps_per_sec": round(sps, 2)}), flush=True)


if __name__ == "__main__":
    main()
