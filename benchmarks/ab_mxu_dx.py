"""Back-to-back A/B of the MXU disc-engine backward's DX formulation.

GIC_MXU_DX=1 (default, `kernels/disc_conv.py:_mxu_bwd_dx_kernel`)
overlap-adds the tap gradients INSIDE the bank kernel and emits the input
gradient already in XT layout; =0 emits the per-timestep DXS tensor
[lv, Q, f·eds] (f× the input bytes) whose XLA-side layout copies + f
shifted adds were ~1 ms of the flagship step trace.

Chip/tunnel state drifts ±8% across hours, so variants are interleaved
within one process (same methodology as ab_single_fwd.py / ab_disc_engine).

    python benchmarks/ab_mxu_dx.py
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
VARIANTS = os.environ.get("GIC_AB_VARIANTS", "0,1").split(",")
NAMES = {"0": "dxs+xla-overlap-add", "1": "dx-in-kernel"}


def build(flag: str):
    os.environ["GIC_MXU_DX"] = flag
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

    progs = {}
    for v in VARIANTS:
        progs[v] = build(v)
        # each build() jits fresh programs; GIC_MXU_DX is read at trace
        # time inside _mxu_vjp_bwd, so the two variants coexist
    for rep in range(REPS):
        for v in VARIANTS:
            step, state, batch = progs[v]
            sps, state = measure(step, state, batch)
            progs[v] = (step, state, batch)
            print(json.dumps({"variant": NAMES.get(v, v), "rep": rep,
                              "steps_per_sec": round(sps, 2)}), flush=True)


if __name__ == "__main__":
    main()
