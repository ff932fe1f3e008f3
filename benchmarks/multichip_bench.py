"""Data-parallel scaling benchmark: sharded adversarial steps/s over a mesh.

Round-2 note (NEXT_STEPS item): all sharding is validated on virtual CPU
meshes; this harness is the measurement tool for when real multi-chip
hardware is attached — it builds a ``data:N`` mesh over every available
device, shards the TrainState + batch with the production rules
(parallel/sharding.py), runs the SAME fused adversarial step the 1-chip
bench runs, and reports per-mesh steps/s, global samples/s and scaling
efficiency vs the single-device rate.

    python benchmarks/multichip_bench.py            # all devices
    GIC_MESH="data:4,model:2" ... python ...        # explicit mesh
    # correctness/virtual run:
    JAX_PLATFORM_NAME=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
        python benchmarks/multichip_bench.py

Prints one JSON line per mesh configuration.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

ITERS = int(os.environ.get("GIC_BENCH_ITERS", "20"))
WARMUP = int(os.environ.get("GIC_BENCH_WARMUP", "3"))


def measure(mesh_spec, per_device_batch, config_base):
    from gan_image_captioning_tpu.data.loader import make_batch
    from gan_image_captioning_tpu.parallel.mesh import make_mesh
    from gan_image_captioning_tpu.parallel.sharding import (shard_batch,
                                                            shard_train_state)
    from gan_image_captioning_tpu.train.state import create_train_state
    from gan_image_captioning_tpu.train.steps import make_adv_step

    if mesh_spec:
        # a "data:k" spec with k < all devices rides the first k devices
        from gan_image_captioning_tpu.parallel.mesh import parse_mesh_spec
        try:
            _, sizes = parse_mesh_spec(mesh_spec, len(jax.devices()))
            devs = None
        except ValueError:
            import numpy as _np
            sizes = [int(p.partition(":")[2]) for p in mesh_spec.split(",")]
            devs = jax.devices()[:int(_np.prod(sizes))]
        mesh = make_mesh(mesh_spec, devs)
    else:
        mesh = None
    dp = mesh.shape.get("data", 1) if mesh is not None else 1
    batch_size = per_device_batch * max(dp, 1)
    config = config_base.replace(adv_train_batch_size=batch_size)

    state = create_train_state(config, jax.random.PRNGKey(1008))
    caps = [jax.random.randint(jax.random.PRNGKey(i), (30,), 4,
                               config.vocab_size - 8)
            for i in range(batch_size)]
    batch = {k: jnp.asarray(v)
             for k, v in make_batch(caps, None, config.seq_len).items()}
    if mesh is not None:
        state = shard_train_state(state, mesh)
        batch = shard_batch(batch, mesh)
    step = make_adv_step(config)

    for _ in range(WARMUP):
        state, metrics = step(state, batch, 10.0)
    float(metrics["gen_adv_loss"])
    t0 = time.perf_counter()
    for _ in range(ITERS):
        state, metrics = step(state, batch, 10.0)
    float(metrics["gen_adv_loss"])
    dt = time.perf_counter() - t0
    sps = ITERS / dt
    return {"mesh": mesh_spec or "single",
            "devices": mesh.size if mesh is not None else 1,
            "global_batch": batch_size,
            "steps_per_sec": round(sps, 3),
            "samples_per_sec": round(sps * batch_size, 1)}


def main():
    from gan_image_captioning_tpu.config import Config
    from gan_image_captioning_tpu.utils.runtime import setup

    setup()
    n = len(jax.devices())
    small = jax.default_backend() == "cpu"
    config = Config(
        vocab_size=1024 if small else 11008,
        gen_embed_dim=64 if small else 512,
        gen_hidden_dim=64 if small else 512,
        gen_num_layers=2, max_seq_len=10 if small else 34,
        disc_embed_dim=16 if small else 64,
        disc_num_rep=16 if small else 64,
        disc_filter_sizes=(3, 4, 5),
        disc_num_filters=(8, 8, 8) if small else (300, 300, 300),
        dtype="float32" if small else "bfloat16",
        # GSPMD-shardable decode (the Pallas kernel is single-device)
        decode_impl="decoupled" if small else "fused")
    per_dev = int(os.environ.get("GIC_BENCH_BATCH", "8" if small else "64"))

    explicit = os.environ.get("GIC_MESH")
    if explicit:
        # single-device baseline first so the explicit mesh's weak-scaling
        # efficiency is vs the true 1-device rate (divided by the mesh's
        # OWN device count, not the host's total)
        specs = [None, explicit]
    else:
        # dp-scaling ladder: 1 → 2 → 4 → … → n devices
        ladder, k = [], 2
        while k <= n:
            ladder.append(f"data:{k}")
            k *= 2
        specs = [None] + ladder
    base = None
    for spec in specs:
        r = measure(spec, per_dev, config)
        if base is None:
            base = r["samples_per_sec"]          # the 1-device rate
        # weak scaling (per-device batch fixed): perfect = base × devices
        r["scaling_efficiency"] = round(
            r["samples_per_sec"] / (base * r["devices"]), 3)
        print(json.dumps(r), flush=True)


if __name__ == "__main__":
    main()
