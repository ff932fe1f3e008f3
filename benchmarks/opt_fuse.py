"""In-process interleaved A/B: optax clip→adam chain vs GIC_FUSED_ADAM=1
(one-pass clip→Adam→apply, train/state.py:make_fused_update) on the full
flagship adversarial step.

Round-5 motivation: the measured phase breakdown
(benchmarks/phase_breakdown.py) put opt+glue at 1.85 ms of the 5.13 ms
device step (36%) — the LARGEST bucket; the optax chain materializes a
clipped-grad tree, an update tree and a separate ``p + u`` pass that one
fused elementwise expression avoids.

Both variants run as K-step scanned programs (per-call dispatch floors at
~5-6 ms over the tunnel and would mask the delta), timed alternately.

    python benchmarks/opt_fuse.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REPS = int(os.environ.get("GIC_AB_REPS", "5"))
CALLS = int(os.environ.get("GIC_AB_CALLS", "6"))
K = int(os.environ.get("GIC_AB_K", "10"))


def main():
    from gan_image_captioning_tpu.utils.runtime import setup

    setup()
    import jax
    import jax.numpy as jnp

    from gan_image_captioning_tpu.ops import gumbel as gumbel_ops

    on_tpu = jax.default_backend() == "tpu"
    gumbel_ops.set_use_pallas(on_tpu)
    if on_tpu:
        os.environ.setdefault("GIC_DISC_KERNEL", "3")
        os.environ.setdefault("GIC_BF16_MU", "1")

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
        decode_impl="kernel" if on_tpu else "fused")
    B = config.adv_train_batch_size
    caps = [jax.random.randint(jax.random.PRNGKey(i), (30,), 4, 11000)
            for i in range(B)]
    batch = {k: jnp.asarray(v)
             for k, v in make_batch(caps, None, config.seq_len).items()}

    def build(flag):
        os.environ["GIC_FUSED_ADAM"] = flag
        raw = make_adv_step(config, _raw=True)

        @jax.jit
        def prog(st):
            def it(c, _):
                st2, m = raw(c, batch, 10.0)
                return st2, m["gen_adv_loss"]
            st, losses = jax.lax.scan(it, st, None, length=K)
            return st, jnp.sum(losses)
        return prog

    variants = {}
    for flag in ("0", "1"):
        prog = build(flag)
        st = create_train_state(config, jax.random.PRNGKey(1008))
        t0 = time.perf_counter()
        st, s = prog(st)
        float(s)
        print(f"[ab] fused={flag}: compile+first {time.perf_counter()-t0:.1f}s",
              file=sys.stderr)
        variants[flag] = (prog, [st])
    os.environ.pop("GIC_FUSED_ADAM", None)

    times = {"0": [], "1": []}
    for rep in range(REPS):
        for flag in ("0", "1"):
            prog, cell = variants[flag]
            st, s = cell[0], None
            t0 = time.perf_counter()
            for _ in range(CALLS):
                st, s = prog(st)
            float(s)
            dt = (time.perf_counter() - t0) / (CALLS * K)
            cell[0] = st
            times[flag].append(dt * 1e3)
        print(f"[ab] rep {rep+1}/{REPS}: optax={times['0'][-1]:.3f}ms "
              f"fused={times['1'][-1]:.3f}ms", file=sys.stderr)

    med = {f: sorted(v)[len(v) // 2] for f, v in times.items()}
    import json
    print(json.dumps({
        "metric": "fused_adam_ab_ms_per_step",
        "optax_ms": round(med["0"], 4), "fused_ms": round(med["1"], 4),
        "speedup_pct": round(100.0 * (med["0"] / med["1"] - 1.0), 2),
        "steps_per_sec": {f: round(1e3 / m, 1) for f, m in med.items()},
        "reps": {f: [round(x, 4) for x in v] for f, v in times.items()}}))


if __name__ == "__main__":
    main()
