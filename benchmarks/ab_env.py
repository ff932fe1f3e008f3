"""Generalized in-process interleaved A/B over an env flag, on the full
flagship adversarial step as a K-step scanned program.

Round 5 replaces the per-call A/B harnesses (ab_bptt/ab_fuse/...) for
re-judging flags at the current operating point: the device step is now
~5.1 ms while per-call dispatch over the tunnel floors at ~5.4 ms, so
per-call A/Bs measure the TUNNEL, not the flag (the r4 "neutral" verdicts
for GIC_BPTT_KERNEL / GIC_FUSE_EMBED were taken per-call at ~100 steps/s
where that was fine).  K-scanned programs expose device time.

    python benchmarks/ab_env.py GIC_BPTT_CHAIN 0 1
    python benchmarks/ab_env.py GIC_FUSE_EMBED 0 1
    GIC_AB_K=20 python benchmarks/ab_env.py GIC_DISC_KERNEL 2 3
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REPS = int(os.environ.get("GIC_AB_REPS", "5"))
CALLS = int(os.environ.get("GIC_AB_CALLS", "6"))
K = int(os.environ.get("GIC_AB_K", "10"))


def main():
    var = sys.argv[1]
    values = sys.argv[2:] or ["0", "1"]

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
        decode_impl=os.environ.get(
            "GIC_DECODE_IMPL", "kernel" if on_tpu else "fused"))
    B = config.adv_train_batch_size
    caps = [jax.random.randint(jax.random.PRNGKey(i), (30,), 4, 11000)
            for i in range(B)]
    batch = {k: jnp.asarray(v)
             for k, v in make_batch(caps, None, config.seq_len).items()}

    # COMBO mode: each "value" is a +-joined assignment list, e.g.
    #   python benchmarks/ab_env.py COMBO \
    #       "GIC_BPTT_CHAIN=0+GIC_MXU_TILE=1024" \
    #       "GIC_BPTT_CHAIN=1+GIC_MXU_TILE=2048"
    def _assigns(value):
        if var != "COMBO":
            return [(var, value)]
        return [tuple(kv.split("=", 1)) for kv in value.split("+")]

    prev = {k: os.environ.get(k)
            for v in values for k, _ in _assigns(v)}

    def build(value):
        for k, v in _assigns(value):
            os.environ[k] = v
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
    for v in values:
        prog = build(v)
        st = create_train_state(config, jax.random.PRNGKey(1008))
        t0 = time.perf_counter()
        st, s = prog(st)
        float(s)
        print(f"[ab] {var}={v}: compile+first {time.perf_counter()-t0:.1f}s",
              file=sys.stderr)
        variants[v] = (prog, [st])
    for k, v in prev.items():
        if v is None:
            os.environ.pop(k, None)
        else:
            os.environ[k] = v

    times = {v: [] for v in values}
    for rep in range(REPS):
        for v in values:
            prog, cell = variants[v]
            st, s = cell[0], None
            t0 = time.perf_counter()
            for _ in range(CALLS):
                st, s = prog(st)
            float(s)
            cell[0] = st
            times[v].append((time.perf_counter() - t0) / (CALLS * K) * 1e3)
        print(f"[ab] rep {rep+1}/{REPS}: "
              + " ".join(f"{var}={v}:{times[v][-1]:.3f}ms" for v in values),
              file=sys.stderr)

    med = {v: sorted(t)[len(t) // 2] for v, t in times.items()}
    base = med[values[0]]
    print(json.dumps({
        "metric": f"ab_{var.lower()}_ms_per_step",
        "flag": var, "values": values,
        "ms_per_step": {v: round(m, 4) for v, m in med.items()},
        "steps_per_sec": {v: round(1e3 / m, 1) for v, m in med.items()},
        "delta_pct_vs_first": {
            v: round(100.0 * (base / med[v] - 1.0), 2) for v in values},
        "reps": {v: [round(x, 4) for x in t] for v, t in times.items()}}))


if __name__ == "__main__":
    main()
