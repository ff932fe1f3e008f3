"""MEASURED per-phase step-time breakdown of the flagship adversarial step.

VERDICT r4 item 1: the MFU roofline (benchmarks/mfu.py) splits the step's
FLOPs analytically; this harness splits its *time* by measurement.  It
builds a ladder of programs at the exact bench.py defaults (decode kernel,
MXU disc engine 3 with in-kernel DX, bf16, joint pullback) where each rung
adds one phase, and times each rung as a K-STEP ``lax.scan`` inside one
jit — per-call dispatch over the tunneled chip floors at ~5-6 ms/call
(the r5 per-call ladder measured EVERY rung at ~6 ms regardless of
content), so only scan-amortized timing exposes true device time.  All
rungs are timed INTERLEAVED in one process (chip/tunnel drift
discipline), and the report is the marginal cost of each phase under
XLA's real global schedule:

  sample        decode forward only (kernel sample + ids/soft consumed)
  decode_grad   decode forward + decode backward (random cotangent)
  fwd           + 3 discriminator forward passes + losses
  g_pull        + generator-side pullback (disc DX backward + decode bwd)
  both_pull     + discriminator parameter backward
  full          + both Adam updates, EMA, guards (= the real bench step)
  opt_only      optimizer section alone (fixed grads, chained opt state)

Buckets (ms/step, device):
  decode fwd   = t(sample)
  disc fwd     = t(fwd)       - t(sample)
  gen bwd      = t(g_pull)    - t(fwd)               [disc-DX + decode bwd]
  disc bwd     = t(both_pull) - t(g_pull)            [disc param grads]
  opt + glue   = t(full)      - t(both_pull)         [cross-check: opt_only]
  decode bwd   = t(decode_grad) - t(sample)          [no-disc estimate]
  dispatch gap = per-call full-step time - t(full)   [the tunnel RTT share]

Usage (real chip):
    python benchmarks/phase_breakdown.py
    GIC_PB_REPS=6 GIC_PB_CALLS=8 GIC_PB_K=10 python benchmarks/phase_breakdown.py
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REPS = int(os.environ.get("GIC_PB_REPS", "5"))
CALLS = int(os.environ.get("GIC_PB_CALLS", "8"))   # jit calls per window
K = int(os.environ.get("GIC_PB_K", "10"))          # scanned steps per call
WARMUP = int(os.environ.get("GIC_PB_WARMUP", "2"))


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
    from gan_image_captioning_tpu.models import api
    from gan_image_captioning_tpu.train.state import create_train_state
    from gan_image_captioning_tpu.train.steps import (_compute_cast,
                                                      adv_losses,
                                                      make_adv_step,
                                                      make_optimizer)

    config = Config(
        vocab_size=11008, gen_embed_dim=512, gen_hidden_dim=512,
        gen_num_layers=2, max_seq_len=34, disc_embed_dim=64, disc_num_rep=64,
        disc_filter_sizes=(3, 4, 5), disc_num_filters=(300, 300, 300),
        adv_train_batch_size=int(os.environ.get("GIC_BENCH_BATCH", "64")),
        dtype="bfloat16",
        decode_impl=os.environ.get("GIC_DECODE_IMPL",
                                   "kernel" if on_tpu else "fused"))
    B = config.adv_train_batch_size
    state = create_train_state(config, jax.random.PRNGKey(1008))
    caps = [jax.random.randint(jax.random.PRNGKey(i), (30,), 4, 11000)
            for i in range(B)]
    batch = {k: jnp.asarray(v)
             for k, v in make_batch(caps, None, config.seq_len).items()}
    temp = jnp.bfloat16(10.0)
    gp, dp = state.gen_params, state.disc_params

    # ---- rung bodies (k = scan index, returns a consumed scalar) --------
    def _sample_body(k):
        seed = jax.random.fold_in(jax.random.PRNGKey(7), k)
        gpc, _, bc = _compute_cast(config, gp, dp, batch)
        cond, _ = api.generator_condition(config, gpc, bc, True)
        soft, ids = api.generator_sample(gpc, cond, seed, temp,
                                         config.seq_len, False, config)
        return (jnp.sum(soft.astype(jnp.float32))
                + jnp.sum(ids).astype(jnp.float32))

    def _decode_grad_body(k):
        seed = jax.random.fold_in(jax.random.PRNGKey(7), k)

        def loss(g):
            gpc, _, bc = _compute_cast(config, g, dp, batch)
            cond, _ = api.generator_condition(config, gpc, bc, True)
            soft, _ = api.generator_sample(gpc, cond, seed, temp,
                                           config.seq_len, False, config)
            return jnp.sum(soft.astype(jnp.float32))
        grads = jax.grad(loss)(gp)
        return (jnp.sum(grads["decoder"]["linear"]["b"])
                + jnp.sum(grads["decoder"]["lstm"][0]["b_ih"]))

    def _joint(gp_, dp_, seed):
        g_loss, d_loss, _ = adv_losses(config, gp_, dp_, batch, seed, temp,
                                       train=True, grad_side="both")
        return g_loss, d_loss

    def _fwd_body(k):
        seed = jax.random.fold_in(jax.random.PRNGKey(7), k)
        g_loss, d_loss = _joint(gp, dp, seed)
        return g_loss + d_loss

    def _g_pull_body(k):
        seed = jax.random.fold_in(jax.random.PRNGKey(7), k)
        (g_loss, _), vjp_fn = jax.vjp(lambda g: _joint(g, dp, seed), gp)
        (g_grads,) = vjp_fn((jnp.float32(1.0), jnp.float32(0.0)))
        return g_loss + jnp.sum(g_grads["decoder"]["linear"]["b"])

    def _both_pull_body(k):
        seed = jax.random.fold_in(jax.random.PRNGKey(7), k)
        (g_loss, d_loss), vjp_fn = jax.vjp(
            lambda g, d: _joint(g, d, seed), gp, dp)
        g_grads, d_grads = vjp_fn((jnp.float32(1.0), jnp.float32(1.0)))
        return (g_loss + d_loss + jnp.sum(g_grads["decoder"]["linear"]["b"])
                + jnp.sum(d_grads["embeddings"]["w"]))

    def _scalar_prog(body):
        @jax.jit
        def prog():
            def it(c, k):
                return c + body(k), None
            c, _ = jax.lax.scan(it, jnp.float32(0.0), jnp.arange(K))
            return c
        return prog

    # full: K REAL chained steps in one program (state carried)
    raw_step = make_adv_step(config, _raw=True)

    @jax.jit
    def full_prog(st):
        def it(c, _):
            st, m = raw_step(c, batch, 10.0)
            return st, m["gen_adv_loss"]
        st, losses = jax.lax.scan(it, st, None, length=K)
        return st, jnp.sum(losses)

    # optimizer section alone, opt state chained through the scan
    gen_tx = make_optimizer(config.gen_lr, config.clip_norm, config)
    disc_tx = make_optimizer(config.disc_lr, config.clip_norm, config)
    g_grads_fixed = jax.tree_util.tree_map(lambda p: 1e-6 * p, gp)
    d_grads_fixed = jax.tree_util.tree_map(lambda p: 1e-6 * p, dp)

    @jax.jit
    def opt_prog(gp_, dp_, g_opt, d_opt):
        def it(carry, _):
            gp_, dp_, g_opt, d_opt = carry
            g_up, g_opt = gen_tx.update(g_grads_fixed, g_opt, gp_)
            gp_ = jax.tree_util.tree_map(lambda p, u: p + u, gp_, g_up)
            d_up, d_opt = disc_tx.update(d_grads_fixed, d_opt, dp_)
            dp_ = jax.tree_util.tree_map(lambda p, u: p + u, dp_, d_up)
            return (gp_, dp_, g_opt, d_opt), None
        carry, _ = jax.lax.scan(it, (gp_, dp_, g_opt, d_opt), None,
                                length=K)
        return carry

    # per-call single full step (the bench.py program) for the dispatch gap
    percall_step = make_adv_step(config)
    percall_cell = [create_train_state(config, jax.random.PRNGKey(1009))]

    # ---- run wrappers ----------------------------------------------------
    progs = {n: _scalar_prog(b) for n, b in
             [("sample", _sample_body), ("decode_grad", _decode_grad_body),
              ("fwd", _fwd_body), ("g_pull", _g_pull_body),
              ("both_pull", _both_pull_body)]}
    full_cell = [state]

    def run_scalar(name):
        out = None
        for _ in range(CALLS):
            out = progs[name]()
        float(out)

    def run_full():
        st = full_cell[0]
        s = None
        for _ in range(CALLS):
            st, s = full_prog(st)
        full_cell[0] = st
        float(s)

    def run_opt():
        carry = (gp, dp, state.gen_opt_state, state.disc_opt_state)
        for _ in range(CALLS):
            carry = opt_prog(*carry)
        jax.block_until_ready(carry)
        float(jnp.sum(carry[0]["decoder"]["linear"]["b"]))

    def run_percall():
        st, m = percall_cell[0], None
        for _ in range(CALLS * K):
            st, m = percall_step(st, batch, 10.0)
        percall_cell[0] = st
        float(m["gen_adv_loss"])

    rungs = ([(n, (lambda n=n: run_scalar(n)))
              for n in progs] +
             [("full", run_full), ("opt_only", run_opt),
              ("full_percall", run_percall)])

    print(f"[pb] compile+warmup ({len(rungs)} programs, K={K})...",
          file=sys.stderr)
    for name, fn in rungs:
        t0 = time.perf_counter()
        fn()
        print(f"[pb]   {name}: first call {time.perf_counter() - t0:.1f}s",
              file=sys.stderr)
    for _ in range(WARMUP - 1):
        for _, fn in rungs:
            fn()

    times = {name: [] for name, _ in rungs}
    for rep in range(REPS):
        for name, fn in rungs:
            t0 = time.perf_counter()
            fn()
            dt = (time.perf_counter() - t0) / (CALLS * K) * 1e3
            times[name].append(dt)
        print(f"[pb] rep {rep + 1}/{REPS}: "
              + " ".join(f"{n}={times[n][-1]:.3f}" for n, _ in rungs),
              file=sys.stderr)

    med = {n: sorted(v)[len(v) // 2] for n, v in times.items()}
    best = {n: min(v) for n, v in times.items()}
    buckets = {
        "decode_fwd": med["sample"],
        "disc_fwd": med["fwd"] - med["sample"],
        "gen_bwd": med["g_pull"] - med["fwd"],
        "disc_bwd": med["both_pull"] - med["g_pull"],
        "opt_glue": med["full"] - med["both_pull"],
        "decode_bwd_no_disc": med["decode_grad"] - med["sample"],
        "opt_only_direct": med["opt_only"],
        "dispatch_gap_percall": med["full_percall"] - med["full"],
    }
    out = {"metric": "phase_breakdown_ms_device", "batch": B, "K": K,
           "decode_impl": config.decode_impl,
           "disc_kernel": os.environ.get("GIC_DISC_KERNEL"),
           "full_ms_per_step_scanned": round(med["full"], 4),
           "full_ms_per_step_percall": round(med["full_percall"], 4),
           "steps_per_sec_equiv_scanned": round(1e3 / med["full"], 1),
           "rungs_ms_median": {n: round(v, 4) for n, v in med.items()},
           "rungs_ms_min": {n: round(v, 4) for n, v in best.items()},
           "buckets_ms": {n: round(v, 4) for n, v in buckets.items()},
           "buckets_pct_of_full": {
               n: round(100.0 * v / med["full"], 1)
               for n, v in buckets.items()
               if n not in ("opt_only_direct", "dispatch_gap_percall")},
           "reps": {n: [round(x, 4) for x in v] for n, v in times.items()}}
    print(json.dumps(out))


if __name__ == "__main__":
    main()
