"""MEASURED per-component times of the adversarial step (real chip).

XLA cost analysis (cost_breakdown.py) models bytes per HLO, but fusion and
custom calls (Pallas) make those counts unreliable — this harness times
each subprogram for real: sample forward, G-loss grad, D-loss grad, the
full fused step, and a disc fwd+bwd microbench, under each decode impl /
disc-kernel setting.

Usage: GIC_DISC_KERNEL=0|1 python benchmarks/component_times.py [fused|decoupled]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

ITERS = int(os.environ.get("GIC_ITERS", "20"))


def scalarize(fn):
    """jit a version of fn reduced to ONE scalar — host fetches over the
    remote tunnel must move 4 bytes, not the gradient trees."""
    @jax.jit
    def wrapped(*args):
        out = fn(*args)
        leaves = jax.tree_util.tree_leaves(out)
        return sum(jnp.sum(jnp.asarray(l, jnp.float32)) for l in leaves)
    return wrapped


def timeit(fn, *args):
    float(fn(*args))  # compile + warm
    float(fn(*args))
    t0 = time.perf_counter()
    outs = [fn(*args) for _ in range(ITERS)]
    float(outs[-1])
    dt = time.perf_counter() - t0
    return dt / ITERS * 1e3


def main():
    from gan_image_captioning_tpu.utils.runtime import setup

    setup()
    from gan_image_captioning_tpu.config import Config
    from gan_image_captioning_tpu.data.loader import make_batch
    from gan_image_captioning_tpu.models import api
    from gan_image_captioning_tpu.train.state import create_train_state
    from gan_image_captioning_tpu.train.steps import (_compute_cast,
                                                      adv_losses,
                                                      make_adv_step)

    impl = sys.argv[1] if len(sys.argv) > 1 else "fused"
    config = Config(
        vocab_size=11008, gen_embed_dim=512, gen_hidden_dim=512,
        gen_num_layers=2, max_seq_len=34, disc_embed_dim=64, disc_num_rep=64,
        disc_filter_sizes=(3, 4, 5), disc_num_filters=(300, 300, 300),
        adv_train_batch_size=64, dtype="bfloat16", decode_impl=impl)
    rng = jax.random.PRNGKey(1008)
    state = create_train_state(config, rng)
    gp, dp = state.gen_params, state.disc_params
    caps = [jax.random.randint(jax.random.PRNGKey(i), (30,), 4, 11000)
            for i in range(64)]
    batch = {k: jnp.asarray(v)
             for k, v in make_batch(caps, None, config.seq_len).items()}

    gpc, dpc, bc = _compute_cast(config, gp, dp, batch)
    seq_len = config.seq_len
    # match the train step: temperature in the compute dtype, else it
    # promotes every soft output to f32
    temp = jnp.asarray(10.0, jnp.bfloat16)
    drng = jax.random.PRNGKey(7)

    @scalarize
    def sample_fwd(gpc, rng):
        cond, _ = api.generator_condition(config, gpc, bc, train=True)
        soft, ids = api.generator_sample(gpc, cond, rng, temp,
                                         seq_len, False, config)
        return soft, ids

    @jax.jit
    def sample_soft(gpc, rng):
        cond, _ = api.generator_condition(config, gpc, bc, train=True)
        soft, ids = api.generator_sample(gpc, cond, rng, temp,
                                         seq_len, False, config)
        return soft

    soft = sample_soft(gpc, rng)

    @scalarize
    def disc_fwd(dpc, soft):
        return api.discriminator_apply(dpc, soft, config, drng, train=True)

    @scalarize
    def disc_grad(dpc, soft):
        def loss(p, s):
            return jnp.mean(api.discriminator_apply(p, s, config, drng,
                                                    train=True))
        return jax.grad(loss, argnums=(0, 1))(dpc, soft)

    @scalarize
    def g_grad(gpc, rng):
        def loss(p):
            cond, _ = api.generator_condition(config, p, bc, train=True)
            soft, _ = api.generator_sample(p, cond, rng, temp,
                                           seq_len, False, config)
            g_out = api.discriminator_apply(dpc, soft, config, drng,
                                            train=True)
            return jnp.mean(g_out)
        return jax.grad(loss)(gpc)

    step = make_adv_step(config)

    def time_step():
        st = create_train_state(config, rng)
        s2, m = step(st, batch, 10.0)
        float(m["gen_adv_loss"])
        t0 = time.perf_counter()
        for _ in range(ITERS):
            s2, m = step(s2, batch, 10.0)
        float(m["gen_adv_loss"])
        return (time.perf_counter() - t0) / ITERS * 1e3

    print(f"impl={impl} disc_kernel={os.environ.get('GIC_DISC_KERNEL', '?')}")
    print(f"sample fwd        {timeit(sample_fwd, gpc, rng):7.2f} ms")
    print(f"disc fwd (soft)   {timeit(disc_fwd, dpc, soft):7.2f} ms")
    print(f"disc grad (p+in)  {timeit(disc_grad, dpc, soft):7.2f} ms")
    print(f"g grad (full)     {timeit(g_grad, gpc, rng):7.2f} ms")
    print(f"fused adv step    {time_step():7.2f} ms")


if __name__ == "__main__":
    main()
