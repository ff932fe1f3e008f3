"""Marginal-cost ablation of the fused adversarial step (real chip).

Times four jitted programs sharing the exact step structure:
  fwd_only   losses only (no backward, no updates)
  +g_bwd     generator backward added
  +d_bwd     discriminator backward added
  full       both backwards + both Adam updates (the real step)

The deltas are the true marginal costs of each phase under XLA's global
scheduling (component microbenches mis-attribute overlap).

Usage: GIC_DISC_KERNEL=0|1 GIC_DECODE_IMPL=fused|decoupled \
    python benchmarks/step_ablation.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

ITERS = int(os.environ.get("GIC_ITERS", "20"))


def main():
    from gan_image_captioning_tpu.utils.runtime import setup

    setup()
    from gan_image_captioning_tpu.config import Config
    from gan_image_captioning_tpu.data.loader import make_batch
    from gan_image_captioning_tpu.train.state import create_train_state
    from gan_image_captioning_tpu.train.steps import adv_losses

    impl = os.environ.get("GIC_DECODE_IMPL", "fused")
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
    rng_step = jax.random.PRNGKey(3)

    @jax.jit
    def fwd_only(gp, dp):
        g_loss, d_loss, _ = adv_losses(config, gp, dp, batch, rng_step,
                                       10.0, train=True)
        return g_loss + d_loss

    @jax.jit
    def g_bwd(gp, dp):
        def g_loss_fn(gp):
            g_loss, d_loss, _ = adv_losses(config, gp, dp, batch, rng_step,
                                           10.0, train=True)
            return g_loss + 0.0 * d_loss  # keep both losses live

        loss, grads = jax.value_and_grad(g_loss_fn)(gp)
        return loss + sum(jnp.sum(l.astype(jnp.float32))
                          for l in jax.tree_util.tree_leaves(grads))

    @jax.jit
    def d_bwd(gp, dp):
        def d_loss_fn(dp):
            g_loss, d_loss, _ = adv_losses(config, gp, dp, batch, rng_step,
                                           10.0, train=True)
            return d_loss + 0.0 * g_loss

        loss, grads = jax.value_and_grad(d_loss_fn)(dp)
        return loss + sum(jnp.sum(l.astype(jnp.float32))
                          for l in jax.tree_util.tree_leaves(grads))

    @jax.jit
    def both_bwd(gp, dp):
        def g_loss_fn(gp):
            g_loss, _, _ = adv_losses(config, gp, dp, batch, rng_step,
                                      10.0, train=True)
            return g_loss

        def d_loss_fn(dp):
            _, d_loss, _ = adv_losses(config, gp, dp, batch, rng_step,
                                      10.0, train=True)
            return d_loss

        gl, gg = jax.value_and_grad(g_loss_fn)(gp)
        dl, dg = jax.value_and_grad(d_loss_fn)(dp)
        return gl + dl + sum(jnp.sum(l.astype(jnp.float32))
                             for l in jax.tree_util.tree_leaves((gg, dg)))

    def timeit(fn):
        float(fn(gp, dp))
        float(fn(gp, dp))
        t0 = time.perf_counter()
        outs = [fn(gp, dp) for _ in range(ITERS)]
        float(outs[-1])
        return (time.perf_counter() - t0) / ITERS * 1e3

    print(f"impl={impl} disc_kernel={os.environ.get('GIC_DISC_KERNEL', '?')}")
    t0 = timeit(fwd_only)
    tg = timeit(g_bwd)
    td = timeit(d_bwd)
    tb = timeit(both_bwd)
    print(f"fwd only (sample + 3 D passes + losses)  {t0:7.2f} ms")
    print(f"+ g backward                             {tg:7.2f} ms  (Δ {tg - t0:+.2f})")
    print(f"+ d backward                             {td:7.2f} ms  (Δ {td - t0:+.2f})")
    print(f"both backwards                           {tb:7.2f} ms  (Δg {tb - td:+.2f}, Δd {tb - tg:+.2f})")


if __name__ == "__main__":
    main()
