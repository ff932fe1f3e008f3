"""Component-level XLA cost breakdown of the adversarial step.

Isolates which subprogram moves the bytes: sample forward, generator-loss
gradient, discriminator-loss gradient, full fused step — per decode impl.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp


def flagship(decode_impl):
    from gan_image_captioning_tpu.config import Config

    return Config(
        vocab_size=11008, gen_embed_dim=512, gen_hidden_dim=512,
        gen_num_layers=2, max_seq_len=34, disc_embed_dim=64, disc_num_rep=64,
        disc_filter_sizes=(3, 4, 5), disc_num_filters=(300, 300, 300),
        adv_train_batch_size=64, dtype="bfloat16", decode_impl=decode_impl)


def report(name, fn, *args):
    cost = jax.jit(fn).lower(*args).compile().cost_analysis()
    print(f"{name:34s} {cost.get('flops', 0) / 1e9:8.1f} GFLOP  "
          f"{cost.get('bytes accessed', 0) / 1e9:7.2f} GB")


def main():
    from gan_image_captioning_tpu.data.loader import make_batch
    from gan_image_captioning_tpu.models import api
    from gan_image_captioning_tpu.train.steps import (adv_losses, mle_loss,
                                                      _compute_cast)

    for impl in ("fused", "decoupled"):
        config = flagship(impl)
        rng = jax.random.PRNGKey(1008)
        k1, k2 = jax.random.split(rng)
        gp = api.init_generator(k1, config)
        dp = api.init_discriminator(k2, config)
        caps = [jax.random.randint(jax.random.PRNGKey(i), (30,), 4, 11000)
                for i in range(64)]
        batch = {k: jnp.asarray(v)
                 for k, v in make_batch(caps, None, config.seq_len).items()}

        def sample_fwd(gp, batch):
            gpc, bc = _compute_cast(config, gp, batch)
            cond, _ = api.generator_condition(config, gpc, bc, False)
            soft, ids = api.generator_sample(
                gpc, cond, jax.random.PRNGKey(0), jnp.bfloat16(2.0),
                config.seq_len, False, config)
            return jnp.sum(soft.astype(jnp.float32)), ids

        def g_grad(gp, batch):
            def loss(g):
                gl, _, _ = adv_losses(config, g, dp, batch,
                                      jax.random.PRNGKey(0), 2.0, True)
                return gl
            return jax.grad(loss)(gp)

        def d_grad(dp_, batch):
            def loss(d):
                _, dl, _ = adv_losses(config, gp, d, batch,
                                      jax.random.PRNGKey(0), 2.0, True)
                return dl
            return jax.grad(loss)(dp_)

        def mle_grad(gp, batch):
            def loss(g):
                l, _ = mle_loss(config, g, batch, jax.random.PRNGKey(0), True)
                return l
            return jax.grad(loss)(gp)

        print(f"--- {impl}")
        report("sample forward (soft+ids)", sample_fwd, gp, batch)
        report("mle grad", mle_grad, gp, batch)
        report("g grad (adv)", g_grad, gp, batch)
        report("d grad (adv)", d_grad, dp, batch)


if __name__ == "__main__":
    from gan_image_captioning_tpu.utils.runtime import setup

    setup()
    main()
