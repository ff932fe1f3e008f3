"""Microbenchmark: fused disc conv kernel vs the XLA conv path, flagship
shapes (B=64, L=36, E=R=64, banks 3/4/5 × 300).  Times forward and
forward+backward, host-fetch bounded."""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from gan_image_captioning_tpu.config import Config
from gan_image_captioning_tpu.models import discriminator as disc


def timeit(fn, *args, iters=20):
    out = fn(*args)
    np.asarray(jax.tree_util.tree_leaves(out)[0])
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    np.asarray(jax.tree_util.tree_leaves(out)[0])
    return (time.perf_counter() - t0) / iters * 1e3


def main():
    config = Config(vocab_size=11008, disc_embed_dim=64, disc_num_rep=64,
                    disc_filter_sizes=(3, 4, 5),
                    disc_num_filters=(300, 300, 300), max_seq_len=34)
    params = disc.init_discriminator_params(jax.random.PRNGKey(0), config,
                                            jnp.bfloat16)
    emb = jax.random.normal(jax.random.PRNGKey(1), (64, 36, 64), jnp.bfloat16)
    probe = jax.random.normal(jax.random.PRNGKey(2), (64 * 64, 900),
                              jnp.bfloat16)

    for label, env in (("pallas", "1"), ("hybrid", "2"), ("mxu", "3"),
                       ("xla", "0")):
        os.environ["GIC_DISC_KERNEL"] = env

        @jax.jit
        def fwd(p, e):
            return disc.conv_pooled(p, e, config)

        @jax.jit
        def fwd_bwd(p, e):
            def loss(p, e):
                return jnp.sum(disc.conv_pooled(p, e, config)
                               .astype(jnp.float32) * probe.astype(jnp.float32))
            return jax.grad(loss, argnums=(0, 1))(p, e)

        t_f = timeit(fwd, params, emb)
        t_fb = timeit(fwd_bwd, params, emb)
        print(f"{label:7s} fwd {t_f:7.3f} ms   fwd+bwd {t_fb:7.3f} ms")


if __name__ == "__main__":
    from gan_image_captioning_tpu.utils.runtime import setup

    setup()
    main()
