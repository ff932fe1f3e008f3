"""Weights-resident decode kernel vs the jnp scan (real chip).

Times the T=36 flagship sampling decode (greedy + sample modes) and checks
greedy-ids agreement between the kernel and the scan.

Usage: python benchmarks/decode_kernel_bench.py [f32]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

ITERS = int(os.environ.get("GIC_ITERS", "30"))


def main():
    from gan_image_captioning_tpu.utils.runtime import setup

    setup()
    from gan_image_captioning_tpu.config import Config
    from gan_image_captioning_tpu.kernels.decode_sample import decode_sample
    from gan_image_captioning_tpu.models import generator as gen_lib
    from gan_image_captioning_tpu.train.steps import _compute_cast

    dtype = "float32" if (len(sys.argv) > 1 and sys.argv[1] == "f32") \
        else "bfloat16"
    config = Config(vocab_size=11008, gen_embed_dim=512, gen_hidden_dim=512,
                    gen_num_layers=2, max_seq_len=34, dtype=dtype)
    params = gen_lib.init_generator_params(jax.random.PRNGKey(1008), config)
    dec = _compute_cast(config, params)["decoder"]
    feats = gen_lib.start_token_features(dec, 64)
    T = config.seq_len

    @jax.jit
    def kernel_greedy(dec, feats):
        return decode_sample(feats, dec["lstm"], dec["linear"]["w"],
                             dec["linear"]["b"], dec["embed"], seq_len=T,
                             mode="greedy")

    @jax.jit
    def kernel_sample(dec, feats, seed):
        ids, noise = decode_sample(feats, dec["lstm"], dec["linear"]["w"],
                                   dec["linear"]["b"], dec["embed"],
                                   seq_len=T, mode="sample", seed=seed)
        return ids, jnp.sum(noise)

    @jax.jit
    def scan_greedy(dec, feats):
        _, ids = gen_lib.sample(dec, feats, jax.random.PRNGKey(0),
                                jnp.asarray(1.0, feats.dtype), T,
                                pretrain=True, impl="fused")
        return ids

    @jax.jit
    def scan_sample(dec, feats, rng):
        soft, ids = gen_lib.sample(dec, feats, rng,
                                   jnp.asarray(10.0, feats.dtype), T,
                                   pretrain=False, impl="fused")
        return ids, jnp.sum(soft.astype(jnp.float32))

    def timeit(fn, *args):
        r = fn(*args)
        jax.tree_util.tree_map(lambda x: np.asarray(x[:1]) if x.ndim else
                               float(x), r)
        t0 = time.perf_counter()
        outs = [fn(*args) for _ in range(ITERS)]
        jax.tree_util.tree_map(lambda x: np.asarray(x[:1]) if x.ndim else
                               float(x), outs[-1])
        return (time.perf_counter() - t0) / ITERS * 1e3

    ik = np.asarray(kernel_greedy(dec, feats))
    isc = np.asarray(scan_greedy(dec, feats))
    match = float((ik == isc).mean())
    print(f"dtype={dtype}  greedy ids match kernel-vs-scan: {match:.4f}")
    print(f"scan   greedy   {timeit(scan_greedy, dec, feats):7.3f} ms")
    print(f"kernel greedy   {timeit(kernel_greedy, dec, feats):7.3f} ms")
    print(f"scan   sample   {timeit(scan_sample, dec, feats, jax.random.PRNGKey(2)):7.3f} ms")
    print(f"kernel sample   {timeit(kernel_sample, dec, feats, 2):7.3f} ms")


if __name__ == "__main__":
    main()
