"""XLA cost analysis of the fused adversarial step (flagship geometry).

Prints FLOPs and bytes-accessed of the compiled program for each decode
implementation — the roofline evidence behind docs/benchmarks.md.  Runs on
whatever backend is active (the cost model is per-HLO, not per-hardware).

Usage: python benchmarks/step_cost.py [decoupled|fused ...]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp


def analyze(decode_impl: str):
    from gan_image_captioning_tpu.config import Config
    from gan_image_captioning_tpu.data.loader import make_batch
    from gan_image_captioning_tpu.train.state import create_train_state
    from gan_image_captioning_tpu.train.steps import make_adv_step

    config = Config(
        vocab_size=11008, gen_embed_dim=512, gen_hidden_dim=512,
        gen_num_layers=2, max_seq_len=34, disc_embed_dim=64, disc_num_rep=64,
        disc_filter_sizes=(3, 4, 5), disc_num_filters=(300, 300, 300),
        adv_train_batch_size=64, dtype="bfloat16", decode_impl=decode_impl)
    state = create_train_state(config, jax.random.PRNGKey(1008))
    caps = [jax.random.randint(jax.random.PRNGKey(i), (30,), 4, 11000)
            for i in range(config.adv_train_batch_size)]
    batch = {k: jnp.asarray(v)
             for k, v in make_batch(caps, None, config.seq_len).items()}
    step = make_adv_step(config)
    lowered = step.lower(state, batch, 10.0)
    cost = lowered.compile().cost_analysis()
    flops = cost.get("flops", 0.0)
    bytes_ = cost.get("bytes accessed", 0.0)
    print(f"{decode_impl:10s}  {flops / 1e9:8.1f} GFLOP  "
          f"{bytes_ / 1e9:8.2f} GB/step")
    return flops, bytes_


if __name__ == "__main__":
    impls = sys.argv[1:] or ["fused", "decoupled"]
    for impl in impls:
        analyze(impl)
