"""Transformer-variant adversarial step benchmark.

The report's best model (NLP_Report.pdf Table 1: transformer generator,
NLL 1.01 vs LSTM 2.07) at its stated geometry — 256 emb / 256 hid /
4 layers / 8 heads generator vs the transformer discriminator
(64 emb / 128 hid / 8 heads / 4 layers, §4.2) — fused adversarial step
on one chip.  Prints one JSON line.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    from gan_image_captioning_tpu.utils.runtime import setup

    setup()
    import jax
    import jax.numpy as jnp

    from gan_image_captioning_tpu.config import Config
    from gan_image_captioning_tpu.data.loader import make_batch
    from gan_image_captioning_tpu.train.state import create_train_state
    from gan_image_captioning_tpu.train.steps import make_adv_step

    config = Config(
        vocab_size=11008, gen_arch="transformer", disc_arch="transformer",
        gen_embed_dim=256, gen_hidden_dim=256, gen_num_layers=4,
        gen_num_heads=8, disc_embed_dim=64, disc_hidden_dim=128,
        disc_num_heads=8, disc_num_layers=4,
        max_seq_len=34, adv_train_batch_size=64, dtype="bfloat16")

    state = create_train_state(config, jax.random.PRNGKey(1008))
    caps = [jax.random.randint(jax.random.PRNGKey(i), (30,), 4, 11000)
            for i in range(config.adv_train_batch_size)]
    batch = {k: jnp.asarray(v)
             for k, v in make_batch(caps, None, config.seq_len).items()}
    step = make_adv_step(config)

    for _ in range(3):
        state, m = step(state, batch, 10.0)
    float(m["gen_adv_loss"])
    t0 = time.perf_counter()
    for _ in range(20):
        state, m = step(state, batch, 10.0)
    float(m["gen_adv_loss"])
    dt = time.perf_counter() - t0
    print(json.dumps({"metric": "transformer_adv_steps_per_sec_chip",
                      "value": round(20 / dt, 3), "unit": "steps/s"}))


if __name__ == "__main__":
    main()
