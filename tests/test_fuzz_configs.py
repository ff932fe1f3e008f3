"""Config-space fuzz: random valid configs must run one fused MLE +
adversarial step without crashing (catches shape/divisibility edge cases
across the arch grid)."""

import jax
import numpy as np
import pytest

from gan_image_captioning_tpu.config import Config
from gan_image_captioning_tpu.data.loader import make_batch
from gan_image_captioning_tpu.train.state import create_train_state
from gan_image_captioning_tpu.train.steps import make_adv_step, make_mle_step


def _random_config(rng):
    gen_arch = rng.choice(["lstm", "transformer"])
    disc_arch = rng.choice(["cnn", "transformer", "ar_transformer", "bilstm"])
    heads = int(rng.choice([1, 2, 4]))
    d = heads * int(rng.choice([4, 8]))
    num_rep = int(rng.choice([1, 2, 4]))
    disc_embed = num_rep * int(rng.choice([1, 2]))
    max_len = int(rng.integers(5, 12))
    fs = sorted(rng.choice(range(2, min(5, max_len)), size=2,
                           replace=False).tolist())
    return Config(
        vocab_size=int(rng.integers(20, 80)),
        gen_arch=gen_arch, disc_arch=disc_arch,
        gen_embed_dim=d, gen_hidden_dim=int(rng.choice([8, 16, 32])),
        gen_num_layers=int(rng.integers(1, 3)), gen_num_heads=heads,
        disc_embed_dim=disc_embed, disc_num_rep=num_rep,
        disc_hidden_dim=heads * 4, disc_num_heads=heads,
        disc_num_layers=int(rng.integers(1, 3)),
        disc_filter_sizes=tuple(fs), disc_num_filters=(4, 4),
        max_seq_len=max_len,
        adv_loss_type=str(rng.choice(["standard", "JS", "KL", "hinge",
                                      "tv", "rsgan"])),
        dtype=str(rng.choice(["float32", "bfloat16"])),
        disc_train_freq=int(rng.integers(1, 3)),
        label_smoothing=float(rng.choice([0.0, 0.1])),
        noisy_labels=float(rng.choice([0.0, 0.2])),
    )


@pytest.mark.parametrize("seed", range(8))
def test_random_config_one_step(seed):
    rng = np.random.default_rng(seed)
    cfg = _random_config(rng)
    state = create_train_state(cfg, jax.random.PRNGKey(seed))
    caps = [rng.integers(4, cfg.vocab_size, size=rng.integers(2, cfg.max_seq_len))
            for _ in range(4)]
    batch = make_batch(caps, None, cfg.seq_len)
    state, m1 = make_mle_step(cfg)(state, batch)
    state, m2 = make_adv_step(cfg)(state, batch, 2.0)
    for v in list(m1.values()) + list(m2.values()):
        assert np.isfinite(float(v)), cfg
