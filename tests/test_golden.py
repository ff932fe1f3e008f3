"""Golden regression: fixed seed → fixed greedy caption ids.

Catches accidental numerics changes in the decode path (embedding, LSTM
cell math, projection, argmax) — update ONLY after intentionally changing
decode semantics."""

import jax
import numpy as np

from gan_image_captioning_tpu.config import Config
from gan_image_captioning_tpu.models import api
from gan_image_captioning_tpu.models.generator import start_token_features


def test_golden_greedy_ids():
    cfg = Config(vocab_size=37, gen_embed_dim=8, gen_hidden_dim=16,
                 gen_num_layers=2, max_seq_len=10)
    params = api.init_generator(jax.random.PRNGKey(0), cfg)
    feats = start_token_features(params["decoder"], 2)
    cond = {"features": feats, "context": None}
    # Gumbel sampling (adversarial mode) — sensitive to embedding, LSTM,
    # projection, PRNG-split, and softmax numerics all at once.
    _, ids = api.generator_sample(params, cond, jax.random.PRNGKey(2), 3.0,
                                  cfg.seq_len, False, cfg)
    print("golden ids:", np.asarray(ids).tolist())
    golden = GOLDEN_IDS
    np.testing.assert_array_equal(np.asarray(ids), np.asarray(golden))


GOLDEN_IDS = [[11, 0, 31, 9, 13, 13, 16, 23, 29, 2, 16, 7], [17, 4, 13, 22, 19, 2, 5, 15, 19, 15, 12, 24]]
