"""Coalescing + continuous-batching serving engine.

Correctness bar: a slot-decoded caption must be IDENTICAL to the batch
greedy decode of the same feature row, regardless of when it joined the
pool; coalescing must merge concurrent requests into fewer device
programs without changing any result.
"""

import time

import jax
import jax.numpy as jnp
import numpy as np

from gan_image_captioning_tpu.config import Config
from gan_image_captioning_tpu.eval import decode as decode_lib
from gan_image_captioning_tpu.models import generator as gen_lib
from gan_image_captioning_tpu.serving import (CoalescingBatcher,
                                              ContinuousBatcher,
                                              _masked_logprob_sum)


def _setup(b=6):
    config = Config(vocab_size=128, gen_embed_dim=16, gen_hidden_dim=32,
                    gen_num_layers=2, max_seq_len=7)
    params = gen_lib.init_generator_params(jax.random.PRNGKey(11), config)
    rng = jax.random.normal(jax.random.PRNGKey(3), (b, 16))
    feats = rng * 0.5
    return config, params, np.asarray(feats)


def test_continuous_matches_batch_greedy():
    config, params, feats = _setup(b=6)
    ref_ids = np.asarray(decode_lib.greedy(params, jnp.asarray(feats), config))
    ref_lp = np.asarray(decode_lib.sequence_logprob(
        params, jnp.asarray(feats), jnp.asarray(ref_ids), config))

    eng = ContinuousBatcher(params, config, num_slots=3, chunk_steps=4)
    try:
        # staggered submission: more requests than slots, arriving over time
        futs = []
        for i in range(feats.shape[0]):
            futs.append(eng.submit(feats[i]))
            if i == 2:
                time.sleep(0.1)  # let the pool start mid-flight
        for i, fut in enumerate(futs):
            ids, lp = fut.result(timeout=30)
            np.testing.assert_array_equal(ids, ref_ids[i])
            np.testing.assert_allclose(lp, ref_lp[i], atol=1e-4)
    finally:
        eng.close()


def test_continuous_reuses_slots():
    config, params, feats = _setup(b=8)
    eng = ContinuousBatcher(params, config, num_slots=2, chunk_steps=7)
    try:
        futs = [eng.submit(feats[i]) for i in range(8)]
        ref_ids = np.asarray(decode_lib.greedy(params, jnp.asarray(feats),
                                               config))
        for i, fut in enumerate(futs):
            ids, _ = fut.result(timeout=60)
            np.testing.assert_array_equal(ids, ref_ids[i])
    finally:
        eng.close()


def test_coalescing_merges_requests():
    config, params, feats = _setup(b=8)

    calls = []

    def decode_fn(f):
        time.sleep(0.15)  # make the device "busy" so later requests queue
        calls.append(f.shape[0])
        ids = decode_lib.greedy(params, f, config)
        lps = decode_lib.sequence_logprob(params, f, ids, config)
        return ids, lps

    eng = CoalescingBatcher(decode_fn, batch_size=4, feat_dim=16)
    try:
        futs = [eng.submit(feats[i:i + 1]) for i in range(8)]
        ref_ids = np.asarray(decode_lib.greedy(params, jnp.asarray(feats),
                                               config))
        for i, fut in enumerate(futs):
            ids, _ = fut.result(timeout=60)
            np.testing.assert_array_equal(ids[0], ref_ids[i])
        assert eng.device_calls < 8, calls  # burst of 8 coalesced
        assert eng.requests == 8
    finally:
        eng.close()


def test_masked_logprob_sum():
    from gan_image_captioning_tpu.data.vocab import END

    ids = np.array([[5, END, 7, END], [3, 4, 5, 6]])
    lps = np.array([[-1.0, -2.0, -4.0, -8.0], [-1.0, -1.0, -1.0, -1.0]])
    out = _masked_logprob_sum(ids, lps)
    np.testing.assert_allclose(out, [-3.0, -4.0])
