"""Serve-mode decode kernel: greedy ids + per-token logprobs + carried
state, equivalent to the jnp scan path (interpret mode off-TPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gan_image_captioning_tpu.config import Config
from gan_image_captioning_tpu.eval import decode as decode_lib
from gan_image_captioning_tpu.kernels.decode_sample import decode_sample
from gan_image_captioning_tpu.models import generator as gen_lib
from gan_image_captioning_tpu.models import lstm as lstm_lib

B, T, V, H, E = 4, 8, 256, 32, 32


@pytest.fixture(autouse=True)
def _env(monkeypatch):
    monkeypatch.setenv("GIC_KERNEL_INTERPRET", "1")


def _setup():
    config = Config(vocab_size=V, gen_embed_dim=E, gen_hidden_dim=H,
                    gen_num_layers=2, max_seq_len=T - 2)
    rng = jax.random.PRNGKey(3)
    k1, k2 = jax.random.split(rng)
    gen_params = {"decoder": gen_lib.init_decoder_params(k1, config)}
    features = jax.random.normal(k2, (B, E), jnp.float32)
    return config, gen_params, features


def test_serve_matches_greedy_and_logprob():
    config, gen_params, features = _setup()
    dec = gen_params["decoder"]
    ids, lps = decode_sample(features, dec["lstm"], dec["linear"]["w"],
                             dec["linear"]["b"], dec["embed"], T,
                             mode="serve")
    ids_ref = decode_lib.greedy(gen_params, features, config, T)
    np.testing.assert_array_equal(np.asarray(ids), np.asarray(ids_ref))

    want = decode_lib.sequence_logprob(gen_params, features, ids_ref, config)
    got = decode_lib.masked_logprob_sum(ids, lps)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=1e-4, rtol=1e-4)


def test_greedy_with_logprobs_uses_kernel_path():
    config, gen_params, features = _setup()
    ids, lp = decode_lib.greedy_with_logprobs(gen_params, features, config)
    ids_ref = decode_lib.greedy(gen_params, features, config)
    lp_ref = decode_lib.sequence_logprob(gen_params, features, ids_ref,
                                         config)
    np.testing.assert_array_equal(np.asarray(ids), np.asarray(ids_ref))
    np.testing.assert_allclose(np.asarray(lp), np.asarray(lp_ref),
                               atol=1e-4, rtol=1e-4)


def test_chunked_carry_equals_full_decode():
    """K-step chunks chained through the carried (h, c, x) must reproduce
    the single full-T serve decode exactly."""
    config, gen_params, features = _setup()
    dec = gen_params["decoder"]
    full_ids, full_lps = decode_sample(
        features, dec["lstm"], dec["linear"]["w"], dec["linear"]["b"],
        dec["embed"], T, mode="serve")

    K = 4
    nl = len(dec["lstm"])
    h0, c0 = lstm_lib.zero_state(nl, B, H, features.dtype)
    state, x = (h0, c0), features
    ids_parts, lps_parts = [], []
    for _ in range(T // K):
        ids_k, lps_k, (hT, cT, xT) = decode_sample(
            x, dec["lstm"], dec["linear"]["w"], dec["linear"]["b"],
            dec["embed"], K, mode="serve",
            init_state=(state[0], state[1], x))
        ids_parts.append(np.asarray(ids_k))
        lps_parts.append(np.asarray(lps_k))
        state, x = (hT, cT), xT
    ids = np.concatenate(ids_parts, axis=1)
    lps = np.concatenate(lps_parts, axis=1)
    np.testing.assert_array_equal(ids, np.asarray(full_ids))
    np.testing.assert_allclose(lps, np.asarray(full_lps), atol=1e-4)


def test_continuous_batcher_kernel_slots_match_batch_greedy():
    """Slot-based continuous batching over the serve kernel must produce
    ids identical to the one-shot batch greedy decode."""
    from gan_image_captioning_tpu.serving import ContinuousBatcher

    config, gen_params, features = _setup()
    assert decode_lib.kernel_serve_available(config)
    cb = ContinuousBatcher(gen_params, config, num_slots=4, chunk_steps=3)
    try:
        futs = [cb.submit(np.asarray(features[i])) for i in range(B)]
        got = np.stack([f.result(timeout=60)[0] for f in futs])
    finally:
        cb.close()
    want = np.asarray(decode_lib.greedy(gen_params, features, config))
    np.testing.assert_array_equal(got, want)


def test_transformer_continuous_batcher_matches_batch_greedy():
    """Transformer slots (per-slot KV positions) must match the one-shot
    batch greedy decode — slots join mid-flight at chunk boundaries."""
    from gan_image_captioning_tpu.serving import ContinuousBatcher

    config = Config(vocab_size=V, gen_embed_dim=32, gen_hidden_dim=64,
                    gen_num_layers=2, gen_num_heads=4, max_seq_len=T - 2,
                    gen_arch="transformer")
    rng = jax.random.PRNGKey(9)
    k1, k2 = jax.random.split(rng)
    from gan_image_captioning_tpu.models import transformer as tf_lib

    gen_params = tf_lib.init_transformer_generator_params(k1, config)
    features = jax.random.normal(k2, (5, 32), jnp.float32)

    cb = ContinuousBatcher(gen_params, config, num_slots=3, chunk_steps=3)
    try:
        futs = [cb.submit(np.asarray(features[i])) for i in range(5)]
        got = np.stack([f.result(timeout=120)[0] for f in futs])
    finally:
        cb.close()
    want = np.asarray(decode_lib.greedy(gen_params, features, config))
    np.testing.assert_array_equal(got, want)


def test_adaptive_uses_kernel_chunks():
    """greedy_with_logprobs_adaptive's while_loop body is the serve-mode
    pallas_call (chunked, carried (h, c, x)) — identical ids/logprobs to
    the full-T kernel program up to the first <E>."""
    config, gen_params, features = _setup()
    want_ids, want_lp = decode_lib.greedy_with_logprobs(gen_params, features,
                                                        config, T)

    ids, lp = decode_lib.greedy_with_logprobs_adaptive(
        gen_params, features, config, seq_len=T, chunk=3)

    from gan_image_captioning_tpu.data.vocab import END, PAD
    w = np.asarray(want_ids).copy()
    for row in w:
        hits = np.flatnonzero(row == END)
        if hits.size:
            row[hits[0] + 1:] = PAD
    g = np.asarray(ids)
    np.testing.assert_array_equal(g, w)
    np.testing.assert_allclose(np.asarray(lp), np.asarray(want_lp),
                               atol=1e-4, rtol=1e-4)
