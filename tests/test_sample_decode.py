"""Stochastic decoding: temperature / top-k / nucleus sampling
(eval/decode.py:filter_logits, sample_decode) — the inference-time
counterpart of the training-time Gumbel-max sample (generator.py:68-73)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gan_image_captioning_tpu.config import Config
from gan_image_captioning_tpu.data.synthetic import SyntheticCaptions
from gan_image_captioning_tpu.eval import decode as decode_lib
from gan_image_captioning_tpu.models import api


def _cfg(**kw):
    ds = SyntheticCaptions("train", num_items=16)
    base = dict(vocab_size=ds.vocab_size, gen_embed_dim=8, gen_hidden_dim=12,
                max_seq_len=8, conditional_gan=0)
    base.update(kw)
    return Config(**base)


def _features(cfg, params, n=6):
    caps = np.full((n, cfg.seq_len), 3, np.int32)
    batch = {"captions": jnp.asarray(caps),
             "weights": jnp.ones((n,), jnp.float32)}
    cond, _ = api.generator_condition(cfg, params, batch, train=False)
    return cond


# -------------------------------------------------------------- filter_logits

def test_filter_top_k_keeps_exactly_k():
    rng = np.random.RandomState(0)
    logits = jnp.asarray(rng.randn(5, 32), jnp.float32)
    out = decode_lib.filter_logits(logits, top_k=4)
    kept = np.asarray(out) > decode_lib.NEG_INF / 2
    np.testing.assert_array_equal(kept.sum(axis=1), 4)
    # the kept ones are the 4 largest
    for row_in, row_kept in zip(np.asarray(logits), kept):
        top4 = set(np.argsort(row_in)[-4:])
        assert set(np.where(row_kept)[0]) == top4


def test_filter_top_p_minimal_prefix():
    rng = np.random.RandomState(1)
    logits = jnp.asarray(rng.randn(8, 64) * 3, jnp.float32)
    p = 0.7
    out = np.asarray(decode_lib.filter_logits(logits, top_p=p))
    probs = np.asarray(jax.nn.softmax(logits, axis=-1))
    for row_p, row_out in zip(probs, out):
        kept = row_out > decode_lib.NEG_INF / 2
        assert kept.sum() >= 1
        mass = row_p[kept].sum()
        assert mass >= p - 1e-5                      # reaches the nucleus
        if kept.sum() > 1:                           # minimal: drop smallest
            smallest = np.where(kept)[0][np.argmin(row_p[kept])]
            assert mass - row_p[smallest] < p


def test_filter_top_p_one_is_identity_and_temperature_scales():
    logits = jnp.asarray([[1.0, 2.0, 3.0]])
    np.testing.assert_allclose(
        np.asarray(decode_lib.filter_logits(logits)), np.asarray(logits))
    half = decode_lib.filter_logits(logits, temperature=0.5)
    np.testing.assert_allclose(np.asarray(half), np.asarray(logits) * 2.0,
                               rtol=1e-6)


# -------------------------------------------------------------- sample_decode

@pytest.mark.parametrize("arch", ["lstm", "transformer"])
def test_top_k_one_is_greedy(arch):
    cfg = _cfg(gen_arch=arch)
    params = api.init_generator(jax.random.PRNGKey(0), cfg)
    cond = _features(cfg, params)
    ids, _ = decode_lib.sample_decode(params, cond["features"], cfg,
                                      jax.random.PRNGKey(7),
                                      context=cond["context"], top_k=1)
    greedy_ids = decode_lib.greedy(params, cond["features"], cfg,
                                   context=cond["context"])
    np.testing.assert_array_equal(np.asarray(ids), np.asarray(greedy_ids))


def test_sample_deterministic_per_key_and_varies_across_keys():
    cfg = _cfg()
    params = api.init_generator(jax.random.PRNGKey(1), cfg)
    cond = _features(cfg, params, n=8)
    a1, _ = decode_lib.sample_decode(params, cond["features"], cfg,
                                     jax.random.PRNGKey(3))
    a2, _ = decode_lib.sample_decode(params, cond["features"], cfg,
                                     jax.random.PRNGKey(3))
    b, _ = decode_lib.sample_decode(params, cond["features"], cfg,
                                    jax.random.PRNGKey(4))
    np.testing.assert_array_equal(np.asarray(a1), np.asarray(a2))
    assert not np.array_equal(np.asarray(a1), np.asarray(b))
    assert np.asarray(a1).min() >= 0 and np.asarray(a1).max() < cfg.vocab_size


def test_reported_logprob_matches_sequence_logprob():
    """The in-scan per-token logprobs must agree with an independent
    teacher-forced rescore of the sampled ids."""
    cfg = _cfg()
    params = api.init_generator(jax.random.PRNGKey(2), cfg)
    cond = _features(cfg, params, n=5)
    ids, lps = decode_lib.sample_decode(params, cond["features"], cfg,
                                        jax.random.PRNGKey(11),
                                        temperature=1.3, top_k=6)
    rescored = decode_lib.sequence_logprob(params, cond["features"], ids, cfg)
    np.testing.assert_allclose(np.asarray(lps), np.asarray(rescored),
                               rtol=1e-4, atol=1e-5)


def test_sample_decode_jits():
    cfg = _cfg()
    params = api.init_generator(jax.random.PRNGKey(5), cfg)
    cond = _features(cfg, params, n=4)
    fn = jax.jit(lambda p, f, k: decode_lib.sample_decode(
        p, f, cfg, k, temperature=0.8, top_k=10, top_p=0.9))
    ids, lps = fn(params, cond["features"], jax.random.PRNGKey(0))
    assert ids.shape == (4, cfg.seq_len) and lps.shape == (4,)


def test_sample_early_stop_prefix_identical():
    """early_stop=True draws the SAME tokens through each row's first <E>
    (positional key chain) and pads the discarded tail; logprobs equal."""
    import numpy as np

    from gan_image_captioning_tpu.data.vocab import END, PAD

    cfg = _cfg()
    params = api.init_generator(jax.random.PRNGKey(0), cfg)
    from gan_image_captioning_tpu.models.generator import (
        start_token_features)

    feats = start_token_features(params["decoder"], 8)
    key = jax.random.PRNGKey(42)

    full_ids, full_lp = decode_lib.sample_decode(params, feats, cfg, key,
                                              temperature=1.2)
    es_ids, es_lp = decode_lib.sample_decode(params, feats, cfg, key,
                                          temperature=1.2, early_stop=True)
    full_ids, es_ids = np.asarray(full_ids), np.asarray(es_ids)
    for f, e in zip(full_ids, es_ids):
        hits = np.flatnonzero(f == END)
        if hits.size:
            cut = hits[0] + 1
            np.testing.assert_array_equal(e[:cut], f[:cut])
            np.testing.assert_array_equal(e[cut:], PAD)
        else:
            np.testing.assert_array_equal(e, f)
    np.testing.assert_allclose(np.asarray(es_lp), np.asarray(full_lp),
                               atol=1e-5)


def test_no_repeat_bigram_property():
    """no_repeat_ngram=2: no emitted caption contains the same bigram
    twice (checked up to and including the first <E>)."""
    from gan_image_captioning_tpu.data.vocab import END

    cfg = _cfg()
    params = api.init_generator(jax.random.PRNGKey(11), cfg)
    feats = jax.random.normal(jax.random.PRNGKey(12), (6, cfg.gen_embed_dim))
    ids, lp = decode_lib.sample_decode(params, feats, cfg,
                                       jax.random.PRNGKey(13),
                                       temperature=1.5, no_repeat_ngram=2)
    assert np.isfinite(np.asarray(lp)).all()
    for row in np.asarray(ids):
        toks = list(row)
        if END in toks:
            toks = toks[: toks.index(END) + 1]
        bigrams = list(zip(toks, toks[1:]))
        assert len(bigrams) == len(set(bigrams)), toks


def test_repetition_penalty_blocks_token_reuse():
    """A huge CTRL penalty with top_k=1 (penalized greedy) forbids any
    token from repeating within a caption (V > T here)."""
    from gan_image_captioning_tpu.data.vocab import END

    cfg = _cfg()
    params = api.init_generator(jax.random.PRNGKey(14), cfg)
    feats = jax.random.normal(jax.random.PRNGKey(15), (5, cfg.gen_embed_dim))
    ids, _ = decode_lib.sample_decode(params, feats, cfg,
                                      jax.random.PRNGKey(16), top_k=1,
                                      repetition_penalty=1e9)
    for row in np.asarray(ids):
        toks = list(row)
        if END in toks:
            toks = toks[: toks.index(END) + 1]
        assert len(toks) == len(set(toks)), toks
    # invalid n errors loudly
    import pytest as _pytest

    with _pytest.raises(ValueError):
        decode_lib.sample_decode(params, feats, cfg, jax.random.PRNGKey(0),
                                 no_repeat_ngram=4)


def test_trigram_ban_property():
    from gan_image_captioning_tpu.data.vocab import END

    cfg = _cfg(max_seq_len=12)
    params = api.init_generator(jax.random.PRNGKey(17), cfg)
    feats = jax.random.normal(jax.random.PRNGKey(18), (4, cfg.gen_embed_dim))
    ids, _ = decode_lib.sample_decode(params, feats, cfg,
                                      jax.random.PRNGKey(19), top_k=1,
                                      no_repeat_ngram=3)
    for row in np.asarray(ids):
        toks = list(row)
        if END in toks:
            toks = toks[: toks.index(END) + 1]
        tris = list(zip(toks, toks[1:], toks[2:]))
        assert len(tris) == len(set(tris)), toks
