"""Speculative greedy decoding: lossless by construction — ids must equal
the target's plain greedy decode for ANY draft, any block size."""

import os
import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from gan_image_captioning_tpu.config import Config
from gan_image_captioning_tpu.eval import decode as decode_lib
from gan_image_captioning_tpu.eval.speculative import speculative_greedy
from gan_image_captioning_tpu.models import api
from gan_image_captioning_tpu.models.generator import start_token_features
from gan_image_captioning_tpu.ops.quantize import quantize_generator


def _cfg(**kw):
    base = dict(vocab_size=35, gen_embed_dim=10, gen_hidden_dim=14,
                gen_num_layers=2, max_seq_len=10, conditional_gan=0)
    base.update(kw)
    return Config(**base)


def _stepper_greedy_ref(params, feats, cfg):
    stepper = decode_lib.lstm_stepper(params["decoder"], cfg)
    return decode_lib._stepper_greedy(stepper, feats, cfg.seq_len)


@pytest.mark.parametrize("draft_len", [1, 3, 4, 8])
def test_int8_draft_matches_greedy(draft_len):
    cfg = _cfg()
    params = api.init_generator(jax.random.PRNGKey(0), cfg)
    draft = quantize_generator(params, cfg)
    feats = start_token_features(params["decoder"], 6)
    want = np.asarray(_stepper_greedy_ref(params, feats, cfg))
    got = np.asarray(jax.jit(
        lambda p, d, f: speculative_greedy(p, d, f, cfg,
                                           draft_len=draft_len))(
        params, draft, feats))
    np.testing.assert_array_equal(got, want)


def test_garbage_draft_still_exact():
    """Worst case: the draft is an unrelated random model — every block
    degenerates to one corrected token, output still exact."""
    cfg = _cfg()
    params = api.init_generator(jax.random.PRNGKey(1), cfg)
    garbage = api.init_generator(jax.random.PRNGKey(999), cfg)
    feats = start_token_features(params["decoder"], 5)
    want = np.asarray(_stepper_greedy_ref(params, feats, cfg))
    got = np.asarray(speculative_greedy(params, garbage, feats, cfg,
                                        draft_len=4))
    np.testing.assert_array_equal(got, want)


def test_self_draft_one_block_per_sweep():
    """Draft == target accepts everything: K+1 tokens per block."""
    cfg = _cfg()
    params = api.init_generator(jax.random.PRNGKey(2), cfg)
    feats = start_token_features(params["decoder"], 4)
    want = np.asarray(_stepper_greedy_ref(params, feats, cfg))
    got = np.asarray(speculative_greedy(params, params, feats, cfg,
                                        draft_len=5))
    np.testing.assert_array_equal(got, want)


def test_draft_len_exceeds_seq_len():
    cfg = _cfg(max_seq_len=4)  # T = 6
    params = api.init_generator(jax.random.PRNGKey(3), cfg)
    draft = quantize_generator(params, cfg)
    feats = start_token_features(params["decoder"], 3)
    want = np.asarray(_stepper_greedy_ref(params, feats, cfg))
    got = np.asarray(speculative_greedy(params, draft, feats, cfg,
                                        draft_len=9))
    np.testing.assert_array_equal(got, want)


def test_matches_production_greedy():
    """speculative == decode_lib.greedy (the generator_sample scan), not
    just the stepper formulation."""
    cfg = _cfg()
    params = api.init_generator(jax.random.PRNGKey(4), cfg)
    draft = quantize_generator(params, cfg)
    feats = start_token_features(params["decoder"], 6)
    want = np.asarray(decode_lib.greedy(params, feats, cfg))
    got = np.asarray(speculative_greedy(params, draft, feats, cfg,
                                        draft_len=4))
    np.testing.assert_array_equal(got, want)


def test_rejects_non_lstm_target():
    cfg = _cfg(gen_arch="transformer", gen_num_heads=2, gen_num_layers=2,
               gen_embed_dim=16, gen_hidden_dim=32)
    params = api.init_generator(jax.random.PRNGKey(5), cfg)
    with pytest.raises(ValueError, match="LSTM"):
        speculative_greedy(params, params,
                           jnp.zeros((2, 16), jnp.float32), cfg)


def test_early_stop_canonical_equality():
    """early_stop=True returns the same caption (through the first <E>)
    with a <PAD>-dominated tail; default stays full-T bit-exact."""
    import numpy as np

    from gan_image_captioning_tpu.data.vocab import END, PAD

    config = _cfg()
    gen_params = api.init_generator(jax.random.PRNGKey(0), config)
    draft = quantize_generator(gen_params, config)
    feats = start_token_features(gen_params["decoder"], 6)

    full = np.asarray(speculative_greedy(gen_params, draft, feats, config,
                                         draft_len=3))
    early = np.asarray(speculative_greedy(gen_params, draft, feats, config,
                                          draft_len=3, early_stop=True))

    for f, e in zip(full, early):
        hits = np.flatnonzero(f == END)
        if hits.size:
            cut = hits[0] + 1
            np.testing.assert_array_equal(e[:cut], f[:cut])
            # tail: the ending block may carry a few exact-greedy tokens,
            # everything past it is <PAD>
            blk_end = min(cut + 3, len(f))  # ≤ K more tokens from the block
            np.testing.assert_array_equal(e[blk_end:], PAD)
        else:
            np.testing.assert_array_equal(e, f)
