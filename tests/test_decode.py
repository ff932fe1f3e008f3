"""Greedy + beam-search decoding."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gan_image_captioning_tpu.config import Config
from gan_image_captioning_tpu.eval import decode as dec_lib
from gan_image_captioning_tpu.models import api
from gan_image_captioning_tpu.models.generator import start_token_features


def cfg_for(arch, **kw):
    base = dict(vocab_size=29, gen_embed_dim=12, gen_hidden_dim=24,
                gen_num_layers=2, gen_num_heads=4, max_seq_len=7,
                gen_arch=arch)
    base.update(kw)
    return Config(**base)


def _features(params, cfg, B):
    return start_token_features(
        params["decoder"] if cfg.gen_arch == "lstm"
        else {"embed": params["decoder"]["embed"]}, B)


@pytest.mark.parametrize("arch", ["lstm", "transformer"])
def test_beam_size_1_equals_greedy(arch):
    cfg = cfg_for(arch)
    params = api.init_generator(jax.random.PRNGKey(0), cfg)
    feats = jax.random.normal(jax.random.PRNGKey(1), (4, cfg.gen_embed_dim))
    greedy_ids = dec_lib.greedy(params, feats, cfg)
    beam_ids, _ = dec_lib.beam_search(params, feats, cfg, beam_size=1)
    # Identical until (and including) the first <E>; beam pads after <E>
    # while greedy keeps free-running — compare the caption prefix.
    from gan_image_captioning_tpu.eval.metrics import strip_caption

    for g, b in zip(np.asarray(greedy_ids), np.asarray(beam_ids)):
        assert strip_caption(g) == strip_caption(b)


@pytest.mark.parametrize("arch", ["lstm", "transformer"])
def test_beam_score_at_least_greedy(arch):
    """Beam-4's best hypothesis must score >= the greedy path (both measured
    by the same sequence_logprob on <E>-terminated prefixes)."""
    cfg = cfg_for(arch)
    params = api.init_generator(jax.random.PRNGKey(2), cfg)
    feats = jax.random.normal(jax.random.PRNGKey(3), (6, cfg.gen_embed_dim))
    greedy_ids = dec_lib.greedy(params, feats, cfg)
    beam_ids, beam_scores = dec_lib.beam_search(params, feats, cfg,
                                                beam_size=4)
    lp_greedy = dec_lib.sequence_logprob(params, feats, greedy_ids, cfg)
    lp_beam = dec_lib.sequence_logprob(params, feats, beam_ids, cfg)
    assert np.all(np.asarray(lp_beam) >= np.asarray(lp_greedy) - 1e-4), (
        np.asarray(lp_beam), np.asarray(lp_greedy))


def test_beam_terminates_and_pads():
    cfg = cfg_for("lstm")
    params = api.init_generator(jax.random.PRNGKey(4), cfg)
    feats = jax.random.normal(jax.random.PRNGKey(5), (3, cfg.gen_embed_dim))
    ids, scores = dec_lib.beam_search(params, feats, cfg, beam_size=3)
    assert ids.shape == (3, cfg.seq_len)
    arr = np.asarray(ids)
    from gan_image_captioning_tpu.data.vocab import END, PAD

    for row in arr:
        if END in row:
            after = row[list(row).index(END) + 1:]
            assert np.all(after == PAD)  # frozen beams pad after <E>
    assert np.all(np.isfinite(np.asarray(scores)))


def test_beam_is_jittable():
    cfg = cfg_for("transformer")
    params = api.init_generator(jax.random.PRNGKey(6), cfg)
    feats = jax.random.normal(jax.random.PRNGKey(7), (2, cfg.gen_embed_dim))
    f = jax.jit(lambda p, x: dec_lib.beam_search(p, x, cfg, beam_size=4))
    ids, scores = f(params, feats)
    ids2, scores2 = dec_lib.beam_search(params, feats, cfg, beam_size=4)
    np.testing.assert_array_equal(np.asarray(ids), np.asarray(ids2))


def test_beam_search_sharded_dp(devices8):
    """Beam search under a data-parallel mesh reproduces single-device ids."""
    from gan_image_captioning_tpu.parallel.mesh import make_mesh
    from jax.sharding import NamedSharding, PartitionSpec as P

    cfg = cfg_for("lstm")
    params = api.init_generator(jax.random.PRNGKey(0), cfg)
    feats = jax.random.normal(jax.random.PRNGKey(1), (8, cfg.gen_embed_dim))
    ids_ref, _ = dec_lib.beam_search(params, feats, cfg, beam_size=3)

    mesh = make_mesh("data:4", devices8[:4])
    feats_sh = jax.device_put(feats, NamedSharding(mesh, P("data", None)))
    params_sh = jax.tree_util.tree_map(
        lambda x: jax.device_put(x, NamedSharding(mesh, P())), params)
    ids_sh, _ = jax.jit(lambda p, f: dec_lib.beam_search(p, f, cfg,
                                                         beam_size=3))(
        params_sh, feats_sh)
    np.testing.assert_array_equal(np.asarray(ids_ref),
                                  np.asarray(jax.device_get(ids_sh)))


def test_beam_width_monotonic_quality():
    """Wider beams never find worse sequences (scores are comparable because
    ranking uses raw log-prob at length_penalty=0)."""
    cfg = cfg_for("lstm", vocab_size=17, max_seq_len=5)
    params = api.init_generator(jax.random.PRNGKey(9), cfg)
    feats = jax.random.normal(jax.random.PRNGKey(10), (6, cfg.gen_embed_dim))
    prev = None
    for k in (1, 2, 4, 8):
        _, scores = dec_lib.beam_search(params, feats, cfg, beam_size=k)
        scores = np.asarray(scores)
        if prev is not None:
            assert np.all(scores >= prev - 1e-4), (k, scores, prev)
        prev = scores
