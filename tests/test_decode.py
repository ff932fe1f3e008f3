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


# ------------------------------------------------- adaptive-length decode

def _canon(ids):
    """Void everything after each row's first <E> (the adaptive decoder's
    output convention)."""
    from gan_image_captioning_tpu.data.vocab import END, PAD

    ids = np.asarray(ids).copy()
    for row in ids:
        hits = np.flatnonzero(row == END)
        if hits.size:
            row[hits[0] + 1:] = PAD
    return ids


def _rig_end(params, boost=100.0):
    from gan_image_captioning_tpu.data.vocab import END

    b = np.asarray(params["decoder"]["linear"]["b"]).copy()
    b[END] += boost
    dec = dict(params["decoder"])
    dec["linear"] = dict(dec["linear"], b=jnp.asarray(b))
    return dict(params, decoder=dec)


def test_adaptive_matches_full_greedy():
    """greedy_with_logprobs_adaptive == greedy_with_logprobs up to each
    row's first <E> (tail <PAD>), logprobs equal — including a chunk size
    that does not divide T."""
    import jax

    from gan_image_captioning_tpu.config import Config
    from gan_image_captioning_tpu.eval import decode as decode_lib
    from gan_image_captioning_tpu.models import generator as gen_lib

    config = Config(vocab_size=64, gen_embed_dim=16, gen_hidden_dim=24,
                    gen_num_layers=2, max_seq_len=11)
    params = {"decoder": gen_lib.init_decoder_params(jax.random.PRNGKey(7),
                                                     config)}
    feats = jax.random.normal(jax.random.PRNGKey(8), (5, 16))

    want_ids, want_lp = decode_lib.greedy_with_logprobs(params, feats, config)
    for chunk in (1, 3, 8, 32):
        ids, lp = decode_lib.greedy_with_logprobs_adaptive(
            params, feats, config, chunk=chunk)
        np.testing.assert_array_equal(_canon(ids), _canon(want_ids))
        np.testing.assert_allclose(np.asarray(lp), np.asarray(want_lp),
                                   atol=1e-4, rtol=1e-4)


def test_adaptive_early_stop_rigged_end():
    """With <E> forced argmax the adaptive decode returns [<E>, <PAD>…] and
    the sequence_logprob mask semantics."""
    import jax

    from gan_image_captioning_tpu.config import Config
    from gan_image_captioning_tpu.data.vocab import END
    from gan_image_captioning_tpu.eval import decode as decode_lib
    from gan_image_captioning_tpu.models import generator as gen_lib

    config = Config(vocab_size=40, gen_embed_dim=12, gen_hidden_dim=16,
                    max_seq_len=9)
    params = _rig_end({"decoder": gen_lib.init_decoder_params(
        jax.random.PRNGKey(1), config)})
    feats = jax.random.normal(jax.random.PRNGKey(2), (3, 12))

    ids, lp = decode_lib.greedy_with_logprobs_adaptive(params, feats, config,
                                                       chunk=4)
    assert (np.asarray(ids)[:, 0] == END).all()
    np.testing.assert_array_equal(np.asarray(ids)[:, 1:], 0)
    ref = decode_lib.sequence_logprob(
        params, feats, decode_lib.greedy(params, feats, config), config)
    np.testing.assert_allclose(np.asarray(lp), np.asarray(ref), atol=1e-4)


def test_adaptive_transformer():
    """The adaptive while_loop also runs the transformer stepper (dynamic
    per-step positions inside the chunk scan)."""
    import jax

    from gan_image_captioning_tpu.config import Config
    from gan_image_captioning_tpu.eval import decode as decode_lib
    from gan_image_captioning_tpu.models import api

    config = Config(vocab_size=48, gen_embed_dim=16, gen_hidden_dim=32,
                    gen_arch="transformer", gen_num_layers=2,
                    gen_num_heads=2, max_seq_len=10)
    params = api.init_generator(jax.random.PRNGKey(4), config)
    feats = jax.random.normal(jax.random.PRNGKey(5), (4, 16))

    want_ids, want_lp = decode_lib.greedy_with_logprobs(params, feats, config)
    ids, lp = decode_lib.greedy_with_logprobs_adaptive(params, feats, config,
                                                       chunk=4)
    np.testing.assert_array_equal(_canon(ids), _canon(want_ids))
    np.testing.assert_allclose(np.asarray(lp), np.asarray(want_lp),
                               atol=1e-4, rtol=1e-4)


def test_beam_early_stop_exact_equivalence():
    """early_stop beam == full-T beam bit-exactly — finished beams only
    extend with zero-cost <PAD>, so truncating the loop changes nothing
    (checked on a rigged model where every beam ends at t=0 AND on a
    random model where beams end at staggered steps)."""
    from gan_image_captioning_tpu.config import Config
    from gan_image_captioning_tpu.eval import decode as decode_lib
    from gan_image_captioning_tpu.models import generator as gen_lib

    config = Config(vocab_size=48, gen_embed_dim=12, gen_hidden_dim=20,
                    gen_num_layers=2, max_seq_len=9)
    for seed, rig in ((3, True), (5, False)):
        params = {"decoder": gen_lib.init_decoder_params(
            jax.random.PRNGKey(seed), config)}
        if rig:
            params = _rig_end(params)
        feats = jax.random.normal(jax.random.PRNGKey(seed + 10), (4, 12))
        want = decode_lib.beam_search(params, feats, config, beam_size=3,
                                      early_stop=False)
        got = decode_lib.beam_search(params, feats, config, beam_size=3,
                                     early_stop=True)
        np.testing.assert_array_equal(np.asarray(got[0]),
                                      np.asarray(want[0]))
        np.testing.assert_allclose(np.asarray(got[1]), np.asarray(want[1]),
                                   rtol=1e-6)


# --------------------------------------------------------- diverse beam

@pytest.mark.parametrize("arch", ["lstm", "transformer"])
def test_diverse_beam_one_group_equals_vanilla(arch):
    """G=1 / strength 0 IS vanilla beam search (same selection math)."""
    cfg = cfg_for(arch)
    params = api.init_generator(jax.random.PRNGKey(3), cfg)
    feats = jax.random.normal(jax.random.PRNGKey(4), (3, cfg.gen_embed_dim))
    want_ids, want_s = dec_lib.beam_search(params, feats, cfg, beam_size=4)
    got_ids, got_s = dec_lib.diverse_beam_search(
        params, feats, cfg, beam_size=4, num_groups=1,
        diversity_strength=0.0)
    np.testing.assert_array_equal(np.asarray(want_ids),
                                  np.asarray(got_ids)[:, 0])
    np.testing.assert_allclose(np.asarray(want_s), np.asarray(got_s)[:, 0],
                               rtol=1e-5, atol=1e-6)


def test_diverse_beam_groups_diverge():
    """With a large diversity strength every group must open with a
    DIFFERENT first token (the Hamming penalty forbids same-step reuse)."""
    cfg = cfg_for("lstm")
    params = api.init_generator(jax.random.PRNGKey(5), cfg)
    feats = jax.random.normal(jax.random.PRNGKey(6), (4, cfg.gen_embed_dim))
    ids, scores = dec_lib.diverse_beam_search(
        params, feats, cfg, beam_size=4, num_groups=4,
        diversity_strength=100.0)
    ids = np.asarray(ids)                         # [B, G, T]
    assert ids.shape == (4, 4, cfg.seq_len)
    for b in range(4):
        first = ids[b, :, 0]
        assert len(set(first.tolist())) == 4, first
    assert np.isfinite(np.asarray(scores)).all()
    # invalid group split errors loudly
    with pytest.raises(ValueError):
        dec_lib.diverse_beam_search(params, feats, cfg, beam_size=4,
                                    num_groups=3)


def test_diverse_beam_scores_are_true_logprobs():
    """Reported scores must be model log-probabilities, NOT the
    diversity-penalized selection objective — rerankers downstream would
    otherwise discard every diverse candidate."""
    cfg = cfg_for("lstm")
    params = api.init_generator(jax.random.PRNGKey(5), cfg)
    feats = jax.random.normal(jax.random.PRNGKey(6), (3, cfg.gen_embed_dim))
    ids, scores = dec_lib.diverse_beam_search(
        params, feats, cfg, beam_size=4, num_groups=4,
        diversity_strength=100.0)          # huge λ: contamination obvious
    for g in range(4):
        want = dec_lib.sequence_logprob(
            params, feats, jnp.asarray(np.asarray(ids)[:, g]), cfg)
        np.testing.assert_allclose(np.asarray(scores)[:, g],
                                   np.asarray(want), rtol=1e-4, atol=1e-4)


def test_diverse_beam_jittable_and_int8():
    from gan_image_captioning_tpu.ops import quantize as q_lib

    cfg = cfg_for("lstm")
    params = api.init_generator(jax.random.PRNGKey(7), cfg)
    qparams = q_lib.quantize_generator(params, cfg)
    feats = jax.random.normal(jax.random.PRNGKey(8), (2, cfg.gen_embed_dim))
    fn = jax.jit(lambda f: dec_lib.diverse_beam_search(
        qparams, f, cfg, beam_size=4, num_groups=2))
    ids, scores = fn(feats)
    assert np.asarray(ids).shape == (2, 2, cfg.seq_len)
    assert np.isfinite(np.asarray(scores)).all()


def test_min_length_blocks_early_end():
    """min_length: no <E> before position min_length in beam, diverse beam
    and sampled decodes; the min_length=0 default path is untouched."""
    from gan_image_captioning_tpu.data.vocab import END

    cfg = cfg_for("lstm")
    params = api.init_generator(jax.random.PRNGKey(9), cfg)
    feats = jax.random.normal(jax.random.PRNGKey(10), (4, cfg.gen_embed_dim))
    m = 4
    ids_b, _ = dec_lib.beam_search(params, feats, cfg, beam_size=3,
                                   min_length=m)
    ids_d, _ = dec_lib.diverse_beam_search(params, feats, cfg, beam_size=4,
                                           num_groups=2, min_length=m)
    ids_s, _ = dec_lib.sample_decode(params, feats, cfg,
                                     jax.random.PRNGKey(11), min_length=m)
    for ids in (np.asarray(ids_b).reshape(-1, cfg.seq_len),
                np.asarray(ids_d).reshape(-1, cfg.seq_len),
                np.asarray(ids_s)):
        assert not (ids[:, :m] == END).any()


def test_beam_topk_matches_lax_top_k():
    """Iterative argmax top-k must match lax.top_k exactly, ties included
    (values descending, ties by lower index)."""
    import numpy as np

    from gan_image_captioning_tpu.eval.decode import beam_topk

    rng = np.random.default_rng(0)
    x = rng.standard_normal((5, 97)).astype(np.float32)
    # manufacture ties: duplicate values at several positions
    x[0, 10] = x[0, 50] = x[0, 3]
    x[2, :] = 1.25          # whole row tied
    x[3, 7] = x[3, 8] = x[3, 9] = x[3].max() + 1.0
    xj = jnp.asarray(x)
    for k in (1, 4, 7):
        v_ref, i_ref = jax.lax.top_k(xj, k)
        v_it, i_it = beam_topk(xj, k)
        np.testing.assert_array_equal(np.asarray(i_ref), np.asarray(i_it))
        np.testing.assert_allclose(np.asarray(v_ref), np.asarray(v_it))


def test_beam_search_identical_across_topk_impls(monkeypatch):
    """beam_search must produce identical tokens/scores with the sort and
    iterative top-k implementations."""
    import numpy as np

    from gan_image_captioning_tpu.eval.decode import beam_search
    from gan_image_captioning_tpu.models import api

    config = _config() if "_config" in globals() else None
    if config is None:
        from gan_image_captioning_tpu.config import Config
        config = Config(vocab_size=64, gen_embed_dim=16, gen_hidden_dim=16,
                        gen_num_layers=1, max_seq_len=8)
    gp = api.init_generator(jax.random.PRNGKey(0), config)
    feats = jax.random.normal(jax.random.PRNGKey(1),
                              (4, config.gen_embed_dim))
    outs = {}
    for impl in ("sort", "iter"):
        monkeypatch.setenv("GIC_BEAM_TOPK", impl)
        outs[impl] = beam_search(gp, feats, config, beam_size=4)
    np.testing.assert_array_equal(np.asarray(outs["sort"][0]),
                                  np.asarray(outs["iter"][0]))
    np.testing.assert_allclose(np.asarray(outs["sort"][1]),
                               np.asarray(outs["iter"][1]), atol=1e-6)
