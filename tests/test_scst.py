"""Self-critical sequence training: rewards, programs, instructor phase."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gan_image_captioning_tpu.config import Config
from gan_image_captioning_tpu.data.synthetic import SyntheticCaptions
from gan_image_captioning_tpu.eval.bleu import corpus_bleu, sentence_bleu
from gan_image_captioning_tpu.eval.cider import CiderScorer, cider_d


def test_sentence_bleu_bounds():
    refs = [[3, 4, 5, 6, 7]]
    assert sentence_bleu([3, 4, 5, 6, 7], refs) == pytest.approx(1.0)
    assert sentence_bleu([], refs) == 0.0
    assert sentence_bleu([9, 9, 9, 9, 9], refs) == 0.0  # no unigram match
    partial = sentence_bleu([3, 4, 9, 6, 7], refs)
    assert 0.0 < partial < 1.0
    # smoothing: a short candidate with only low-order matches still scores
    assert sentence_bleu([3, 4], refs) > 0.0


def test_sentence_bleu_orders_candidates():
    """More n-gram overlap → higher reward (the property SCST needs)."""
    refs = [[3, 4, 5, 6, 7, 8]]
    worse = sentence_bleu([3, 9, 5, 9, 7, 9], refs)
    better = sentence_bleu([3, 4, 5, 9, 7, 8], refs)
    assert better > worse


def test_cider_scorer_matches_corpus_cider():
    """CiderScorer fit over a corpus reproduces cider_d as the mean of the
    per-image scores (same idf, same per-image formula)."""
    refs = [[[3, 4, 5, 6]], [[3, 7, 8, 9, 10]], [[11, 12, 4, 3]]]
    cands = [[3, 4, 5, 6], [3, 7, 9, 10], [11, 12, 3]]
    scorer = CiderScorer(refs)
    per_img = [scorer.score(c, r) for c, r in zip(cands, refs)]
    assert np.mean(per_img) == pytest.approx(cider_d(cands, refs))
    # identical candidate scores strictly higher than a perturbed one
    assert scorer.score([3, 4, 5, 6], refs[0]) > scorer.score(
        [3, 4, 5, 9], refs[0])


def _cfg(tmp, **kw):
    ds = SyntheticCaptions("train", num_items=32)
    base = dict(vocab_size=ds.vocab_size, gen_embed_dim=12, gen_hidden_dim=16,
                max_seq_len=9, disc_embed_dim=8, disc_num_rep=4,
                disc_filter_sizes=(2, 3), disc_num_filters=(6, 6),
                pre_train_batch_size=8, pre_eval_batch_size=8,
                adv_train_batch_size=8, adv_eval_batch_size=8,
                pretrain_epochs=1, adv_epochs=0, num_workers=1,
                save_dir=os.path.join(tmp, "save"),
                model_dir=os.path.join(tmp, "save", "models"),
                log_file=os.path.join(tmp, "save", "log"))
    base.update(kw)
    return Config(**base)


def test_zero_advantage_is_a_no_op():
    """advantage == 0 → zero gradients → Adam moves nothing (wiring is
    exactly REINFORCE, no stray loss terms)."""
    from gan_image_captioning_tpu.models import api
    from gan_image_captioning_tpu.train.scst import make_scst_programs
    from gan_image_captioning_tpu.train.state import create_train_state

    cfg = _cfg("/tmp")
    state = create_train_state(cfg, jax.random.PRNGKey(0))
    T = cfg.seq_len
    batch = {"captions": jnp.zeros((4, T), jnp.int32).at[:, 0].set(1),
             "weights": jnp.ones((4,), jnp.float32)}
    rollout, update, _ = make_scst_programs(cfg)
    sampled, greedy = rollout(state.gen_params, batch, jax.random.PRNGKey(1))
    assert sampled.shape == greedy.shape == (4, T)
    new_state, loss = update(state, batch, sampled,
                             jnp.zeros((4,), jnp.float32),
                             jax.random.PRNGKey(2))
    assert float(loss) == 0.0
    leaves0 = jax.tree_util.tree_leaves(state.gen_params)
    leaves1 = jax.tree_util.tree_leaves(new_state.gen_params)
    for a, b in zip(leaves0, leaves1):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    assert int(new_state.gen_steps) == int(state.gen_steps) + 1


def test_positive_advantage_moves_params():
    from gan_image_captioning_tpu.train.scst import make_scst_programs
    from gan_image_captioning_tpu.train.state import create_train_state

    cfg = _cfg("/tmp")
    state = create_train_state(cfg, jax.random.PRNGKey(0))
    T = cfg.seq_len
    batch = {"captions": jnp.zeros((4, T), jnp.int32).at[:, 0].set(1),
             "weights": jnp.ones((4,), jnp.float32)}
    rollout, update, _ = make_scst_programs(cfg)
    sampled, _ = rollout(state.gen_params, batch, jax.random.PRNGKey(1))
    new_state, _ = update(state, batch, sampled,
                          jnp.ones((4,), jnp.float32), jax.random.PRNGKey(2))
    changed = any(
        not np.array_equal(np.asarray(a), np.asarray(b))
        for a, b in zip(jax.tree_util.tree_leaves(state.gen_params),
                        jax.tree_util.tree_leaves(new_state.gen_params)))
    assert changed


@pytest.mark.slow
def test_scst_phase_end_to_end(tmp_path):
    """--scst-epochs runs between MLE and adversarial: finite losses,
    scst_model.ckpt written, reward logged."""
    from gan_image_captioning_tpu.train.instructor import GANInstructor

    cfg = _cfg(str(tmp_path), pretrain_epochs=2, scst_epochs=2,
               scst_reward="cider")
    train = SyntheticCaptions("train", num_items=32)
    val = SyntheticCaptions("val", num_items=16)
    inst = GANInstructor(cfg, train, val, silent=True)
    inst._run()
    assert os.path.isdir(os.path.join(cfg.model_dir, "scst_model.ckpt"))


def test_scst_bleu_reward_phase(tmp_path):
    from gan_image_captioning_tpu.train.instructor import GANInstructor

    cfg = _cfg(str(tmp_path), pretrain_epochs=1, scst_epochs=1,
               scst_reward="bleu", scst_lr=1e-4)
    train = SyntheticCaptions("train", num_items=16)
    val = SyntheticCaptions("val", num_items=8)
    inst = GANInstructor(cfg, train, val, silent=True)
    inst._run()
    assert os.path.isdir(os.path.join(cfg.model_dir, "scst_model.ckpt"))


def test_batch_index_maps_rows():
    """Batches carry the dataset row per batch row; pad rows repeat row 0
    with zero weight (shuffled epochs stay consistent)."""
    from gan_image_captioning_tpu.data.loader import Batcher

    ds = SyntheticCaptions("train", num_items=10)
    loader = Batcher(ds, batch_size=4, seq_len=9, shuffle=True, seed=3,
                     num_workers=1)
    seen = []
    for batch in loader:
        assert batch["index"].shape == (4,)
        for j in range(4):
            if batch["weights"][j] == 0:
                continue
            want, _ = ds.sample(int(batch["index"][j]))
            got = batch["captions"][j]
            np.testing.assert_array_equal(got[1: 1 + len(want)], want)
            seen.append(int(batch["index"][j]))
    assert sorted(seen) == list(range(10))


def test_multi_ref_row_references_mini_coco():
    """--scst-multi-ref groups references by image: on mini-COCO (5
    captions per image) every row's reference set has all 5 captions."""
    from gan_image_captioning_tpu.data.coco import CocoCaptions
    from gan_image_captioning_tpu.train.scst import build_row_references

    root = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "data", "mini_coco")
    cj = os.path.join(root, "dataset_coco.json")
    ds = CocoCaptions(cj, root, "train", 48, captions_per_image=5,
                      conditional=False)
    single = build_row_references(ds, multi_ref=False)
    multi = build_row_references(ds, multi_ref=True)
    assert all(len(r) == 1 for r in single)
    assert all(len(r) == 5 for r in multi)
    # the row's own caption is inside its image's set
    for i in range(0, len(ds), 7):
        assert single[i][0] in multi[i]


def test_scst_multi_ref_phase(tmp_path):
    """--scst-multi-ref end-to-end on the synthetic set (1 caption per
    image — multi-ref degenerates to single-ref, the phase must run)."""
    from gan_image_captioning_tpu.train.instructor import GANInstructor

    cfg = _cfg(str(tmp_path), pretrain_epochs=1, scst_epochs=1,
               scst_multi_ref=True, scst_lr=1e-4)
    train = SyntheticCaptions("train", num_items=16)
    val = SyntheticCaptions("val", num_items=8)
    inst = GANInstructor(cfg, train, val, silent=True)
    inst._run()
    assert os.path.isdir(os.path.join(cfg.model_dir, "scst_model.ckpt"))


def test_scst_under_data_mesh(tmp_path):
    """--scst-epochs under --mesh data:8: the phase runs GSPMD-sharded and
    reports the same val reward as the single-device run (deterministic
    rollout keys, same batch order)."""
    import json

    from gan_image_captioning_tpu.train.instructor import GANInstructor

    rewards = {}
    for tag, mesh in (("single", ""), ("dp", "data:8")):
        cfg = _cfg(os.path.join(str(tmp_path), tag), pretrain_epochs=1,
                   scst_epochs=1, scst_lr=1e-4, mesh=mesh,
                   pre_train_batch_size=8, pre_eval_batch_size=8)
        train = SyntheticCaptions("train", num_items=32)
        val = SyntheticCaptions("val", num_items=16)
        inst = GANInstructor(cfg, train, val, silent=True)
        inst._run()
        with open(os.path.join(cfg.save_dir, "metrics.jsonl")) as f:
            vals = [json.loads(l) for l in f if "SCST_val_reward" in l]
        assert vals, "no SCST val reward logged"
        rewards[tag] = vals[-1]["value"]
    assert abs(rewards["single"] - rewards["dp"]) < 1e-4, rewards


def test_scst_transformer_generator(tmp_path):
    """SCST's rollout/rescore run through the transformer stepper too."""
    from gan_image_captioning_tpu.train.instructor import GANInstructor

    cfg = _cfg(str(tmp_path), pretrain_epochs=1, scst_epochs=1,
               scst_lr=1e-4, gen_arch="transformer", gen_num_heads=2,
               gen_embed_dim=16, gen_hidden_dim=32)
    train = SyntheticCaptions("train", num_items=16)
    val = SyntheticCaptions("val", num_items=8)
    inst = GANInstructor(cfg, train, val, silent=True)
    inst._run()
    assert os.path.isdir(os.path.join(cfg.model_dir, "scst_model.ckpt"))
