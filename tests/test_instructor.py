"""Instructor engine: schedule, checkpoints, resume continuity."""

import os

import jax
import numpy as np
import pytest

from gan_image_captioning_tpu.config import Config
from gan_image_captioning_tpu.data.synthetic import SyntheticCaptions
from gan_image_captioning_tpu.train.instructor import GANInstructor


def _config(tmp, **kw):
    ds = SyntheticCaptions("train", num_items=32)
    base = dict(vocab_size=ds.vocab_size, gen_embed_dim=12, gen_hidden_dim=16,
                max_seq_len=9, disc_embed_dim=8, disc_num_rep=4,
                disc_filter_sizes=(2, 3), disc_num_filters=(6, 6),
                pre_train_batch_size=8, pre_eval_batch_size=8,
                adv_train_batch_size=8, adv_eval_batch_size=8,
                pretrain_epochs=1, adv_epochs=2, num_workers=1,
                save_dir=os.path.join(tmp, "save"),
                model_dir=os.path.join(tmp, "save", "models"),
                log_file=os.path.join(tmp, "save", "log"))
    base.update(kw)
    return Config(**base)


@pytest.fixture()
def datasets():
    return (SyntheticCaptions("train", num_items=32),
            SyntheticCaptions("val", num_items=16))


def test_run_schedule_and_checkpoints(tmp_path, datasets):
    cfg = _config(str(tmp_path), checkpoint_every=1)
    inst = GANInstructor(cfg, *datasets, silent=True)
    inst._run()
    assert os.path.isdir(os.path.join(cfg.model_dir, "pretrained_model.ckpt"))
    assert os.path.isdir(os.path.join(cfg.model_dir, "adv_model.ckpt"))
    assert os.path.isdir(os.path.join(cfg.model_dir, "state_0.ckpt"))
    # counters advanced: 1 pretrain epoch × 4 batches; 2 adv epochs × 4
    assert inst.pretrain_steps == 4
    assert int(inst.state.gen_steps) == 8
    # temperature followed the exp ramp to max at the final epoch
    assert float(inst.state.temperature) == pytest.approx(
        cfg.temperature ** (2 / 2), rel=1e-3)


def test_resume_continues_counters(tmp_path, datasets):
    """Snapshot resume with the schedule sidecar: the resumed run skips the
    completed pretrain phase and adv epoch automatically (no hand-edited
    --pretrain-epochs 0) and continues at adv epoch 1."""
    cfg = _config(str(tmp_path), checkpoint_every=1, adv_epochs=1)
    inst = GANInstructor(cfg, *datasets, silent=True)
    inst._run()
    ckpt = os.path.join(cfg.model_dir, "state_0.ckpt")

    # same pretrain_epochs as the original: the sidecar (phase=adv) skips it
    cfg2 = _config(str(tmp_path) + "_resumed", resume=ckpt, adv_epochs=2)
    inst2 = GANInstructor(cfg2, *datasets, silent=True)
    # counters restored from the checkpointed step (state_0 saved AFTER
    # adv epoch 0); host mirrors restored from the sidecar
    start_steps = int(inst2.state.gen_steps)
    assert start_steps == int(inst.state.gen_steps)
    assert inst2.pretrain_steps == inst.pretrain_steps
    inst2._run()
    # one more adv epoch (epoch 1 of 2) = 4 batches, pretrain untouched
    assert int(inst2.state.gen_steps) == start_steps + 4
    assert inst2.pretrain_steps == inst.pretrain_steps


def test_resume_schedule_opt_out(tmp_path, datasets):
    """--resume-schedule 0: params-only resume (the pre-sidecar behavior —
    the schedule replays from the start under the user's flags)."""
    cfg = _config(str(tmp_path), checkpoint_every=1, adv_epochs=1)
    inst = GANInstructor(cfg, *datasets, silent=True)
    inst._run()
    ckpt = os.path.join(cfg.model_dir, "state_0.ckpt")

    cfg2 = _config(str(tmp_path) + "_r0", resume=ckpt, resume_schedule=0,
                   pretrain_epochs=0, adv_epochs=1)
    inst2 = GANInstructor(cfg2, *datasets, silent=True)
    assert inst2._schedule is None
    start_steps = int(inst2.state.gen_steps)
    inst2._run()
    assert int(inst2.state.gen_steps) == start_steps + 4


def test_eval_quality_hook(tmp_path, datasets):
    cfg = _config(str(tmp_path), adv_epochs=1, eval_bleu_every=1)
    inst = GANInstructor(cfg, *datasets, silent=True)
    inst._run()
    q = inst.evaluate_quality(max_batches=1)
    assert np.isfinite(q["nll_gen"]) and 0.0 <= q["bleu4"] <= 1.0


def test_cached_features_run(tmp_path):
    """--cache-features: frozen backbone runs once per image; training then
    feeds [B, 512] feature batches through the trainable head only."""
    train = SyntheticCaptions("train", num_items=16, image_size=32,
                              conditional=True)
    val = SyntheticCaptions("val", num_items=8, image_size=32,
                            conditional=True)
    cfg = _config(str(tmp_path), conditional_gan=1, image_size=32,
                  cache_features=1, pretrain_epochs=1, adv_epochs=1)
    inst = GANInstructor(cfg, train, val, silent=True)
    from gan_image_captioning_tpu.data.feature_cache import CachedFeatureDataset

    assert isinstance(inst.train_dataset, CachedFeatureDataset)
    assert inst.train_dataset.features.shape == (16, 512)
    batch = next(iter(inst.pre_train_loader))
    assert "backbone_feats" in batch and "images" not in batch
    inst._run()
    assert os.path.isdir(os.path.join(cfg.model_dir, "adv_model.ckpt"))


def test_training_is_deterministic(tmp_path, datasets):
    """Same seed → identical parameter trajectory (the reference pins seed
    1008 'for reproducibility', main.py:14-23)."""
    import jax

    cfg_a = _config(str(tmp_path) + "_a", adv_epochs=1)
    cfg_b = _config(str(tmp_path) + "_b", adv_epochs=1)
    ia = GANInstructor(cfg_a, *datasets, silent=True)
    ib = GANInstructor(cfg_b, *datasets, silent=True)
    ia._run()
    ib._run()
    for la, lb in zip(jax.tree_util.tree_leaves(ia.state.gen_params),
                      jax.tree_util.tree_leaves(ib.state.gen_params)):
        np.testing.assert_array_equal(np.asarray(la), np.asarray(lb))


def test_interrupt_checkpoints_and_stops(tmp_path, datasets):
    """A SIGTERM-style interrupt saves a resumable TrainState at the next
    epoch boundary and stops cleanly."""
    cfg = _config(str(tmp_path), pretrain_epochs=3, adv_epochs=3)
    inst = GANInstructor(cfg, *datasets, silent=True)
    inst._request_interrupt()  # what the signal handler does
    inst._run()
    ckpt = os.path.join(cfg.model_dir, "interrupt_state.ckpt")
    assert os.path.isdir(ckpt)
    # nothing trained (interrupt hit before the first epoch)
    assert inst.pretrain_steps == 0 and int(inst.state.gen_steps) == 0
    # and the checkpoint resumes
    cfg2 = _config(str(tmp_path) + "_r", resume=ckpt, pretrain_epochs=0,
                   adv_epochs=1)
    inst2 = GANInstructor(cfg2, *datasets, silent=True)
    inst2._run()
    assert int(inst2.state.gen_steps) == 4


def test_checkpoint_retention(tmp_path, datasets):
    """--keep-checkpoints N prunes periodic state snapshots (per phase,
    newest N kept); best-val files are untouched and the newest snapshot
    still resumes."""
    from gan_image_captioning_tpu.train import checkpoint as ckpt_lib
    from gan_image_captioning_tpu.train.state import create_train_state

    cfg = _config(str(tmp_path), pretrain_epochs=4, adv_epochs=5,
                  checkpoint_every=1, keep_checkpoints=2)
    inst = GANInstructor(cfg, *datasets, silent=True)
    inst._run()
    ckpt_lib.wait_for_checkpoints()
    names = sorted(os.listdir(cfg.model_dir))
    # each surviving snapshot keeps exactly its ckpt dir + schedule sidecar;
    # pruned snapshots lose both (train/schedule.py)
    assert [n for n in names if n.startswith("state_pre_")] == [
        "state_pre_2.ckpt", "state_pre_2.ckpt.schedule.json",
        "state_pre_3.ckpt", "state_pre_3.ckpt.schedule.json"]
    assert [n for n in names if n.startswith("state_")
            and not n.startswith("state_pre_")] == [
        "state_3.ckpt", "state_3.ckpt.schedule.json",
        "state_4.ckpt", "state_4.ckpt.schedule.json"]
    assert "pretrained_model.ckpt" in names and "adv_model.ckpt" in names
    # the newest adv snapshot is loadable (retention never corrupts)
    template = create_train_state(cfg, jax.random.PRNGKey(0))
    st = ckpt_lib.load_state(os.path.join(cfg.model_dir, "state_4.ckpt"),
                             template)
    assert int(st.gen_steps) > 0


def test_prune_checkpoints_unit(tmp_path):
    from gan_image_captioning_tpu.train import checkpoint as ckpt_lib

    d = str(tmp_path)
    for n in ("state_1.ckpt", "state_2.ckpt", "state_10.ckpt",
              "state_pre_7.ckpt", "adv_model.ckpt"):
        os.makedirs(os.path.join(d, n))
    deleted = ckpt_lib.prune_checkpoints(d, "state_", keep=1)
    assert sorted(os.path.basename(p) for p in deleted) == [
        "state_1.ckpt", "state_2.ckpt"]  # numeric sort: 10 survives
    left = sorted(os.listdir(d))
    assert left == ["adv_model.ckpt", "state_10.ckpt", "state_pre_7.ckpt"]
    assert ckpt_lib.prune_checkpoints(d, "state_", keep=0) == []


def test_eval_quality_adaptive_matches(tmp_path, datasets, monkeypatch):
    """GIC_EVAL_ADAPTIVE in-run eval decode scores the same NLL/BLEU as
    the full-T decode (captions strip at <E> before scoring)."""
    cfg = _config(str(tmp_path), pretrain_epochs=1, adv_epochs=0)
    inst = GANInstructor(cfg, *datasets, silent=True)
    inst._run()
    base = inst.evaluate_quality()
    monkeypatch.setenv("GIC_EVAL_ADAPTIVE", "4")
    del inst._greedy_decode          # force recompile under the env
    fast = inst.evaluate_quality()
    assert fast["bleu4"] == base["bleu4"]
    assert abs(fast["nll_gen"] - base["nll_gen"]) < 1e-6
