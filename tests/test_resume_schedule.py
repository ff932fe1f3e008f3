"""Step-granular interrupt + resume (train/schedule.py).

The gold property: a run interrupted MID-EPOCH and resumed from the saved
checkpoint+sidecar produces BIT-IDENTICAL final parameters to the same run
uninterrupted — the PRNG key threads through the TrainState, the sidecar
replays the identical seeded data order past the skip point, and the
temperature ramp uses the global batch index.  (The reference has no resume
at all: ``training.py:116-119,223-227`` only write best-val state_dicts.)
"""

import json
import os

import jax
import numpy as np
import pytest

from gan_image_captioning_tpu.config import Config
from gan_image_captioning_tpu.data.loader import Batcher
from gan_image_captioning_tpu.data.synthetic import SyntheticCaptions
from gan_image_captioning_tpu.train import schedule as sched_lib
from gan_image_captioning_tpu.train.instructor import GANInstructor


def _config(tmp, **kw):
    ds = SyntheticCaptions("train", num_items=32)
    base = dict(vocab_size=ds.vocab_size, gen_embed_dim=12, gen_hidden_dim=16,
                max_seq_len=9, disc_embed_dim=8, disc_num_rep=4,
                disc_filter_sizes=(2, 3), disc_num_filters=(6, 6),
                pre_train_batch_size=8, pre_eval_batch_size=8,
                adv_train_batch_size=8, adv_eval_batch_size=8,
                pretrain_epochs=2, adv_epochs=2, num_workers=1,
                save_dir=os.path.join(tmp, "save"),
                model_dir=os.path.join(tmp, "save", "models"),
                log_file=os.path.join(tmp, "save", "log"))
    base.update(kw)
    return Config(**base)


@pytest.fixture()
def datasets():
    return (SyntheticCaptions("train", num_items=32),
            SyntheticCaptions("val", num_items=16))


def _interrupt_after(inst, step_attr: str, n_calls: int):
    """Wrap a jitted step attribute so the n-th call requests an interrupt
    (deterministic stand-in for a SIGTERM landing mid-sweep)."""
    orig = getattr(inst, step_attr)
    calls = [0]

    def wrapped(*args, **kw):
        out = orig(*args, **kw)
        calls[0] += 1
        if calls[0] == n_calls:
            inst._request_interrupt()
        return out

    setattr(inst, step_attr, wrapped)


def _leaves_equal(a, b):
    for la, lb in zip(jax.tree_util.tree_leaves(a),
                      jax.tree_util.tree_leaves(b)):
        np.testing.assert_array_equal(np.asarray(la), np.asarray(lb))


def test_batcher_iter_from_replays_tail(datasets):
    train, _ = datasets
    a = Batcher(train, 8, 11, shuffle=True, seed=3, num_workers=1)
    b = Batcher(train, 8, 11, shuffle=True, seed=3, num_workers=1)
    full = list(iter(a))
    tail = list(b.iter_from(2))
    assert len(tail) == len(full) - 2
    for x, y in zip(full[2:], tail):
        np.testing.assert_array_equal(x["captions"], y["captions"])
        np.testing.assert_array_equal(x["index"], y["index"])
    # both consumed one epoch
    assert a.epoch == b.epoch == 1


def test_midpretrain_interrupt_resume_bitexact(tmp_path, datasets):
    # uninterrupted reference trajectory
    cfg_a = _config(str(tmp_path) + "_a")
    ia = GANInstructor(cfg_a, *datasets, silent=True)
    ia._run()

    # interrupted after 2 of 4 batches of pretrain epoch 0
    cfg_b = _config(str(tmp_path) + "_b")
    ib = GANInstructor(cfg_b, *datasets, silent=True)
    _interrupt_after(ib, "mle_step", 2)
    ib._run()
    ckpt = os.path.join(cfg_b.model_dir, "interrupt_state.ckpt")
    assert os.path.isdir(ckpt)
    side = json.load(open(ckpt + ".schedule.json"))
    assert side["phase"] == "pretrain" and side["epoch"] == 0
    assert side["batches_done"] == 2 and side["pretrain_steps"] == 2
    assert side["loader_epochs"]["pre_train"] == 0  # replay epoch 0's order
    # nothing past the interrupt ran
    assert int(ib.state.gen_steps) == 0

    # resumed: same flags, schedule fast-forwards from the sidecar
    cfg_c = _config(str(tmp_path) + "_b", resume=ckpt)
    ic = GANInstructor(cfg_c, *datasets, silent=True)
    assert ic.pretrain_steps == 2
    ic._run()
    assert ic.pretrain_steps == ia.pretrain_steps
    assert int(ic.state.gen_steps) == int(ia.state.gen_steps)
    _leaves_equal(ia.state.gen_params, ic.state.gen_params)
    _leaves_equal(ia.state.disc_params, ic.state.disc_params)


def test_midadv_interrupt_resume_bitexact(tmp_path, datasets):
    cfg_a = _config(str(tmp_path) + "_a")
    ia = GANInstructor(cfg_a, *datasets, silent=True)
    ia._run()

    # interrupt after 3 adv steps: mid-sweep of adv epoch 0 (4 batches/epoch)
    cfg_b = _config(str(tmp_path) + "_b")
    ib = GANInstructor(cfg_b, *datasets, silent=True)
    _interrupt_after(ib, "adv_step", 3)
    ib._run()
    ckpt = os.path.join(cfg_b.model_dir, "interrupt_state.ckpt")
    side = json.load(open(ckpt + ".schedule.json"))
    assert side["phase"] == "adv" and side["epoch"] == 0
    assert side["batches_done"] == 3
    assert int(ib.state.gen_steps) == 3

    cfg_c = _config(str(tmp_path) + "_b", resume=ckpt)
    ic = GANInstructor(cfg_c, *datasets, silent=True)
    ic._run()
    assert int(ic.state.gen_steps) == int(ia.state.gen_steps)
    # the temperature ramp continued from the global batch index
    assert float(ic.state.temperature) == pytest.approx(
        float(ia.state.temperature))
    _leaves_equal(ia.state.gen_params, ic.state.gen_params)
    _leaves_equal(ia.state.disc_params, ic.state.disc_params)


def test_periodic_snapshot_sidecar_resume_bitexact(tmp_path, datasets):
    """--checkpoint-every snapshots carry sidecars too: a crash (no SIGTERM,
    no interrupt save) resumes from the newest snapshot with zero flag
    edits and reproduces the uninterrupted trajectory."""
    cfg_a = _config(str(tmp_path) + "_a", checkpoint_every=1, adv_epochs=3)
    ia = GANInstructor(cfg_a, *datasets, silent=True)
    ia._run()
    ckpt = os.path.join(cfg_a.model_dir, "state_1.ckpt")
    side = json.load(open(ckpt + ".schedule.json"))
    assert side == {**side, "phase": "adv", "epoch": 2, "batches_done": 0}

    cfg_b = _config(str(tmp_path) + "_b", checkpoint_every=1, adv_epochs=3,
                    resume=ckpt)
    ib = GANInstructor(cfg_b, *datasets, silent=True)
    ib._run()
    assert int(ib.state.gen_steps) == int(ia.state.gen_steps)
    _leaves_equal(ia.state.gen_params, ib.state.gen_params)
    _leaves_equal(ia.state.disc_params, ib.state.disc_params)


def test_midsweep_resume_with_changed_geometry_degrades(tmp_path, datasets):
    """A mid-sweep sidecar resumed under a DIFFERENT batch size would skip
    the wrong batches — the guard degrades to the next epoch boundary
    (never double-trains the applied batches)."""
    cfg_b = _config(str(tmp_path) + "_b", pretrain_epochs=3)
    ib = GANInstructor(cfg_b, *datasets, silent=True)
    _interrupt_after(ib, "mle_step", 2)   # mid-epoch 0 (2 of 4 batches)
    ib._run()
    ckpt = os.path.join(cfg_b.model_dir, "interrupt_state.ckpt")

    # resume with batch size 4 → 8 train batches/epoch now, sidecar says 4
    cfg_c = _config(str(tmp_path) + "_b", resume=ckpt, pretrain_epochs=3,
                    pre_train_batch_size=4)
    ic = GANInstructor(cfg_c, *datasets, silent=True)
    assert ic.pretrain_steps == 2
    ic._run()
    # epochs 1 and 2 ran at 8 batches each; the broken epoch 0 was skipped
    assert ic.pretrain_steps == 2 + 2 * 8
    assert int(ic.state.gen_steps) > 0  # adv phase still ran


def test_scst_phase_skipped_on_adv_resume(tmp_path, datasets):
    """A sidecar at phase=adv skips SCST on resume (phase ordering)."""
    info = {"phase": "adv", "epoch": 0, "batches_done": 0}
    assert sched_lib.phase_completed(info, "pretrain")
    assert sched_lib.phase_completed(info, "scst")
    assert not sched_lib.phase_completed(info, "adv")
    assert sched_lib.phase_start(info, "adv") == (0, 0)
    assert sched_lib.phase_start(info, "pretrain") == (0, 0)


def test_resolve_auto_resume_unit(tmp_path):
    """--resume auto picks the newest interrupt/snapshot checkpoint across
    this experiment name's run dirs; fresh start when none exists."""
    import argparse
    import time as _time

    from gan_image_captioning_tpu.config import resolve_auto_resume

    root = str(tmp_path)

    def _args():
        return argparse.Namespace(save_dir=root, expt_name="demo",
                                  model_dir="models", resume="auto")

    # nothing yet → fresh start
    assert resolve_auto_resume(_args()).resume == ""

    old = os.path.join(root, "demo_1", "models", "state_0.ckpt")
    new = os.path.join(root, "demo_2", "models", "interrupt_state.ckpt")
    other = os.path.join(root, "demonot_3", "models", "state_9.ckpt")
    for d in (old, new, other):
        os.makedirs(d)
    _time.sleep(0.01)
    os.utime(old, (1, 1))          # force ordering
    os.utime(other, None)          # newest, but a DIFFERENT experiment
    assert resolve_auto_resume(_args()).resume == new
    # an explicit path passes through untouched
    a = _args()
    a.resume = "/explicit/path.ckpt"
    assert resolve_auto_resume(a).resume == "/explicit/path.ckpt"


def test_auto_resume_cli_end_to_end(tmp_path):
    """Rerunning the identical command line with --resume auto continues
    from the previous run's newest snapshot via the schedule sidecar."""
    from src.main import main

    argv = ["--dataset", "synthetic", "--synthetic-items", "32",
            "--max-seq-len", "8", "--gen-embed-dim", "8",
            "--gen-hidden-dim", "12", "--pre-train-batch-size", "8",
            "--pre-eval-batch-size", "8", "--adv-train-batch-size", "8",
            "--adv-eval-batch-size", "8", "--pretrain-epochs", "2",
            "--adv-epochs", "1", "--checkpoint-every", "1",
            "--save-dir", os.path.join(str(tmp_path), "save"),
            "--expt-name", "auto", "--resume", "auto", "--device", "cpu"]
    inst1 = main(argv)          # fresh start: no prior checkpoints
    assert inst1.config.resume == ""
    steps1 = int(inst1.state.gen_steps)

    inst2 = main(argv)          # identical command: resumes from state_0
    assert inst2.config.resume.endswith("state_0.ckpt")
    assert inst2._schedule is not None
    # pretrain skipped (sidecar phase=adv); adv continued from epoch 1:
    # adv_epochs=1 means the schedule is already complete
    assert int(inst2.state.gen_steps) == steps1
    assert inst2.pretrain_steps == inst1.pretrain_steps


def test_midscst_interrupt_resume_bitexact(tmp_path, datasets, monkeypatch):
    """SCST sweeps honor per-batch interrupts too (an SCST epoch —
    rollout + host reward — is the most expensive kind); resume replays
    the identical (base_key, global step) folds → bit-exact."""
    from gan_image_captioning_tpu.train import scst as scst_lib

    kw = dict(pretrain_epochs=1, adv_epochs=0, scst_epochs=2,
              scst_reward="bleu")
    cfg_a = _config(str(tmp_path) + "_a", **kw)
    ia = GANInstructor(cfg_a, *datasets, silent=True)
    ia._run()

    cfg_b = _config(str(tmp_path) + "_b", **kw)
    ib = GANInstructor(cfg_b, *datasets, silent=True)
    orig = scst_lib.batch_advantage
    calls = [0]

    def counting(*a, **k):
        calls[0] += 1
        if calls[0] == 2:            # mid-epoch 0 (4 batches/epoch)
            ib._request_interrupt()
        return orig(*a, **k)

    monkeypatch.setattr(scst_lib, "batch_advantage", counting)
    ib._run()
    monkeypatch.setattr(scst_lib, "batch_advantage", orig)
    ckpt = os.path.join(cfg_b.model_dir, "interrupt_state.ckpt")
    side = json.load(open(ckpt + ".schedule.json"))
    assert side["phase"] == "scst" and side["epoch"] == 0
    assert side["batches_done"] == 2 and side["scst_step"] == 2

    cfg_c = _config(str(tmp_path) + "_b", resume=ckpt, **kw)
    ic = GANInstructor(cfg_c, *datasets, silent=True)
    assert ic._scst_step == 2
    ic._run()
    _leaves_equal(ia.state.gen_params, ic.state.gen_params)


def test_resolve_auto_resume_metachar_save_dir(tmp_path):
    """A save_dir containing glob metacharacters must still find resume
    candidates (a silent no-match would restart training from scratch)."""
    import argparse

    from gan_image_captioning_tpu.config import resolve_auto_resume

    root = os.path.join(str(tmp_path), "runs[2026]", "out")
    ckpt = os.path.join(root, "demo_1", "models", "interrupt_state.ckpt")
    os.makedirs(ckpt)
    args = argparse.Namespace(save_dir=root, expt_name="demo",
                              model_dir="models", resume="auto")
    assert resolve_auto_resume(args).resume == ckpt


def test_elastic_resume_across_mesh_sizes(tmp_path, datasets):
    """Elastic recovery: a snapshot taken under --mesh data:8 resumes on a
    SINGLE device (and back under the mesh), bit-identical to the
    uninterrupted single-device run — checkpoints are host-resident numpy,
    sharding is re-applied from the resumed config (SURVEY §5
    failure/elastic: restart on whatever devices survive)."""
    if jax.device_count() < 8:
        pytest.skip("needs 8 virtual devices")

    cfg_a = _config(str(tmp_path) + "_a", adv_epochs=2, mesh="data:8",
                    checkpoint_every=1)
    ia = GANInstructor(cfg_a, *datasets, silent=True)
    ia._run()
    ckpt = os.path.join(cfg_a.model_dir, "state_0.ckpt")  # after adv epoch 0

    # same mesh: the resumed program sequence is identical → bit-exact
    cfg_b8 = _config(str(tmp_path) + "_b8", adv_epochs=2, mesh="data:8",
                     resume=ckpt)
    ib8 = GANInstructor(cfg_b8, *datasets, silent=True)
    ib8._run()
    assert int(ib8.state.gen_steps) == int(ia.state.gen_steps)
    _leaves_equal(ia.state.gen_params, ib8.state.gen_params)
    _leaves_equal(ia.state.disc_params, ib8.state.disc_params)

    # single device: elastic restart on fewer devices — numerically
    # continuous (psum reduction ORDER differs from the one-device batch
    # reduction, so grads differ at float epsilon, not bit-exact)
    cfg_b1 = _config(str(tmp_path) + "_b1", adv_epochs=2, mesh="",
                     resume=ckpt)
    ib1 = GANInstructor(cfg_b1, *datasets, silent=True)
    ib1._run()
    assert int(ib1.state.gen_steps) == int(ia.state.gen_steps)
    for la, lb in zip(jax.tree_util.tree_leaves(ia.state.gen_params),
                      jax.tree_util.tree_leaves(ib1.state.gen_params)):
        np.testing.assert_allclose(np.asarray(la), np.asarray(lb),
                                   atol=1e-5, rtol=1e-4)


def test_sidecar_roundtrip_and_corruption(tmp_path):
    ckpt = os.path.join(str(tmp_path), "x.ckpt")
    info = {"phase": "pretrain", "epoch": 1, "batches_done": 3,
            "loader_epochs": {"pre_train": 1}}
    path = sched_lib.save_sidecar(ckpt, info)
    assert sched_lib.load_sidecar(ckpt)["batches_done"] == 3
    with open(path, "w") as f:
        f.write("{ not json")
    assert sched_lib.load_sidecar(ckpt) is None  # degrade, never crash
    with pytest.raises(ValueError):
        sched_lib.save_sidecar(ckpt, {"phase": "nope"})


@pytest.mark.parametrize("seed", range(3))
def test_fuzz_interrupt_anywhere_resume_bitexact(tmp_path, seed):
    """Property: for random small configs and a random interrupt point
    ANYWHERE in the schedule (any phase, any batch), interrupt + resume
    reproduces the uninterrupted run bit-exactly."""
    rng = np.random.default_rng(100 + seed)
    kw = dict(pretrain_epochs=int(rng.integers(1, 3)),
              adv_epochs=int(rng.integers(1, 3)),
              disc_train_freq=int(rng.integers(1, 3)),
              label_smoothing=float(rng.choice([0.0, 0.1])),
              checkpoint_every=int(rng.choice([0, 1])),
              length_buckets=str(rng.choice(["", "7"])))
    train = SyntheticCaptions("train", num_items=24)
    val = SyntheticCaptions("val", num_items=16)

    cfg_a = _config(str(tmp_path) + "_a", **kw)
    ia = GANInstructor(cfg_a, train, val, silent=True)
    ia._run()

    nb = len(ia.pre_train_loader)
    total = kw["pretrain_epochs"] * nb + kw["adv_epochs"] * nb
    cut = int(rng.integers(1, total))  # somewhere strictly inside

    cfg_b = _config(str(tmp_path) + "_b", **kw)
    ib = GANInstructor(cfg_b, train, val, silent=True)
    calls = [0]
    for attr in ("mle_step", "adv_step"):
        orig = getattr(ib, attr)

        def wrapped(*a, _orig=orig, **k):
            out = _orig(*a, **k)
            calls[0] += 1
            if calls[0] == cut:
                ib._request_interrupt()
            return out

        setattr(ib, attr, wrapped)
    ib._run()
    ckpt = os.path.join(cfg_b.model_dir, "interrupt_state.ckpt")
    assert os.path.isdir(ckpt), (kw, cut)

    cfg_c = _config(str(tmp_path) + "_b", resume=ckpt, **kw)
    ic = GANInstructor(cfg_c, train, val, silent=True)
    ic._run()
    assert int(ic.state.gen_steps) == int(ia.state.gen_steps), (kw, cut)
    _leaves_equal(ia.state.gen_params, ic.state.gen_params)
    _leaves_equal(ia.state.disc_params, ic.state.disc_params)


def test_iter_from_with_worker_pool_preserves_order(datasets):
    """iter_from under num_workers>1: the reorder buffer must emit the
    truncated batch list in order, identical to a single-worker replay."""
    train, _ = datasets
    a = Batcher(train, 8, 11, shuffle=True, seed=5, num_workers=1)
    b = Batcher(train, 8, 11, shuffle=True, seed=5, num_workers=3)
    one = list(a.iter_from(1))
    pooled = list(b.iter_from(1))
    assert len(one) == len(pooled)
    for x, y in zip(one, pooled):
        np.testing.assert_array_equal(x["captions"], y["captions"])
        np.testing.assert_array_equal(x["index"], y["index"])
