"""REAL multi-process multi-host validation (SURVEY §2.3 comm-backend row).

Everything else in the parallel suite uses N virtual devices in ONE
process; these tests form an actual 2-process jax.distributed cluster
(Gloo collectives over localhost — the wiring a TPU pod uses over DCN)
via ``scripts/multihost_smoke.py`` and check:

  * the cluster forms through ``maybe_initialize`` (coordinator env vars);
  * per-host loaders + ``shard_batch``'s process-local global-batch
    assembly reproduce the single-process trajectory (the global batch is
    a strided row-permutation of the single-process batch, so mean
    losses/grads agree to fp tolerance);
  * training state stays replicated (identical checksums on both
    processes);
  * the instructor runs end-to-end and only process 0 writes checkpoints.
"""

import json
import os
import socket
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def _free_port():
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def _launch(tmp_path, save_dir=""):
    port = _free_port()
    procs, outs = [], []
    for pid in range(2):
        out = os.path.join(str(tmp_path), f"p{pid}.json")
        outs.append(out)
        env = dict(os.environ)
        env.update({
            "JAX_COORDINATOR_ADDRESS": f"127.0.0.1:{port}",
            "JAX_NUM_PROCESSES": "2",
            "JAX_PROCESS_ID": str(pid),
            "PALLAS_AXON_POOL_IPS": "",
            "JAX_PLATFORMS": "cpu",
        })
        cmd = [sys.executable, os.path.join(REPO, "scripts",
                                            "multihost_smoke.py"),
               "--out", out]
        if save_dir:
            cmd += ["--save-dir", save_dir]
        procs.append(subprocess.Popen(cmd, env=env,
                                      stdout=subprocess.PIPE,
                                      stderr=subprocess.STDOUT))
    results = []
    for p, out in zip(procs, outs):
        stdout, _ = p.communicate(timeout=420)
        assert p.returncode == 0, stdout.decode()[-3000:]
        results.append(json.load(open(out)))
    return results


@pytest.mark.slow
def test_two_process_cluster_matches_single_process(tmp_path):
    r0, r1 = _launch(tmp_path)
    assert r0["processes"] == r1["processes"] == 2
    assert r0["devices"] == 4          # 2 procs × 2 virtual devices

    # replicated state: both processes hold identical params
    assert r0["checksum"] == r1["checksum"]
    assert r0["mle_losses"] == r1["mle_losses"]
    assert (r0["adv_g"], r0["adv_d"]) == (r1["adv_g"], r1["adv_d"])
    assert np.isfinite([r0["adv_g"], r0["adv_d"]]).all()

    # single-process reference: same global batches (the per-host strided
    # rows union to the same shuffled row-set per step), so the mean loss
    # trajectory matches to fp tolerance
    import jax

    from gan_image_captioning_tpu.config import Config
    from gan_image_captioning_tpu.data.loader import Batcher
    from gan_image_captioning_tpu.data.synthetic import SyntheticCaptions
    from gan_image_captioning_tpu.train.state import create_train_state
    from gan_image_captioning_tpu.train.steps import make_mle_step

    ds = SyntheticCaptions("train", num_items=32)
    cfg = Config(vocab_size=ds.vocab_size, gen_embed_dim=12,
                 gen_hidden_dim=16, max_seq_len=9, disc_embed_dim=8,
                 disc_num_rep=4, disc_filter_sizes=(2, 3),
                 disc_num_filters=(6, 6), pre_train_batch_size=8,
                 adv_train_batch_size=8)
    state = create_train_state(cfg, jax.random.PRNGKey(0))
    loader = Batcher(ds, 8, cfg.seq_len, shuffle=True, seed=0,
                     drop_last=True, num_workers=1)
    mle = make_mle_step(cfg)
    it = iter(loader)
    ref_losses = []
    for _ in range(len(r0["mle_losses"])):
        state, m = mle(state, next(it))
        ref_losses.append(float(m["gen_pretrain_loss"]))
    np.testing.assert_allclose(r0["mle_losses"], ref_losses, rtol=2e-5)
    w = state.gen_params["decoder"]["linear"]["w"]
    np.testing.assert_allclose(r0["checksum"],
                               float(np.abs(np.asarray(w)).sum()), rtol=2e-5)


@pytest.mark.slow
def test_two_process_instructor_and_single_writer(tmp_path):
    save_dir = os.path.join(str(tmp_path), "save")
    os.makedirs(save_dir)
    r0, r1 = _launch(tmp_path, save_dir=save_dir)
    i0, i1 = r0["instructor"], r1["instructor"]
    # both processes ran the full schedule in lockstep
    assert i0["pretrain_steps"] == i1["pretrain_steps"] == 4
    assert i0["gen_steps"] == i1["gen_steps"] == 4
    # checkpoints exist exactly once (process 0 wrote; 1 skipped) and the
    # directory is loadable
    assert i0["ckpt_exists"]
    from gan_image_captioning_tpu.config import Config
    from gan_image_captioning_tpu.train import checkpoint as ckpt_lib

    cfg = Config(vocab_size=35, gen_embed_dim=12, gen_hidden_dim=16,
                 max_seq_len=9)
    gen, _ = ckpt_lib.load_generator_checkpoint(
        os.path.join(save_dir, "models", "pretrained_model.ckpt"), cfg)
    assert gen is not None
