"""Explicit ring/Ulysses CP and GPipe PP routed INSIDE the fused train steps.

Round-1 VERDICT item 7: the shard_map kernels must be reachable from the
training engine (``--mesh …,sp:k --cp-mode ring|ulysses``, ``--mesh …,pp:k``),
not only standalone.  These tests run make_mle_step / make_adv_step with the
modes active on a virtual mesh and assert exact equivalence with the
single-device step.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gan_image_captioning_tpu.config import Config
from gan_image_captioning_tpu.models import transformer as tf_lib
from gan_image_captioning_tpu.parallel.mesh import make_mesh
from gan_image_captioning_tpu.train.state import create_train_state
from gan_image_captioning_tpu.train.steps import make_adv_step, make_mle_step


def tf_config(**kw):
    base = dict(vocab_size=64, gen_arch="transformer", gen_embed_dim=16,
                gen_hidden_dim=32, gen_num_layers=2, gen_num_heads=2,
                disc_arch="transformer", disc_embed_dim=8, disc_num_heads=2,
                disc_hidden_dim=16, disc_num_layers=2,
                max_seq_len=6,  # seq_len = 8: divides sp=2 and heads=2
                adv_train_batch_size=8, pre_train_batch_size=8)
    base.update(kw)
    return Config(**base)


def make_inputs(config, seed=0):
    state = create_train_state(config, jax.random.PRNGKey(1008))
    caps = jax.random.randint(jax.random.PRNGKey(seed),
                              (8, config.seq_len), 0, config.vocab_size)
    # no `lengths`: the purely-causal mask path is what CP/PP route
    return state, {"captions": caps}


def run_steps(config, mesh=None, cp_mode=None, pp=False):
    """One MLE + one adv step under the given parallel modes; returns
    (mle_loss, adv_g, adv_d, one generator leaf after the updates)."""
    try:
        if cp_mode:
            tf_lib.set_context_parallel(cp_mode, mesh)
        if pp:
            tf_lib.set_pipeline(mesh, num_microbatches=4)
        state, batch = make_inputs(config)
        mle = make_mle_step(config)
        adv = make_adv_step(config)
        state, m1 = mle(state, batch)
        state, m2 = adv(state, batch, 2.0)
        leaf = np.asarray(
            state.gen_params["decoder"]["blocks"][0]["attn"]["wq"]["w"])
        return (float(m1["gen_pretrain_loss"]), float(m2["gen_adv_loss"]),
                float(m2["disc_adv_loss"]), leaf)
    finally:
        tf_lib.set_context_parallel(None)
        tf_lib.set_pipeline(None)


@pytest.fixture(scope="module")
def baseline():
    return run_steps(tf_config())


@pytest.mark.parametrize("cp_mode", ["ring", "ulysses"])
def test_cp_inside_fused_steps_matches_single_device(cp_mode, baseline,
                                                     devices8):
    mesh = make_mesh("data:2,sp:2", devices8[:4])
    got = run_steps(tf_config(), mesh=mesh, cp_mode=cp_mode)
    for g, b in zip(got[:3], baseline[:3]):
        np.testing.assert_allclose(g, b, rtol=2e-4, atol=1e-6)
    np.testing.assert_allclose(got[3], baseline[3], rtol=2e-4, atol=1e-6)


def test_pp_inside_fused_steps_matches_single_device(baseline, devices8):
    mesh = make_mesh("pp:2", devices8[:2])
    got = run_steps(tf_config(), mesh=mesh, pp=True)
    for g, b in zip(got[:3], baseline[:3]):
        np.testing.assert_allclose(g, b, rtol=2e-4, atol=1e-6)
    np.testing.assert_allclose(got[3], baseline[3], rtol=2e-4, atol=1e-6)


def test_cp_falls_back_when_not_divisible(devices8):
    """seq_len=9 doesn't divide sp=2 → dense fallback, still correct."""
    config = tf_config(max_seq_len=7)  # seq_len 9
    base = run_steps(config)
    mesh = make_mesh("sp:2", devices8[:2])
    got = run_steps(config, mesh=mesh, cp_mode="ring")
    np.testing.assert_allclose(got[0], base[0], rtol=1e-5)


def test_instructor_wires_modes_from_mesh_flag(tmp_path, devices8):
    """--mesh data:4,sp:2 --cp-mode ring reaches set_context_parallel via
    the training engine (the reachability VERDICT item)."""
    import os

    from gan_image_captioning_tpu.data.synthetic import SyntheticCaptions
    from gan_image_captioning_tpu.train.instructor import GANInstructor

    train = SyntheticCaptions("train", num_items=16)
    dev = SyntheticCaptions("val", num_items=8)
    config = tf_config(vocab_size=train.vocab_size, mesh="data:4,sp:2",
                       cp_mode="ring", pretrain_epochs=1, adv_epochs=0,
                       pre_eval_batch_size=8, num_workers=1,
                       save_dir=os.path.join(str(tmp_path), "save"),
                       model_dir=os.path.join(str(tmp_path), "save", "m"),
                       log_file=os.path.join(str(tmp_path), "save", "log"))
    try:
        inst = GANInstructor(config, train, dev, silent=True)
        assert tf_lib._CP_MODE is not None and tf_lib._CP_MODE[0] == "ring"
        inst.pretrain_generator(1)
    finally:
        tf_lib.set_context_parallel(None)
        tf_lib.set_activation_sharding(None)
        tf_lib.set_pipeline(None)
