"""Checkpoint averaging tool (src/average_checkpoints.py)."""

import os
import sys

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from gan_image_captioning_tpu.config import Config
from gan_image_captioning_tpu.data.synthetic import SyntheticCaptions
from gan_image_captioning_tpu.models import api
from gan_image_captioning_tpu.train import checkpoint as ckpt_lib


def _cfg():
    ds = SyntheticCaptions("train", num_items=16)
    return Config(vocab_size=ds.vocab_size, gen_embed_dim=8,
                  gen_hidden_dim=12, max_seq_len=6, disc_embed_dim=8,
                  disc_num_rep=2, disc_filter_sizes=(2,),
                  disc_num_filters=(6,), conditional_gan=0)


def _shift(tree, delta):
    return jax.tree_util.tree_map(lambda x: x + delta, tree)


def test_average_params_checkpoints(tmp_path):
    cfg = _cfg()
    gen = api.init_generator(jax.random.PRNGKey(0), cfg)
    p1, p2, p3 = str(tmp_path / "a.ckpt"), str(tmp_path / "b.ckpt"), \
        str(tmp_path / "c.ckpt")
    ckpt_lib.save_params(p1, gen, sync=True)
    ckpt_lib.save_params(p2, _shift(gen, 0.3), sync=True)
    ckpt_lib.save_params(p3, _shift(gen, 0.6), sync=True)

    out = str(tmp_path / "avg.ckpt")
    from src.average_checkpoints import main

    main(["--checkpoints", p1, p2, p3, "--output", out,
          "--dataset", "synthetic", "--max-seq-len", "6",
          "--gen-embed-dim", "8", "--gen-hidden-dim", "12",
          "--disc-embed-dim", "8", "--disc-num-rep", "2",
          "--disc-filter-sizes", "2", "--disc-num-filters", "6"])

    got = ckpt_lib.load_params(out, gen)
    want = _shift(gen, 0.3)   # mean of +0.0, +0.3, +0.6
    for g, w in zip(jax.tree_util.tree_leaves(got),
                    jax.tree_util.tree_leaves(want)):
        np.testing.assert_allclose(np.asarray(g), np.asarray(w),
                                   rtol=1e-5, atol=1e-6)


def test_average_mixed_forms_yields_generator_only(tmp_path):
    cfg = _cfg()
    gen = api.init_generator(jax.random.PRNGKey(1), cfg)
    disc = api.init_discriminator(jax.random.PRNGKey(2), cfg)
    p1 = str(tmp_path / "pre.ckpt")
    p2 = str(tmp_path / "adv.ckpt")
    ckpt_lib.save_params(p1, gen, sync=True)
    ckpt_lib.save_params(p2, {"generator": _shift(gen, 1.0),
                              "discriminator": disc}, sync=True)

    out = str(tmp_path / "avg.ckpt")
    from src.average_checkpoints import main

    main(["--checkpoints", p1, p2, "--output", out,
          "--dataset", "synthetic", "--max-seq-len", "6",
          "--gen-embed-dim", "8", "--gen-hidden-dim", "12",
          "--disc-embed-dim", "8", "--disc-num-rep", "2",
          "--disc-filter-sizes", "2", "--disc-num-filters", "6"])

    got = ckpt_lib.load_params(out, gen)   # generator-shaped (no disc dict)
    for g, w in zip(jax.tree_util.tree_leaves(got),
                    jax.tree_util.tree_leaves(_shift(gen, 0.5))):
        np.testing.assert_allclose(np.asarray(g), np.asarray(w),
                                   rtol=1e-5, atol=1e-6)
