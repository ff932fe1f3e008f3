"""On-device train-time image augmentation (ops/augment.py,
--random-flip / --random-crop-pad).  The reference's transform chain is
deterministic (tasks.py:92-100); these are shape-preserving framework
extensions applied inside the fused step."""

import jax
import jax.numpy as jnp
import numpy as np

from gan_image_captioning_tpu.config import Config
from gan_image_captioning_tpu.data.loader import make_batch
from gan_image_captioning_tpu.data.synthetic import SyntheticCaptions
from gan_image_captioning_tpu.ops.augment import augment_images
from gan_image_captioning_tpu.train import steps as steps_lib
from gan_image_captioning_tpu.train.state import create_train_state


def _images(b=16, c=3, s=8, seed=0):
    rng = np.random.RandomState(seed)
    return jnp.asarray(rng.randn(b, c, s, s), jnp.float32)


def test_flip_outputs_are_original_or_mirror():
    imgs = _images()
    out = np.asarray(augment_images(imgs, jax.random.PRNGKey(0),
                                    flip=True, crop_pad=0))
    orig, mirror = np.asarray(imgs), np.asarray(imgs[..., ::-1])
    flipped = 0
    for i in range(out.shape[0]):
        is_orig = np.array_equal(out[i], orig[i])
        is_mirr = np.array_equal(out[i], mirror[i])
        assert is_orig or is_mirr
        flipped += int(is_mirr and not is_orig)
    assert 0 < flipped < out.shape[0]   # coin actually varies at B=16


def test_crop_is_translation_of_reflect_pad():
    imgs = _images(b=8, s=6, seed=1)
    p = 2
    out = np.asarray(augment_images(imgs, jax.random.PRNGKey(1),
                                    flip=False, crop_pad=p))
    assert out.shape == imgs.shape
    padded = np.pad(np.asarray(imgs), ((0, 0), (0, 0), (p, p), (p, p)),
                    mode="reflect")
    for i in range(out.shape[0]):
        found = any(
            np.array_equal(out[i], padded[i, :, y:y + 6, x:x + 6])
            for y in range(2 * p + 1) for x in range(2 * p + 1))
        assert found, f"row {i} is not a translation of the padded input"


def test_augment_deterministic_per_key_and_uint8_ok():
    imgs = _images()
    a = augment_images(imgs, jax.random.PRNGKey(3), flip=True, crop_pad=1)
    b = augment_images(imgs, jax.random.PRNGKey(3), flip=True, crop_pad=1)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    u8 = jnp.asarray(np.random.RandomState(0).randint(
        0, 255, (4, 3, 8, 8)), jnp.uint8)
    out = augment_images(u8, jax.random.PRNGKey(4), flip=True, crop_pad=1)
    assert out.dtype == jnp.uint8 and out.shape == u8.shape


def test_conditional_train_step_with_augmentation():
    ds = SyntheticCaptions("train", num_items=8, image_size=8,
                           conditional=True)
    cfg = Config(vocab_size=ds.vocab_size, gen_embed_dim=8, gen_hidden_dim=12,
                 max_seq_len=6, disc_embed_dim=8, disc_num_rep=2,
                 disc_filter_sizes=(2,), disc_num_filters=(6,),
                 conditional_gan=1, image_size=8, random_flip=1,
                 random_crop_pad=1)
    caps = [ds.sample(i)[0] for i in range(8)]
    imgs = [ds.sample(i)[1] for i in range(8)]
    batch = make_batch(caps, imgs, cfg.seq_len)
    batch = {k: jnp.asarray(v) for k, v in batch.items()}

    state = create_train_state(cfg, jax.random.PRNGKey(0))
    state = jax.tree_util.tree_map(np.asarray, state)   # steps donate input
    new_state, m = steps_lib.make_mle_step(cfg)(state, batch)
    assert np.isfinite(float(m["gen_pretrain_loss"]))
    state = jax.tree_util.tree_map(np.asarray, new_state)
    _, m = steps_lib.make_adv_step(cfg)(state, batch, 1.0)
    assert np.isfinite(float(m["gen_adv_loss"]))
    assert np.isfinite(float(m["disc_adv_loss"]))


def test_augmentation_off_is_noop_trace():
    """Default config must not change the step's outputs vs before the
    feature (PRNG-stream preservation)."""
    ds = SyntheticCaptions("train", num_items=8, image_size=8,
                           conditional=True)
    kw = dict(vocab_size=ds.vocab_size, gen_embed_dim=8, gen_hidden_dim=12,
              max_seq_len=6, disc_embed_dim=8, disc_num_rep=2,
              disc_filter_sizes=(2,), disc_num_filters=(6,),
              conditional_gan=1, image_size=8)
    cfg_off = Config(**kw)
    caps = [ds.sample(i)[0] for i in range(8)]
    imgs = [ds.sample(i)[1] for i in range(8)]
    batch = make_batch(caps, imgs, cfg_off.seq_len)
    batch = {k: jnp.asarray(v) for k, v in batch.items()}

    state = create_train_state(cfg_off, jax.random.PRNGKey(0))
    host = jax.tree_util.tree_map(np.asarray, state)
    s_off, m_off = steps_lib.make_mle_step(cfg_off)(host, batch)
    # same loss twice — the no-op path is deterministic given the key
    host2 = jax.tree_util.tree_map(np.asarray, state)
    s_off2, m_off2 = steps_lib.make_mle_step(cfg_off)(host2, batch)
    assert float(m_off["gen_pretrain_loss"]) == \
        float(m_off2["gen_pretrain_loss"])
