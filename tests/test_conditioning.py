"""Conditioning wiring: the image must measurably steer the decoder.

Full "learns the color from the image" training is NOT asserted here.
Measured finding: the reference's init sweep (uniform ±0.05 over EVERY
parameter incl. BatchNorm scales, generator.py:116-123) attenuates the
ResNet to ~1e-9 cross-image feature variance — the conditional encoder is
numerically dead at init and must be resurrected by training, which is
consistent with the report's own Table 4 (conditioning barely moved NLL:
cond-LSTM 3.76 vs uncond 3.54).  See docs/results.md.  These tests
therefore use the UN-swept (kaiming/ones-BN) encoder init to assert the
wiring itself.

What IS asserted: the mechanism — features vary with the image, gradients
reach the encoder, and changing the image changes the decoder's
first-token distribution.
"""

import jax
import jax.numpy as jnp
import numpy as np

from gan_image_captioning_tpu.config import Config
from gan_image_captioning_tpu.data.loader import make_batch
from gan_image_captioning_tpu.data.synthetic import SyntheticCaptions
from gan_image_captioning_tpu.models import api


def _cfg(ds):
    return Config(vocab_size=ds.vocab_size, gen_embed_dim=24,
                  gen_hidden_dim=48, max_seq_len=9, conditional_gan=1,
                  image_size=16, trainable_backbone=1)


def test_features_vary_with_image_and_steer_logits():
    ds = SyntheticCaptions("train", num_items=8, image_size=16,
                           conditional=True)
    cfg = _cfg(ds)
    params = api.init_generator(jax.random.PRNGKey(0), cfg)
    from gan_image_captioning_tpu.models import encoder as encoder_lib

    # healthy encoder init (the swept one is numerically dead, see docstring)
    params = dict(params, encoder=encoder_lib.init_encoder_params(
        jax.random.PRNGKey(2), cfg))

    caps = [ds.sample(i)[0] for i in range(8)]
    imgs = [ds.sample(i)[1] for i in range(8)]
    batch = make_batch(caps, imgs, cfg.seq_len)
    cond, _ = api.generator_condition(cfg, params, batch, train=False)
    feats = np.asarray(cond["features"])
    # cross-image variance is nonzero (tiny under the reference init sweep,
    # but the signal exists)
    assert float(feats.std(axis=0).mean()) > 1e-4

    # swapping the image changes the first-token logits
    outs_a = api.generator_mle_outputs(params, cond,
                                       jnp.asarray(batch["captions"]),
                                       jax.random.PRNGKey(1), cfg)
    batch_b = dict(batch, images=batch["images"][::-1].copy())
    cond_b, _ = api.generator_condition(cfg, params, batch_b, train=False)
    outs_b = api.generator_mle_outputs(params, cond_b,
                                       jnp.asarray(batch["captions"]),
                                       jax.random.PRNGKey(1), cfg)
    first_tok_delta = float(np.abs(np.asarray(outs_a[:, 0])
                                   - np.asarray(outs_b[:, 0])).max())
    assert first_tok_delta > 1e-5


def test_encoder_receives_training_gradient_through_mle():
    ds = SyntheticCaptions("train", num_items=8, image_size=16,
                           conditional=True)
    cfg = _cfg(ds)
    from gan_image_captioning_tpu.train.steps import mle_loss

    params = api.init_generator(jax.random.PRNGKey(0), cfg)
    caps = [ds.sample(i)[0] for i in range(4)]
    imgs = [ds.sample(i)[1] for i in range(4)]
    batch = make_batch(caps, imgs, cfg.seq_len)
    grads = jax.grad(lambda p: mle_loss(cfg, p, batch, jax.random.PRNGKey(1),
                                        train=True)[0])(params)
    g_backbone = float(np.abs(np.asarray(
        grads["encoder"]["backbone"]["conv1"]["w"])).max())
    g_proj = float(np.abs(np.asarray(grads["encoder"]["proj"]["w"])).max())
    assert g_proj > 0.0 and g_backbone > 0.0
