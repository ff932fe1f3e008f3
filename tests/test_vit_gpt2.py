"""ViT encoder + GPT-2 preset (stretch config)."""

import jax
import jax.numpy as jnp
import numpy as np

from gan_image_captioning_tpu.config import Config, build_parser, config_from_args
from gan_image_captioning_tpu.models import vit as vit_lib
from gan_image_captioning_tpu.models import encoder as encoder_lib


def test_vit_shapes():
    class C:  # minimal config stub for image_size
        image_size = 32

    weights, stats = vit_lib.init_vit_params(jax.random.PRNGKey(0), C())
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 3, 32, 32))
    pooled, _ = vit_lib.vit(weights, stats, x)
    grid, _ = vit_lib.vit_grid(weights, stats, x)
    assert pooled.shape == (2, 768)
    assert grid.shape == (2, 4, 768)  # 32/16 = 2 → 2x2 patches


def test_patchify_roundtrip_structure():
    x = jnp.arange(2 * 3 * 32 * 32, dtype=jnp.float32).reshape(2, 3, 32, 32)
    p = vit_lib._patchify(x)
    assert p.shape == (2, 4, 16 * 16 * 3)
    # first patch's first channel value = images[0, :, 0, 0] arrangement:
    # layout is (ph, pw, C) flattened
    np.testing.assert_allclose(np.asarray(p[0, 0, :3]),
                               np.asarray(x[0, :, 0, 0]))


def test_vit_encoder_conditional_step():
    cfg = Config(vocab_size=40, gen_embed_dim=16, gen_hidden_dim=32,
                 max_seq_len=6, conditional_gan=1, encoder_arch="vit",
                 image_size=32, disc_embed_dim=8, disc_num_rep=4,
                 disc_filter_sizes=(2,), disc_num_filters=(8,))
    params = encoder_lib.init_encoder_params(jax.random.PRNGKey(0), cfg)
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 3, 32, 32))
    feats, stats = encoder_lib.encode(params, x, cfg, train=True)
    assert feats.shape == (2, 16)
    feats2, grid, _ = encoder_lib.encode_with_grid(params, x, cfg, train=False)
    assert grid.shape == (2, 4, 768)


def test_gpt2_preset():
    args = build_parser().parse_args(["--gen-arch", "gpt2"])
    cfg = config_from_args(args)
    assert cfg.gen_arch == "transformer"
    assert (cfg.gen_embed_dim, cfg.gen_hidden_dim, cfg.gen_num_layers,
            cfg.gen_num_heads) == (768, 3072, 12, 12)


def test_gpt2_tiny_decode_runs():
    """The GPT-2 shape family decodes (scaled-down depth for test speed)."""
    from gan_image_captioning_tpu.models import api

    cfg = Config(vocab_size=50, gen_arch="transformer", gen_embed_dim=64,
                 gen_hidden_dim=256, gen_num_layers=3, gen_num_heads=4,
                 max_seq_len=6)
    params = api.init_generator(jax.random.PRNGKey(0), cfg)
    from gan_image_captioning_tpu.models.generator import start_token_features

    feats = start_token_features({"embed": params["decoder"]["embed"]}, 2)
    cond = {"features": feats, "context": None}
    soft, ids = api.generator_sample(params, cond, jax.random.PRNGKey(1),
                                     2.0, cfg.seq_len, False, cfg)
    assert soft.shape == (2, cfg.seq_len, 50) and ids.shape == (2, cfg.seq_len)
