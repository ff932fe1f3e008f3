"""ViT pretrained-weight import oracle (BASELINE.json config 5 encoder).

Zero-egress: fabricates a ViT-B-width (768/12-head) but shallow (2-block)
``transformers.ViTModel`` checkpoint and verifies
``vit_from_torch`` reproduces the HF model's CLS and patch-grid features
through our block stack — the same strategy as tests/test_gpt2_import.py.
``hidden_act='gelu_new'`` keeps both sides on the tanh GELU so the
comparison is exact (real ViT-B uses erf GELU — O(1e-3) feature delta,
documented in the converter docstring).
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

import jax
import jax.numpy as jnp

from gan_image_captioning_tpu.models import vit as vit_lib
from gan_image_captioning_tpu.models.torch_import import vit_from_torch


def _tiny_vitb(image_size=32):
    cfg = transformers.ViTConfig(
        hidden_size=768, num_hidden_layers=2, num_attention_heads=12,
        intermediate_size=3072, image_size=image_size, patch_size=16,
        hidden_act="gelu_new", layer_norm_eps=1e-5)
    torch.manual_seed(7)
    return transformers.ViTModel(cfg, add_pooling_layer=False).eval()


def test_vit_import_matches_hf_features():
    model = _tiny_vitb(image_size=32)
    weights, stats = vit_from_torch(model.state_dict(), image_size=32)
    assert len(weights["blocks"]) == 2
    assert stats == {}

    rng = np.random.default_rng(0)
    images = rng.standard_normal((2, 3, 32, 32)).astype(np.float32)
    with torch.no_grad():
        hf = model(torch.from_numpy(images)).last_hidden_state.numpy()

    cls_ours, _ = vit_lib.vit(weights, stats, jnp.asarray(images))
    grid_ours, _ = vit_lib.vit_grid(weights, stats, jnp.asarray(images))
    np.testing.assert_allclose(np.asarray(cls_ours), hf[:, 0],
                               atol=2e-4, rtol=2e-4)
    np.testing.assert_allclose(np.asarray(grid_ours), hf[:, 1:],
                               atol=2e-4, rtol=2e-4)


def test_vit_pos_embedding_resize():
    """Importing at a larger image size bilinearly resizes the patch-grid
    position rows (CLS row preserved) and the backbone runs end-to-end."""
    model = _tiny_vitb(image_size=32)                     # 2×2 patch grid
    weights, stats = vit_from_torch(model.state_dict(), image_size=64)
    assert weights["pos"].shape[0] == 1 + (64 // 16) ** 2
    orig = np.asarray(model.state_dict()["embeddings.position_embeddings"])
    np.testing.assert_allclose(np.asarray(weights["pos"][0]), orig[0, 0],
                               atol=1e-6)
    images = jnp.asarray(np.random.default_rng(1).standard_normal(
        (1, 3, 64, 64)).astype(np.float32))
    feats, _ = vit_lib.vit(weights, stats, images)
    assert feats.shape == (1, 768)
    assert np.isfinite(np.asarray(feats)).all()


def test_import_vit_cli(tmp_path):
    """src/import_vit.py converts a bare state_dict into a generator ckpt
    that --init-gen-ckpt can consume with --encoder-arch vit."""
    import sys

    sys.path.insert(0, "/root/repo")
    from src.import_vit import main as import_main

    model = _tiny_vitb(image_size=32)
    sd_path = str(tmp_path / "vit_sd.pt")
    torch.save(model.state_dict(), sd_path)
    out = str(tmp_path / "vit_gen.ckpt")
    import_main(["--state-dict", sd_path, "--output", out,
                 "--image-size", "32", "--conditional-gan", "1",
                 "--vocab-multiple", "1", "--max-seq-len", "6",
                 "--gen-embed-dim", "16", "--gen-hidden-dim", "16",
                 "--gen-num-layers", "1"])
    assert "vit_gen.ckpt" in out

    from gan_image_captioning_tpu.config import (build_parser,
                                                 config_from_args)
    from gan_image_captioning_tpu.models import api
    from gan_image_captioning_tpu.train import checkpoint as ckpt_lib

    args = build_parser().parse_args(
        ["--conditional-gan", "1", "--encoder-arch", "vit",
         "--image-size", "32", "--max-seq-len", "6",
         "--gen-embed-dim", "16", "--gen-hidden-dim", "16",
         "--gen-num-layers", "1"])
    args.vocab_size = 256
    config = config_from_args(args)
    template = api.init_generator(jax.random.PRNGKey(0), config)
    # the fabricated oracle is 2 blocks deep (real ViT-B == vit.DEPTH == 12,
    # where template and checkpoint agree structurally)
    template["encoder"]["backbone"]["blocks"] = \
        template["encoder"]["backbone"]["blocks"][:2]
    loaded = ckpt_lib.load_params(out, template)
    got = np.asarray(loaded["encoder"]["backbone"]["cls"])
    want = np.asarray(model.state_dict()["embeddings.cls_token"])
    np.testing.assert_allclose(got, want, atol=1e-6)
