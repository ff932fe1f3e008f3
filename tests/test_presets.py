"""--preset: named BASELINE.json benchmark-configuration bundles applied as
flag defaults (config.py:PRESETS / _PresetParser).  Explicit flags must win
regardless of argv order."""

import pytest

from gan_image_captioning_tpu.config import (PRESETS, build_parser,
                                             config_from_args)


def _cfg(argv):
    args = build_parser().parse_args(argv)
    if args.vocab_size < 0:
        args.vocab_size = 64
    return config_from_args(args)


def test_all_presets_parse_to_configs():
    for name in PRESETS:
        cfg = _cfg(["--preset", name])
        assert cfg.vocab_size == 64  # sanity: Config built


def test_config3_matches_sbatch_geometry():
    # The canonical invocation, reference sbatch_script.s:16.
    cfg = _cfg(["--preset", "config3"])
    assert cfg.gen_embed_dim == 512 and cfg.gen_num_layers == 2
    assert cfg.pretrain_epochs == 50 and cfg.adv_epochs == 50
    assert cfg.pretrain_lr == 1e-2 and cfg.gen_lr == 1e-4
    assert cfg.disc_lr == 1e-4 and cfg.dataset_percent == 0.1
    assert cfg.captions_per_image == 5


def test_config4_transformer_reinforce():
    cfg = _cfg(["--preset", "config4"])
    assert cfg.gen_arch == "transformer" and cfg.disc_arch == "transformer"
    assert cfg.gen_embed_dim == 256 and cfg.gen_hidden_dim == 256
    assert cfg.gen_num_layers == 4 and cfg.gen_num_heads == 8
    assert cfg.adv_objective == "reinforce" and cfg.rollout_num == 4


def test_config5_stretch():
    cfg = _cfg(["--preset", "config5"])
    # gpt2 expands to the GPT-2-small transformer geometry
    # (config_from_args).
    assert cfg.gen_arch == "transformer" and cfg.gen_embed_dim == 768
    assert cfg.gen_num_layers == 12 and cfg.gen_num_heads == 12
    assert cfg.encoder_arch == "vit" and cfg.conditional_gan == 1
    assert cfg.tokenizer == "bpe" and cfg.dtype == "bfloat16"


def test_explicit_flag_beats_preset_after():
    cfg = _cfg(["--preset", "config3", "--gen-lr", "5e-5"])
    assert cfg.gen_lr == 5e-5
    assert cfg.gen_embed_dim == 512  # rest of the preset intact


def test_explicit_flag_beats_preset_before():
    # argv order must not matter — the preset is applied as DEFAULTS.
    cfg = _cfg(["--gen-lr", "5e-5", "--preset", "config3"])
    assert cfg.gen_lr == 5e-5


def test_preset_equals_syntax():
    cfg = _cfg(["--preset=config4"])
    assert cfg.gen_arch == "transformer"


def test_unknown_preset_errors():
    with pytest.raises(SystemExit):
        build_parser().parse_args(["--preset", "config9"])


def test_no_preset_keeps_reference_defaults():
    cfg = _cfg([])
    assert cfg.gen_embed_dim == 32 and cfg.gen_arch == "lstm"
    assert cfg.adv_epochs == 30  # reference default, args.py:149-153
