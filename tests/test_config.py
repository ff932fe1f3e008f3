"""Flag system: reference-parity defaults, round-trips, side effects."""

import os

from gan_image_captioning_tpu.config import (Config, build_parser,
                                             config_from_args, get_args)


def test_reference_defaults():
    """Every reference flag default (args.py:6-256) survives verbatim."""
    args = build_parser().parse_args([])
    assert args.gen_hidden_dim == 512 and args.gen_embed_dim == 32
    assert args.gen_num_layers == 1 and args.gen_init == "uniform"
    assert args.disc_embed_dim == 64 and args.disc_num_rep == 64
    assert args.disc_filter_sizes == [3, 4, 5]
    assert args.disc_num_filters == [300, 300, 300]
    assert args.conditional_gan == 0
    assert args.vocab_size == -1 and args.max_seq_len == 34
    assert args.padding_idx == 0 and args.image_size == 256
    assert args.captions_per_image == 1 and args.dataset_percent == 1.0
    assert args.pretrain_lr == 1e-2 and args.pretrain_epochs == 0
    assert args.pre_train_batch_size == 64
    assert args.gen_lr == 1e-4 and args.disc_lr == 1e-4
    assert args.disc_train_freq == 1 and args.adv_epochs == 30
    assert args.adv_loss_type == "standard"
    assert args.temperature == 100 and args.temp_adpt == "exp"
    assert args.clip_norm == 5.0
    assert args.expt_name == "debug" and args.model_dir == "models"
    assert args.save_dir == "./save" and args.log_file == "log"


def test_config_roundtrip_and_props():
    args = build_parser().parse_args(
        ["--max-seq-len", "20", "--conditional-gan", "1",
         "--disc-num-filters", "10,20"])
    cfg = config_from_args(args)
    assert cfg.seq_len == 22 and cfg.cgan
    assert cfg.disc_feature_dim == 30
    assert isinstance(cfg.disc_num_filters, tuple)  # hashable for jit
    hash(cfg)  # frozen dataclass must be hashable


def test_experiment_dir_autoincrement(tmp_path):
    """save/{expt}_{n} auto-increment (reference args.py:261-273)."""
    for expected in (1, 2):
        args = get_args(["--save-dir", str(tmp_path), "--expt-name", "run"])
        assert args.expt_name == f"run_{expected}"
        assert os.path.isdir(args.save_dir)
        assert os.path.isdir(args.model_dir)
        assert args.log_file.startswith(args.save_dir)
