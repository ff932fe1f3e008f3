"""Early stopping (--early-stop-patience), --length-penalty plumbing, and
the run-dir config.json dump."""

import json
import os

import numpy as np
import pytest

from gan_image_captioning_tpu.config import Config, build_parser, \
    config_from_args
from gan_image_captioning_tpu.data.synthetic import SyntheticCaptions
from gan_image_captioning_tpu.train.instructor import GANInstructor


def _cfg(tmp_path, **kw):
    ds = SyntheticCaptions("train", num_items=16)
    base = dict(vocab_size=ds.vocab_size, gen_embed_dim=8, gen_hidden_dim=12,
                max_seq_len=6, disc_embed_dim=8, disc_num_rep=2,
                disc_filter_sizes=(2,), disc_num_filters=(6,),
                conditional_gan=0, num_workers=1,
                pre_train_batch_size=8, pre_eval_batch_size=8,
                adv_train_batch_size=8, adv_eval_batch_size=8,
                save_dir=os.path.join(str(tmp_path), "save"),
                model_dir=os.path.join(str(tmp_path), "save", "models"),
                log_file=os.path.join(str(tmp_path), "save", "log"))
    base.update(kw)
    return Config(**base)


def test_pretrain_early_stop_on_scripted_losses(tmp_path):
    cfg = _cfg(tmp_path, pretrain_epochs=10, adv_epochs=0,
               early_stop_patience=2)
    inst = GANInstructor(cfg, SyntheticCaptions("train", num_items=16),
                         SyntheticCaptions("val", num_items=8), silent=True)
    # val: improves at epoch 1, then worsens — must stop after epoch 3
    script = {"train": [1.0] * 10, "val": [0.9, 0.5, 0.6, 0.7, 0.4, 0.3,
                                           0.2, 0.1, 0.1, 0.1]}
    calls = {"train": 0, "val": 0}

    def fake_loop(what, start_batch=0):
        i = calls[what]
        calls[what] += 1
        return [script[what][i]]

    inst.genpretrain_loop = fake_loop
    inst.pretrain_generator(cfg.pretrain_epochs)
    assert calls["val"] == 4          # epochs 0..3 then stop
    from gan_image_captioning_tpu.train import checkpoint as ckpt_lib

    ckpt_lib.wait_for_checkpoints()   # saves are async
    assert os.path.isdir(os.path.join(cfg.model_dir,
                                      "pretrained_model.ckpt"))


def test_adv_early_stop_on_scripted_losses(tmp_path):
    cfg = _cfg(tmp_path, pretrain_epochs=0, adv_epochs=10,
               early_stop_patience=3)
    inst = GANInstructor(cfg, SyntheticCaptions("train", num_items=16),
                         SyntheticCaptions("val", num_items=8), silent=True)
    g_vals = [0.9, 0.8, 0.85, 0.9, 0.95, 0.2, 0.2, 0.2, 0.2, 0.2]
    epochs_run = []

    def fake_adv_loop(what, adv_epoch, start_batch=0):
        if what == "val":
            epochs_run.append(adv_epoch)
            return g_vals[adv_epoch], 1.0
        return 1.0, 1.0

    inst.adv_loop = fake_adv_loop
    inst._run()
    # best at epoch 1 (0.8); epochs 2,3,4 don't improve → stop at 4,
    # never reaching the 0.2 values
    assert epochs_run == [0, 1, 2, 3, 4]


def test_flags_reach_config():
    args = build_parser().parse_args(
        ["--early-stop-patience", "5", "--length-penalty", "0.7"])
    args.vocab_size = 32
    cfg = config_from_args(args)
    assert cfg.early_stop_patience == 5
    assert cfg.length_penalty == pytest.approx(0.7)


def test_main_dumps_config_json(tmp_path):
    from src.main import main

    inst = main(["--dataset", "synthetic", "--pretrain-epochs", "1",
                 "--adv-epochs", "0", "--max-seq-len", "6",
                 "--gen-embed-dim", "8", "--gen-hidden-dim", "12",
                 "--pre-train-batch-size", "8", "--synthetic-items", "16",
                 "--save-dir", os.path.join(str(tmp_path), "save"),
                 "--expt-name", "cfgdump"])
    path = os.path.join(inst.config.save_dir, "config.json")
    assert os.path.exists(path)
    blob = json.load(open(path))
    assert blob["vocab_size"] == inst.config.vocab_size
    assert blob["gen_embed_dim"] == 8


def test_vocab_multiple_roundtrip_through_cli_tools(tmp_path):
    """Regression: every checkpoint-loading CLI must apply the SAME
    --vocab-multiple padding training did (src/main.py:inject_vocab_size) —
    previously only main.py padded, so flagship (--vocab-multiple) ckpts
    failed to load in evaluate/caption/serve."""
    from src.caption import main as cap_main
    from src.main import main as train_main

    geometry = ["--dataset", "synthetic", "--max-seq-len", "6",
                "--gen-embed-dim", "8", "--gen-hidden-dim", "12",
                "--synthetic-items", "16", "--vocab-multiple", "16"]
    inst = train_main(geometry + [
        "--pretrain-epochs", "1", "--adv-epochs", "0",
        "--pre-train-batch-size", "8",
        "--save-dir", os.path.join(str(tmp_path), "save"),
        "--expt-name", "vm"])
    assert inst.config.vocab_size % 16 == 0
    ck = os.path.join(inst.config.model_dir, "pretrained_model.ckpt")

    out = os.path.join(str(tmp_path), "caps.jsonl")
    cap_main(geometry + ["--checkpoint", ck, "--num-samples", "2",
                         "--output", out])
    lines = open(out).read().strip().splitlines()
    assert len(lines) == 2 and "caption" in lines[0]


def test_beam_length_penalty_changes_ranking_shape():
    """length_penalty flows through beam_search: alpha > 0 divides scores by
    ((5+len)/6)^alpha — same ids for alpha=0 vs tiny alpha on a toy model,
    but the returned scores must differ when lengths > 1."""
    import jax

    from gan_image_captioning_tpu.eval import decode as decode_lib
    from gan_image_captioning_tpu.models import api

    ds = SyntheticCaptions("train", num_items=8)
    cfg = Config(vocab_size=ds.vocab_size, gen_embed_dim=8,
                 gen_hidden_dim=12, max_seq_len=6, conditional_gan=0)
    params = api.init_generator(jax.random.PRNGKey(0), cfg)
    from gan_image_captioning_tpu.models.generator import (
        start_token_features)

    feats = start_token_features(params["decoder"], 4)
    ids0, s0 = decode_lib.beam_search(params, feats, cfg, beam_size=3,
                                      length_penalty=0.0)
    ids1, s1 = decode_lib.beam_search(params, feats, cfg, beam_size=3,
                                      length_penalty=1.0)
    assert not np.allclose(np.asarray(s0), np.asarray(s1))
