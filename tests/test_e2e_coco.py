"""End-to-end: the full CLI path (main → datasets → instructor → checkpoints)
on a fabricated mini-COCO directory — BASELINE.json config 1's CPU-runnable
slice at test scale."""

import json
import os
import sys

import numpy as np
import pytest


@pytest.fixture(scope="module")
def mini_coco(tmp_path_factory):
    """A tiny on-disk COCO layout: dataset_coco.json + JPEGs under
    train2014/ and val2014/ (the reference's expected layout, tasks.py:120)."""
    from PIL import Image

    root = str(tmp_path_factory.mktemp("coco"))
    rows = []
    rng = np.random.RandomState(0)
    words = ["a", "red", "green", "cat", "dog", "sits", "runs", "on", "mat"]
    for i in range(12):
        split_dir = "train2014" if i < 8 else "val2014"
        os.makedirs(os.path.join(root, split_dir), exist_ok=True)
        color = tuple(int(c) for c in rng.randint(0, 255, 3))
        Image.new("RGB", (48, 36), color).save(
            os.path.join(root, split_dir, f"img_{i}.jpg"))
        sentences = []
        for s in range(2):
            toks = list(rng.choice(words, size=rng.randint(3, 7)))
            sentences.append({"tokens": toks, "raw": " ".join(toks),
                              "imgid": i, "sentid": 10 * i + s})
        rows.append({"filepath": split_dir, "filename": f"img_{i}.jpg",
                     "imgid": i, "split": "train" if i < 8 else "val",
                     "sentences": sentences})
    with open(os.path.join(root, "dataset_coco.json"), "w") as f:
        json.dump({"images": rows}, f)
    return root


def test_full_cli_run_on_mini_coco(mini_coco, tmp_path):
    """python src/main.py on a real COCO-format dir: conditional LSTM GAN,
    1 pretrain + 1 adv epoch, checkpoint files written."""
    sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__)))))
    from src.main import main

    save_dir = os.path.join(str(tmp_path), "save")
    inst = main([
        "--data-dir", mini_coco, "--dataset", "coco",
        "--conditional-gan", "1", "--image-size", "32",
        "--captions-per-image", "2",
        "--pretrain-epochs", "1", "--adv-epochs", "1",
        "--max-seq-len", "8",
        "--pre-train-batch-size", "4", "--pre-eval-batch-size", "4",
        "--adv-train-batch-size", "4", "--adv-eval-batch-size", "4",
        "--gen-embed-dim", "12", "--gen-hidden-dim", "16",
        "--disc-embed-dim", "8", "--disc-num-rep", "4",
        "--disc-filter-sizes", "2,3", "--disc-num-filters", "6,6",
        "--num-workers", "1",
        "--save-dir", save_dir, "--expt-name", "e2e",
    ])
    model_dir = os.path.join(save_dir, "e2e_1", "models")
    assert os.path.isdir(os.path.join(model_dir, "pretrained_model.ckpt"))
    assert os.path.isdir(os.path.join(model_dir, "adv_model.ckpt"))
    # vocab was built from the train split and injected (main.py:38 parity)
    assert inst.config.vocab_size > 4
    # reference-compatible pickle caches materialized (tasks.py:30-37)
    assert os.path.exists(os.path.join(mini_coco, "train_2.pkl"))
    assert os.path.exists(os.path.join(mini_coco, "val_2.pkl"))
    # metrics stream exists and contains both phases
    metrics_path = os.path.join(save_dir, "e2e_1", "metrics.jsonl")
    tags = {json.loads(line)["tag"] for line in open(metrics_path)}
    assert "GenPreTraining_train_loss" in tags
    assert "Generator_train_loss" in tags and "Discriminator_train_loss" in tags


def test_multi_ref_grouping(mini_coco):
    """image_key groups the flattened per-caption rows back to images (2
    captions per image in this fixture)."""
    from gan_image_captioning_tpu.data.coco import CocoCaptions

    cj = os.path.join(mini_coco, "dataset_coco.json")
    train = CocoCaptions(cj, mini_coco, "train", 48,
                         captions_per_image=2, conditional=False)
    ds = CocoCaptions(cj, mini_coco, "val", 48, captions_per_image=2,
                      vocab_dicts=(train.word_to_index,
                                   train.index_to_word),
                      conditional=False)
    keys = [ds.image_key(i) for i in range(len(ds))]
    assert len(keys) == 8  # 4 val images × 2 captions
    from collections import Counter
    assert all(v == 2 for v in Counter(keys).values())


def test_evaluate_multi_ref_cli(mini_coco, tmp_path, capsys):
    """--multi-ref: one candidate per image vs all its references; CIDEr/
    BLEU computed over num_images groups."""
    import json as _json

    import jax

    from gan_image_captioning_tpu.config import (build_parser,
                                                 config_from_args)
    from gan_image_captioning_tpu.models import api
    from gan_image_captioning_tpu.train import checkpoint as ckpt_lib
    from src import evaluate as eval_cli
    from src.main import build_datasets, inject_vocab_size

    parser = build_parser()
    args = parser.parse_args([
        "--data-dir", mini_coco, "--dataset", "coco",
        "--captions-per-image", "2", "--max-seq-len", "8",
        "--gen-embed-dim", "12", "--gen-hidden-dim", "16",
        "--pre-eval-batch-size", "4", "--num-workers", "1"])
    train_ds, _ = build_datasets(args)
    inject_vocab_size(args, train_ds)
    cfg = config_from_args(args)
    params = api.init_generator(jax.random.PRNGKey(0), cfg)
    ckpt = os.path.join(str(tmp_path), "gen.ckpt")
    ckpt_lib.save_params(ckpt, params)

    eval_cli.main([
        "--data-dir", mini_coco, "--dataset", "coco",
        "--captions-per-image", "2", "--max-seq-len", "8",
        "--gen-embed-dim", "12", "--gen-hidden-dim", "16",
        "--pre-eval-batch-size", "4", "--num-workers", "1",
        "--checkpoint", ckpt, "--multi-ref", "--cider", "--device", "cpu"])
    out = _json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["num_samples"] == 8     # 4 val images × 2 caption rows
    assert out["num_images"] == 4      # grouped
    assert "bleu4_multiref" in out and "cider_d" in out
