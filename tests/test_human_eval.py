"""Human-evaluation harness (NLP_Report Table 6 protocol): blind sheet
generation + per-system score aggregation."""

import csv
import json
import os
import sys

import jax
import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from gan_image_captioning_tpu.config import Config
from gan_image_captioning_tpu.models import api
from gan_image_captioning_tpu.train import checkpoint as ckpt_lib

DIMS = ["--dataset", "synthetic", "--max-seq-len", "9",
        "--gen-embed-dim", "12", "--gen-hidden-dim", "16",
        "--pre-eval-batch-size", "8", "--num-workers", "1"]


@pytest.fixture(scope="module")
def ckpts(tmp_path_factory):
    tmp = str(tmp_path_factory.mktemp("human_eval"))
    cfg = Config(vocab_size=35, gen_embed_dim=12, gen_hidden_dim=16,
                 max_seq_len=9)
    gen = api.init_generator(jax.random.PRNGKey(0), cfg)
    disc = api.init_discriminator(jax.random.PRNGKey(1), cfg)
    adv_path = os.path.join(tmp, "adv.ckpt")
    ckpt_lib.save_params(adv_path, {"generator": gen, "discriminator": disc})
    mle_path = os.path.join(tmp, "mle.ckpt")
    ckpt_lib.save_params(mle_path, api.init_generator(jax.random.PRNGKey(2),
                                                      cfg))
    return adv_path, mle_path


def test_sheet_generation_blind_and_complete(ckpts, tmp_path, capsys):
    from src.human_eval import main

    adv, mle = ckpts
    sheet = os.path.join(str(tmp_path), "sheet.csv")
    key = os.path.join(str(tmp_path), "key.json")
    main(["--checkpoint", adv, "--mle-checkpoint", mle, *DIMS,
          "--num-images", "6", "--sheet", sheet, "--key", key])
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["num_images"] == 6
    assert out["systems"] == ["generated", "mle", "real"]
    assert out["rows"] == 18  # 3 systems x 6 images

    rows = list(csv.DictReader(open(sheet)))
    assert len(rows) == 18
    # blind: the sheet never names a system
    for r in rows:
        assert set(r) == {"row_id", "image_id", "caption", "rating"}
        assert r["rating"] == ""
    with open(key) as f:
        k = json.load(f)
    # every sheet row maps to a system; each image has each system once
    per_img = {}
    for r in rows:
        system = k["rows"][r["row_id"]]["system"]
        per_img.setdefault(r["image_id"], []).append(system)
    assert all(sorted(v) == ["generated", "mle", "real"]
               for v in per_img.values())
    # adv ckpt → discriminator realism scores per system in the key
    assert set(k["disc_scores"]) == {"generated", "mle", "real"}
    assert all(len(v) == 6 for v in k["disc_scores"].values())
    assert all(0.0 <= s <= 1.0 for v in k["disc_scores"].values()
               for s in v)


def test_score_aggregation_table6_means(ckpts, tmp_path, capsys):
    from src.human_eval import main

    adv, mle = ckpts
    sheet = os.path.join(str(tmp_path), "sheet.csv")
    key = os.path.join(str(tmp_path), "key.json")
    main(["--checkpoint", adv, "--mle-checkpoint", mle, *DIMS,
          "--num-images", "4", "--sheet", sheet, "--key", key])
    capsys.readouterr()

    # Fill ratings: real=5, mle=4, generated=2; leave one row blank.
    with open(key) as f:
        k = json.load(f)
    want = {"real": 5.0, "mle": 4.0, "generated": 2.0}
    rows = list(csv.DictReader(open(sheet)))
    blanked = rows[0]["row_id"]
    for r in rows:
        if r["row_id"] == blanked:
            continue
        r["rating"] = str(int(want[k["rows"][r["row_id"]]["system"]]))
    filled = os.path.join(str(tmp_path), "filled.csv")
    with open(filled, "w", newline="") as f:
        w = csv.DictWriter(f, fieldnames=["row_id", "image_id", "caption",
                                          "rating"])
        w.writeheader()
        w.writerows(rows)

    main(["--score-sheet", filled, "--key", key, "--checkpoint", "x",
          "--dataset", "synthetic"])
    result = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert result["num_blank"] == 1
    assert result["num_rated"] == len(rows) - 1
    blank_sys = k["rows"][blanked]["system"]
    for system, val in want.items():
        # the blanked row drops one sample from its system's mean, but all
        # ratings within a system are equal so the mean is unchanged
        assert result[f"rating_{system}"] == pytest.approx(val), system
    assert 0.0 <= result["disc_score_generated"] <= 1.0
    assert blank_sys in want

    # hand-edited sheets: 'n/a' cells are skipped AND reported by row_id;
    # European decimals parse
    rows[1]["rating"] = "n/a"
    rows[2]["rating"] = "3,5"
    with open(filled, "w", newline="") as f:
        w = csv.DictWriter(f, fieldnames=["row_id", "image_id", "caption",
                                          "rating"])
        w.writeheader()
        w.writerows(rows)
    main(["--score-sheet", filled, "--key", key, "--checkpoint", "x",
          "--dataset", "synthetic"])
    result = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert result["unparsable_rows"] == [rows[1]["row_id"]]
    assert result["num_rated"] == len(rows) - 2  # blank + n/a dropped
