"""Hand-checkable tests for the diversity + CIDEr-D metrics
(eval/diversity.py, eval/cider.py) and their evaluate-CLI wiring."""

import math

import numpy as np
import pytest

from gan_image_captioning_tpu.eval.cider import cider_d
from gan_image_captioning_tpu.eval.diversity import distinct_n, self_bleu


# ------------------------------------------------------------- diversity

def test_self_bleu_collapse_is_one():
    caps = [[5, 6, 7, 8, 9]] * 10
    assert self_bleu(caps) == pytest.approx(1.0)


def test_self_bleu_disjoint_is_zero():
    # no shared 1-grams at all → clipped counts 0 → BLEU 0
    caps = [[1, 2, 3, 4], [5, 6, 7, 8], [9, 10, 11, 12]]
    assert self_bleu(caps) == 0.0


def test_self_bleu_orders_diversity():
    collapsed = [[1, 2, 3, 4, 5]] * 8
    diverse = [[i, i + 1, i + 2, i + 3, i + 4] for i in range(0, 80, 10)]
    assert self_bleu(collapsed) > self_bleu(diverse)


def test_self_bleu_degenerate_inputs():
    assert self_bleu([]) == 0.0
    assert self_bleu([[1, 2, 3]]) == 0.0           # one caption: undefined → 0
    assert self_bleu([[], []]) == 0.0              # empties dropped


def test_distinct_n_hand_computed():
    # corpus: "a b", "a b" → unigrams 4 total / 2 unique; bigrams 2/1
    caps = [[7, 8], [7, 8]]
    assert distinct_n(caps, 1) == pytest.approx(0.5)
    assert distinct_n(caps, 2) == pytest.approx(0.5)
    # all-unique corpus → 1.0
    assert distinct_n([[1, 2], [3, 4]], 1) == pytest.approx(1.0)
    # no caption reaches length n → 0
    assert distinct_n([[1], [2]], 2) == 0.0


# --------------------------------------------------------------- CIDEr-D

def test_cider_perfect_match_scores_ten():
    """Candidate == single reference: cosine 1 for every n, penalty 1,
    so the score is exactly the conventional 10x scale."""
    caps = [[1, 2, 3, 4, 5, 6]]
    assert cider_d(caps, [[list(caps[0])]]) == pytest.approx(10.0)


def test_cider_disjoint_scores_zero():
    assert cider_d([[1, 2, 3, 4, 5]], [[[6, 7, 8, 9, 10]]]) == 0.0


def test_cider_idf_kills_corpus_constant_ngrams():
    """A unigram appearing in EVERY image's references has
    idf = log(N) - log(N) = 0 and must not contribute: a candidate made
    only of that token scores 0 even though it matches the reference."""
    refs = [[[1, 5, 6]], [[1, 7, 8]]]          # token 1 in both images
    score = cider_d([[1], [9]], refs)
    assert score == pytest.approx(0.0)


def test_cider_length_penalty_monotone():
    """Same matched content, growing length mismatch → strictly lower."""
    ref = [[1, 2, 3, 4]]
    exact = cider_d([[1, 2, 3, 4]], [ref])
    longer = cider_d([[1, 2, 3, 4, 9, 9]], [ref])      # delta 2
    longest = cider_d([[1, 2, 3, 4, 9, 9, 9, 9]], [ref])  # delta 4
    assert exact > longer > longest > 0.0


def test_cider_length_penalty_value():
    """With a single 1-gram-only vocabulary overlap the n>1 terms vanish
    and the score is 10/4 * penalty * cosine — check the Gaussian."""
    ref = [[1, 2]]
    # candidate [1] vs ref [1,2]: only unigram 1 matches.
    # cosine = idf1 / (idf1 * sqrt(idf1^2 + idf2^2) / idf1) … idfs equal
    # (both df=1, N treated as 2): cos = 1/sqrt(2).  penalty = exp(-1/72).
    got = cider_d([[1]], [ref])
    want = 10.0 / 4.0 * math.exp(-1.0 / 72.0) * (1.0 / math.sqrt(2.0))
    assert got == pytest.approx(want, rel=1e-6)


def test_cider_multiple_references_average():
    """Per-image score averages over the reference set."""
    cand = [[1, 2, 3]]
    refs = [[[1, 2, 3], [7, 8, 9]]]   # one perfect, one disjoint
    perfect_only = cider_d(cand, [[[1, 2, 3]]])
    both = cider_d(cand, refs)
    # disjoint ref contributes ~0 → averaging halves the per-n scores of
    # the n-grams still present; df rises for no shared grams, so the
    # score is at most half the perfect-only score.
    assert 0.0 < both <= perfect_only / 2.0 + 1e-9


def test_cider_empty_corpus():
    assert cider_d([], []) == 0.0


# --------------------------------------------------------------- ROUGE-L

def test_rouge_perfect_match_is_one():
    from gan_image_captioning_tpu.eval.rouge import rouge_l

    assert rouge_l([[1, 2, 3, 4]], [[[1, 2, 3, 4]]]) == pytest.approx(1.0)


def test_rouge_disjoint_is_zero():
    from gan_image_captioning_tpu.eval.rouge import rouge_l

    assert rouge_l([[1, 2, 3]], [[[4, 5, 6]]]) == 0.0


def test_rouge_hand_computed():
    """cand [a b c d] vs ref [a c d]: LCS=3, P=3/4, R=1,
    F = 2.44 * 0.75 / (1 + 1.44 * 0.75)."""
    from gan_image_captioning_tpu.eval.rouge import rouge_l

    want = (1 + 1.2 ** 2) * 0.75 * 1.0 / (1.0 + 1.2 ** 2 * 0.75)
    assert rouge_l([[1, 2, 3, 4]], [[[1, 3, 4]]]) == pytest.approx(want)


def test_rouge_lcs_not_substring():
    """LCS tolerates gaps: [a X b Y c] vs [a b c] still matches 3."""
    from gan_image_captioning_tpu.eval.rouge import rouge_l

    gapped = rouge_l([[1, 9, 2, 8, 3]], [[[1, 2, 3]]])
    scrambled = rouge_l([[3, 2, 1, 9, 8]], [[[1, 2, 3]]])
    assert gapped > scrambled > 0.0


def test_rouge_multiple_refs_takes_max():
    from gan_image_captioning_tpu.eval.rouge import rouge_l

    one = rouge_l([[1, 2, 3]], [[[9, 9, 9]]])
    best = rouge_l([[1, 2, 3]], [[[9, 9, 9], [1, 2, 3]]])
    assert one == 0.0 and best == pytest.approx(1.0)


def test_rouge_empty_corpus():
    from gan_image_captioning_tpu.eval.rouge import rouge_l

    assert rouge_l([], []) == 0.0
    assert rouge_l([[]], [[[1, 2]]]) == 0.0


# ---------------------------------------------------------------- METEOR

def test_meteor_perfect_match():
    """Identical 5-token captions: P=R=Fmean=1, one chunk,
    penalty = 0.5 * (1/5)^3."""
    from gan_image_captioning_tpu.eval.meteor import meteor

    want = 1.0 - 0.5 * (1.0 / 5.0) ** 3
    assert meteor([[1, 2, 3, 4, 5]], [[[1, 2, 3, 4, 5]]]) == \
        pytest.approx(want)


def test_meteor_disjoint_is_zero():
    from gan_image_captioning_tpu.eval.meteor import meteor

    assert meteor([[1, 2, 3]], [[[4, 5, 6]]]) == 0.0


def test_meteor_fragmentation_penalty():
    """Same matched unigrams, scrambled order → more chunks → lower."""
    from gan_image_captioning_tpu.eval.meteor import meteor

    ref = [[[1, 2, 3, 4, 5, 6]]]
    ordered = meteor([[1, 2, 3, 4, 5, 6]], ref)
    scrambled = meteor([[4, 5, 6, 1, 2, 3]], ref)   # 2 chunks
    shuffled = meteor([[6, 4, 2, 5, 3, 1]], ref)    # 6 chunks
    assert ordered > scrambled > shuffled > 0.0


def test_meteor_hand_computed_partial():
    """cand [a b x] vs ref [a b y]: m=2 (one chunk), P=2/3, R=2/3,
    Fmean=2/3, penalty=0.5*(1/2)^3."""
    from gan_image_captioning_tpu.eval.meteor import meteor

    want = (2.0 / 3.0) * (1.0 - 0.5 * 0.125)
    assert meteor([[1, 2, 8]], [[[1, 2, 9]]]) == pytest.approx(want)


def test_meteor_recall_weighted():
    """alpha=0.9 weights recall: missing ref tokens hurts more than
    adding extra candidate tokens."""
    from gan_image_captioning_tpu.eval.meteor import meteor

    ref = [[[1, 2, 3, 4]]]
    extra = meteor([[1, 2, 3, 4, 9, 9]], ref)    # P=4/6, R=1
    missing = meteor([[1, 2]], ref)              # P=1, R=2/4
    assert extra > missing


def test_meteor_multiple_refs_takes_best():
    from gan_image_captioning_tpu.eval.meteor import meteor

    solo = meteor([[1, 2, 3]], [[[9, 8, 7]]])
    best = meteor([[1, 2, 3]], [[[9, 8, 7], [1, 2, 3]]])
    assert solo == 0.0 and best > 0.9


def test_meteor_empty_corpus():
    from gan_image_captioning_tpu.eval.meteor import meteor

    assert meteor([], []) == 0.0
    assert meteor([[]], [[[1]]]) == 0.0


# ------------------------------------------------------------ CLI wiring

def test_evaluate_cli_reports_new_metrics(tmp_path):
    """src/evaluate.py --diversity --cider prints the new keys."""
    import json
    import subprocess
    import sys

    from gan_image_captioning_tpu.config import Config
    from gan_image_captioning_tpu.models import api
    from gan_image_captioning_tpu.train import checkpoint as ckpt_lib

    import jax

    from gan_image_captioning_tpu.data.synthetic import SyntheticCaptions

    vocab = SyntheticCaptions("train", num_items=32).vocab_size
    cfg = Config(vocab_size=vocab, gen_embed_dim=8, gen_hidden_dim=16,
                 max_seq_len=8, conditional_gan=0)
    params = api.init_generator(jax.random.PRNGKey(0), cfg)
    ckpt = tmp_path / "gen.ckpt"
    ckpt_lib.save_params(str(ckpt), params, sync=True)

    out = subprocess.run(
        [sys.executable, "src/evaluate.py", "--checkpoint", str(ckpt),
         "--dataset", "synthetic", "--synthetic-items", "32",
         "--max-seq-len", "8", "--gen-embed-dim", "8",
         "--gen-hidden-dim", "16", "--conditional-gan", "0",
         "--pre-eval-batch-size", "8", "--max-batches", "2",
         "--diversity", "--cider", "--rouge", "--meteor",
         "--save-dir", str(tmp_path / "save")],
        capture_output=True, text=True, cwd="/root/repo",
        env={**__import__("os").environ, "JAX_PLATFORM_NAME": "cpu"})
    assert out.returncode == 0, out.stderr[-2000:]
    line = [ln for ln in out.stdout.splitlines() if ln.startswith("{")][-1]
    res = json.loads(line)
    for key in ("nll_gen", "bleu4", "self_bleu4", "distinct1", "distinct2",
                "cider_d", "rouge_l", "meteor"):
        assert key in res
    assert 0.0 <= res["self_bleu4"] <= 1.0
    assert 0.0 <= res["distinct2"] <= 1.0
    assert res["cider_d"] >= 0.0
    assert 0.0 <= res["rouge_l"] <= 1.0
    assert 0.0 <= res["meteor"] <= 1.0
