"""Corpus BLEU: hand-computed cases + invariants."""

import math

import pytest

import numpy as np

from gan_image_captioning_tpu.eval.bleu import corpus_bleu
from gan_image_captioning_tpu.eval.metrics import (bleu4_from_batches,
                                                   strip_caption)


def test_perfect_match_is_one():
    c = [["a", "cat", "sat", "on", "the", "mat"]]
    assert corpus_bleu(c, [c[0:1]]) == 1.0


def test_hand_computed_bleu2():
    # candidate: "the cat the cat", ref: "the cat sat"
    cand = [["the", "cat", "the", "cat"]]
    refs = [[["the", "cat", "sat"]]]
    # 1-gram: clipped counts: the→min(2,1)=1, cat→min(2,1)=1 → 2/4
    # 2-gram: "the cat"×2→min(2,1)=1, "cat the"→0 → 1/3
    # BP: c=4 > r=3 → 1
    expected = math.exp(0.5 * (math.log(2 / 4) + math.log(1 / 3)))
    got = corpus_bleu(cand, refs, max_n=2)
    np.testing.assert_allclose(got, expected, rtol=1e-12)


def test_brevity_penalty():
    cand = [["a", "cat"]]
    refs = [[["a", "cat", "sat", "on"]]]
    # precisions are 1.0; BP = exp(1 - 4/2)
    np.testing.assert_allclose(corpus_bleu(cand, refs, max_n=2),
                               math.exp(1 - 4 / 2), rtol=1e-12)


def test_zero_when_no_4gram_overlap():
    cand = [["a", "b", "c", "d", "e"]]
    refs = [[["f", "g", "h", "i", "j"]]]
    assert corpus_bleu(cand, refs, max_n=4) == 0.0


def test_multiple_references_max_clip():
    cand = [["a", "a"]]
    refs = [[["a"], ["a", "a"]]]  # second ref allows both unigrams
    assert corpus_bleu(cand, refs, max_n=1) == 1.0


def test_strip_caption():
    # <S>=1, <E>=2, <PAD>=0 (tasks.py:42-44)
    assert strip_caption([1, 5, 6, 2, 0, 0]) == [5, 6]
    assert strip_caption([5, 6, 7]) == [5, 6, 7]  # no <E> → keep all
    assert strip_caption([1, 2]) == []


def test_bleu4_from_batches_skips_pad_rows():
    gen = [np.array([[1, 5, 6, 7, 8, 2], [1, 9, 9, 9, 9, 2]])]
    real = [np.array([[1, 5, 6, 7, 8, 2], [1, 3, 3, 3, 3, 2]])]
    w_all = [np.array([1.0, 1.0])]
    w_first = [np.array([1.0, 0.0])]
    # with the mismatching row masked out, BLEU is perfect
    assert bleu4_from_batches(gen, real, w_first) == 1.0
    assert bleu4_from_batches(gen, real, w_all) < 1.0


def test_oracle_bleu4_picks_best_candidate():
    from gan_image_captioning_tpu.eval.bleu import corpus_bleu, oracle_bleu4

    ref = [list("the cat sat on the mat".split())]
    good = list("the cat sat on the mat".split())
    bad = list("zebra zebra zebra".split())
    assert oracle_bleu4([[bad, good]], [ref]) == pytest.approx(
        corpus_bleu([good], [ref]))
    assert oracle_bleu4([[bad]], [ref]) == pytest.approx(
        corpus_bleu([bad], [ref]))
