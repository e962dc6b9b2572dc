"""Absolute-value METEOR fixtures (round-2 VERDICT missing #1 / next-#4).

WordNet and the meteor-1.5 resource files are unreachable in this
environment (zero egress; ``nltk.download('wordnet')`` fails), so the
external truth these fixtures pin against is the PUBLISHED scoring model
itself: Denkowski & Lavie 2014 ("Meteor Universal"), en parameters
alpha=0.85 beta=0.2 gamma=0.6 delta=0.75, module weights exact=1.0
stem=0.6 synonym=0.8. Every expected value below is derived by hand from
those formulas (the closed form is written out in each test), on sentence
pairs whose one-to-one alignment is unambiguous — so the tests verify
absolute scores, not previously-recorded outputs of this implementation.

Weighted precision/recall (delta content/function weighting):
  P = sum_i wt_i * w_stage(i) / sum_i wt_i   over hypothesis words
  R = same over reference words
  Fmean = P*R / (alpha*P + (1-alpha)*R)
  penalty = gamma * (chunks / matches)^beta
  score = (1 - penalty) * Fmean
"""

import pytest

from vct_tpu.evalcap.meteor import Meteor, score_pair

A, B_, G, D = 0.85, 0.2, 0.6, 0.75  # alpha, beta, gamma, delta
W_EXACT, W_STEM, W_SYN = 1.0, 0.6, 0.8


def test_identical_content_words():
    """3 exact content matches, 1 chunk: P=R=1, Fmean=1,
    penalty = gamma*(1/3)^beta."""
    s = score_pair("cat sat mat".split(), "cat sat mat".split())
    assert s == pytest.approx(1.0 - G * (1.0 / 3.0) ** B_, abs=1e-12)


def test_function_word_weighting():
    """Only 'the' (function word, weight 1-delta=0.25) matches:
    P = R = 0.25*1 / (0.25 + 0.75) = 0.25; Fmean = 0.25; 1 match/1 chunk
    -> penalty = gamma."""
    s = score_pair("the cat".split(), "the dog".split())
    p = r = (1 - D) * W_EXACT / ((1 - D) + D)
    fmean = p * r / (A * p + (1 - A) * r)
    assert fmean == pytest.approx(0.25)
    assert s == pytest.approx((1 - G) * fmean, abs=1e-12)


def test_stem_match_weight():
    """'running' vs 'runs' match only at the stem stage (Porter both ->
    'run'): P = R = w_stem = 0.6, Fmean = 0.6, penalty = gamma."""
    s = score_pair(["running"], ["runs"])
    assert s == pytest.approx((1 - G) * W_STEM, abs=1e-12)


def test_synonym_match_weight():
    """'automobile' vs 'car' match only at the synonym stage:
    P = R = w_syn = 0.8, Fmean = 0.8, penalty = gamma."""
    s = score_pair(["automobile"], ["car"])
    assert s == pytest.approx((1 - G) * W_SYN, abs=1e-12)


def test_fragmentation_penalty():
    """All 4 content words match exactly but in 3 chunks
    ((0,0) | (1,2),(2,3) | (3,1)): Fmean = 1,
    penalty = gamma*(3/4)^beta."""
    s = score_pair("dog barks loudly outside".split(),
                   "dog outside barks loudly".split())
    assert s == pytest.approx(1.0 - G * (3.0 / 4.0) ** B_, abs=1e-12)


def test_precision_recall_asymmetry():
    """hyp 'cat' vs ref 'black cat': P = 1, R = 0.5 (one of two content
    words), Fmean = 0.5/0.925, penalty = gamma."""
    s = score_pair(["cat"], ["black", "cat"])
    p, r = 1.0, 0.5
    fmean = p * r / (A * p + (1 - A) * r)
    assert s == pytest.approx((1 - G) * fmean, abs=1e-12)


def test_no_match_zero():
    assert score_pair(["cat"], ["window"]) == 0.0
    assert score_pair([], ["cat"]) == 0.0
    assert score_pair(["cat"], []) == 0.0


def test_stage_priority_exact_over_synonym():
    """With both an exact and a synonym candidate free, the exact stage
    claims its match first: hyp 'car' against ref 'automobile car' must
    align to the exact 'car' (weight 1.0), giving
    P = 1, R = 0.75/1.5 = 0.5 — not the synonym weight."""
    s = score_pair(["car"], ["automobile", "car"])
    p, r = 1.0, 0.5
    fmean = p * r / (A * p + (1 - A) * r)
    assert s == pytest.approx((1 - G) * fmean, abs=1e-12)


def test_corpus_mean_and_max_over_refs():
    """compute_score = mean over images of max over references."""
    gts = {
        "v1": ["cat sat mat", "a window"],
        "v2": ["dog barks loudly outside"],
    }
    res = {"v1": ["cat sat mat"], "v2": ["dog outside barks loudly"]}
    mean, scores = Meteor().compute_score(gts, res)
    exp1 = 1.0 - G * (1.0 / 3.0) ** B_   # perfect ref wins the max
    # v2: hyp and ref swapped vs the fragmentation fixture -> same
    # match set, chunks((0,0),(1,3),(2,1),(3,2)) = 3 of 4
    exp2 = 1.0 - G * (3.0 / 4.0) ** B_
    assert scores[0] == pytest.approx(exp1, abs=1e-12)
    assert scores[1] == pytest.approx(exp2, abs=1e-12)
    assert mean == pytest.approx((exp1 + exp2) / 2, abs=1e-12)


def test_perfect_long_sentence_approaches_point_six_penalty_limit():
    """Perfect m-word match: score = 1 - gamma*(1/m)^beta -> 1 as m grows;
    the m=10 closed form."""
    words = ("alpha bravo charlie delta echo foxtrot golf hotel india "
             "juliet").split()
    s = score_pair(words, words)
    assert s == pytest.approx(1.0 - G * (1.0 / 10.0) ** B_, abs=1e-12)
