"""Absolute-value fixtures for CIDEr-D and ROUGE-L (round-4 VERDICT #3).

METEOR has closed-form fixtures to 1e-12 (``test_meteor_fixtures.py``) and
Bleu cross-checks nltk; until now CIDEr/ROUGE-L had only property tests, so a
silent formulation bug (sigma, df mode, clipping, beta, max-vs-average over
references) could shift the MSVD CIDEr-113.8 comparison unnoticed. Every
expected value below is HAND-DERIVED from the pycocoevalcap formulation the
reference invokes (``/root/reference/eval.py:73-108``) — the full arithmetic
is in the comments, so the fixtures are independent of the implementation
under test. pycocoevalcap itself is not installable in this environment
(Java-free rebuild is the point); ROUGE-L additionally cross-checks LCS
precision/recall against Google's ``rouge_score`` package (independent
implementation), recombined with pycocoevalcap's beta=1.2.

CIDEr-D recap (cider_scorer.py): n-grams n=1..4; corpus document frequency
counted ONCE per image over its reference set; idf = log(N) - log(max(1,df));
g_k(w) = tf * idf; per-n clipped cosine sim = sum(min(h,r)*r)/(|h||r|);
length penalty exp(-(len_h-len_r)^2 / (2*6^2)) on unigram token counts;
average over n THEN over references, times 10. ROUGE-L recap (rouge.py):
LCS-based P/R per reference, max P and max R taken INDEPENDENTLY across
references, F-beta with beta=1.2, mean over images.
"""

import math

import pytest

from vct_tpu.evalcap.cider import Cider
from vct_tpu.evalcap.rouge import Rouge

LOG2 = math.log(2.0)
TOL = 1e-12


def _cider(gts, res):
    return Cider().compute_score(gts, res)


def _rouge(gts, res):
    return Rouge().compute_score(gts, res)


# ---------------------------------------------------------------------------
# CIDEr-D
# ---------------------------------------------------------------------------


def test_cider_single_image_corpus_is_zero():
    """N=1 quirk: idf = log(1) - log(max(1, df)) = 0 for every reference
    n-gram, so all TF-IDF vectors vanish and even a PERFECT hypothesis scores
    0 — the corpus-df construction makes single-image CIDEr meaningless, and
    matching that behavior (rather than 'fixing' it) is what parity means."""
    score, per = _cider({"v": ["a b c d e"]}, {"v": ["a b c d e"]})
    assert abs(score - 0.0) <= TOL
    assert per == [0.0]


def test_cider_perfect_match_short_sentences():
    """Two disjoint images, hyp == ref = 2 tokens. All df=1 -> idf=log2.
    n=1: vec={a:log2,b:log2}, |v|=sqrt(2)*log2; sim = 2*log2^2/(2*log2^2)=1.
    n=2: vec={(a,b):log2}; sim=1. n=3,4: no n-grams -> 0 (norm guard).
    Per image: 10 * (1+1+0+0)/4 = 5.0 — a perfect match does NOT score 10
    when the sentence is too short to have 3/4-grams (per-n averaging)."""
    gts = {"u": ["a b"], "v": ["c d"]}
    res = {"u": ["a b"], "v": ["c d"]}
    score, per = _cider(gts, res)
    assert abs(score - 5.0) <= TOL
    assert all(abs(p - 5.0) <= TOL for p in per)


def test_cider_perfect_match_all_orders():
    """4-token perfect matches populate every n-gram order: sim_n = 1 for
    n=1..4, per image 10 * 4/4 = 10.0 — pins the x10 scale and that 10 is
    attainable exactly when all orders are covered."""
    gts = {"u": ["a b c d"], "v": ["e f g h"]}
    res = {"u": ["a b c d"], "v": ["e f g h"]}
    score, per = _cider(gts, res)
    assert abs(score - 10.0) <= TOL
    assert all(abs(p - 10.0) <= TOL for p in per)


def test_cider_gaussian_length_penalty_sigma6():
    """Image u: hyp 'a' (1 token) vs ref 'a b c d' (4 tokens), delta=-3,
    penalty = exp(-9/72) = exp(-0.125).
    All df=1 -> idf=log2 everywhere (image v supplies N=2).
    n=1: hyp vec {a:log2} |h|=log2; ref |r|=2*log2;
         sim = log2*log2/(log2*2*log2) = 1/2 -> val = 0.5*exp(-0.125).
    n>=2: hyp has none -> 0. Image u: 10*(0.5*exp(-0.125))/4
    = 1.25*exp(-0.125). Image v ('x y' perfect 2-token): 5.0 (above)."""
    gts = {"u": ["a b c d"], "v": ["x y"]}
    res = {"u": ["a"], "v": ["x y"]}
    expected_u = 1.25 * math.exp(-0.125)
    score, per = _cider(gts, res)
    assert abs(per[0] - expected_u) <= TOL
    assert abs(per[1] - 5.0) <= TOL
    assert abs(score - (expected_u + 5.0) / 2.0) <= TOL


def test_cider_d_count_clipping():
    """CIDEr-D's anti-gaming clip: hyp 'a a' repeats a word the single ref
    'a' has once. idf('a')=log2 (df=1; image v gives N=2); hyp bigram (a,a)
    never appears in ANY ref -> df=0 -> idf defaults to log(N)=log2.
    n=1: hyp w=2*log2, |h|=2*log2; ref w=log2, |r|=log2;
         clipped: min(2log2, log2)*log2 = log2^2 -> /(2log2*log2) = 1/2
         (UNclipped cosine would give 1.0 — the clip is observable).
    n=2: ref has no bigrams -> norm guard -> 0.
    penalty: delta = 2-1 = 1 -> exp(-1/72).
    Image u: 10*(0.5*exp(-1/72))/4 = 1.25*exp(-1/72). Image v 'b'=='b':
    n=1 sim 1, others 0 -> 2.5."""
    gts = {"u": ["a"], "v": ["b"]}
    res = {"u": ["a a"], "v": ["b"]}
    expected_u = 1.25 * math.exp(-1.0 / 72.0)
    score, per = _cider(gts, res)
    assert abs(per[0] - expected_u) <= TOL
    assert abs(per[1] - 2.5) <= TOL
    assert abs(score - (expected_u + 2.5) / 2.0) <= TOL


def test_cider_averages_over_references():
    """Unlike ROUGE/METEOR (max over refs), CIDEr AVERAGES over references.
    Image u refs ['a b', 'a c'], hyp 'a b' (df of 'a' counted once per image
    -> 1 -> idf=log2 for every n-gram; image v supplies N=2):
      vs 'a b': sim1=1, sim2=1.
      vs 'a c': n=1 overlap 'a' only: log2^2/(sqrt2*log2)^2 = 1/2; n=2: 0.
    sum over refs: n1=1.5, n2=1.0 -> 10 * (2.5/4)/2 = 3.125.
    Image v perfect 2-token: 5.0."""
    gts = {"u": ["a b", "a c"], "v": ["d e"]}
    res = {"u": ["a b"], "v": ["d e"]}
    score, per = _cider(gts, res)
    assert abs(per[0] - 3.125) <= TOL
    assert abs(per[1] - 5.0) <= TOL
    assert abs(score - (3.125 + 5.0) / 2.0) <= TOL


def test_cider_idf_zeroes_corpus_universal_words():
    """df mode: 'a' appears in BOTH images' reference sets -> df=2 ->
    idf = log2 - log2 = 0. A hypothesis made only of corpus-universal words
    scores 0 (image u), while unique words keep full weight: image v's
    'a c' == ref scores n1: (0*0 + log2*log2)/(log2*log2) = 1 (the zero-idf
    'a' drops out of both norms), n2 ((a,c), df=1): 1 -> 5.0."""
    gts = {"u": ["a b"], "v": ["a c"]}
    res = {"u": ["a"], "v": ["a c"]}
    score, per = _cider(gts, res)
    assert abs(per[0] - 0.0) <= TOL
    assert abs(per[1] - 5.0) <= TOL
    assert abs(score - 2.5) <= TOL


# ---------------------------------------------------------------------------
# ROUGE-L
# ---------------------------------------------------------------------------


def test_rouge_identity_is_one():
    score, per = _rouge({"v": ["a b c d"]}, {"v": ["a b c d"]})
    assert abs(score - 1.0) <= TOL and abs(per[0] - 1.0) <= TOL


def test_rouge_beta_1_2_fbeta():
    """hyp 'a b c' vs ref 'a c': LCS=2 -> P=2/3, R=1.
    F = (1+1.2^2) * P * R / (R + 1.2^2 * P) — beta=1.2 favors recall; plain
    F1 would give 0.8, this gives ~0.8299."""
    p, r = 2.0 / 3.0, 1.0
    expected = (1 + 1.2**2) * p * r / (r + 1.2**2 * p)
    score, _ = _rouge({"v": ["a c"]}, {"v": ["a b c"]})
    assert abs(score - expected) <= TOL
    assert abs(expected - 0.8299319727891157) <= 1e-12  # literal anchor


def test_rouge_independent_max_p_and_max_r_across_refs():
    """pycocoevalcap quirk: max precision and max recall are taken over the
    reference set INDEPENDENTLY, then combined — the F can exceed what any
    single reference yields. hyp 'a b': vs 'a b c d' P=1, R=1/2; vs 'b'
    P=1/2, R=1. maxP=1 and maxR=1 combine to F=1.0 even though no single
    reference scores 1."""
    score, _ = _rouge({"v": ["a b c d", "b"]}, {"v": ["a b"]})
    assert abs(score - 1.0) <= TOL


def test_rouge_lcs_is_subsequence_not_substring():
    """hyp 'a x b y c' vs ref 'a b c': LCS=3 (non-contiguous) -> P=3/5, R=1.
    F = (1+1.44)*0.6/(1 + 1.44*0.6)."""
    p = 3.0 / 5.0
    expected = (1 + 1.2**2) * p * 1.0 / (1.0 + 1.2**2 * p)
    score, _ = _rouge({"v": ["a b c"]}, {"v": ["a x b y c"]})
    assert abs(score - expected) <= TOL


def test_rouge_disjoint_is_zero():
    score, per = _rouge({"v": ["a b c"]}, {"v": ["x y z"]})
    assert score == 0.0 and per == [0.0]


def test_rouge_corpus_mean_over_images():
    """Corpus score is the plain mean of per-image scores."""
    p = 2.0 / 3.0
    f_u = (1 + 1.2**2) * p * 1.0 / (1.0 + 1.2**2 * p)  # the beta fixture
    gts = {"u": ["a c"], "w": ["x y z"]}
    res = {"u": ["a b c"], "w": ["p q r"]}
    score, per = _rouge(gts, res)
    assert abs(per[0] - f_u) <= TOL and per[1] == 0.0
    assert abs(score - f_u / 2.0) <= TOL


def test_rouge_cross_check_against_rouge_score_package():
    """Independent-implementation cross-check: Google's ``rouge_score``
    computes rougeL LCS precision/recall; recombining those with
    pycocoevalcap's beta=1.2 must reproduce our per-image scores. Single-ref
    images (the package is single-ref); plain lowercase words so its
    default tokenizer is a no-op relative to .split()."""
    rouge_scorer = pytest.importorskip("rouge_score.rouge_scorer")

    corpus = [
        ("a man is playing a guitar on stage", "a man plays the guitar"),
        ("two dogs run across the field", "dogs are running in a field"),
        ("someone slices a tomato", "a person is slicing a tomato quickly"),
        ("the cat sat", "the black cat sat down"),
    ]
    scorer = rouge_scorer.RougeScorer(["rougeL"])
    ours = Rouge()
    b2 = 1.2**2
    for i, (ref, hyp) in enumerate(corpus):
        s = scorer.score(ref, hyp)["rougeL"]
        p_ind, r_ind = s.precision, s.recall
        if p_ind == 0.0 or r_ind == 0.0:
            expected = 0.0
        else:
            expected = (1 + b2) * p_ind * r_ind / (r_ind + b2 * p_ind)
        got = ours.calc_score(hyp, [ref])
        assert abs(got - expected) <= 1e-9, (i, got, expected)
