"""Caption-metric tests: sanity properties + cross-checks against nltk
(corpus BLEU algorithm, original Porter stemmer)."""

import numpy as np
import pytest

from vct_tpu.evalcap import ptb
from vct_tpu.evalcap.bleu import Bleu
from vct_tpu.evalcap.cider import Cider
from vct_tpu.evalcap.meteor import Meteor
from vct_tpu.evalcap.rouge import Rouge
from vct_tpu.evalcap.scorer import score_captions
from vct_tpu.evalcap.stemmer import stem

GTS = {
    "v1": ["a man is playing a guitar", "a man plays the guitar", "someone plays guitar"],
    "v2": ["a cat is sleeping on the couch", "the cat sleeps on a sofa"],
    "v3": ["children are running in the park", "kids run around a park"],
}
RES_PERFECT = {k: [v[0]] for k, v in GTS.items()}
RES_OK = {
    "v1": ["a man is playing guitar"],
    "v2": ["a cat sleeps on the couch"],
    "v3": ["children run in a park"],
}
RES_BAD = {k: ["completely unrelated words here"] for k in GTS}


def test_ptb_tokenizer():
    assert ptb.tokenize_caption("A man, who isn't here, plays!") == [
        "a", "man", "who", "is", "n't", "here", "plays",
    ]
    assert ptb.tokenize_caption("It's 3.5 km...") == ["it", "'s", "3.5", "km"]


def test_bleu_perfect_and_ordering():
    scores_p, per = Bleu(4).compute_score(GTS, RES_PERFECT)
    assert all(s > 0.99 for s in scores_p)
    assert len(per[3]) == len(GTS)
    scores_ok, _ = Bleu(4).compute_score(GTS, RES_OK)
    scores_bad, _ = Bleu(4).compute_score(GTS, RES_BAD)
    assert scores_p[3] > scores_ok[3] > scores_bad[3]


def test_bleu_matches_nltk_corpus_bleu():
    from nltk.translate.bleu_score import corpus_bleu

    refs = [[r.split() for r in GTS[k]] for k in GTS]
    hyps = [RES_OK[k][0].split() for k in GTS]
    ours, _ = Bleu(4).compute_score(GTS, RES_OK)
    for n in range(1, 5):
        w = tuple([1.0 / n] * n)
        theirs = corpus_bleu(refs, hyps, weights=w)
        np.testing.assert_allclose(ours[n - 1], theirs, atol=1e-6)


def test_rouge_properties():
    s_p, _ = Rouge().compute_score(GTS, RES_PERFECT)
    s_ok, _ = Rouge().compute_score(GTS, RES_OK)
    s_bad, _ = Rouge().compute_score(GTS, RES_BAD)
    assert s_p == pytest.approx(1.0)
    assert s_p > s_ok > s_bad


def test_cider_properties():
    s_p, per = Cider().compute_score(GTS, RES_PERFECT)
    s_ok, _ = Cider().compute_score(GTS, RES_OK)
    s_bad, _ = Cider().compute_score(GTS, RES_BAD)
    assert 0 <= s_bad < s_ok < s_p <= 10.0 + 1e-9
    assert len(per) == len(GTS)


def test_meteor_properties():
    s_p, _ = Meteor().compute_score(GTS, RES_PERFECT)
    s_ok, _ = Meteor().compute_score(GTS, RES_OK)
    s_bad, _ = Meteor().compute_score(GTS, RES_BAD)
    assert s_p > 0.9
    assert s_p > s_ok > s_bad


def test_meteor_stem_match():
    gts = {"v": ["the children are running"]}
    res = {"v": ["the child runs"]}
    s, _ = Meteor().compute_score(gts, res)
    # runs/running match via stems (child/children is an irregular plural
    # Porter cannot fold); exact-only matching would score ~0.19
    assert s > 0.25


def test_porter_stemmer_against_nltk():
    from nltk.stem.porter import PorterStemmer

    ps = PorterStemmer(mode="ORIGINAL_ALGORITHM")
    words = (
        "running plays playing played cats ponies caresses feed agreed "
        "plastered motoring sing conflated troubled sized hopping tanned "
        "falling hissing fizzed failing filing happy sky relational "
        "conditional rational valency hesitancy digitizer communism "
        "feudalism adoption formality sensitivity activate probate rate "
        "cease controller roll generalization generalize electrical"
    ).split()
    for w in words:
        assert stem(w) == ps.stem(w), w


def test_full_scorer_pipeline():
    scores = score_captions({k: v[0] for k, v in RES_OK.items()}, GTS)
    for key in ("Bleu_1", "Bleu_4", "METEOR", "ROUGE_L", "CIDEr"):
        assert key in scores
        assert scores[key] > 0


def test_hyphenated_compounds_stay_one_token():
    """Stanford PTBTokenizer keeps 'well-known' as a single token; splitting
    it would inflate n-gram credit for near-miss hypotheses."""
    assert ptb.tokenize_caption("a well-known man") == ["a", "well-known", "man"]
    assert ptb.tokenize_caption("state-of-the-art model") == ["state-of-the-art", "model"]


def test_empty_reference_list_scores_zero():
    """A video with zero ground-truth captions must score 0, not crash."""
    from vct_tpu.evalcap.scorer import COCOScorer, make_coco_sample

    gts, samples, ids = make_coco_sample(
        {"v1": "a man runs", "v2": "a cat"},
        {"v1": ["a man runs fast"], "v2": []},
    )
    scores = COCOScorer(verbose=False).score(gts, samples, ids)
    assert all(np.isfinite(v) for v in scores.values())
