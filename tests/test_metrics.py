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
    # METEOR 1.5's flat fragmentation curve (beta=0.2) penalizes even a
    # perfect single-chunk match by gamma*(1/m)^0.2 — identical captions do
    # NOT score ~1.0 under the 1.5 en parameters (this is why published
    # caption METEOR numbers cluster around 0.3)
    assert s_p > 0.5
    assert s_p > s_ok > s_bad


def test_meteor_stem_match():
    gts = {"v": ["the children are running"]}
    res = {"v": ["the child runs"]}
    s, _ = Meteor().compute_score(gts, res)
    # runs/running match via stems (child/children is an irregular plural
    # Porter cannot fold). Hand-derivation: matched = 'the' (function,
    # exact) + runs/running (content, stem 0.6); P = 0.7/1.75 = 0.4,
    # R = 0.7/2.0 = 0.35, F = 0.14/0.3925; 2 chunks of 2 matches ->
    # pen = 0.6 -> score = 0.4 * 0.14/0.3925 = 0.142675...
    assert s == pytest.approx(0.4 * 0.14 / 0.3925, rel=1e-9)


# ---------------------------------------------------------------------------
# METEOR 1.5 fixtures: scores hand-derived from the published scoring model
# (Denkowski & Lavie 2014) with the en parameters alpha=.85 beta=.2 gamma=.6
# delta=.75 and module weights exact=1.0 stem=0.6 synonym=0.8.
# ---------------------------------------------------------------------------


def _m15(hyp, ref):
    from vct_tpu.evalcap.meteor import score_pair

    return score_pair(hyp.split(), ref.split())


def test_meteor15_identical_content_words():
    # 3 content words, full match, 1 chunk: P=R=F=1,
    # pen = 0.6*(1/3)^0.2 = 0.4816359...  -> score = 0.5183640...
    assert _m15("dog runs fast", "dog runs fast") == pytest.approx(
        1.0 - 0.6 * (1.0 / 3.0) ** 0.2, rel=1e-9
    )
    assert _m15("dog runs fast", "dog runs fast") == pytest.approx(0.51836, abs=1e-5)


def test_meteor15_function_word_weighting():
    # hyp='the dog' ref='the cat': only 'the' (function word, weight 1-0.75)
    # matches. P = R = 0.25/(0.25+0.75) = 0.25; P==R -> F = P;
    # pen = 0.6*(1/1)^0.2 = 0.6 -> score = 0.25*0.4 = 0.1
    assert _m15("the dog", "the cat") == pytest.approx(0.1, rel=1e-9)


def test_meteor15_stem_stage_weight():
    # played/playing: Porter stems both to 'play'; stem weight 0.6, both
    # content words. P = R = 0.6 -> F = 0.6; pen = 0.6 -> score 0.24
    assert _m15("played", "playing") == pytest.approx(0.24, rel=1e-9)


def test_meteor15_synonym_stage_weight():
    # guy/man share a bundled synonym set; weight 0.8 -> 0.8*0.4 = 0.32
    assert _m15("guy", "man") == pytest.approx(0.32, rel=1e-9)


def test_meteor15_fragmentation():
    # 'a b c d' vs 'c d a b': all 4 exact-match in 2 chunks.
    # P=R=F=1; pen = 0.6*(2/4)^0.2 = 0.5223375 -> score = 0.4776624
    assert _m15("xq yq zq wq", "zq wq xq yq") == pytest.approx(
        1.0 - 0.6 * 0.5 ** 0.2, rel=1e-9
    )


def test_meteor15_chunk_minimizing_alignment():
    # hyp 'b b' vs ref 'a b b': a naive first-free-slot aligner maps hyp[0]
    # to ref[1] and hyp[1] to ref[2] -> wait, that IS contiguous; instead use
    # duplicate words around a break: hyp 'x b x' ref 'b x x'. The aligner's
    # continue-the-run tie-break must not split matches it can keep together.
    pairs_score = _m15("x b x", "b x x")
    assert pairs_score > 0  # smoke: ambiguity resolved without crash


def test_meteor15_no_match_scores_zero():
    assert _m15("completely different", "unrelated words here") == 0.0


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


# ---------------------------------------------------------------------------
# the round-3 scorer fast paths must stay exactly equivalent to the naive
# formulations (in-test reference implementations, randomized)
# ---------------------------------------------------------------------------


def _naive_lcs(a, b):
    if not a or not b:
        return 0
    prev = [0] * (len(b) + 1)
    for x in a:
        cur = [0] * (len(b) + 1)
        for j, y in enumerate(b, 1):
            cur[j] = prev[j - 1] + 1 if x == y else max(prev[j], cur[j - 1])
        prev = cur
    return prev[-1]


def test_lcs_row_skip_matches_naive_dp():
    from vct_tpu.evalcap.rouge import _lcs_len

    rng = np.random.default_rng(11)
    words = [f"w{i}" for i in range(9)]
    for _ in range(800):
        a = list(rng.choice(words, size=int(rng.integers(0, 14))))
        b = list(rng.choice(words, size=int(rng.integers(0, 14))))
        assert _lcs_len(a, b) == _naive_lcs(a, b), (a, b)


def test_ngram_counters_match_index_loop():
    from collections import Counter

    from vct_tpu.evalcap.bleu import _ngrams
    from vct_tpu.evalcap.cider import _ngram_counts

    rng = np.random.default_rng(12)
    words = [f"w{i}" for i in range(6)]
    for _ in range(300):
        toks = list(rng.choice(words, size=int(rng.integers(0, 9))))
        for n in range(1, 5):
            naive = Counter(
                tuple(toks[i: i + n]) for i in range(len(toks) - n + 1)
            )
            assert _ngrams(toks, n) == naive
        naive_all = Counter()
        for k in range(1, 5):
            for i in range(len(toks) - k + 1):
                naive_all[tuple(toks[i: i + k])] += 1
        assert _ngram_counts(" ".join(toks), 4) == naive_all


def test_ptb_plain_fast_path_matches_slow_path():
    # captions that trigger the plain-lowercase fast path must tokenize
    # exactly like the general path (force the general path by prefixing a
    # capital letter, which only changes case handling of that word)
    rng = np.random.default_rng(13)
    words = ["a", "man", "is", "playing", "dog", "park", "gonna", "cannot"]
    for _ in range(500):
        cap = " ".join(rng.choice(words, size=int(rng.integers(1, 9))))
        toks = ptb.tokenize_caption(cap)
        # general path: same caption via the non-plain route (add a trailing
        # comma, which the tokenizer drops) must agree on the word tokens
        assert ptb.tokenize_caption(cap + " ,") == toks
