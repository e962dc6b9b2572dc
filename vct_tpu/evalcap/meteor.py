"""METEOR-lite: a pure-Python METEOR with exact + Porter-stem match stages.

The reference scores METEOR through the ``meteor-1.5.jar`` **Java subprocess**
(``pycocoevalcap`` Meteor wrapper; README demands a JRE, ``README.md:33``).
With zero JVM dependency this module computes the METEOR formulation
(unigram alignment -> F-mean -> chunk fragmentation penalty) with the classic
parameters alpha=0.9, beta=3.0, gamma=0.5:

    P = m/|hyp|, R = m/|ref|
    F = P*R / (alpha*P + (1-alpha)*R)
    penalty = gamma * (chunks/m)^beta
    score   = F * (1 - penalty),  max over references, mean over images

Match stages: exact surface match, then Porter-stem match. The jar's extra
WordNet-synonym and paraphrase-table stages (and its language-tuned 1.5
parameters) need external resources this environment doesn't ship, so absolute
values differ slightly from the Java tool; the metric remains monotonically
comparable across checkpoints and is labelled METEOR throughout.
"""

from __future__ import annotations

from typing import Dict, List, Tuple

from vct_tpu.evalcap.stemmer import stem

ALPHA, BETA, GAMMA = 0.9, 3.0, 0.5


def _align(hyp: List[str], ref: List[str]) -> Tuple[int, int]:
    """Greedy two-stage alignment -> (matches, chunks).

    Matches are found left-to-right: exact first, then stem equality. Chunks =
    number of maximal runs of hyp matches whose ref positions are contiguous
    and increasing.
    """
    ref_used = [False] * len(ref)
    align: List[Tuple[int, int]] = []  # (hyp_idx, ref_idx)

    hyp_stem = [stem(w) for w in hyp]
    ref_stem = [stem(w) for w in ref]

    matched_hyp = set()
    for stage in ("exact", "stem"):
        for i, hw in enumerate(hyp):
            if i in matched_hyp:
                continue
            for j, rw in enumerate(ref):
                if ref_used[j]:
                    continue
                ok = hw == rw if stage == "exact" else hyp_stem[i] == ref_stem[j]
                if ok:
                    ref_used[j] = True
                    matched_hyp.add(i)
                    align.append((i, j))
                    break

    if not align:
        return 0, 0
    align.sort()
    chunks = 1
    for (h0, r0), (h1, r1) in zip(align, align[1:]):
        if not (h1 == h0 + 1 and r1 == r0 + 1):
            chunks += 1
    return len(align), chunks


def _score_pair(hyp: List[str], ref: List[str]) -> float:
    m, chunks = _align(hyp, ref)
    if m == 0:
        return 0.0
    p = m / len(hyp)
    r = m / len(ref)
    f = p * r / (ALPHA * p + (1 - ALPHA) * r)
    penalty = GAMMA * (chunks / m) ** BETA
    return f * (1 - penalty)


class Meteor:
    def method(self) -> str:
        return "METEOR"

    def compute_score(
        self, gts: Dict[str, List[str]], res: Dict[str, List[str]]
    ) -> Tuple[float, List[float]]:
        scores = []
        for img_id in gts.keys():
            hyp = res[img_id][0].split()
            refs = gts[img_id]
            scores.append(
                max(_score_pair(hyp, r.split()) for r in refs) if refs else 0.0
            )
        return sum(scores) / max(len(scores), 1), scores
