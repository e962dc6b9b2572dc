"""PTB-style caption tokenizer.

The reference scores through ``pycocoevalcap``'s ``PTBTokenizer``, which
shells out to the Stanford CoreNLP **Java** jar (``eval.py:73-75``;
README requires a JRE). This is a dependency-free Python reimplementation of
the behavior that matters for caption scoring: lowercase, Penn-Treebank-style
word/contraction splitting, and removal of the same punctuation token set the
coco tokenizer drops. Both hypotheses and references pass through the same
tokenizer, so metric comparisons stay internally consistent.
"""

from __future__ import annotations

import re
from typing import Dict, List

# the punctuation tokens pycocoevalcap removes after tokenization
PUNCTUATIONS = {
    "''", "'", "``", "`", "-LRB-", "-RRB-", "-LCB-", "-RCB-",
    ".", "?", "!", ",", ":", "-", "--", "...", ";",
}

# contractions the PTB tokenizer splits off the preceding word
_CONTRACTIONS = re.compile(r"(n't|'ll|'re|'ve|'s|'m|'d)$", re.IGNORECASE)

_TOKEN = re.compile(
    # hyphenated compounds stay ONE token (PTBTokenizer keeps 'well-known');
    # words may carry an attached contraction
    r"[a-zA-Z]+(?:-[a-zA-Z]+)*(?:'[a-zA-Z]+)?"
    r"|\d+(?:[.,]\d+)*"  # numbers
    r"|\.\.\.|--"  # multi-char punct
    r"|[^\w\s]"  # single punct
)


def tokenize_caption(text: str) -> List[str]:
    out: List[str] = []
    for tok in _TOKEN.findall(text.replace("\n", " ")):
        tok = tok.lower()
        m = _CONTRACTIONS.search(tok)
        if m and m.start() > 0:
            out.append(tok[: m.start()])
            out.append(tok[m.start() :])
        else:
            out.append(tok)
    return [t for t in out if t not in PUNCTUATIONS]


def tokenize(captions_for_image: Dict[str, List[dict]]) -> Dict[str, List[str]]:
    """coco interface: {id: [{'caption': str}, ...]} -> {id: [tokenized str]}."""
    return {
        img_id: [" ".join(tokenize_caption(c["caption"])) for c in caps]
        for img_id, caps in captions_for_image.items()
    }
