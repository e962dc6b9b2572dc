"""PTB tokenizer fixture set (round-1 VERDICT missing #3).

Every caption metric consumes ``evalcap.ptb`` output, so its drift against
the reference's Stanford ``PTBTokenizer`` + pycocoevalcap punctuation filter
(``/root/reference/eval.py:73-75``) must be bounded. The Stanford jar cannot
run here (no JRE / no jar), so these input->output pairs are frozen from the
DOCUMENTED PTB-3 tokenization conventions that the Stanford tokenizer
implements (contraction splitting, special-word splits, -LRB-/-RRB- bracket
escapes, quote conversion) composed with pycocoevalcap's exact postprocessing
(lowercase, drop the PUNCTUATIONS token list, join with single spaces). Each
case notes the convention it pins. Divergences discovered against the real
jar should be fixed in ``ptb.py`` or documented here.
"""

import pytest

from vct_tpu.evalcap.ptb import tokenize, tokenize_caption

# (input, expected space-joined output, convention pinned)
FIXTURES = [
    # --- casing + whitespace ------------------------------------------------
    ("A Man Rides a Horse", "a man rides a horse", "lowercase"),
    ("a  man\trides", "a man rides", "whitespace collapse"),
    ("a man\nrides", "a man rides", "newline is whitespace"),
    ("", "", "empty caption"),
    # --- sentence-final + internal punctuation (coco drops PUNCTUATIONS) ----
    ("a man rides.", "a man rides", "final period dropped"),
    ("a man, a plan, a canal", "a man a plan a canal", "commas dropped"),
    ("stop!", "stop", "exclamation dropped"),
    ("really?", "really", "question mark dropped"),
    ("one: two; three", "one two three", "colon/semicolon dropped"),
    ("wait -- what", "wait what", "double dash dropped"),
    ("and then...", "and then", "ellipsis dropped"),
    ("a man - a plan", "a man a plan", "lone hyphen token dropped"),
    # --- contraction splitting (PTB-3: clitics split off) -------------------
    ("don't run", "do n't run", "n't split"),
    ("doesn't work", "does n't work", "n't split"),
    ("it's red", "it 's red", "'s split"),
    ("the man's hat", "the man 's hat", "possessive 's split"),
    ("they're here", "they 're here", "'re split"),
    ("we'll see", "we 'll see", "'ll split"),
    ("i've seen it", "i 've seen it", "'ve split"),
    ("i'm running", "i 'm running", "'m split"),
    ("he'd gone", "he 'd gone", "'d split"),
    # --- PTB special-case word splits ----------------------------------------
    ("i cannot see", "i can not see", "cannot -> can not"),
    ("gonna rain", "gon na rain", "gonna -> gon na"),
    ("wanna play", "wan na play", "wanna -> wan na"),
    ("gotta go", "got ta go", "gotta -> got ta"),
    ("gimme that", "gim me that", "gimme -> gim me"),
    ("lemme see", "lem me see", "lemme -> lem me"),
    # --- brackets / quotes: escaped to -LRB- etc then dropped by coco -------
    ("(a man) rides", "a man rides", "-LRB-/-RRB- dropped"),
    ("[a man] rides", "a man rides", "bracket escapes dropped"),
    ("{a man} rides", "a man rides", "-LCB-/-RCB- dropped"),
    ('"hello" world', "hello world", "quote escapes dropped"),
    ("the 'best' dog", "the best dog", "single-quote tokens dropped"),
    # --- hyphenated compounds stay single tokens ----------------------------
    ("a well-known man", "a well-known man", "hyphenated compound intact"),
    ("state-of-the-art model", "state-of-the-art model", "multi-hyphen intact"),
    ("t-shirt and jeans", "t-shirt and jeans", "letter-hyphen compound"),
    # --- numbers --------------------------------------------------------------
    ("a 10 year old", "a 10 year old", "plain number"),
    ("over 1,000 people", "over 1,000 people", "comma-grouped number intact"),
    ("a 3.5 mm jack", "a 3.5 mm jack", "decimal number intact"),
    # --- possessive plural: trailing apostrophe becomes a ' token, dropped --
    ("the dogs' bowls", "the dogs bowls", "plural possessive apostrophe"),
    # --- mixed realistic captions --------------------------------------------
    (
        "A man isn't riding the horse; he's walking.",
        "a man is n't riding the horse he 's walking",
        "mixed contraction + punctuation",
    ),
    (
        "Two kids (a boy and a girl) can't stop laughing!",
        "two kids a boy and a girl ca n't stop laughing",
        "ca n't split (PTB: can't -> ca + n't)",
    ),
    (
        "The chef adds salt, pepper, and 2 cups of flour.",
        "the chef adds salt pepper and 2 cups of flour",
        "list with numbers",
    ),
    ("someone says \"let's go\"", "someone says let 's go", "quoted contraction"),
    ("won't won't", "wo n't wo n't", "won't -> wo n't"),
    # --- alphanumeric + unicode words (CoreNLP keeps these whole) -----------
    ("a 5th grader", "a 5th grader", "ordinal stays one token"),
    ("an mp3 player in a 4x4", "an mp3 player in a 4x4", "alphanumeric words"),
    ("café costs 3.5 dollars", "café costs 3.5 dollars",
     "accented word kept; decimal number one token"),
    # round-5 review: CoreNLP normalizes typographic Unicode punctuation,
    # so curly apostrophes split contractions like ASCII ones and curly
    # quotes / em-dashes / ellipses are dropped, not leaked into n-grams
    ("don’t run", "do n't run", "curly apostrophe contraction"),
    ("a “big” dog — running", "a big dog running",
     "curly quotes and em-dash dropped"),
    ("wait… now", "wait now", "unicode ellipsis dropped"),
    ("it–goes", "it goes", "en-dash separates words"),
    # archaic leading-apostrophe contractions reach the special-split table
    ("'twas a dark night", "'t was a dark night", "PTB 'twas split"),
    ("'Tis fine", "'t is fine", "PTB 'tis split, case-folded"),
]


@pytest.mark.parametrize("text,expected,why", FIXTURES, ids=[f[2] for f in FIXTURES])
def test_ptb_fixture(text, expected, why):
    assert " ".join(tokenize_caption(text)) == expected, why


def test_coco_interface_shape():
    out = tokenize({"v1": [{"caption": "Don't stop!"}, {"caption": "A man."}]})
    assert out == {"v1": ["do n't stop", "a man"]}
