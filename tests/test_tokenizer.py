"""WordPiece tokenizer behavior tests (BERT algorithm, no HF dependency)."""

import numpy as np
import pytest

from vct_tpu.text.tokenizer import CaptionPreprocessor, WordPieceTokenizer

VOCAB_TOKENS = [
    "[PAD]", "[UNK]", "[CLS]", "[SEP]", "[MASK]",
    "a", "man", "is", "play", "##ing", "the", "guitar", ".", ",",
    "cat", "##s", "run", "##ning", "dog", "on", "skate", "##board",
    "un", "##want", "##ed", "你", "好",
]


@pytest.fixture
def tok():
    return WordPieceTokenizer({t: i for i, t in enumerate(VOCAB_TOKENS)})


def test_basic_and_wordpiece(tok):
    assert tok.tokenize("A man is playing the guitar.") == [
        "a", "man", "is", "play", "##ing", "the", "guitar", ".",
    ]
    # greedy longest-match continuation
    assert tok.tokenize("cats running") == ["cat", "##s", "run", "##ning"]
    # punctuation split even without spaces
    assert tok.tokenize("man,dog") == ["man", ",", "dog"]
    # unknown word -> [UNK]
    assert tok.tokenize("xylophone") == ["[UNK]"]
    # accents stripped, lowercased
    assert tok.tokenize("Mán") == ["man"]


def test_cjk_spacing(tok):
    assert tok.tokenize("你好") == ["你", "好"]


def test_encode_adds_specials(tok):
    ids = tok.encode("a man")
    assert ids[0] == tok.start_id and ids[-1] == tok.end_id
    assert tok.convert_ids_to_tokens(ids) == ["[CLS]", "a", "man", "[SEP]"]


def test_convert_tokens_to_string(tok):
    s = tok.convert_tokens_to_string(["play", "##ing", "the", "guitar", "."])
    assert s == "playing the guitar ."


def test_decode_caption_truncation_semantics(tok):
    """MMT4Caption.py:174-183: cut at first [SEP]; no [SEP] -> drop last token."""
    cls, sep = tok.start_id, tok.end_id
    a, man, run = tok.vocab["a"], tok.vocab["man"], tok.vocab["run"]
    assert tok.decode_caption([cls, a, man, sep, run, run]) == "a man"
    # no SEP: last token dropped
    assert tok.decode_caption([cls, a, man, run]) == "a man"


def test_preprocessor_static_shapes(tok):
    prep = CaptionPreprocessor(tok, max_len=8)
    ids, mask = prep(["a man is playing the guitar .", "a man"])
    assert ids.shape == (2, 8) and mask.shape == (2, 8)
    # truncated rows still end with [SEP]
    assert ids[0, -1] == tok.end_id
    assert not mask[0].any()
    assert ids[1, 0] == tok.start_id and ids[1, 3] == tok.end_id
    np.testing.assert_array_equal(mask[1], [False] * 4 + [True] * 4)
    assert (ids[1, 4:] == tok.pad_id).all()


def test_wordpiece_parity_with_hf_bert_tokenizer(tmp_path):
    """Property parity vs transformers.BertTokenizer built from the same local
    vocab file (no hub access) across punctuation/accents/CJK/unk cases."""
    transformers = pytest.importorskip("transformers")

    vocab = ["[PAD]", "[UNK]", "[CLS]", "[SEP]", "[MASK]",
             "a", "man", "rides", "horse", "##s", "##ing", "rid", "play",
             "##ed", "the", "!", ",", "'", "s", "7", "o", "##'", "##clock",
             "un", "##aff", "##able", "天", "气"]
    vf = tmp_path / "vocab.txt"
    vf.write_text("\n".join(vocab))

    from vct_tpu.text.tokenizer import WordPieceTokenizer

    ours = WordPieceTokenizer.from_vocab_file(str(vf), do_lower_case=True)
    theirs = transformers.BertTokenizer(str(vf), do_lower_case=True)

    cases = [
        "a man rides horses",
        "A MAN RIDING!",
        "the man, played",
        "unaffable",
        "zzz unknown zzz",
        "a  man\trides\nhorses",
        "café man",            # accent stripping
        "天气 a man",           # CJK spacing
        "it's 7 o'clock",
        "",
        "!!!",
    ]
    for text in cases:
        assert ours.tokenize(text) == theirs.tokenize(text), repr(text)
        assert ours.encode(text) == theirs.encode(text), repr(text)


def test_make_tokenizer_case_heuristic(tmp_path):
    """The vocab-file do_lower heuristic follows HF conventions: '-uncased'
    lowers, '-cased' keeps case, and bert-base-chinese is ALSO cased (its HF
    tokenizer_config sets do_lower_case=false) despite lacking the
    substring (round-5 review finding)."""
    from vct_tpu.text.tokenizer import make_tokenizer

    vocab = tmp_path / "v.txt"
    vocab.write_text("\n".join(["[PAD]", "[UNK]", "[CLS]", "[SEP]", "[MASK]",
                                "Cat", "cat"]))
    for name, lower in [("bert-base-uncased", True),
                        ("bert-base-cased", False),
                        ("bert-base-chinese", False),
                        ("bert-base-multilingual-uncased", True)]:
        tok = make_tokenizer(str(vocab), name)
        assert tok.do_lower_case is lower, name
