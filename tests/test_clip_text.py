"""CLIP text tower + BPE tokenizer: parity vs HF torch implementations."""

import json

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp

from vct_tpu.clip.text import (
    CLIPBPETokenizer,
    CLIPTextTower,
    _bytes_to_unicode,
    convert_clip_text,
)


def _make_bpe_files(tmp_path):
    """Build a small but real BPE vocab the OpenAI way: base byte-chars,
    their </w> forms, merge results, then specials."""
    merges = [
        ("h", "e"), ("l", "l"), ("he", "ll"), ("o", "</w>"), ("hell", "o</w>"),
        ("w", "o"), ("wo", "r"), ("r", "l"), ("wor", "l"), ("worl", "d</w>"),
        ("d", "</w>"),
    ]
    chars = list(_bytes_to_unicode().values())
    vocab_list = chars + [c + "</w>" for c in chars]
    vocab_list += ["".join(m) for m in merges]
    vocab_list += ["<|startoftext|>", "<|endoftext|>"]
    vocab = {t: i for i, t in enumerate(vocab_list)}

    vocab_json = tmp_path / "vocab.json"
    merges_txt = tmp_path / "merges.txt"
    vocab_json.write_text(json.dumps(vocab))
    merges_txt.write_text("#version: 0.2\n" + "\n".join(" ".join(m) for m in merges))
    return str(vocab_json), str(merges_txt)


class TestBPETokenizer:
    def test_parity_with_hf_cliptokenizer(self, tmp_path):
        transformers = pytest.importorskip("transformers")
        vocab_json, merges_txt = _make_bpe_files(tmp_path)
        ours = CLIPBPETokenizer.from_hf_files(vocab_json, merges_txt)
        theirs = transformers.CLIPTokenizer(vocab_json, merges_txt)

        for text in ["hello world", "hello", "a man rides!", "it's 7 o'clock",
                     "Hello   WORLD  ", "don't stop--now"]:
            ref = theirs(text)["input_ids"]
            got = [ours.sot] + ours.encode(text) + [ours.eot]
            assert got == ref, f"mismatch on {text!r}: {got} vs {ref}"

    def test_tokenize_shape_and_specials(self, tmp_path):
        vocab_json, merges_txt = _make_bpe_files(tmp_path)
        tok = CLIPBPETokenizer.from_hf_files(vocab_json, merges_txt)
        arr = tok.tokenize(["hello world", "hello"])
        assert arr.shape == (2, 77) and arr.dtype == np.int32
        assert (arr[:, 0] == tok.sot).all()
        assert (arr == tok.eot).sum() == 2
        # truncation keeps EOT at the end
        long = tok.tokenize(["hello " * 100], context_length=10)
        assert long[0, -1] == tok.eot

    def test_openai_merges_format(self, tmp_path):
        # same vocab via the bpe_simple_vocab-style file (header line + merges)
        vocab_json, merges_txt = _make_bpe_files(tmp_path)
        hf = CLIPBPETokenizer.from_hf_files(vocab_json, merges_txt)
        oa = CLIPBPETokenizer.from_openai_merges(merges_txt)
        for text in ["hello world", "abc xyz"]:
            assert hf.encode(text) == oa.encode(text)


class TestTextTowerParity:
    def test_output_parity(self):
        torch = pytest.importorskip("torch")
        from transformers import CLIPTextConfig, CLIPTextModelWithProjection

        vocab = 100
        cfg = CLIPTextConfig(
            vocab_size=vocab, hidden_size=64, intermediate_size=256,
            num_hidden_layers=2, num_attention_heads=2,
            max_position_embeddings=77, projection_dim=32,
            hidden_act="quick_gelu", eos_token_id=vocab - 1,
        )
        torch.manual_seed(0)
        ref = CLIPTextModelWithProjection(cfg).eval()
        sd = {k: v.detach().numpy() for k, v in ref.state_dict().items()}
        params = convert_clip_text(sd, layers=2)
        tower = CLIPTextTower(vocab_size=vocab, width=64, layers=2, heads=2,
                              out_dim=32)

        rng = np.random.default_rng(0)
        toks = rng.integers(1, vocab - 1, (3, 77)).astype(np.int32)
        toks[:, 0] = 0
        toks[:, 10] = vocab - 1  # EOT = max id -> argmax pooling == eos pooling
        ours = np.asarray(tower.apply({"params": params}, jnp.asarray(toks)))
        with torch.no_grad():
            theirs = ref(input_ids=torch.from_numpy(toks.astype(np.int64))).text_embeds.numpy()
        assert ours.shape == theirs.shape == (3, 32)
        np.testing.assert_allclose(ours, theirs, rtol=3e-4, atol=3e-4)


def test_merges_with_hash_initial_entries(tmp_path):
    """Real CLIP merges contain '#'-initial byte pairs (hashtags); only the
    '#version' header line may be skipped."""
    from vct_tpu.clip.text import _bytes_to_unicode

    merges = [("#", "#"), ("h", "i</w>"), ("##", "#</w>")]
    chars = list(_bytes_to_unicode().values())
    vocab_list = chars + [c + "</w>" for c in chars]
    vocab_list += ["".join(m) for m in merges]
    vocab_list += ["<|startoftext|>", "<|endoftext|>"]
    vocab = {t: i for i, t in enumerate(vocab_list)}
    (tmp_path / "v.json").write_text(json.dumps(vocab))
    (tmp_path / "m.txt").write_text(
        "#version: 0.2\n" + "\n".join(" ".join(m) for m in merges))
    tok = CLIPBPETokenizer.from_hf_files(str(tmp_path / "v.json"), str(tmp_path / "m.txt"))
    assert len(tok.bpe_ranks) == 3  # the '#'-initial merges survived
    assert tok.encode("###") == [vocab["##"], vocab["#</w>"]] or tok.encode("###")
    # parity with HF on hashtag text
    transformers = pytest.importorskip("transformers")
    theirs = transformers.CLIPTokenizer(str(tmp_path / "v.json"), str(tmp_path / "m.txt"))
    for text in ["###", "## hi", "#hi#"]:
        assert [tok.sot] + tok.encode(text) + [tok.eot] == theirs(text)["input_ids"], text
