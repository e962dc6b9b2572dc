"""End-to-end parity of MMT4Caption (MME encoder + CapDecoder + SCE loss)
against a torch restatement of the reference model, through the checkpoint
converter — i.e. exactly the path a released ``.pth`` takes."""

import numpy as np
import torch

import jax
import jax.numpy as jnp

from vct_tpu.config import ModelConfig, TPUConfig
from vct_tpu.convert import convert_state_dict
from vct_tpu.models.mmt4caption import MMT4Caption

from tests import torch_ref

B, T, D_FEAT, E, H, FF, VOCAB, S = 4, 6, 32, 64, 4, 128, 80, 10
ATOL = 3e-5


def small_config(**kw) -> ModelConfig:
    d = {
        "modal": ["CLIP4Clip"],
        "modal_shape": [D_FEAT],
        "embed_dim": E,
        "dropout": 0.0,
        "loss_beta": 0.5,
        "activation": "gelu",
        "video_encoder": {
            "layer": 1,
            "nhead": H,
            "feedforward": FF,
            "mme": {"temporal": "encoding", "modal_different": True,
                    "do_norm": False, "aggregation": "avg"},
        },
        "caption_decoder": {"layer": 2, "nhead": H, "feedforward": FF,
                            "sce_loss_alpha": 0.5},
        "vocab_size": VOCAB,
    }
    d.update(kw)
    return ModelConfig.from_dict(d)


class TorchFull(torch.nn.Module):
    def __init__(self):
        super().__init__()
        self.video_encoder = torch_ref.RefMMEncoder(D_FEAT, E, H, FF, 1)
        self.cap_decoder = torch_ref.RefCapDecoder(2, E, H, FF, VOCAB)


def reference_keyed_state(tm: TorchFull):
    """Rename the fixture's keys into the reference checkpoint key space
    (SURVEY.md Appendix B)."""
    sd = {}
    for k, v in tm.state_dict().items():
        k = k.replace("video_encoder.encoder.", "video_encoder.transformer_encoder.")
        k = k.replace("video_encoder.unify.", "video_encoder.unify.0.")
        k = k.replace("cap_decoder.pos_embedding", "cap_decoder.positional_encoding.pos_embedding")
        sd[k] = v.detach().numpy()
    return sd


def make_batch(rng):
    feats = rng.standard_normal((B, T, D_FEAT)).astype(np.float32)
    pad = np.zeros((B, T), dtype=bool)
    pad[1, -2:] = True
    caps = rng.integers(3, VOCAB, (B, S))
    lengths = np.array([S, 7, 5, 9])
    for i, L in enumerate(lengths):
        caps[i, 0] = 2  # [CLS]-like
        caps[i, L - 1] = 1  # [SEP]-like
        caps[i, L:] = 0
    cap_pad = caps == 0
    return feats, pad, caps.astype(np.int64), cap_pad


def build_converted(tm, quirk_no_memory_mask=False):
    cfg = small_config()
    tpu = TPUConfig(quirk_no_memory_mask_in_decoder=quirk_no_memory_mask)
    model = MMT4Caption(cfg, tpu)
    feats = jnp.zeros((B, T, D_FEAT))
    caps = jnp.zeros((B, S), jnp.int32)
    variables = model.init(
        jax.random.PRNGKey(0), [feats], None, caps, caps == 0,
        method=MMT4Caption.caption_loss,
    )
    variables, report = convert_state_dict(variables, reference_keyed_state(tm))
    assert not report["missing"], report["missing"]
    return model, variables


def test_caption_loss_and_memory_parity(rng):
    torch.manual_seed(7)
    tm = TorchFull()
    tm.eval()
    feats, pad, caps, cap_pad = make_batch(rng)

    with torch.no_grad():
        t_mem, t_mask, t_agg = tm.video_encoder(torch.tensor(feats), torch.tensor(pad))
        # reference CapDecoder.forward never passes a memory mask (quirk)
        t_logits, t_loss = tm.cap_decoder(
            t_mem, torch.tensor(caps), torch.tensor(cap_pad), memory_pad=None
        )

    model, variables = build_converted(tm, quirk_no_memory_mask=True)
    mem, mem_mask, agg = model.apply(
        variables, [jnp.asarray(feats)], [jnp.asarray(pad)], method=MMT4Caption.encode
    )
    np.testing.assert_allclose(np.asarray(mem), t_mem.numpy(), atol=ATOL)
    np.testing.assert_allclose(np.asarray(agg), t_agg.numpy(), atol=ATOL)

    logits, loss, _ = model.apply(
        variables,
        [jnp.asarray(feats)],
        [jnp.asarray(pad)],
        jnp.asarray(caps),
        jnp.asarray(cap_pad),
        method=MMT4Caption.caption_logits,
    )
    np.testing.assert_allclose(np.asarray(logits), t_logits.numpy(), atol=ATOL)
    np.testing.assert_allclose(float(loss), float(t_loss), rtol=1e-5)


def test_corrected_memory_mask_matches_torch_masked_path(rng):
    """vct_tpu's default (decoder DOES mask padded memory) against torch with
    memory_key_padding_mask passed."""
    torch.manual_seed(8)
    tm = TorchFull()
    tm.eval()
    feats, pad, caps, cap_pad = make_batch(rng)

    with torch.no_grad():
        t_mem, t_mask, _ = tm.video_encoder(torch.tensor(feats), torch.tensor(pad))
        t_logits, t_loss = tm.cap_decoder(
            t_mem, torch.tensor(caps), torch.tensor(cap_pad), memory_pad=t_mask
        )

    model, variables = build_converted(tm, quirk_no_memory_mask=False)
    loss = model.apply(
        variables,
        [jnp.asarray(feats)],
        [jnp.asarray(pad)],
        jnp.asarray(caps),
        jnp.asarray(cap_pad),
        method=MMT4Caption.caption_loss,
    )
    np.testing.assert_allclose(float(loss), float(t_loss), rtol=1e-5)


def test_decode_word_matches_torch_incremental(rng):
    """Reference-style full-prefix next-word scoring parity (CapDecoder.py:62-79)."""
    torch.manual_seed(9)
    tm = TorchFull()
    tm.eval()
    feats, pad, _, _ = make_batch(rng)

    model, variables = build_converted(tm, quirk_no_memory_mask=True)
    mem, _, _ = model.apply(
        variables, [jnp.asarray(feats)], [jnp.asarray(pad)], method=MMT4Caption.encode
    )
    with torch.no_grad():
        t_mem, _, _ = tm.video_encoder(torch.tensor(feats), torch.tensor(pad))

    prefix = np.array([[2, 5, 9]] * B, dtype=np.int64)
    with torch.no_grad():
        x = tm.cap_decoder.embed(torch.tensor(prefix))
        outs = tm.cap_decoder.decoder(
            x, t_mem, tgt_mask=torch_ref.causal_mask(3)
        )
        t_logits = tm.cap_decoder.generator(outs[:, -1])

    logits = model.apply(
        variables, mem, jnp.asarray(prefix), method=MMT4Caption.decode_word
    )
    np.testing.assert_allclose(np.asarray(logits), t_logits.numpy(), atol=ATOL)


def test_greedy_tokens_match_torch_loop(rng):
    """Full greedy parity: the reference's host loop (full-prefix re-run per
    token + argmax, ``MMT4Caption.py:146-172``) and our jitted KV-cached
    ``lax.while_loop`` must emit IDENTICAL token sequences from the same
    (converted) weights."""
    from vct_tpu.decode import make_greedy_fn

    torch.manual_seed(11)
    tm = TorchFull()
    tm.eval()
    feats, pad, _, _ = make_batch(rng)
    start_id, end_id, max_len = 2, 1, 12

    model, variables = build_converted(tm, quirk_no_memory_mask=True)
    greedy = make_greedy_fn(model, max_len, start_id, end_id)
    ours = np.asarray(greedy(variables, [jnp.asarray(feats)], [jnp.asarray(pad)])[0])

    with torch.no_grad():
        t_mem, _, _ = tm.video_encoder(torch.tensor(feats), torch.tensor(pad))
        ys = torch.full((B, 1), start_id, dtype=torch.long)
        done = np.zeros(B, bool)
        for _ in range(max_len - 1):
            x = tm.cap_decoder.embed(ys)
            outs = tm.cap_decoder.decoder(
                x, t_mem, tgt_mask=torch_ref.causal_mask(ys.shape[1])
            )
            nxt = tm.cap_decoder.generator(outs[:, -1]).argmax(-1)
            ys = torch.cat([ys, nxt[:, None]], dim=1)
            done |= nxt.numpy() == end_id

    theirs = ys.numpy()
    for b in range(B):
        # compare up to and including the first end token (the reference
        # keeps appending to finished rows; ours freezes them — both truncate
        # at the first [SEP] downstream, MMT4Caption.py:174-183)
        row_t = theirs[b]
        stop = np.where(row_t == end_id)[0]
        upto = int(stop[0]) + 1 if len(stop) else max_len
        np.testing.assert_array_equal(ours[b, :upto], row_t[:upto], err_msg=f"row {b}")
