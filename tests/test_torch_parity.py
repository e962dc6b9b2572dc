"""Golden parity of vct_tpu Flax blocks against torch nn.Transformer numerics.

The reference's entire compute path is torch built-ins, so matching them on
CPU float32 (within fp32 tolerance) is the parity bar that makes ported
checkpoints reproduce the published metrics.
"""

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from vct_tpu.convert import convert_state_dict
from vct_tpu.models.layers import (
    MultiHeadAttention,
    TransformerDecoder,
    TransformerEncoder,
)
from vct_tpu.ops.attention import causal_bias, combine_bias, padding_bias

from tests import torch_ref

B, T, E, H, FF = 3, 7, 64, 4, 128
ATOL = 2e-5


def _sd(mod):
    return {k: v.detach().numpy() for k, v in mod.state_dict().items()}


def test_mha_self_attention_parity(rng):
    torch.manual_seed(0)
    tmha = torch.nn.MultiheadAttention(E, H, dropout=0.0, batch_first=True)
    tmha.eval()

    x = rng.standard_normal((B, T, E)).astype(np.float32)
    pad = np.zeros((B, T), dtype=bool)
    pad[0, -2:] = True
    pad[2, -1:] = True

    with torch.no_grad():
        t_out, _ = tmha(
            torch.tensor(x), torch.tensor(x), torch.tensor(x),
            key_padding_mask=torch.tensor(pad),
        )

    model = MultiHeadAttention(E, H)
    variables = model.init(jax.random.PRNGKey(0), jnp.asarray(x))
    variables, report = convert_state_dict(variables, _sd(tmha))
    assert not report["missing"] and not report["unexpected"], report

    out, _ = model.apply(variables, jnp.asarray(x), bias=padding_bias(jnp.asarray(pad)))
    np.testing.assert_allclose(np.asarray(out), t_out.numpy(), atol=ATOL)


def test_encoder_stack_parity(rng):
    torch.manual_seed(1)
    tenc = torch_ref.make_encoder(E, H, FF, num_layers=2)
    tenc.eval()

    x = rng.standard_normal((B, T, E)).astype(np.float32)
    pad = np.zeros((B, T), dtype=bool)
    pad[1, -3:] = True

    with torch.no_grad():
        t_out = tenc(torch.tensor(x), None, torch.tensor(pad))

    model = TransformerEncoder(2, E, H, FF, dropout_rate=0.0)
    variables = model.init(jax.random.PRNGKey(0), jnp.asarray(x))
    variables, report = convert_state_dict(variables, _sd(tenc))
    assert not report["missing"] and not report["unexpected"], report

    out = model.apply(variables, jnp.asarray(x), padding_bias(jnp.asarray(pad)))
    np.testing.assert_allclose(np.asarray(out), t_out.numpy(), atol=ATOL)


@pytest.fixture
def decoder_pair(rng):
    torch.manual_seed(2)
    tdec = torch_ref.make_decoder(E, H, FF, num_layers=3)
    tdec.eval()
    model = TransformerDecoder(3, E, H, FF, dropout_rate=0.0)
    tgt = rng.standard_normal((B, T, E)).astype(np.float32)
    mem = rng.standard_normal((B, 5, E)).astype(np.float32)
    variables = model.init(jax.random.PRNGKey(0), jnp.asarray(tgt), jnp.asarray(mem))
    variables, report = convert_state_dict(variables, _sd(tdec))
    assert not report["missing"] and not report["unexpected"], report
    return tdec, model, variables, tgt, mem


def test_decoder_stack_parity(decoder_pair):
    tdec, model, variables, tgt, mem = decoder_pair
    tgt_pad = np.zeros((B, T), dtype=bool)
    tgt_pad[0, -2:] = True

    with torch.no_grad():
        t_out = tdec(
            torch.tensor(tgt),
            torch.tensor(mem),
            tgt_mask=torch_ref.causal_mask(T),
            tgt_key_padding_mask=torch.tensor(tgt_pad),
        )

    bias = combine_bias(causal_bias(T), padding_bias(jnp.asarray(tgt_pad)))
    out, _ = model.apply(variables, jnp.asarray(tgt), jnp.asarray(mem), bias)
    np.testing.assert_allclose(np.asarray(out), t_out.numpy(), atol=ATOL)


def test_decoder_memory_padding_parity(decoder_pair):
    """Cross-attention with memory_key_padding_mask (vct_tpu default path)."""
    tdec, model, variables, tgt, mem = decoder_pair
    mem_pad = np.zeros((B, 5), dtype=bool)
    mem_pad[1, -2:] = True

    with torch.no_grad():
        t_out = tdec(
            torch.tensor(tgt),
            torch.tensor(mem),
            tgt_mask=torch_ref.causal_mask(T),
            memory_key_padding_mask=torch.tensor(mem_pad),
        )

    out, _ = model.apply(
        variables,
        jnp.asarray(tgt),
        jnp.asarray(mem),
        causal_bias(T),
        padding_bias(jnp.asarray(mem_pad)),
    )
    np.testing.assert_allclose(np.asarray(out), t_out.numpy(), atol=ATOL)


def test_decoder_kv_cache_matches_full_forward(decoder_pair):
    """Token-by-token cached decoding == full-sequence causal forward."""
    tdec, model, variables, tgt, mem = decoder_pair
    full, _ = model.apply(
        variables, jnp.asarray(tgt), jnp.asarray(mem), causal_bias(T)
    )

    memory = jnp.asarray(mem)
    caches = model.apply(variables, B, T, memory, method=TransformerDecoder.init_cache)
    stepped = []
    for i in range(T):
        out, caches, _ = model.apply(
            variables,
            jnp.asarray(tgt[:, i : i + 1]),
            caches,
            jnp.asarray(i, jnp.int32),
            method=TransformerDecoder.decode_step,
        )
        stepped.append(out[:, 0])
    stepped = jnp.stack(stepped, axis=1)
    np.testing.assert_allclose(np.asarray(stepped), np.asarray(full), atol=ATOL)


def test_attention_weights_match_torch(decoder_pair):
    """return_attn reproduces torch's head-averaged cross-attn weights
    (the capability predict_video.py:43-79 monkey-patches for)."""
    tdec, model, variables, tgt, mem = decoder_pair

    layer0 = tdec.layers[0]
    with torch.no_grad():
        sa = layer0.self_attn(
            torch.tensor(tgt), torch.tensor(tgt), torch.tensor(tgt),
            attn_mask=torch_ref.causal_mask(T),
        )[0]
        x = layer0.norm1(torch.tensor(tgt) + sa)
        _, t_attn = layer0.multihead_attn(x, torch.tensor(mem), torch.tensor(mem))

    _, attns = model.apply(
        variables, jnp.asarray(tgt), jnp.asarray(mem), causal_bias(T), return_attn=True
    )
    assert attns.shape == (3, B, T, 5)
    np.testing.assert_allclose(np.asarray(attns[0]), t_attn.numpy(), atol=ATOL)
