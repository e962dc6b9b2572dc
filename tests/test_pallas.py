"""Pallas fused-attention kernel vs the XLA reference path (interpret mode on
CPU; the real-TPU path is exercised by bench.py)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from vct_tpu.ops.attention import causal_bias, combine_bias, dot_product_attention, padding_bias
from vct_tpu.ops.pallas_attention import fused_attention


@pytest.mark.parametrize("tq,tk,h,d", [(13, 13, 8, 96), (8, 16, 4, 64), (31, 13, 2, 128)])
def test_fused_matches_xla(rng, tq, tk, h, d):
    b = 3
    q = jnp.asarray(rng.standard_normal((b, tq, h, d)).astype(np.float32))
    k = jnp.asarray(rng.standard_normal((b, tk, h, d)).astype(np.float32))
    v = jnp.asarray(rng.standard_normal((b, tk, h, d)).astype(np.float32))
    pad = np.zeros((b, tk), dtype=bool)
    pad[0, -3:] = True
    bias = padding_bias(jnp.asarray(pad))

    ref, _ = dot_product_attention(q, k, v, bias)
    out = fused_attention(q, k, v, bias, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


def test_fused_causal(rng):
    b, t, h, d = 2, 10, 4, 64
    q = jnp.asarray(rng.standard_normal((b, t, h, d)).astype(np.float32))
    bias = combine_bias(causal_bias(t), None)
    ref, _ = dot_product_attention(q, q, q, bias)
    out = fused_attention(q, q, q, bias, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


def test_fused_no_bias(rng):
    b, t, h, d = 2, 12, 4, 64
    q = jnp.asarray(rng.standard_normal((b, t, h, d)).astype(np.float32))
    ref, _ = dot_product_attention(q, q, q, None)
    out = fused_attention(q, q, q, None, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


def test_fused_bf16(rng):
    b, t, h, d = 2, 13, 4, 96
    q = jnp.asarray(rng.standard_normal((b, t, h, d)).astype(np.float32)).astype(jnp.bfloat16)
    ref, _ = dot_product_attention(q, q, q, None)
    out = fused_attention(q, q, q, None, interpret=True)
    np.testing.assert_allclose(
        np.asarray(out, np.float32), np.asarray(ref, np.float32), atol=3e-2
    )
