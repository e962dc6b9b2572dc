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


def test_pallas_never_eligible_in_training_mode():
    """The kernel has no autodiff rule; deterministic=False (every train step,
    even with dropout 0) must route to the XLA path."""
    import jax.numpy as jnp

    from vct_tpu.ops.attention import _pallas_eligible

    q = jnp.zeros((2, 8, 2, 16))
    assert not _pallas_eligible(q, deterministic=False, return_weights=False)
    assert not _pallas_eligible(q, deterministic=True, return_weights=True)
    # single-token decode steps stay on XLA too
    assert not _pallas_eligible(q[:, :1], deterministic=True, return_weights=False)


def test_grad_through_attention_with_pallas_flag():
    """jax.grad through dot_product_attention(use_pallas=True) must work —
    the dispatch may not take the pallas path under differentiation."""
    import jax
    import jax.numpy as jnp

    from vct_tpu.ops.attention import dot_product_attention

    q = jnp.ones((1, 4, 2, 8)) * 0.1

    def loss(q):
        out, _ = dot_product_attention(q, q, q, deterministic=False,
                                       dropout_rate=0.0, use_pallas=True)
        return out.sum()

    g = jax.grad(loss)(q)
    assert g.shape == q.shape and bool(jnp.isfinite(g).all())
