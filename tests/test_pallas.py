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


def test_pallas_eligibility():
    """Training (deterministic=False) IS served since the custom_vjp landed;
    attention-map returns, single-token decode steps, and SHORT sequences
    stay on XLA (round-3 measurement: at S=31 the (B, H)-grid kernel costs
    ~1 ms/call of per-program overhead and XLA is 43% faster end-to-end;
    the kernel pays only once the [Tq, Tk] score tile is large)."""
    import jax.numpy as jnp

    from vct_tpu.ops.attention import _pallas_eligible

    q = jnp.zeros((2, 256, 2, 16))
    assert not _pallas_eligible(q, q, deterministic=True, return_weights=True)
    # single-token decode steps stay on XLA
    assert not _pallas_eligible(q[:, :1], q, deterministic=True,
                                return_weights=False)
    # short-sequence training shapes stay on XLA
    short = jnp.zeros((2, 31, 2, 16))
    assert not _pallas_eligible(short, short, deterministic=False,
                                return_weights=False)
    # long sequences qualify (backend check is the only remaining gate)
    import jax

    expected = jax.default_backend() == "tpu"
    assert _pallas_eligible(q, q, deterministic=False,
                            return_weights=False) == expected


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


# ---------------------------------------------------------------------------
# trainable path: custom_vjp + in-kernel dropout (round-2 VERDICT #3)
# ---------------------------------------------------------------------------


def _trainable(rate, q, k, v, bias, keep=None):
    from vct_tpu.ops.pallas_attention import fused_attention_trainable

    return fused_attention_trainable(rate, True, q, k, v, bias, keep)


@pytest.mark.parametrize("tq,tk,h,d", [(13, 13, 4, 64), (31, 13, 2, 96)])
def test_trainable_forward_matches_xla(rng, tq, tk, h, d):
    b = 2
    q = jnp.asarray(rng.standard_normal((b, tq, h, d)).astype(np.float32))
    k = jnp.asarray(rng.standard_normal((b, tk, h, d)).astype(np.float32))
    v = jnp.asarray(rng.standard_normal((b, tk, h, d)).astype(np.float32))
    pad = np.zeros((b, tk), dtype=bool)
    pad[0, -2:] = True
    bias = padding_bias(jnp.asarray(pad))
    ref, _ = dot_product_attention(q, k, v, bias)
    out = _trainable(0.0, q, k, v, bias)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


def test_trainable_grad_matches_xla(rng):
    """Gradient parity vs jax.grad through the XLA reference path (no
    dropout): dq/dk/dv from the Pallas backward kernel must match."""
    b, tq, tk, h, d = 2, 10, 13, 2, 64
    q = jnp.asarray(rng.standard_normal((b, tq, h, d)).astype(np.float32))
    k = jnp.asarray(rng.standard_normal((b, tk, h, d)).astype(np.float32))
    v = jnp.asarray(rng.standard_normal((b, tk, h, d)).astype(np.float32))
    pad = np.zeros((b, tk), dtype=bool)
    pad[1, -4:] = True
    bias = padding_bias(jnp.asarray(pad))
    w = jnp.asarray(rng.standard_normal((b, tq, h, d)).astype(np.float32))

    def loss_ref(q, k, v):
        out, _ = dot_product_attention(q, k, v, bias)
        return jnp.sum(out * w)

    def loss_pallas(q, k, v):
        return jnp.sum(_trainable(0.0, q, k, v, bias) * w)

    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    g_pal = jax.grad(loss_pallas, argnums=(0, 1, 2))(q, k, v)
    for a, b_ in zip(g_pal, g_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_), atol=3e-5)


def test_trainable_grad_causal_selfattn(rng):
    """Self-attention (q=k=v from one tensor) with a causal bias — the
    decoder-train shape; cotangents accumulate across all three uses."""
    b, t, h, d = 2, 9, 2, 32
    x = jnp.asarray(rng.standard_normal((b, t, h, d)).astype(np.float32))
    bias = causal_bias(t)

    def loss_ref(x):
        out, _ = dot_product_attention(x, x, x, bias)
        return jnp.sum(out ** 2)

    def loss_pallas(x):
        return jnp.sum(_trainable(0.0, x, x, x, bias) ** 2)

    np.testing.assert_allclose(
        np.asarray(jax.grad(loss_pallas)(x)),
        np.asarray(jax.grad(loss_ref)(x)),
        atol=3e-5,
    )


def _xla_dropout_attention(q, k, v, bias, keep, rate):
    """The XLA path's exact math with an EXPLICIT keep mask."""
    d = q.shape[-1]
    logits = jnp.einsum("bqhd,bkhd->bhqk", q, k,
                        preferred_element_type=jnp.float32) / jnp.sqrt(float(d))
    if bias is not None:
        logits = logits + bias
    w = jax.nn.softmax(logits, axis=-1)
    w = jnp.where(keep, w / (1.0 - rate), 0.0)
    return jnp.einsum("bhqk,bkhd->bqhd", w.astype(q.dtype), v,
                      preferred_element_type=jnp.float32).astype(q.dtype)


def test_trainable_dropout_forward_and_grad_match_xla(rng):
    """With a SHARED keep mask, Pallas forward AND backward must match the
    XLA dropout math exactly — the strongest possible dropout-parity test."""
    b, tq, tk, h, d = 2, 10, 13, 2, 64
    rate = 0.3
    q = jnp.asarray(rng.standard_normal((b, tq, h, d)).astype(np.float32))
    k = jnp.asarray(rng.standard_normal((b, tk, h, d)).astype(np.float32))
    v = jnp.asarray(rng.standard_normal((b, tk, h, d)).astype(np.float32))
    bias = causal_bias(tq)[..., :tk] if tq == tk else None
    keep = jax.random.bernoulli(jax.random.PRNGKey(3), 1 - rate, (b, h, tq, tk))
    w = jnp.asarray(rng.standard_normal((b, tq, h, d)).astype(np.float32))

    out_ref = _xla_dropout_attention(q, k, v, bias, keep, rate)
    out_pal = _trainable(rate, q, k, v, bias, keep)
    np.testing.assert_allclose(np.asarray(out_pal), np.asarray(out_ref), atol=3e-5)

    def loss_ref(q, k, v):
        return jnp.sum(_xla_dropout_attention(q, k, v, bias, keep, rate) * w)

    def loss_pal(q, k, v):
        return jnp.sum(_trainable(rate, q, k, v, bias, keep) * w)

    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    g_pal = jax.grad(loss_pal, argnums=(0, 1, 2))(q, k, v)
    for a, b_ in zip(g_pal, g_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_), atol=3e-5)


def test_trainable_dispatch_shares_rng_semantics(rng):
    """dot_product_attention(use_pallas=True, deterministic=False) draws the
    keep mask with the same bernoulli call as the XLA path, so under a fixed
    rng the two paths agree exactly (eligibility permitting)."""
    from vct_tpu.ops.pallas_attention import fused_attention_trainable

    b, t, h, d = 2, 8, 2, 32
    rate = 0.25
    q = jnp.asarray(rng.standard_normal((b, t, h, d)).astype(np.float32))
    key = jax.random.PRNGKey(11)
    ref, _ = dot_product_attention(
        q, q, q, None, dropout_rate=rate, dropout_rng=key, deterministic=False,
        use_pallas=False,
    )
    keep = jax.random.bernoulli(key, 1 - rate, (b, h, t, t))
    out = fused_attention_trainable(rate, True, q, q, q, None, keep)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=3e-5)


def test_trainable_bf16_grad_finite(rng):
    b, t, h, d = 2, 13, 2, 64
    x = jnp.asarray(rng.standard_normal((b, t, h, d)).astype(np.float32)).astype(jnp.bfloat16)

    def loss(x):
        return jnp.sum(_trainable(0.0, x, x, x, None).astype(jnp.float32))

    g = jax.grad(loss)(x)
    assert g.dtype == jnp.bfloat16 and bool(jnp.isfinite(g.astype(jnp.float32)).all())


# ---------------------------------------------------------------------------
# shard_map-ped kernel (multi-device jit)
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("mesh_shape", [(8, 1), (4, 2)])
def test_sharded_trainable_matches_xla(rng, mesh_shape):
    """fused_attention_trainable_sharded (the multi-device wrapper) produces
    the same outputs and gradients as the XLA path, with a batch padding
    bias (sharded) and under both pure-dp and dp x tp meshes."""
    from vct_tpu.ops.pallas_attention import fused_attention_trainable_sharded
    from vct_tpu.parallel.mesh import make_mesh

    mesh = make_mesh(*mesh_shape)
    b, tq, tk, h, d = 16, 10, 13, 2, 64
    q = jnp.asarray(rng.standard_normal((b, tq, h, d)).astype(np.float32))
    k = jnp.asarray(rng.standard_normal((b, tk, h, d)).astype(np.float32))
    v = jnp.asarray(rng.standard_normal((b, tk, h, d)).astype(np.float32))
    pad = np.zeros((b, tk), dtype=bool)
    pad[1, -4:] = True
    bias = padding_bias(jnp.asarray(pad))
    w = jnp.asarray(rng.standard_normal((b, tq, h, d)).astype(np.float32))

    def loss_ref(q, k, v):
        out, _ = dot_product_attention(q, k, v, bias)
        return jnp.sum(out * w)

    def loss_sharded(q, k, v):
        out = fused_attention_trainable_sharded(
            mesh, "data", 0.0, True, q, k, v, bias, None)
        return jnp.sum(out * w)

    np.testing.assert_allclose(
        float(jax.jit(loss_sharded)(q, k, v)), float(loss_ref(q, k, v)),
        rtol=2e-5)
    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    g_sh = jax.jit(jax.grad(loss_sharded, argnums=(0, 1, 2)))(q, k, v)
    for a, b_ in zip(g_sh, g_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_), atol=3e-5)


def test_sharded_trainable_causal_and_dropout(rng):
    """Replicated causal bias (leading dim 1) + sharded dropout keep mask."""
    from vct_tpu.ops.pallas_attention import fused_attention_trainable_sharded
    from vct_tpu.parallel.mesh import make_mesh

    mesh = make_mesh(8, 1)
    b, t, h, d = 16, 9, 2, 32
    rate = 0.3
    x = jnp.asarray(rng.standard_normal((b, t, h, d)).astype(np.float32))
    bias = causal_bias(t)
    keep = jnp.asarray(rng.random((b, h, t, t)) < 1.0 - rate)

    def loss_ref(x):
        out = _xla_dropout_attention(x, x, x, bias, keep, rate)
        return jnp.sum(out ** 2)

    def loss_sharded(x):
        out = fused_attention_trainable_sharded(
            mesh, "data", rate, True, x, x, x, bias, keep)
        return jnp.sum(out ** 2)

    np.testing.assert_allclose(
        float(jax.jit(loss_sharded)(x)), float(loss_ref(x)), rtol=2e-5)
    # atol 1e-4: the /(1-rate) dropout rescale amplifies the kernel's fp32
    # softmax-recompute rounding; the non-sharded dropout-grad test sees the
    # same scale of noise on its largest elements
    np.testing.assert_allclose(
        np.asarray(jax.jit(jax.grad(loss_sharded))(x)),
        np.asarray(jax.grad(loss_ref)(x)),
        atol=1e-4,
    )
