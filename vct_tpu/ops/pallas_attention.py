"""Pallas fused multi-head attention for TPU.

The hot compute op of the framework (SURVEY.md §2.2: the one genuinely
"native" component to build — the reference delegates it to cuDNN/ATen fused
attention inside ``torch.nn.Transformer*``). One kernel instance computes, for
one (batch, head) grid cell, the full ``softmax(q k^T / sqrt(d) + bias) v``
with the sequence resident in VMEM:

* sequences here are short (uni_12 ⇒ 13 memory tokens, captions ≤ 32;
  ``README.md:20`` scopes out long video), so no K/V tiling or online-softmax
  streaming is needed — the whole (padded) sequence fits VMEM many times over.
  The win over unfused XLA is keeping the logits tile out of HBM entirely,
* grid = (B, H): each cell reads q/k/v tiles [T, D] and the bias row, writes
  the [Tq, D] output tile. Lane dim = head_dim (64 or 128 → native tiling),
* numerics match ``ops.attention.dot_product_attention`` (fp32 logits +
  softmax, bf16/fp32 matmuls with fp32 accumulation) — asserted by
  ``tests/test_pallas.py`` in interpreter mode and on real TPU by the bench,
* the sequence axes are padded to the fp32 sublane quantum (8) by the wrapper
  with masked-out bias so tiling constraints hold for any T.

Dropout-on-weights (train-time only) stays on the XLA path; this kernel
serves the inference/decode fast path, where dropout is off anyway.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


def _softmax_av(logits, v, o_ref):
    m = jnp.max(logits, axis=-1, keepdims=True)
    e = jnp.exp(logits - m)
    s = jnp.sum(e, axis=-1, keepdims=True)
    w = (e / s).astype(v.dtype)
    o_ref[0, 0] = jax.lax.dot_general(
        w, v, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    ).astype(o_ref.dtype)


def _qk_logits(q_ref, k_ref):
    q = q_ref[0, 0]
    k = k_ref[0, 0]
    scale = jax.lax.rsqrt(jnp.asarray(q.shape[-1], jnp.float32))
    logits = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )
    return logits * scale


def _attn_kernel(q_ref, k_ref, v_ref, bias_ref, o_ref):
    """One (batch, head) cell: q [Tq, D], k/v [Tk, D], bias [Tq, Tk]."""
    _softmax_av(_qk_logits(q_ref, k_ref) + bias_ref[0, 0], v_ref[0, 0], o_ref)


def _attn_kernel_nobias(q_ref, k_ref, v_ref, o_ref):
    _softmax_av(_qk_logits(q_ref, k_ref), v_ref[0, 0], o_ref)


@functools.partial(jax.jit, static_argnames=("interpret",))
def fused_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    bias: Optional[jnp.ndarray] = None,
    *,
    interpret: bool = False,
) -> jnp.ndarray:
    """q [B, Tq, H, D], k/v [B, Tk, H, D], bias broadcastable [B, H, Tq, Tk]
    (fp32 additive) -> [B, Tq, H, D].
    """
    b, tq, h, d = q.shape
    tk = k.shape[1]
    # sublane quantum: 8 for fp32, 16 for bf16 (pallas guide tiling table)
    sub = 16 if q.dtype == jnp.bfloat16 else 8
    tq_p = _round_up(tq, sub)
    tk_p = _round_up(tk, sub)

    qp = jnp.pad(q, ((0, 0), (0, tq_p - tq), (0, 0), (0, 0)))
    kp = jnp.pad(k, ((0, 0), (0, tk_p - tk), (0, 0), (0, 0)))
    vp = jnp.pad(v, ((0, 0), (0, tk_p - tk), (0, 0), (0, 0)))

    # [B, T, H, D] -> [B, H, T, D] so the last two dims are the compute tile
    qp = qp.transpose(0, 2, 1, 3)
    kp = kp.transpose(0, 2, 1, 3)
    vp = vp.transpose(0, 2, 1, 3)

    grid = (b, h)
    qkv_specs = [
        pl.BlockSpec((1, 1, tq_p, d), lambda i, j: (i, j, 0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, tk_p, d), lambda i, j: (i, j, 0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, tk_p, d), lambda i, j: (i, j, 0, 0), memory_space=pltpu.VMEM),
    ]
    out_spec = pl.BlockSpec(
        (1, 1, tq_p, d), lambda i, j: (i, j, 0, 0), memory_space=pltpu.VMEM
    )
    out_shape = jax.ShapeDtypeStruct((b, h, tq_p, d), q.dtype)

    if bias is None and tk_p == tk:
        # fast path: nothing to mask, no bias tensor at all
        out = pl.pallas_call(
            _attn_kernel_nobias, grid=grid, in_specs=qkv_specs,
            out_specs=out_spec, out_shape=out_shape, interpret=interpret,
        )(qp, kp, vp)
        return out.transpose(0, 2, 1, 3)[:, :tq]

    # Build the bias at its MINIMAL broadcast shape (singleton batch/head dims
    # stay singleton; the BlockSpec index map pins them to block 0) instead of
    # materializing a full [B, H, Tq, Tk] logits-sized tensor in HBM. Padded
    # key columns get NEG_INF so they contribute exp(-inf)=0; padded query
    # rows produce garbage that is sliced off.
    if bias is None:
        bb, bh = 1, 1
        small = jnp.zeros((1, 1, tq_p, tk_p), jnp.float32)
    else:
        bias4 = bias.astype(jnp.float32)
        bias4 = jnp.reshape(bias4, (1,) * (4 - bias4.ndim) + bias4.shape)
        bb, bh = bias4.shape[0], bias4.shape[1]
        # sequence dims must be materialized before padding (a bias broadcast
        # over queries would otherwise get ZERO rows in the padding); the
        # batch/head dims stay minimal — that's where the memory win is
        bias4 = jnp.broadcast_to(bias4, (bb, bh, tq, tk))
        small = jnp.pad(bias4, ((0, 0), (0, 0), (0, tq_p - tq), (0, tk_p - tk)))
    if tk_p != tk:
        small = small.at[:, :, :, tk:].set(NEG_INF)

    bias_spec = pl.BlockSpec(
        (1, 1, tq_p, tk_p),
        (lambda i, j: (i if bb > 1 else 0, j if bh > 1 else 0, 0, 0)),
        memory_space=pltpu.VMEM,
    )
    out = pl.pallas_call(
        _attn_kernel, grid=grid, in_specs=qkv_specs + [bias_spec],
        out_specs=out_spec, out_shape=out_shape, interpret=interpret,
    )(qp, kp, vp, small)

    return out.transpose(0, 2, 1, 3)[:, :tq]
