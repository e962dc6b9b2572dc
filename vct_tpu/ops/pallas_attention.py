"""Pallas fused multi-head attention for TPU — forward AND backward.

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

Training path (round-2): ``fused_attention_trainable`` wraps the same
per-(batch, head) kernel in a ``jax.custom_vjp`` with a recompute-based
Pallas backward (flash-style: P is recomputed from q/k/v in the backward
kernel instead of being stored — dS = P*(dP - rowsum(P*dP)), dq = dS k,
dk = dS^T q, dv = P^T do). Attention-weight dropout takes a caller-provided
keep mask (drawn with the same ``jax.random.bernoulli`` call as the XLA
path, so the two paths are bit-comparable under a shared rng); at this
framework's train shapes the mask tensor is ~1 MB, far cheaper than the
testability it buys (the TPU interpreter's in-kernel PRNG returns zeros on
CPU, which would leave dropout untestable). This replaces torch's fused
train-time attention (``/root/reference/model/MMEncoder.py:236-238``).
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
    # materializing a full [B, H, Tq, Tk] logits-sized tensor in HBM — the
    # sequence dims must be materialized before padding (a bias broadcast
    # over queries would otherwise get ZERO rows in the padding); shared
    # helper with the trainable path so the padding invariant has ONE home.
    small, bb, bh = _padded_bias(bias, tq, tk, tq_p, tk_p)

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


# ---------------------------------------------------------------------------
# trainable path: custom_vjp + in-kernel dropout
# ---------------------------------------------------------------------------


def _pad_transpose(q, k, v):
    """[B, T, H, D] -> padded [B, H, T_p, D] (+ original tq, tk)."""
    b, tq, h, d = q.shape
    tk = k.shape[1]
    sub = 16 if q.dtype == jnp.bfloat16 else 8
    tq_p = _round_up(tq, sub)
    tk_p = _round_up(tk, sub)
    qp = jnp.pad(q, ((0, 0), (0, tq_p - tq), (0, 0), (0, 0))).transpose(0, 2, 1, 3)
    kp = jnp.pad(k, ((0, 0), (0, tk_p - tk), (0, 0), (0, 0))).transpose(0, 2, 1, 3)
    vp = jnp.pad(v, ((0, 0), (0, tk_p - tk), (0, 0), (0, 0))).transpose(0, 2, 1, 3)
    return qp, kp, vp, tq, tk, tq_p, tk_p


def _padded_bias(bias, tq, tk, tq_p, tk_p):
    """Minimal-broadcast [bb, bh, tq_p, tk_p] fp32 bias; padded key columns
    NEG_INF so they contribute exp(-inf)=0 (padded query rows are sliced
    off)."""
    if bias is None:
        bb = bh = 1
        small = jnp.zeros((1, 1, tq_p, tk_p), jnp.float32)
    else:
        bias4 = bias.astype(jnp.float32)
        bias4 = jnp.reshape(bias4, (1,) * (4 - bias4.ndim) + bias4.shape)
        bb, bh = bias4.shape[0], bias4.shape[1]
        bias4 = jnp.broadcast_to(bias4, (bb, bh, tq, tk))
        small = jnp.pad(bias4, ((0, 0), (0, 0), (0, tq_p - tq), (0, tk_p - tk)))
    if tk_p != tk:
        small = small.at[:, :, :, tk:].set(NEG_INF)
    return small, bb, bh


def _probs(q_ref, k_ref, bias_ref):
    logits = _qk_logits(q_ref, k_ref) + bias_ref[0, 0]
    m = jnp.max(logits, axis=-1, keepdims=True)
    e = jnp.exp(logits - m)
    return e / jnp.sum(e, axis=-1, keepdims=True)  # fp32 [tq_p, tk_p]


def _fwd_train_kernel(q_ref, k_ref, v_ref, bias_ref, o_ref, *, rate):
    _fwd_train_dropout_kernel(q_ref, k_ref, v_ref, bias_ref, None, o_ref, rate=rate)


def _fwd_train_dropout_kernel(q_ref, k_ref, v_ref, bias_ref, keep_ref, o_ref, *, rate):
    p = _probs(q_ref, k_ref, bias_ref)
    if keep_ref is not None:
        p = jnp.where(keep_ref[0, 0], p / (1.0 - rate), 0.0)
    v = v_ref[0, 0]
    o_ref[0, 0] = jax.lax.dot_general(
        p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).astype(o_ref.dtype)


def _bwd_train_kernel(q_ref, k_ref, v_ref, bias_ref, do_ref,
                      dq_ref, dk_ref, dv_ref, *, rate):
    _bwd_train_dropout_kernel(q_ref, k_ref, v_ref, bias_ref, None, do_ref,
                              dq_ref, dk_ref, dv_ref, rate=rate)


def _bwd_train_dropout_kernel(q_ref, k_ref, v_ref, bias_ref, keep_ref, do_ref,
                              dq_ref, dk_ref, dv_ref, *, rate):
    """Recompute-based backward for one (batch, head) cell.

    With S = qk^T*scale + bias, P = softmax(S), Pd = dropout(P), O = Pd V:
      dV = Pd^T dO
      dPd = dO V^T ;  dP = keep-mask(dPd) / (1 - rate)
      dS = P * (dP - rowsum(P * dP))
      dQ = dS K * scale ;  dK = dS^T Q * scale
    """
    p = _probs(q_ref, k_ref, bias_ref)  # fp32 [tq_p, tk_p]
    if keep_ref is not None:
        keep = keep_ref[0, 0]
        pd = jnp.where(keep, p / (1.0 - rate), 0.0)
    else:
        pd = p
    do = do_ref[0, 0].astype(jnp.float32)
    v = v_ref[0, 0].astype(jnp.float32)
    q = q_ref[0, 0].astype(jnp.float32)
    k = k_ref[0, 0].astype(jnp.float32)

    mm = lambda a, b, dims: jax.lax.dot_general(
        a, b, (dims, ((), ())), preferred_element_type=jnp.float32
    )
    dv = mm(pd, do, ((0,), (0,)))          # [tk_p, d] = Pd^T dO
    dpd = mm(do, v, ((1,), (1,)))          # [tq_p, tk_p] = dO V^T
    dp = jnp.where(keep, dpd / (1.0 - rate), 0.0) if keep_ref is not None else dpd
    delta = jnp.sum(p * dp, axis=-1, keepdims=True)
    scale = jax.lax.rsqrt(jnp.asarray(q.shape[-1], jnp.float32))
    ds = p * (dp - delta) * scale          # [tq_p, tk_p]
    dq_ref[0, 0] = mm(ds, k, ((1,), (0,))).astype(dq_ref.dtype)   # dS K
    dk_ref[0, 0] = mm(ds, q, ((0,), (0,))).astype(dk_ref.dtype)   # dS^T Q
    dv_ref[0, 0] = dv.astype(dv_ref.dtype)


def _train_specs(tq_p, tk_p, d, bb, bh):
    q_spec = pl.BlockSpec((1, 1, tq_p, d), lambda i, j: (i, j, 0, 0), memory_space=pltpu.VMEM)
    k_spec = pl.BlockSpec((1, 1, tk_p, d), lambda i, j: (i, j, 0, 0), memory_space=pltpu.VMEM)
    bias_spec = pl.BlockSpec(
        (1, 1, tq_p, tk_p),
        (lambda i, j: (i if bb > 1 else 0, j if bh > 1 else 0, 0, 0)),
        memory_space=pltpu.VMEM,
    )
    keep_spec = pl.BlockSpec(
        (1, 1, tq_p, tk_p), lambda i, j: (i, j, 0, 0), memory_space=pltpu.VMEM
    )
    return q_spec, k_spec, bias_spec, keep_spec


def _pad_keep(keep_mask, tq, tk, tq_p, tk_p):
    """bool [B, H, Tq, Tk] -> padded [B, H, Tq_p, Tk_p] (padding kept=True;
    padded key columns already carry NEG_INF bias so their P is 0)."""
    return jnp.pad(
        keep_mask, ((0, 0), (0, 0), (0, tq_p - tq), (0, tk_p - tk)),
        constant_values=True,
    )


@functools.partial(jax.custom_vjp, nondiff_argnums=(0, 1))
def fused_attention_trainable(dropout_rate, interpret, q, k, v, bias, keep_mask):
    """Differentiable fused attention with attention-weight dropout.

    q [B, Tq, H, D], k/v [B, Tk, H, D], bias broadcastable [B, H, Tq, Tk] or
    None, keep_mask bool [B, H, Tq, Tk] or None (required iff
    dropout_rate > 0). ``dropout_rate`` and ``interpret`` are static.

    GRADIENT CONTRACT: d/d(bias) is ZERO — the recompute backward never
    materializes the [Tq, Tk] logits gradient. Correct for mask biases
    (causal/padding, the only biases this framework builds); a LEARNED bias
    must NOT be routed through this function (the dispatch in
    ops/attention.py stop_gradients the bias to make this explicit).
    """
    out, _ = _train_fwd(dropout_rate, interpret, q, k, v, bias, keep_mask)
    return out


def _train_fwd(dropout_rate, interpret, q, k, v, bias, keep_mask):
    b, _, h, d = q.shape
    qp, kp, vp, tq, tk, tq_p, tk_p = _pad_transpose(q, k, v)
    biasp, bb, bh = _padded_bias(bias, tq, tk, tq_p, tk_p)
    q_spec, k_spec, bias_spec, keep_spec = _train_specs(tq_p, tk_p, d, bb, bh)
    out_shape = jax.ShapeDtypeStruct((b, h, tq_p, d), q.dtype)
    if dropout_rate > 0.0:
        if keep_mask is None:
            raise ValueError("keep_mask required when dropout_rate > 0")
        keepp = _pad_keep(keep_mask, tq, tk, tq_p, tk_p)
        out = pl.pallas_call(
            functools.partial(_fwd_train_dropout_kernel, rate=dropout_rate),
            grid=(b, h),
            in_specs=[q_spec, k_spec, k_spec, bias_spec, keep_spec],
            out_specs=q_spec, out_shape=out_shape, interpret=interpret,
        )(qp, kp, vp, biasp, keepp)
    else:
        out = pl.pallas_call(
            functools.partial(_fwd_train_kernel, rate=dropout_rate),
            grid=(b, h),
            in_specs=[q_spec, k_spec, k_spec, bias_spec],
            out_specs=q_spec, out_shape=out_shape, interpret=interpret,
        )(qp, kp, vp, biasp)
    return out.transpose(0, 2, 1, 3)[:, :tq], (q, k, v, bias, keep_mask)


def _train_bwd(dropout_rate, interpret, residuals, g):
    q, k, v, bias, keep_mask = residuals
    b, _, h, d = q.shape
    qp, kp, vp, tq, tk, tq_p, tk_p = _pad_transpose(q, k, v)
    gp = jnp.pad(g, ((0, 0), (0, tq_p - tq), (0, 0), (0, 0))).transpose(0, 2, 1, 3)
    biasp, bb, bh = _padded_bias(bias, tq, tk, tq_p, tk_p)
    q_spec, k_spec, bias_spec, keep_spec = _train_specs(tq_p, tk_p, d, bb, bh)
    out_shapes = (
        jax.ShapeDtypeStruct((b, h, tq_p, d), q.dtype),
        jax.ShapeDtypeStruct((b, h, tk_p, d), k.dtype),
        jax.ShapeDtypeStruct((b, h, tk_p, d), v.dtype),
    )
    if dropout_rate > 0.0:
        keepp = _pad_keep(keep_mask, tq, tk, tq_p, tk_p)
        dq, dk, dv = pl.pallas_call(
            functools.partial(_bwd_train_dropout_kernel, rate=dropout_rate),
            grid=(b, h),
            in_specs=[q_spec, k_spec, k_spec, bias_spec, keep_spec, q_spec],
            out_specs=(q_spec, k_spec, k_spec),
            out_shape=out_shapes, interpret=interpret,
        )(qp, kp, vp, biasp, keepp, gp)
    else:
        dq, dk, dv = pl.pallas_call(
            functools.partial(_bwd_train_kernel, rate=dropout_rate),
            grid=(b, h),
            in_specs=[q_spec, k_spec, k_spec, bias_spec, q_spec],
            out_specs=(q_spec, k_spec, k_spec),
            out_shape=out_shapes, interpret=interpret,
        )(qp, kp, vp, biasp, gp)
    dq = dq.transpose(0, 2, 1, 3)[:, :tq]
    dk = dk.transpose(0, 2, 1, 3)[:, :tk]
    dv = dv.transpose(0, 2, 1, 3)[:, :tk]
    # bias is always a mask constant here (causal/padding), keep_mask is
    # boolean: symbolic-zero cotangents
    import numpy as _np

    dbias = None if bias is None else jnp.zeros_like(bias)
    dkeep = (
        None if keep_mask is None
        else _np.zeros(keep_mask.shape, dtype=jax.dtypes.float0)
    )
    return dq, dk, dv, dbias, dkeep


fused_attention_trainable.defvjp(_train_fwd, _train_bwd)


def fused_attention_trainable_sharded(
    mesh, axis, dropout_rate, interpret, q, k, v, bias, keep_mask
):
    """``fused_attention_trainable`` inside a multi-device jit.

    Mosaic kernels are single-device programs — XLA refuses to auto-partition
    a ``pallas_call`` under GSPMD — so this wraps the kernel (custom_vjp and
    all; shard_map differentiates through it) in a ``shard_map`` over the
    mesh's batch axis. Attention is embarrassingly parallel over batch:
    every shard runs the unmodified kernel on its B/n slice, no collectives.
    Batch-shaped operands shard over ``axis``; broadcast operands (a causal
    [1, H, Tq, Tk] bias) replicate.
    """
    from jax.experimental.shard_map import shard_map
    from jax.sharding import PartitionSpec as P

    n = mesh.shape[axis]
    b = q.shape[0]
    if b % n:
        raise ValueError(f"batch {b} not divisible by mesh axis '{axis}'={n}")

    def bspec(x):
        lead = axis if x.shape[0] == b else None
        return P(lead, *([None] * (x.ndim - 1)))

    has_bias, has_keep = bias is not None, keep_mask is not None
    extras = [x for x in (bias, keep_mask) if x is not None]

    def inner(q, k, v, *rest):
        it = iter(rest)
        b_ = next(it) if has_bias else None
        m_ = next(it) if has_keep else None
        return fused_attention_trainable(dropout_rate, interpret, q, k, v, b_, m_)

    in_specs = tuple([bspec(q), bspec(k), bspec(v)] + [bspec(x) for x in extras])
    fn = shard_map(
        inner, mesh=mesh, in_specs=in_specs,
        out_specs=P(axis, None, None, None), check_rep=False,
    )
    return fn(q, k, v, *extras)
