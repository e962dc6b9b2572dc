"""Fused single-token decode-step kernels (round-2 VERDICT next-#1).

The KV-cached greedy decode loop is the framework's hottest path (the
reference decodes every eval split per epoch; the bench's entire runtime).
Profiling on v5e showed the XLA-compiled loop body runs ~3x above its HBM
floor: dozens of small fusions per token (QKV projections, cache updates,
matvec attentions, norms, FFN matmuls, the vocab projection) each pay
scheduling and layout costs that dominate at single-token shapes.

These kernels collapse one decode step into at most TWO pallas_calls per
token (vs ~40 XLA fusions) — or ONE at small batches:

* ``fused_layers_step`` — the whole decoder stack in one kernel (per layer:
  packed-QKV projection, cache row write, masked self-attention over the
  cache, out-projection, norm1, cross-attention over the precomputed memory
  K/V, norm2, FFN, norm3; statically unrolled over layers). Grid tiles the
  batch; weights use constant index maps so Mosaic keeps them resident
  instead of re-fetching per tile. ``fused_layer_step`` is the per-layer
  building block it grew from (kept for tests/composability).
* ``fused_norm_generator_argmax`` — final stack LayerNorm + vocab projection
  + argmax in one kernel, vocab tiled on an inner grid axis with a running
  (max, argmax) carried across tiles — the [B, V] logits tensor never exists
  in HBM (at B=1024/V=30522 that's a 125 MB/step round-trip on the XLA path).
* ``fused_whole_step`` — at batch tiles <= 32 the generator weight fits in
  VMEM untiled, so stack + final norm + generator + argmax run as ONE launch
  (the serving/single-video path).

TPU-shaped design decisions:
* caches are laid out [L, B, E]: the per-token row index lands on the LEADING
  (untiled) dimension, where Mosaic allows arbitrary dynamic block indices —
  on the sublane dimension a dynamic store must be 8-aligned, which a token
  counter never is.
* the kernel never writes the whole cache back: the cache enters read-only,
  and the fresh K/V row leaves through a separate one-row output block whose
  index map consumes the scalar-prefetched position (``input_output_aliases``
  makes it an in-place row write: ~1.5 MB/step instead of a 283 MB
  read-modify-write of the full rectangles).
* the row being written is zeros in the cache (positions are written
  monotonically), so self-attention uses the stale tile plus an in-register
  "fresh row" correction to both the scores and the weighted sum.
* attention head-splitting never reshapes the minor dim (D = E/H is rarely a
  multiple of 128): per-head score reduction and the broadcast back go
  through an [E, H] head-indicator matmul, keeping every big tensor at lane
  width E.
* GELU uses a rational erf (max err 1.5e-7) — Mosaic has no erf lowering,
  and tanh-GELU would be ~1e-3 off the exact-erf numerics.

Numerics match ``layers.TransformerDecoderLayer.decode_step`` bit-closely
(fp32 softmax/norm statistics, matmuls with fp32 accumulation);
``tests/test_pallas_decode.py`` asserts token-exact agreement of the full
greedy loop in interpret mode. Replaces: the reference's per-token full
decoder re-run (``/root/reference/model/CapDecoder.py:62-79``).
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30
LN_EPS = 1e-5


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


def _head_selectors(e: int, heads: int):
    """(sel [E, H], selt [H, E]) head-indicator matmul matrices for the
    packed-QKV [h, d] layout (see ``_attend_single_query``). ONE source of
    truth — the attention head split in every kernel wrapper depends on
    this exact construction matching the packed layout."""
    lane = jnp.arange(e) // (e // heads)
    sel = (lane[:, None] == jnp.arange(heads)[None, :]).astype(jnp.float32)
    return sel, sel.T


def _erf(x):
    """Abramowitz-Stegun 7.1.26 rational erf (max abs err 1.5e-7)."""
    a1, a2, a3, a4, a5 = (0.254829592, -0.284496736, 1.421413741,
                          -1.453152027, 1.061405429)
    p = 0.3275911
    s = jnp.sign(x)
    ax = jnp.abs(x)
    t = 1.0 / (1.0 + p * ax)
    y = 1.0 - ((((a5 * t + a4) * t + a3) * t + a2) * t + a1) * t * jnp.exp(-ax * ax)
    return s * y


def _gelu_exact(x):
    """0.5 x (1 + erf(x / sqrt(2))) in fp32."""
    return 0.5 * x * (1.0 + _erf(x * 0.7071067811865476))


def _layernorm(x, scale, bias):
    """fp32-stat LayerNorm matching flax nn.LayerNorm(epsilon=1e-5)."""
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(xf - mean), axis=-1, keepdims=True)
    y = (xf - mean) * jax.lax.rsqrt(var + LN_EPS)
    return y * scale.astype(jnp.float32) + bias.astype(jnp.float32)


def _matmul(x, w, b, out_dtype):
    y = jax.lax.dot_general(
        x, w, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )
    return (y + b.astype(jnp.float32)).astype(out_dtype)


def _heads_dot(x2d, sel):
    """[N, E] x [E, H] -> [N, H] fp32 (per-head lane reduction via MXU)."""
    return jax.lax.dot_general(
        x2d, sel, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )


def _attend_single_query(q, kc, vc, sel, selt, d, kbias, fresh=None, idx=None):
    """One-query multi-head attention over an [L, Bt, E] cache tile.

    q [Bt, E]; kc/vc [L, Bt, E]; sel [E, H]; kbias [L, Bt or 1] fp32.
    ``fresh=(k1, v1)``: the current position's K/V (row ``idx`` of the cache
    tile is stale zeros — its score and value contributions are patched in
    from registers). -> [Bt, E] fp32.
    """
    l, bt, e = kc.shape
    h = sel.shape[1]
    qf = q.astype(jnp.float32)
    scale = jax.lax.rsqrt(jnp.asarray(d, jnp.float32))
    prod = qf[None] * kc.astype(jnp.float32)                 # [L, Bt, E]
    logits = _heads_dot(prod.reshape(l * bt, e), sel).reshape(l, bt, h) * scale
    if fresh is not None:
        k1, v1 = fresh
        lf = _heads_dot(qf * k1.astype(jnp.float32), sel) * scale  # [Bt, H]
        pos = jax.lax.broadcasted_iota(jnp.int32, (l, 1, 1), 0)
        logits = jnp.where(pos == idx, lf[None], logits)
    logits = logits + kbias[:, :, None]
    m = jnp.max(logits, axis=0, keepdims=True)
    ex = jnp.exp(logits - m)
    w = ex / jnp.sum(ex, axis=0, keepdims=True)              # [L, Bt, H]
    w_e = _heads_dot(w.reshape(l * bt, h), selt).reshape(l, bt, e)
    out = jnp.sum(w_e * vc.astype(jnp.float32), axis=0)      # [Bt, E]
    if fresh is not None:
        pos = jax.lax.broadcasted_iota(jnp.int32, (l, 1, 1), 0)
        wf = jnp.sum(jnp.where(pos == idx, w_e, 0.0), axis=0)  # [Bt, E]
        out = out + wf * v1.astype(jnp.float32)
    return out


def _layer_step_kernel(
    # scalar prefetch
    idx_ref,
    # tensor inputs
    x_ref, k_ref, v_ref, ck_ref, cv_ref, membias_ref, sel_ref, selt_ref,
    wqkv_ref, bqkv_ref, wo_ref, bo_ref,
    wcq_ref, bcq_ref, wco_ref, bco_ref,
    n1s_ref, n1b_ref, n2s_ref, n2b_ref,
    w1_ref, b1_ref, w2_ref, b2_ref, n3s_ref, n3b_ref,
    # outputs
    xout_ref, krow_ref, vrow_ref,
    *, heads: int,
):
    e = x_ref.shape[-1]
    d = e // heads
    idx = idx_ref[0]
    x = x_ref[...]  # [Bt, E]

    qkv = _matmul(x, wqkv_ref[...], bqkv_ref[...], jnp.float32)  # [Bt, 3E]
    q = qkv[:, :e]
    k1 = qkv[:, e:2 * e].astype(krow_ref.dtype)
    v1 = qkv[:, 2 * e:].astype(vrow_ref.dtype)

    # fresh row leaves through the one-row aliased output block
    krow_ref[0] = k1
    vrow_ref[0] = v1

    kc = k_ref[...]  # [L, Bt, E] — row idx is stale zeros (patched in-reg)
    vc = v_ref[...]
    l = kc.shape[0]
    sel = sel_ref[...]
    selt = selt_ref[...]
    # causal mask: rows beyond idx are future
    pos = jax.lax.broadcasted_iota(jnp.int32, (l, 1), 0)
    cbias = jnp.where(pos <= idx, 0.0, NEG_INF).astype(jnp.float32)
    sa = _attend_single_query(q, kc, vc, sel, selt, d, cbias,
                              fresh=(k1, v1), idx=idx)
    sa = _matmul(sa.astype(x.dtype), wo_ref[...], bo_ref[...], jnp.float32)
    x1 = _layernorm(x.astype(jnp.float32) + sa, n1s_ref[...], n1b_ref[...])
    x1c = x1.astype(x.dtype)

    cq = _matmul(x1c, wcq_ref[...], bcq_ref[...], jnp.float32)
    # bias arrives [Bt or 1, Tm] (lane-legal blocks); attention wants [Tm, Bt]
    mbias = membias_ref[...].astype(jnp.float32).T
    ca = _attend_single_query(cq, ck_ref[...], cv_ref[...], sel, selt, d, mbias)
    ca = _matmul(ca.astype(x.dtype), wco_ref[...], bco_ref[...], jnp.float32)
    x2 = _layernorm(x1 + ca, n2s_ref[...], n2b_ref[...])
    x2c = x2.astype(x.dtype)

    h1 = _matmul(x2c, w1_ref[...], b1_ref[...], jnp.float32)
    h1 = _gelu_exact(h1).astype(x.dtype)
    h2 = _matmul(h1, w2_ref[...], b2_ref[...], jnp.float32)
    x3 = _layernorm(x2 + h2, n3s_ref[...], n3b_ref[...])
    xout_ref[...] = x3.astype(xout_ref.dtype)


def fused_layer_step(
    x: jnp.ndarray,            # [B, E] current activations
    k_cache: jnp.ndarray,      # [L, B, E]
    v_cache: jnp.ndarray,      # [L, B, E]
    ck: jnp.ndarray,           # [Tm, B, E] cross K
    cv: jnp.ndarray,           # [Tm, B, E] cross V
    mem_bias: Optional[jnp.ndarray],  # [B, Tm] fp32 additive or None
    weights: dict,
    idx: jnp.ndarray,          # scalar int32 position
    *,
    heads: int,
    block_b: int = 32,
    interpret: bool = False,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """One decoder layer's decode step -> (x_out [B, E], k_cache, v_cache).

    The returned caches are the inputs with row ``idx`` written in place.
    ``weights``: wqkv [E,3E], bqkv [3E], wo [E,E], bo, wcq [E,E], bcq,
    wco [E,E], bco, n1s/n1b/n2s/n2b/n3s/n3b [E], w1 [E,F], b1 [F],
    w2 [F,E], b2 [E].
    """
    b, e = x.shape
    l, tm = k_cache.shape[0], ck.shape[0]
    f = weights["w1"].shape[1]
    bt = min(block_b, b)
    assert b % bt == 0, (b, bt)
    assert e % heads == 0
    grid = (b // bt,)
    d = e // heads

    sel, selt = _head_selectors(e, heads)

    use_mem_bias = mem_bias is not None
    if mem_bias is None:
        mem_bias = jnp.zeros((1, tm), jnp.float32)

    # index maps receive (grid_idx, *scalar_prefetch_refs)
    def row_spec(cols):
        return pl.BlockSpec((bt, cols), lambda i, _s: (i, 0), memory_space=pltpu.VMEM)

    def cache_spec(rows):
        return pl.BlockSpec((rows, bt, e), lambda i, _s: (0, i, 0),
                            memory_space=pltpu.VMEM)

    def const_spec(shape):
        nd = len(shape)
        return pl.BlockSpec(shape, lambda i, _s: (0,) * nd, memory_space=pltpu.VMEM)

    mem_bias_spec = (
        pl.BlockSpec((bt, tm), lambda i, _s: (i, 0), memory_space=pltpu.VMEM)
        if use_mem_bias
        else pl.BlockSpec((1, tm), lambda i, _s: (0, 0), memory_space=pltpu.VMEM)
    )
    # the fresh K/V row: a one-row block whose position comes from the
    # scalar-prefetched idx — the ONLY part of the cache written back
    row_out_spec = pl.BlockSpec(
        (1, bt, e), lambda i, s: (s[0], i, 0), memory_space=pltpu.VMEM
    )

    w = weights
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=grid,
        in_specs=[
            row_spec(e), cache_spec(l), cache_spec(l), cache_spec(tm),
            cache_spec(tm), mem_bias_spec,
            const_spec((e, heads)), const_spec((heads, e)),
            const_spec((e, 3 * e)), const_spec((3 * e,)),
            const_spec((e, e)), const_spec((e,)),
            const_spec((e, e)), const_spec((e,)),
            const_spec((e, e)), const_spec((e,)),
            const_spec((e,)), const_spec((e,)), const_spec((e,)), const_spec((e,)),
            const_spec((e, f)), const_spec((f,)),
            const_spec((f, e)), const_spec((e,)),
            const_spec((e,)), const_spec((e,)),
        ],
        out_specs=(row_spec(e), row_out_spec, row_out_spec),
    )
    out_shapes = (
        jax.ShapeDtypeStruct((b, e), x.dtype),
        jax.ShapeDtypeStruct(k_cache.shape, k_cache.dtype),
        jax.ShapeDtypeStruct(v_cache.shape, v_cache.dtype),
    )
    kernel = functools.partial(_layer_step_kernel, heads=heads)
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=out_shapes,
        # inputs (incl. scalar 0): [1]=x, [2]=k_cache, [3]=v_cache -> alias
        # the caches onto outputs 1/2: in-place one-row writes
        input_output_aliases={2: 1, 3: 2},
        # the layer's full weight set (~13 MB bf16) plus double-buffered
        # cache tiles exceed the 16 MB default scoped-vmem limit; v5e has
        # 128 MB physical VMEM
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=64 * 1024 * 1024),
        interpret=interpret,
    )(
        jnp.asarray(idx, jnp.int32).reshape(1), x, k_cache, v_cache, ck, cv,
        mem_bias, sel, selt,
        w["wqkv"], w["bqkv"], w["wo"], w["bo"],
        w["wcq"], w["bcq"], w["wco"], w["bco"],
        w["n1s"], w["n1b"], w["n2s"], w["n2b"],
        w["w1"], w["b1"], w["w2"], w["b2"], w["n3s"], w["n3b"],
    )


# ---------------------------------------------------------------------------
# all decoder layers in ONE launch
# ---------------------------------------------------------------------------


def _stack_layers(
    idx, x_ref, k_ref, v_ref, ck_ref, cv_ref, membias_ref, sel_ref, selt_ref,
    wqkv_ref, bqkv_ref, wo_ref, bo_ref,
    wcq_ref, bcq_ref, wco_ref, bco_ref,
    n1s_ref, n1b_ref, n2s_ref, n2b_ref,
    w1_ref, b1_ref, w2_ref, b2_ref, n3s_ref, n3b_ref,
    krow_ref, vrow_ref, *, heads: int, nl: int,
):
    """The decoder stack's decode step over in-VMEM refs: ``nl`` layers
    statically unrolled (nl is 2-3 for every shipped config, so Mosaic sees
    straight-line code; per-layer tensors are static leading-axis slices),
    fresh K/V rows written through the one-row aliased output blocks.
    -> final activations [Bt, E] in the compute dtype."""
    e = x_ref.shape[-1]
    d = e // heads
    sel = sel_ref[...]
    selt = selt_ref[...]
    mbias = membias_ref[...].astype(jnp.float32).T
    l = k_ref.shape[1]
    pos = jax.lax.broadcasted_iota(jnp.int32, (l, 1), 0)
    cbias = jnp.where(pos <= idx, 0.0, NEG_INF).astype(jnp.float32)

    x = x_ref[...]  # [Bt, E]
    for li in range(nl):
        qkv = _matmul(x, wqkv_ref[li], bqkv_ref[li], jnp.float32)
        q = qkv[:, :e]
        k1 = qkv[:, e:2 * e].astype(krow_ref.dtype)
        v1 = qkv[:, 2 * e:].astype(vrow_ref.dtype)
        krow_ref[li, 0] = k1
        vrow_ref[li, 0] = v1
        sa = _attend_single_query(q, k_ref[li], v_ref[li], sel, selt, d,
                                  cbias, fresh=(k1, v1), idx=idx)
        sa = _matmul(sa.astype(x.dtype), wo_ref[li], bo_ref[li], jnp.float32)
        x1 = _layernorm(x.astype(jnp.float32) + sa, n1s_ref[li], n1b_ref[li])
        x1c = x1.astype(x.dtype)

        cq = _matmul(x1c, wcq_ref[li], bcq_ref[li], jnp.float32)
        ca = _attend_single_query(cq, ck_ref[li], cv_ref[li], sel, selt, d,
                                  mbias)
        ca = _matmul(ca.astype(x.dtype), wco_ref[li], bco_ref[li], jnp.float32)
        x2 = _layernorm(x1 + ca, n2s_ref[li], n2b_ref[li])
        x2c = x2.astype(x.dtype)

        h1 = _matmul(x2c, w1_ref[li], b1_ref[li], jnp.float32)
        h1 = _gelu_exact(h1).astype(x.dtype)
        h2 = _matmul(h1, w2_ref[li], b2_ref[li], jnp.float32)
        x3 = _layernorm(x2 + h2, n3s_ref[li], n3b_ref[li])
        x = x3.astype(x.dtype)
    return x


def _layers_step_kernel(
    # scalar prefetch
    idx_ref,
    # tensor inputs (stacked on a leading layer axis)
    x_ref, k_ref, v_ref, ck_ref, cv_ref, membias_ref, sel_ref, selt_ref,
    wqkv_ref, bqkv_ref, wo_ref, bo_ref,
    wcq_ref, bcq_ref, wco_ref, bco_ref,
    n1s_ref, n1b_ref, n2s_ref, n2b_ref,
    w1_ref, b1_ref, w2_ref, b2_ref, n3s_ref, n3b_ref,
    # outputs
    xout_ref, krow_ref, vrow_ref,
    *, heads: int, nl: int,
):
    x = _stack_layers(
        idx_ref[0], x_ref, k_ref, v_ref, ck_ref, cv_ref, membias_ref,
        sel_ref, selt_ref, wqkv_ref, bqkv_ref, wo_ref, bo_ref,
        wcq_ref, bcq_ref, wco_ref, bco_ref,
        n1s_ref, n1b_ref, n2s_ref, n2b_ref,
        w1_ref, b1_ref, w2_ref, b2_ref, n3s_ref, n3b_ref,
        krow_ref, vrow_ref, heads=heads, nl=nl,
    )
    xout_ref[...] = x.astype(xout_ref.dtype)


def _whole_step_kernel(
    # scalar prefetch
    idx_ref,
    # tensor inputs
    x_ref, k_ref, v_ref, ck_ref, cv_ref, membias_ref, sel_ref, selt_ref,
    wqkv_ref, bqkv_ref, wo_ref, bo_ref,
    wcq_ref, bcq_ref, wco_ref, bco_ref,
    n1s_ref, n1b_ref, n2s_ref, n2b_ref,
    w1_ref, b1_ref, w2_ref, b2_ref, n3s_ref, n3b_ref,
    ns_ref, nb_ref, wg_ref, bg_ref,
    # outputs
    tok_ref, krow_ref, vrow_ref,
    *, heads: int, nl: int,
):
    """The ENTIRE decode step — decoder stack + final LayerNorm + generator
    + argmax — in one launch. Numerically identical to
    ``_layers_step_kernel`` followed by ``fused_norm_generator_argmax``
    (same bf16 round-trip between the stack and the norm, same fp32 @ bf16
    vocab matmul), just without tiling the vocab: at the small batches this
    kernel serves, the full [E, V_pad] generator weight and the [Bt, V_pad]
    fp32 logits fit in VMEM alongside the stack weights."""
    x = _stack_layers(
        idx_ref[0], x_ref, k_ref, v_ref, ck_ref, cv_ref, membias_ref,
        sel_ref, selt_ref, wqkv_ref, bqkv_ref, wo_ref, bo_ref,
        wcq_ref, bcq_ref, wco_ref, bco_ref,
        n1s_ref, n1b_ref, n2s_ref, n2b_ref,
        w1_ref, b1_ref, w2_ref, b2_ref, n3s_ref, n3b_ref,
        krow_ref, vrow_ref, heads=heads, nl=nl,
    )
    yn = _layernorm(x, ns_ref[...], nb_ref[...])
    logits = jax.lax.dot_general(
        yn.astype(jnp.float32), wg_ref[...], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) + bg_ref[...].astype(jnp.float32)
    tok_ref[:, 0] = jnp.argmax(logits, axis=-1).astype(jnp.int32)


def _stack_call_parts(x, k_cache, v_cache, ck, cv, mem_bias, stacked, idx,
                      heads, block_b, l_view):
    """Shared pallas_call plumbing for the stacked-step kernels: shape/tile
    checks, head-indicator matrices, the stack's in_specs (scalar-prefetch
    layout), the aliased one-row cache out_spec, and the operand tuple in
    kernel-argument order. ``fused_layers_step`` and ``fused_whole_step``
    assemble their calls from this ONE source of truth so the two decode
    paths cannot silently diverge in layout."""
    b, e = x.shape
    nl, l = k_cache.shape[0], k_cache.shape[1]
    if l_view is not None:
        assert l_view % 8 == 0 and 0 < l_view <= l, (l_view, l)
        l = l_view
    tm = ck.shape[1]
    f = stacked["w1"].shape[-1]
    bt = min(block_b, b)
    assert b % bt == 0, (b, bt)
    assert e % heads == 0
    d = e // heads

    sel, selt = _head_selectors(e, heads)

    use_mem_bias = mem_bias is not None
    if mem_bias is None:
        mem_bias = jnp.zeros((1, tm), jnp.float32)

    def row_spec(cols):
        return pl.BlockSpec((bt, cols), lambda i, _s: (i, 0), memory_space=pltpu.VMEM)

    def cache_spec(rows):
        return pl.BlockSpec((nl, rows, bt, e), lambda i, _s: (0, 0, i, 0),
                            memory_space=pltpu.VMEM)

    def const_spec(shape):
        nd = len(shape)
        return pl.BlockSpec(shape, lambda i, _s: (0,) * nd, memory_space=pltpu.VMEM)

    mem_bias_spec = (
        pl.BlockSpec((bt, tm), lambda i, _s: (i, 0), memory_space=pltpu.VMEM)
        if use_mem_bias
        else pl.BlockSpec((1, tm), lambda i, _s: (0, 0), memory_space=pltpu.VMEM)
    )
    row_out_spec = pl.BlockSpec(
        (nl, 1, bt, e), lambda i, s: (0, s[0], i, 0), memory_space=pltpu.VMEM
    )

    w = stacked
    in_specs = [
        row_spec(e), cache_spec(l), cache_spec(l), cache_spec(tm),
        cache_spec(tm), mem_bias_spec,
        const_spec((e, heads)), const_spec((heads, e)),
        const_spec((nl, e, 3 * e)), const_spec((nl, 3 * e)),
        const_spec((nl, e, e)), const_spec((nl, e)),
        const_spec((nl, e, e)), const_spec((nl, e)),
        const_spec((nl, e, e)), const_spec((nl, e)),
        const_spec((nl, e)), const_spec((nl, e)),
        const_spec((nl, e)), const_spec((nl, e)),
        const_spec((nl, e, f)), const_spec((nl, f)),
        const_spec((nl, f, e)), const_spec((nl, e)),
        const_spec((nl, e)), const_spec((nl, e)),
    ]
    operands = (
        jnp.asarray(idx, jnp.int32).reshape(1), x, k_cache, v_cache, ck, cv,
        mem_bias, sel, selt,
        w["wqkv"], w["bqkv"], w["wo"], w["bo"],
        w["wcq"], w["bcq"], w["wco"], w["bco"],
        w["n1s"], w["n1b"], w["n2s"], w["n2b"],
        w["w1"], w["b1"], w["w2"], w["b2"], w["n3s"], w["n3b"],
    )
    return {
        "b": b, "e": e, "nl": nl, "bt": bt, "grid": (b // bt,),
        "in_specs": in_specs, "operands": operands,
        "row_spec": row_spec, "const_spec": const_spec,
        "row_out_spec": row_out_spec,
        # effective cache window (l_view or full L): callers poison their
        # output when idx >= this — past the window the kernel's pos iota
        # never matches idx, the fresh token's K/V silently drops out of
        # self-attention, and the result would be plausible-but-wrong
        "l": l,
    }


def fused_layers_step(
    x: jnp.ndarray,            # [B, E] current activations
    k_cache: jnp.ndarray,      # [NL, L, B, E] all layers' self caches
    v_cache: jnp.ndarray,      # [NL, L, B, E]
    ck: jnp.ndarray,           # [NL, Tm, B, E] all layers' cross K
    cv: jnp.ndarray,           # [NL, Tm, B, E]
    mem_bias: Optional[jnp.ndarray],  # [B, Tm] fp32 additive or None
    weights: dict,             # per-layer tensors stacked on axis 0
    idx: jnp.ndarray,          # scalar int32 position
    *,
    heads: int,
    block_b: int = 64,
    l_view: Optional[int] = None,
    interpret: bool = False,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """The WHOLE decoder stack's decode step in one pallas_call ->
    (x_out [B, E], k_cache, v_cache with row ``idx`` written per layer).

    ``weights`` carries the same tensors as ``fused_layer_step`` but stacked
    [NL, ...]. VMEM budget at the default block_b=64 for the flagship
    (NL=3, E=768, F=2048, L=32, Tm=16): ~40 MB stacked weights (constant
    blocks, fetched once) + ~28 MB of cache/cross tiles per grid step —
    within v5e's 128 MB with double buffering. block_b=128 would double the
    tile traffic and overflow; 64 measures as fast (the launch count, not the
    tile size, was the bottleneck being removed here).

    ``l_view`` (multiple of 8, > idx) reads only the first l_view cache rows:
    rows past ``idx`` carry exactly-zero attention weight (their NEG_INF
    causal bias underflows exp to 0.0 in fp32), so shrinking the window is
    bit-exact while cutting the dominant HBM stream — the decode loop stages
    its steps through growing windows instead of always streaming all L rows.
    The fresh row still writes through the full-array aliased output block.
    """
    p = _stack_call_parts(x, k_cache, v_cache, ck, cv, mem_bias, weights,
                          idx, heads, block_b, l_view)
    e = p["e"]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=p["grid"],
        in_specs=p["in_specs"],
        out_specs=(p["row_spec"](e), p["row_out_spec"], p["row_out_spec"]),
    )
    out_shapes = (
        jax.ShapeDtypeStruct((p["b"], e), x.dtype),
        jax.ShapeDtypeStruct(k_cache.shape, k_cache.dtype),
        jax.ShapeDtypeStruct(v_cache.shape, v_cache.dtype),
    )
    kernel = functools.partial(_layers_step_kernel, heads=heads, nl=p["nl"])
    x_out, ks, vs = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=out_shapes,
        input_output_aliases={2: 1, 3: 2},
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=110 * 1024 * 1024
        ),
        interpret=interpret,
    )(*p["operands"])
    # contract guard (same protection fused_multi_step has): idx must lie
    # inside the staged window or the fresh token's K/V was dropped —
    # poison to NaN so a violation is unmissable instead of plausible.
    x_out = jnp.where(idx < p["l"], x_out, jnp.nan)
    return x_out, ks, vs


def fused_whole_step(
    x: jnp.ndarray,            # [B, E] current activations
    k_cache: jnp.ndarray,      # [NL, L, B, E]
    v_cache: jnp.ndarray,      # [NL, L, B, E]
    ck: jnp.ndarray,           # [NL, Tm, B, E]
    cv: jnp.ndarray,           # [NL, Tm, B, E]
    mem_bias: Optional[jnp.ndarray],  # [B, Tm] fp32 additive or None
    weights: dict,             # stacked layer weights + norm_s/norm_b/wg/bg
    idx: jnp.ndarray,          # scalar int32 position
    *,
    heads: int,
    block_b: int = 32,
    l_view: Optional[int] = None,
    interpret: bool = False,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """ONE launch for the entire decode step -> (next tokens [B] int32,
    k_cache, v_cache with row ``idx`` written per layer).

    The small-batch fast path: at bt <= 32 the full [E, V_pad] generator
    weight (~47 MB bf16 at the flagship vocab) + the stacked layer weights
    (~40 MB) + the [bt, V_pad] fp32 logits all fit in VMEM, so the stack,
    final LayerNorm, vocab projection and argmax run without a second
    launch — at B=1 (single-video latency) the decode loop becomes one
    kernel + glue per token. Token-exact with fused_layers_step +
    fused_norm_generator_argmax (same dtype round-trips, first-win argmax
    ties); ``weights`` additionally carries ``norm_s``/``norm_b``/``wg``/
    ``bg`` exactly as ``extract_fast_weights`` produces them (vocab padded,
    pad bias NEG_INF)."""
    p = _stack_call_parts(x, k_cache, v_cache, ck, cv, mem_bias,
                          weights["stacked"], idx, heads, block_b, l_view)
    e, bt, cs = p["e"], p["bt"], p["const_spec"]
    assert bt <= 32, (bt, "whole-step keeps [bt, V_pad] fp32 logits in VMEM")
    v_pad = weights["wg"].shape[1]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=p["grid"],
        in_specs=p["in_specs"] + [
            cs((e,)), cs((e,)), cs((e, v_pad)), cs((v_pad,)),
        ],
        out_specs=(
            pl.BlockSpec((bt, 1), lambda i, _s: (i, 0), memory_space=pltpu.VMEM),
            p["row_out_spec"], p["row_out_spec"],
        ),
    )
    out_shapes = (
        jax.ShapeDtypeStruct((p["b"], 1), jnp.int32),
        jax.ShapeDtypeStruct(k_cache.shape, k_cache.dtype),
        jax.ShapeDtypeStruct(v_cache.shape, v_cache.dtype),
    )
    kernel = functools.partial(_whole_step_kernel, heads=heads, nl=p["nl"])
    tok, ks, vs = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=out_shapes,
        input_output_aliases={2: 1, 3: 2},
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=120 * 1024 * 1024
        ),
        interpret=interpret,
    )(
        *p["operands"],
        weights["norm_s"], weights["norm_b"], weights["wg"], weights["bg"],
    )
    # contract guard: see fused_layers_step — poison tokens to -1 (the same
    # sentinel fused_multi_step uses) when idx falls outside the window
    tok = jnp.where(idx < p["l"], tok, jnp.int32(-1))
    return tok[:, 0], ks, vs


# ---------------------------------------------------------------------------
# final norm + generator + argmax
# ---------------------------------------------------------------------------


def _topk_rows(vals, idxs, k):
    """Iterative k-pass top-k over the last axis -> ([Bt, k], [Bt, k]).

    ``vals`` [Bt, N] fp32, ``idxs`` [Bt, N] int32 (absolute ids). First-win
    argmax per pass == lax.top_k's lowest-index tie-break as long as equal
    values appear in increasing-id order, which both the raw logit tiles
    (iota ids) and previously-selected lists (selected in id order) satisfy.
    k is tiny (the beam width), so this is k cheap vector passes — no sort,
    no gather."""
    n = vals.shape[1]
    col = jax.lax.broadcasted_iota(jnp.int32, vals.shape, 1)
    out_v, out_i = [], []
    for _ in range(k):
        best = jnp.max(vals, axis=1)                       # [Bt]
        arg = jnp.argmax(vals, axis=1).astype(jnp.int32)   # first win
        sel = col == arg[:, None]
        out_v.append(best)
        out_i.append(jnp.sum(jnp.where(sel, idxs, 0), axis=1))
        vals = jnp.where(sel, -jnp.inf, vals)
    return jnp.stack(out_v, axis=1), jnp.stack(out_i, axis=1)


def _gen_topk_kernel(x_ref, ns_ref, nb_ref, wg_ref, bg_ref,
                     topv_ref, topi_ref, m_ref, s_ref, yn_ref,
                     *, vt: int, k: int):
    """Grid (B_tiles, V_tiles), V innermost. Carries a running per-row
    top-k (values + absolute vocab ids) AND online-softmax (max, sumexp)
    state in revisited output blocks across the vocab tiles — the beam
    search's [B·K, V] log-softmax materialization collapsed into [B·K, k]
    outputs plus a logsumexp."""
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _():
        yn_ref[...] = _layernorm(
            x_ref[...], ns_ref[...], nb_ref[...]
        ).astype(yn_ref.dtype)
        topv_ref[...] = jnp.full(topv_ref.shape, -jnp.inf, topv_ref.dtype)
        topi_ref[...] = jnp.zeros(topi_ref.shape, topi_ref.dtype)
        m_ref[...] = jnp.full(m_ref.shape, -jnp.inf, m_ref.dtype)
        s_ref[...] = jnp.zeros(s_ref.shape, s_ref.dtype)

    logits = jax.lax.dot_general(
        yn_ref[...], wg_ref[...], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) + bg_ref[...].astype(jnp.float32)  # [Bt, VT]

    # online logsumexp (rescale the running sum when the max moves)
    tile_m = jnp.max(logits, axis=-1, keepdims=True)
    m_old = m_ref[...]
    m_new = jnp.maximum(m_old, tile_m)
    s_ref[...] = (
        s_ref[...] * jnp.exp(m_old - m_new)
        + jnp.sum(jnp.exp(logits - m_new), axis=-1, keepdims=True)
    )
    m_ref[...] = m_new

    # tile top-k, then merge with the running top-k (prev listed first so
    # first-win ties prefer the lower absolute id, like lax.top_k)
    ids = jax.lax.broadcasted_iota(jnp.int32, logits.shape, 1) + j * vt
    tile_v, tile_i = _topk_rows(logits, ids, k)
    cat_v = jnp.concatenate([topv_ref[...], tile_v], axis=1)
    cat_i = jnp.concatenate([topi_ref[...], tile_i], axis=1)
    topv_ref[...], topi_ref[...] = _topk_rows(cat_v, cat_i, k)


def fused_norm_generator_topk(
    x: jnp.ndarray,         # [B, E] final decoder activations
    norm_scale: jnp.ndarray,
    norm_bias: jnp.ndarray,
    wg: jnp.ndarray,        # [E, V_pad]
    bg: jnp.ndarray,        # [V_pad] (pad columns biased to -inf-ish)
    *,
    k: int,
    block_b: int = 128,
    block_v: int = 1024,
    interpret: bool = False,
):
    """LayerNorm -> vocab projection -> per-row top-k + logsumexp, the
    [B, V] logits never reaching HBM -> (values [B, k] fp32,
    ids [B, k] int32, lse [B] fp32).

    ``values - lse[:, None]`` are exactly the top-k log-softmax entries, so
    beam search can form its per-beam candidates from k numbers instead of
    the whole vocab row (the reference stubs beam entirely,
    ``/root/reference/model/MMT4Caption.py:186-187``; the module-graph
    ``decode.beam_generate`` materializes [B·K, 30522] logits + log_softmax
    in HBM every token)."""
    b, e = x.shape
    v = wg.shape[1]
    bt = min(block_b, b)
    assert b % bt == 0 and v % block_v == 0, (b, bt, v, block_v)
    assert k >= 1
    grid = (b // bt, v // block_v)

    out = pl.pallas_call(
        functools.partial(_gen_topk_kernel, vt=block_v, k=k),
        grid=grid,
        in_specs=[
            pl.BlockSpec((bt, e), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((e,), lambda i, j: (0,), memory_space=pltpu.VMEM),
            pl.BlockSpec((e,), lambda i, j: (0,), memory_space=pltpu.VMEM),
            pl.BlockSpec((e, block_v), lambda i, j: (0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((block_v,), lambda i, j: (j,), memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((bt, k), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((bt, k), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((bt, 1), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((bt, 1), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((b, k), jnp.float32),
            jax.ShapeDtypeStruct((b, k), jnp.int32),
            jax.ShapeDtypeStruct((b, 1), jnp.float32),
            jax.ShapeDtypeStruct((b, 1), jnp.float32),
        ),
        # yn only carries the LayerNorm result across the vocab tiles of one
        # batch tile (refreshed at j==0): VMEM scratch, not an HBM output —
        # as an output it cost a [bt, e] fp32 writeback per batch tile
        scratch_shapes=[pltpu.VMEM((bt, e), jnp.float32)],
        interpret=interpret,
    )(x, norm_scale, norm_bias, wg, bg)
    topv, topi, m, s = out[0], out[1], out[2], out[3]
    lse = m[:, 0] + jnp.log(s[:, 0])
    return topv, topi, lse


def _gen_argmax_kernel(x_ref, ns_ref, nb_ref, wg_ref, bg_ref,
                       tok_ref, best_ref, yn_ref, *, vt: int):
    """Grid (B_tiles, V_tiles), V innermost. Carries running (max, argmax)
    in the revisited output blocks across the vocab tiles of one batch
    tile."""
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _():
        yn_ref[...] = _layernorm(
            x_ref[...], ns_ref[...], nb_ref[...]
        ).astype(yn_ref.dtype)
        best_ref[...] = jnp.full(best_ref.shape, -jnp.inf, best_ref.dtype)
        tok_ref[...] = jnp.zeros(tok_ref.shape, tok_ref.dtype)

    logits = jax.lax.dot_general(
        yn_ref[...], wg_ref[...], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) + bg_ref[...].astype(jnp.float32)  # [Bt, VT]

    tile_max = jnp.max(logits, axis=-1)
    tile_arg = jnp.argmax(logits, axis=-1).astype(jnp.int32) + j * vt
    prev = best_ref[:, 0]
    take = tile_max > prev
    best_ref[:, 0] = jnp.where(take, tile_max, prev)
    tok_ref[:, 0] = jnp.where(take, tile_arg, tok_ref[:, 0])


def fused_norm_generator_argmax(
    x: jnp.ndarray,         # [B, E] final decoder activations
    norm_scale: jnp.ndarray,
    norm_bias: jnp.ndarray,
    wg: jnp.ndarray,        # [E, V]
    bg: jnp.ndarray,        # [V]
    *,
    block_b: int = 256,
    block_v: int = 1024,
    interpret: bool = False,
) -> jnp.ndarray:
    """LayerNorm -> vocab projection -> argmax, logits never hitting HBM.
    -> token ids [B] int32. V must be padded to block_v by the caller
    (pad columns with a -inf-ish bias so they never win)."""
    b, e = x.shape
    v = wg.shape[1]
    bt = min(block_b, b)
    assert b % bt == 0 and v % block_v == 0, (b, bt, v, block_v)
    grid = (b // bt, v // block_v)

    out = pl.pallas_call(
        functools.partial(_gen_argmax_kernel, vt=block_v),
        grid=grid,
        in_specs=[
            pl.BlockSpec((bt, e), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((e,), lambda i, j: (0,), memory_space=pltpu.VMEM),
            pl.BlockSpec((e,), lambda i, j: (0,), memory_space=pltpu.VMEM),
            pl.BlockSpec((e, block_v), lambda i, j: (0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((block_v,), lambda i, j: (j,), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((bt, 1), lambda i, j: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, 1), jnp.int32),
        # best (running max) and yn (LayerNorm carry) are pure per-batch-tile
        # state: VMEM scratch, not HBM outputs (see fused_norm_generator_topk)
        scratch_shapes=[pltpu.VMEM((bt, 1), jnp.float32),
                        pltpu.VMEM((bt, e), jnp.float32)],
        interpret=interpret,
    )(x, norm_scale, norm_bias, wg, bg)
    return out[:, 0]


# ---------------------------------------------------------------------------
# the ENTIRE greedy generation in one launch (small-batch / latency regime)
# ---------------------------------------------------------------------------


def _sequence_decode_kernel(
    # inputs
    emb_ref,          # [V8/8, 8, E] ANY (stays in HBM; aligned 8-row-group
                      # DMA per token — see group_embed_rows)
    pe_ref,           # [L_pad, 1, E] VMEM (leading time axis)
    ck_ref, cv_ref,   # [NL, Tm_pad, Bt, E] VMEM
    membias_ref,      # [Bt, Tm_pad] VMEM
    sel_ref, selt_ref,
    wqkv_ref, bqkv_ref, wo_ref, bo_ref,
    wcq_ref, bcq_ref, wco_ref, bco_ref,
    n1s_ref, n1b_ref, n2s_ref, n2b_ref,
    w1_ref, b1_ref, w2_ref, b2_ref, n3s_ref, n3b_ref,
    ns_ref, nb_ref, wg_ref, bg_ref,
    # outputs
    tok_ref,          # [L_pad, Bt] int32
    # scratch
    kc_ref, vc_ref,   # [NL, L_pad, Bt, E] VMEM
    g_ref,            # [Bt, 8, E] VMEM (embedding group-DMA landing)
    sem,              # DMA semaphores (Bt,)
    *, heads: int, nl: int, max_len: int,
    start_id: int, end_id: int, pad_id: int,
):
    """All ``max_len - 1`` greedy steps in ONE launch: weights (decoder
    stack + generator, ~90 MB bf16 at the flagship) are fetched into VMEM
    once and reused by every token, the KV caches live in VMEM scratch for
    the whole generation, and only the token embedding row is DMA'd from
    HBM per step — the per-token launch/glue overhead of the two-kernel
    loop (measured ~1 ms/token at B=1 through the relay) disappears.

    Semantics are exactly the module-graph greedy's (decode.greedy_generate):
    once every row has emitted ``end_id``, remaining positions stay
    ``pad_id`` (the loop keeps running — Mosaic has no early exit — but
    writes pads, which is what the exited XLA loop leaves behind)."""
    e = g_ref.shape[-1]
    d = e // heads
    bt = g_ref.shape[0]
    l_pad = pe_ref.shape[0]
    sel = sel_ref[...]
    selt = selt_ref[...]
    mbias = membias_ref[...].astype(jnp.float32).T
    dt = kc_ref.dtype

    pos_l = jax.lax.broadcasted_iota(jnp.int32, (l_pad, 1), 0)
    row_iota = jax.lax.broadcasted_iota(jnp.int32, (l_pad, bt), 0)
    col_iota = jax.lax.broadcasted_iota(jnp.int32, (1, bt), 1)

    tokens0 = jnp.where(row_iota == 0, start_id, pad_id).astype(jnp.int32)
    cur0 = jnp.full((1, bt), start_id, jnp.int32)
    done0 = jnp.zeros((1, bt), jnp.bool_)

    # scratch caches are UNINITIALIZED VMEM: zero them once so future
    # (masked) rows contribute exactly-zero attention weight instead of
    # NaN-poisoning the softmax (exp(NEG_INF + NaN*0) is NaN, not 0)
    kc_ref[...] = jnp.zeros(kc_ref.shape, kc_ref.dtype)
    vc_ref[...] = jnp.zeros(vc_ref.shape, vc_ref.dtype)

    def step(i, carry):
        tokens, cur, done = carry
        # ---- token embedding: one aligned 8-row-group DMA per batch row --
        dmas = []
        for r in range(bt):
            tok_r = jnp.sum(jnp.where(col_iota == r, cur, 0))
            dma = pltpu.make_async_copy(
                emb_ref.at[pl.ds(tok_r // 8, 1)],
                g_ref.at[pl.ds(r, 1)],
                sem.at[r],
            )
            dma.start()
            dmas.append(dma)
        for dma in dmas:
            dma.wait()
        # transpose the int32 BEFORE comparing: tpu.transpose on an i1
        # vector fails Mosaic legalization
        cur_t = cur.T                                           # [Bt, 1] i32
        pick = (jax.lax.broadcasted_iota(jnp.int32, (bt, 8, 1), 1)
                == (cur_t % 8)[:, :, None])
        x = jnp.sum(
            jnp.where(pick, g_ref[...].astype(jnp.float32), 0.0), axis=1
        )
        x = jnp.where(cur_t == pad_id, 0.0, x)
        x = (x + pe_ref[i].astype(jnp.float32)).astype(dt)

        cbias = jnp.where(pos_l <= i, 0.0, NEG_INF).astype(jnp.float32)
        for li in range(nl):
            qkv = _matmul(x, wqkv_ref[li], bqkv_ref[li], jnp.float32)
            q = qkv[:, :e]
            kc_ref[li, i] = qkv[:, e:2 * e].astype(dt)
            vc_ref[li, i] = qkv[:, 2 * e:].astype(dt)
            # the fresh row is already in the VMEM cache: attend directly
            sa = _attend_single_query(q, kc_ref[li], vc_ref[li], sel, selt,
                                      d, cbias)
            sa = _matmul(sa.astype(dt), wo_ref[li], bo_ref[li], jnp.float32)
            x1 = _layernorm(x.astype(jnp.float32) + sa, n1s_ref[li], n1b_ref[li])
            x1c = x1.astype(dt)

            cq = _matmul(x1c, wcq_ref[li], bcq_ref[li], jnp.float32)
            ca = _attend_single_query(cq, ck_ref[li], cv_ref[li], sel, selt,
                                      d, mbias)
            ca = _matmul(ca.astype(dt), wco_ref[li], bco_ref[li], jnp.float32)
            x2 = _layernorm(x1 + ca, n2s_ref[li], n2b_ref[li])
            x2c = x2.astype(dt)

            h1 = _matmul(x2c, w1_ref[li], b1_ref[li], jnp.float32)
            h1 = _gelu_exact(h1).astype(dt)
            h2 = _matmul(h1, w2_ref[li], b2_ref[li], jnp.float32)
            x = _layernorm(x2 + h2, n3s_ref[li], n3b_ref[li]).astype(dt)

        yn = _layernorm(x, ns_ref[...], nb_ref[...])
        logits = jax.lax.dot_general(
            yn.astype(jnp.float32), wg_ref[...], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) + bg_ref[...].astype(jnp.float32)
        # manual argmax (max + min-index-among-ties == first-win argmax):
        # some jnp reductions (argmax, all) fail Mosaic legalization in
        # loop-ish contexts; these primitives are robust everywhere
        mx = jnp.max(logits, axis=-1, keepdims=True)
        vid = jax.lax.broadcasted_iota(jnp.int32, logits.shape, 1)
        nxt = jnp.min(
            jnp.where(logits == mx, vid, jnp.int32(2**30)), axis=-1
        ).astype(jnp.int32)[None]                              # [1, Bt]

        all_done = jnp.sum(jnp.where(done, 1, 0)) == bt
        nxt = jnp.where(all_done, pad_id, nxt)
        done = jnp.logical_or(done, nxt == end_id)
        tokens = jnp.where(row_iota == i + 1, jnp.broadcast_to(nxt, (l_pad, bt)),
                           tokens)
        return tokens, nxt, done

    # STATICALLY UNROLLED over tokens: an in-kernel scf.for fails Mosaic
    # legalization on ops the straight-line path handles fine (the
    # head-split reshape inside the attention, among others), so the token
    # loop is a Python loop — 29 repeats of the step body as straight-line
    # code, which also makes every cache-row write and pe read static
    carry = (tokens0, cur0, done0)
    for i in range(max_len - 1):
        carry = step(i, carry)
    tok_ref[...] = carry[0]


def fused_sequence_decode(
    emb: jnp.ndarray,          # [V, E] token embedding table
    pe: jnp.ndarray,           # [>= round_up(max_len, 8), E] positional table
    ck: jnp.ndarray,           # [NL, Tm_pad, B, E]
    cv: jnp.ndarray,
    mem_bias: jnp.ndarray,     # [B, Tm_pad] fp32
    weights: dict,             # stacked layers + norm_s/norm_b/wg/bg
    *,
    heads: int,
    max_len: int,
    start_id: int,
    end_id: int,
    pad_id: int = 0,
    interpret: bool = False,
) -> jnp.ndarray:
    """-> tokens [B, max_len] int32 — the WHOLE greedy generation as one
    pallas_call. B <= 32 (one batch tile; the [E, V_pad] generator + stacked
    layer weights + per-sequence KV scratch must co-reside in VMEM). This is
    the designed serving/latency lever: the per-token whole-step loop pays
    ~1 ms/token of launch+glue at B=1 (31 ms device of the 35.6 ms p50,
    BENCH_r03), which one launch amortizes away.

    STATUS: token-exact vs the module-graph greedy in interpret mode
    (tests/test_pallas_decode.py) and opt-in only
    (``greedy_generate_fused(sequence_kernel=True)``). The two Mosaic
    rejections are root-caused and fixed: (1) a 1-row slice of the 2D
    [V, E] embedding HBM memref violates the (8,128) tiling — fixed by the
    aligned 8-row-group gather (``group_embed_rows``); (2) tpu.transpose on
    an i1 vector fails legalization — fixed by transposing the int32 token
    row BEFORE comparing. The 4-token ``fused_multi_step`` sibling now
    compiles AND runs token-exact on real v5e; this 29-step body lowers but
    its one-time compile exceeds 10 min on the relay toolchain (compile
    time grows superlinearly with unroll: 55 s at u=2, 334 s at u=4), so
    auto-dispatch keeps the per-token whole-step kernel."""
    nl, tm_pad, b, e = ck.shape
    assert b <= 32, (b, "sequence-decode kernel is a single batch tile")
    assert e % heads == 0
    d = e // heads
    stacked = weights["stacked"]
    f = stacked["w1"].shape[-1]
    v_pad = weights["wg"].shape[1]
    l_pad = _round_up(max_len, 8)

    sel, selt = _head_selectors(e, heads)

    assert pe.shape[0] >= l_pad, (
        f"pe needs >= round_up(max_len, 8) = {l_pad} rows, got {pe.shape[0]}")
    pe3 = pe[:l_pad].reshape(l_pad, 1, e).astype(ck.dtype)

    def cs(shape):
        nd = len(shape)
        return pl.BlockSpec(shape, lambda *a: (0,) * nd, memory_space=pltpu.VMEM)

    w = stacked
    kernel = functools.partial(
        _sequence_decode_kernel, heads=heads, nl=nl, max_len=max_len,
        start_id=start_id, end_id=end_id, pad_id=pad_id,
    )
    out = pl.pallas_call(
        kernel,
        grid=(1,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),  # emb stays in HBM
            cs((l_pad, 1, e)),
            cs((nl, tm_pad, b, e)), cs((nl, tm_pad, b, e)),
            cs((b, tm_pad)),
            cs((e, heads)), cs((heads, e)),
            cs((nl, e, 3 * e)), cs((nl, 3 * e)),
            cs((nl, e, e)), cs((nl, e)),
            cs((nl, e, e)), cs((nl, e)),
            cs((nl, e, e)), cs((nl, e)),
            cs((nl, e)), cs((nl, e)), cs((nl, e)), cs((nl, e)),
            cs((nl, e, f)), cs((nl, f)),
            cs((nl, f, e)), cs((nl, e)),
            cs((nl, e)), cs((nl, e)),
            cs((e,)), cs((e,)), cs((e, v_pad)), cs((v_pad,)),
        ],
        out_specs=pl.BlockSpec((l_pad, b), lambda *a: (0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((l_pad, b), jnp.int32),
        scratch_shapes=[
            pltpu.VMEM((nl, l_pad, b, e), ck.dtype),
            pltpu.VMEM((nl, l_pad, b, e), ck.dtype),
            pltpu.VMEM((b, 8, e), ck.dtype),
            pltpu.SemaphoreType.DMA((b,)),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=120 * 1024 * 1024
        ),
        interpret=interpret,
    )(
        group_embed_rows(emb.astype(ck.dtype)), pe3, ck, cv, mem_bias, sel, selt,
        w["wqkv"], w["bqkv"], w["wo"], w["bo"],
        w["wcq"], w["bcq"], w["wco"], w["bco"],
        w["n1s"], w["n1b"], w["n2s"], w["n2b"],
        w["w1"], w["b1"], w["w2"], w["b2"], w["n3s"], w["n3b"],
        weights["norm_s"], weights["norm_b"], weights["wg"], weights["bg"],
    )
    return out.T[:, :max_len]


# ---------------------------------------------------------------------------
# u tokens per launch (straight-line unroll; launch-overhead amortization)
# ---------------------------------------------------------------------------


def group_embed_rows(emb: jnp.ndarray) -> jnp.ndarray:
    """[V, E] -> [ceil(V/8)*8/8, 8, E]: the aligned-group layout the decode
    kernels' per-token embedding DMA requires. A 1-row slice of a 2D [V, E]
    HBM memref trips Mosaic ("slice along dimension 0 must be aligned to
    tiling (8)"); grouping rows by 8 makes the gathered axis a leading
    UNTILED dim, so a 1-group slice is legal, and the kernel selects the
    row inside the group in-register."""
    v, e = emb.shape
    v8 = -(-v // 8) * 8
    if v8 != v:
        emb = jnp.pad(emb, ((0, v8 - v), (0, 0)))
    return emb.reshape(v8 // 8, 8, e)


def _attend_multi_patch(q, kc, vc, sel, selt, d, kbias, patches):
    """One-query attention over an [L, Bt, E] cache tile where rows at
    ``patches = [(pos, k1, v1), ...]`` are stale zeros in the tile and are
    patched in from registers (generalizes ``_attend_single_query``'s single
    fresh row to this window's rows). -> [Bt, E] fp32."""
    l, bt, e = kc.shape
    qf = q.astype(jnp.float32)
    scale = jax.lax.rsqrt(jnp.asarray(d, jnp.float32))
    prod = qf[None] * kc.astype(jnp.float32)
    logits = _heads_dot(prod.reshape(l * bt, e), sel).reshape(l, bt, sel.shape[1])
    logits = logits * scale
    pos = jax.lax.broadcasted_iota(jnp.int32, (l, 1, 1), 0)
    for p, k1, _v1 in patches:
        lf = _heads_dot(qf * k1.astype(jnp.float32), sel) * scale
        logits = jnp.where(pos == p, lf[None], logits)
    logits = logits + kbias[:, :, None]
    m = jnp.max(logits, axis=0, keepdims=True)
    ex = jnp.exp(logits - m)
    w = ex / jnp.sum(ex, axis=0, keepdims=True)
    w_e = _heads_dot(w.reshape(l * bt, sel.shape[1]), selt).reshape(l, bt, e)
    out = jnp.sum(w_e * vc.astype(jnp.float32), axis=0)
    for p, _k1, v1 in patches:
        wf = jnp.sum(jnp.where(pos == p, w_e, 0.0), axis=0)
        out = out + wf * v1.astype(jnp.float32)
    return out


def _multi_step_kernel(
    # scalar prefetch: window index w (token position i0 = w * u)
    w_ref,
    # inputs
    emb_ref,          # [V8/8, 8, E] ANY (HBM; aligned 8-row-group DMA per
                      # token — a 1-row slice of a 2D [V, E] memref trips
                      # Mosaic's "slice must be aligned to tiling (8)"; the
                      # leading group axis is untiled, so slicing it is free)
    pe_ref,           # [L_pad, 1, E] VMEM
    cur_ref,          # [Bt, 1] int32 — the window's first input token
                      # (column layout: the lane dim is 1 == the full array
                      # dim, so the (bt, 1) block stays Mosaic-legal when
                      # the batch grid has more than one program)
    k_ref, v_ref,     # [NL, l_view, Bt, E] VMEM (rows >= i0 are zeros)
    ck_ref, cv_ref,   # [NL, Tm_pad, Bt, E]
    membias_ref, sel_ref, selt_ref,
    wqkv_ref, bqkv_ref, wo_ref, bo_ref,
    wcq_ref, bcq_ref, wco_ref, bco_ref,
    n1s_ref, n1b_ref, n2s_ref, n2b_ref,
    w1_ref, b1_ref, w2_ref, b2_ref, n3s_ref, n3b_ref,
    ns_ref, nb_ref, wg_ref, bg_ref,
    # outputs
    tok_ref,          # [Bt, U] int32 (this window's raw argmax chain)
    krow_ref, vrow_ref,  # [NL, U, Bt, E] aliased window blocks
    # scratch
    g_ref,            # [Bt, 8, E] — the gathered embedding row groups
    sem,              # DMA semaphores (Bt,)
    *, heads: int, nl: int, u: int, pad_id: int = 0,
    ablate: frozenset = frozenset(),
):
    """``u`` consecutive greedy steps in ONE launch, statically unrolled
    (no in-kernel scf.for — see fused_sequence_decode's STATUS note). The
    kernel emits the raw argmax chain; the caller applies the
    all-rows-finished -> PAD semantics in XLA between windows, which is
    exact because every in-window step after a global finish gets
    overwritten to PAD there anyway."""
    e = g_ref.shape[-1]
    d = e // heads
    bt = g_ref.shape[0]
    dt = k_ref.dtype
    i0 = w_ref[0] * u
    sel = sel_ref[...]
    selt = selt_ref[...]
    mbias = membias_ref[...].astype(jnp.float32).T
    l = k_ref.shape[1]
    pos_l = jax.lax.broadcasted_iota(jnp.int32, (l, 1), 0)
    row_iota = jax.lax.broadcasted_iota(jnp.int32, (bt, 1), 0)

    cur = cur_ref[...]                                         # [Bt, 1]
    fresh = [[] for _ in range(nl)]  # per layer: [(pos, k1, v1), ...]
    outs = []
    for j in range(u):
        if "dma" in ablate:  # toolchain bisect: skip the embedding gather
            x = cur.astype(jnp.float32) * jnp.float32(1e-4)
        else:
            dmas = []
            for r in range(bt):
                tok_r = jnp.sum(jnp.where(row_iota == r, cur, 0))
                dma = pltpu.make_async_copy(
                    emb_ref.at[pl.ds(tok_r // 8, 1)],
                    g_ref.at[pl.ds(r, 1)],
                    sem.at[r],
                )
                dma.start()
                dmas.append(dma)
            for dma in dmas:
                dma.wait()
            # each row's group holds its token at position cur % 8
            pick = (jax.lax.broadcasted_iota(jnp.int32, (bt, 8, 1), 1)
                    == (cur % 8)[:, :, None])
            x = jnp.sum(
                jnp.where(pick, g_ref[...].astype(jnp.float32), 0.0), axis=1
            )
            x = jnp.where(cur == pad_id, 0.0, x)
        x = (x + pe_ref[i0 + j].astype(jnp.float32)).astype(dt)

        cbias = jnp.where(pos_l <= i0 + j, 0.0, NEG_INF).astype(jnp.float32)
        if "layers" in ablate:
            # latency bisect: skip the whole decoder stack's COMPUTE while
            # keeping every weight/cache block's DMA alive with an 8x128
            # corner read per tensor (const blocks are fetched by the
            # pipeline either way; the touch guards against any future
            # unused-ref pruning). Combined with {"gen","dma"} this leaves
            # launch + operand DMA + trivial VPU as the measured floor.
            acc = jnp.float32(0.0)
            for li in range(nl):
                for wref in (wqkv_ref, wo_ref, wcq_ref, wco_ref,
                             w1_ref, w2_ref):
                    acc = acc + jnp.sum(wref[li, :8, :128].astype(jnp.float32))
                acc = acc + jnp.sum(k_ref[li, 0, :, :128].astype(jnp.float32))
                acc = acc + jnp.sum(v_ref[li, 0, :, :128].astype(jnp.float32))
                acc = acc + jnp.sum(ck_ref[li, 0, :, :128].astype(jnp.float32))
                acc = acc + jnp.sum(cv_ref[li, 0, :, :128].astype(jnp.float32))
                krow_ref[li, j] = x
                vrow_ref[li, j] = x
            x = (x + acc * jnp.float32(1e-30)).astype(dt)
        layer_range = range(0 if "layers" in ablate else nl)
        for li in layer_range:
            qkv = _matmul(x, wqkv_ref[li], bqkv_ref[li], jnp.float32)
            q = qkv[:, :e]
            k1 = qkv[:, e:2 * e].astype(dt)
            v1 = qkv[:, 2 * e:].astype(dt)
            krow_ref[li, j] = k1
            vrow_ref[li, j] = v1
            fresh[li].append((i0 + j, k1, v1))
            if "patch" in ablate:  # toolchain bisect: no register patching
                sa = _attend_single_query(q, k_ref[li], v_ref[li], sel, selt,
                                          d, cbias)
            else:
                sa = _attend_multi_patch(q, k_ref[li], v_ref[li], sel, selt,
                                         d, cbias, fresh[li])
            sa = _matmul(sa.astype(dt), wo_ref[li], bo_ref[li], jnp.float32)
            x1 = _layernorm(x.astype(jnp.float32) + sa, n1s_ref[li], n1b_ref[li])
            x1c = x1.astype(dt)

            cq = _matmul(x1c, wcq_ref[li], bcq_ref[li], jnp.float32)
            ca = _attend_single_query(cq, ck_ref[li], cv_ref[li], sel, selt,
                                      d, mbias)
            ca = _matmul(ca.astype(dt), wco_ref[li], bco_ref[li], jnp.float32)
            x2 = _layernorm(x1 + ca, n2s_ref[li], n2b_ref[li])
            x2c = x2.astype(dt)

            h1 = _matmul(x2c, w1_ref[li], b1_ref[li], jnp.float32)
            h1 = _gelu_exact(h1).astype(dt)
            h2 = _matmul(h1, w2_ref[li], b2_ref[li], jnp.float32)
            x = _layernorm(x2 + h2, n3s_ref[li], n3b_ref[li]).astype(dt)

        yn = _layernorm(x, ns_ref[...], nb_ref[...])
        if "gen" in ablate:  # toolchain bisect: no generator/argmax
            nxt = jnp.sum(yn, axis=-1).astype(jnp.int32).reshape(bt, 1) % 97
        else:
            logits = jax.lax.dot_general(
                yn.astype(jnp.float32), wg_ref[...], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            ) + bg_ref[...].astype(jnp.float32)
            mx = jnp.max(logits, axis=-1, keepdims=True)
            vid = jax.lax.broadcasted_iota(jnp.int32, logits.shape, 1)
            nxt = jnp.min(
                jnp.where(logits == mx, vid, jnp.int32(2**30)), axis=-1
            ).astype(jnp.int32)[:, None]                       # [Bt, 1]
        outs.append(nxt)                                       # [Bt, 1]
        cur = nxt
    tok_ref[...] = jnp.concatenate(outs, axis=1)               # [Bt, U]


def fused_multi_step(
    cur: jnp.ndarray,          # [B] int32 — the window's first input token
    k_cache: jnp.ndarray,      # [NL, L_pad, B, E]
    v_cache: jnp.ndarray,
    ck: jnp.ndarray,           # [NL, Tm_pad, B, E]
    cv: jnp.ndarray,
    mem_bias: jnp.ndarray,     # [B, Tm_pad] fp32
    emb: jnp.ndarray,          # [V, E] or pre-grouped [V8/8, 8, E]
    pe: jnp.ndarray,           # [L_pad, 1, E] (kernel layout)
    weights: dict,             # stacked layers + norm_s/norm_b/wg/bg
    w_idx: jnp.ndarray,        # scalar int32 window index (i0 = w*u)
    *,
    heads: int,
    unroll: int = 4,
    block_b: int = 32,
    pad_id: int = 0,
    l_view: Optional[int] = None,
    interpret: bool = False,
    ablate: frozenset = frozenset(),
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """``unroll`` greedy steps in one launch -> (tokens [B, unroll] raw
    argmax chain, k_cache, v_cache with rows [w*u, w*u+u) written).
    ``pad_id`` is the embedding row forced to zero (torch padding_idx
    semantics — must match the caller's pad token, not assume 0).

    Caller contract on ``l_view``: it must cover every row this window's
    steps touch, i.e. l_view >= (w_idx + 1) * unroll. ``w_idx`` is traced,
    so this cannot be a Python assert; greedy_generate_multi guarantees it
    by staging windows with l_view = round_up(hi_w * u, 8). A violating
    window would drop the in-window fresh-key attention patches, so the
    returned tokens are POISONED to -1 whenever (w_idx + 1) * u > l_view
    (cheap traced guard after the kernel) — wrong becomes unmissable.

    Designed latency lever: divides the per-token launch+glue overhead by
    ``unroll``. bt <= 32 (the [E, V_pad] generator rides in VMEM like
    fused_whole_step); b > bt tiles the batch over the grid (the ``cur``
    token column is [B, 1] so its block stays Mosaic-legal on multi-program
    grids). ``ablate`` ({"dma","patch","gen","layers"}) disables kernel sections for
    toolchain bisects. unroll=8 overflows the relay-side compiler; measured
    win/loss numbers live in greedy_generate_multi's docstring."""
    nl, l_pad, b, e = k_cache.shape
    u = unroll
    assert l_pad % u == 0 and u >= 1
    stacked = weights["stacked"]
    f = stacked["w1"].shape[-1]
    v_pad = weights["wg"].shape[1]
    tm = ck.shape[1]
    bt = min(block_b, b)
    assert b % bt == 0 and bt <= 32, (b, bt)
    assert e % heads == 0
    d = e // heads
    l = l_pad if l_view is None else l_view
    assert l % u == 0 and 0 < l <= l_pad

    emb3 = emb if emb.ndim == 3 else group_embed_rows(emb)

    sel, selt = _head_selectors(e, heads)

    def row_spec(cols):
        return pl.BlockSpec((bt, cols), lambda i, _s: (i, 0),
                            memory_space=pltpu.VMEM)

    def cache_spec(rows):
        return pl.BlockSpec((nl, rows, bt, e), lambda i, _s: (0, 0, i, 0),
                            memory_space=pltpu.VMEM)

    def cs(shape):
        nd = len(shape)
        return pl.BlockSpec(shape, lambda i, _s: (0,) * nd,
                            memory_space=pltpu.VMEM)

    # this window's u fresh rows leave through an aliased u-row block whose
    # leading position is the scalar-prefetched WINDOW index (block units)
    row_out_spec = pl.BlockSpec(
        (nl, u, bt, e), lambda i, s: (0, s[0], i, 0), memory_space=pltpu.VMEM
    )
    w = stacked
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(b // bt,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),  # emb stays in HBM
            cs((l_pad, 1, e)),
            pl.BlockSpec((bt, 1), lambda i, _s: (i, 0),
                         memory_space=pltpu.VMEM),
            cache_spec(l), cache_spec(l), cache_spec(tm), cache_spec(tm),
            row_spec(tm),
            cs((e, heads)), cs((heads, e)),
            cs((nl, e, 3 * e)), cs((nl, 3 * e)),
            cs((nl, e, e)), cs((nl, e)),
            cs((nl, e, e)), cs((nl, e)),
            cs((nl, e, e)), cs((nl, e)),
            cs((nl, e)), cs((nl, e)), cs((nl, e)), cs((nl, e)),
            cs((nl, e, f)), cs((nl, f)),
            cs((nl, f, e)), cs((nl, e)),
            cs((nl, e)), cs((nl, e)),
            cs((e,)), cs((e,)), cs((e, v_pad)), cs((v_pad,)),
        ],
        out_specs=(
            pl.BlockSpec((bt, u), lambda i, _s: (i, 0),
                         memory_space=pltpu.VMEM),
            row_out_spec, row_out_spec,
        ),
        scratch_shapes=[
            pltpu.VMEM((bt, 8, e), k_cache.dtype),
            pltpu.SemaphoreType.DMA((bt,)),
        ],
    )
    out_shapes = (
        jax.ShapeDtypeStruct((b, u), jnp.int32),
        jax.ShapeDtypeStruct(k_cache.shape, k_cache.dtype),
        jax.ShapeDtypeStruct(v_cache.shape, v_cache.dtype),
    )
    kernel = functools.partial(_multi_step_kernel, heads=heads, nl=nl, u=u,
                               pad_id=pad_id, ablate=frozenset(ablate))
    toks, ks, vs = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=out_shapes,
        # inputs (incl. scalar 0): [4]=k_cache, [5]=v_cache -> outputs 1/2
        input_output_aliases={4: 1, 5: 2},
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=120 * 1024 * 1024
        ),
        interpret=interpret,
    )(
        jnp.asarray(w_idx, jnp.int32).reshape(1),
        emb3.astype(k_cache.dtype), pe, cur.reshape(b, 1).astype(jnp.int32),
        k_cache, v_cache, ck, cv, mem_bias, sel, selt,
        w["wqkv"], w["bqkv"], w["wo"], w["bo"],
        w["wcq"], w["bcq"], w["wco"], w["bco"],
        w["n1s"], w["n1b"], w["n2s"], w["n2b"],
        w["w1"], w["b1"], w["w2"], w["b2"], w["n3s"], w["n3b"],
        weights["norm_s"], weights["norm_b"], weights["wg"], weights["bg"],
    )
    # Contract guard: l_view >= (w_idx + 1) * u can't be a Python assert
    # (w_idx is traced), and a violating window computes silently-wrong
    # tokens (the fresh-key attention patches past l_view are dropped).
    # Poison the whole window with -1 instead — a scalar select, free next
    # to the kernel — so any violation is unmissable downstream (no real
    # token id is negative; tests/test_pallas_decode.py pins this).
    in_view = (jnp.asarray(w_idx, jnp.int32) + 1) * u <= l
    toks = jnp.where(in_view, toks, jnp.full_like(toks, -1))
    return toks, ks, vs
