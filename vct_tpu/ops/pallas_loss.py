"""Pallas kernels for the fused LM-head + SCE loss (``ops.fused_loss``).

Same math as the XLA vocab-chunk scans in ``fused_loss._fwd_impl``/``_bwd``
(reference semantics: ``/root/reference/model/loss.py:69-92`` SCE =
``alpha*CE + beta*reverse-CE`` over a vocab-30522 projection,
``CapDecoder.py:55-59``), rebuilt as software-pipelined Mosaic kernels.

Why a kernel at all: the round-3 trace (docs/PERF.md) pinned the scans at
~12.6 ms of a B=256 train step and showed them VPU-bound — each chunk's
generator GEMM (MXU) runs *serialized* with the exp/compare sweep over the
chunk (VPU), because within one fused XLA loop body the sweep consumes the
GEMM's output. These kernels break that serialization with a two-slab
software pipeline: grid step ``c`` issues chunk ``c``'s GEMM into slab
``c % 2`` while the VPU reduces chunk ``c-1`` from the other slab — MXU and
VPU run concurrently, so the wall time per sweep drops from
(GEMM + exp) to max(GEMM, exp).

Algorithm shape (identical to the scans, see ``fused_loss`` module
docstring for the derivation):

* pass 1 — online softmax stats: running max ``m``, rescaled sum ``s``,
  label logit ``zt`` (one read of each logits tile),
* pass 2 — clipped-prob sum given ``lse``: ``sa`` (sum of p > eps) and
  ``cnt`` (how many), one more read,
* backward — ``dz = p*(u + c*a) - onehot(label)*lab_term`` with all
  per-row coefficients precomputed outside; emits ``dx`` (accumulated
  in VMEM across chunks), the ``dtype``-rounded ``dz`` tiles (consumed by
  one big XLA GEMM for ``dwg`` — exactly the rounding the scan path applies
  before its per-chunk GEMMs), and per-row-tile ``dbg`` partials in fp32.

A single-sweep forward (fold pass 2 into pass 1) is mathematically
impossible for the *exact* clipped sum: the clip threshold is
``lse + log(eps)`` and the running ``lse`` only grows, so elements counted
"above" early can fall below later and their individual probabilities are
gone. Two reads of the logits is the floor for exact RCE.

Numerics: each chunk's logits are ``dtype``-rounded exactly like
``nn.Dense(dtype)`` (fp32-accumulated MXU GEMM -> dtype, bias added in
dtype), and every reduction runs in fp32 in the same chunk order as the
scans — values match to float-summation order (``tests/test_pallas_loss.py``
pins kernel-vs-scan in interpret mode).

Layout: rows are tiled by ``block_n`` (callers pad N with zero rows — zero
``x`` and zero per-row weights make a padded row contribute exactly nothing),
vocab by ``block_v`` (callers pad V with ``-1e30``-bias columns so
``exp`` underflows to exactly 0). ``w``/``b`` arrive pre-cast to the compute
dtype. All per-row vectors ride as [N, 1] fp32/int32 blocks.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_EPS = 1e-7  # must match fused_loss._EPS

# Scoped-VMEM ceiling for these kernels. The compiler's default stack limit
# is 16 MiB, which the production tile geometry exceeds (first real-TPU
# compile OOMed at 17.5 MiB); v5e has 128 MiB physical VMEM and the fused
# decode kernels already run with 110-120 MiB limits. 64 MiB leaves room
# for big row tiles while keeping half the chip for XLA's own buffers.
_VMEM_LIMIT = 64 * 1024 * 1024


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


# ---------------------------------------------------------------------------
# pass 1: online max / sum / label-logit
# ---------------------------------------------------------------------------


def _pass1_kernel(dtype, block_v, x_ref, w_ref, b_ref, lab_ref,
                  m_out, s_out, zt_out, zbuf, macc, sacc, ztacc):
    c = pl.program_id(1)
    nc = pl.num_programs(1) - 1

    @pl.when(c < nc)
    def _mxu():
        z32 = jax.lax.dot_general(
            x_ref[...], w_ref[...], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        # nn.Dense(dtype) rounding: fp32 accum -> dtype, bias added in dtype
        zbuf[c % 2] = z32.astype(dtype) + b_ref[...]

    @pl.when(c > 0)
    def _vpu():
        z = zbuf[(c - 1) % 2].astype(jnp.float32)
        cmax = jnp.max(z, axis=-1, keepdims=True)
        loc = lab_ref[...] - (c - 1) * block_v
        cols = jax.lax.broadcasted_iota(jnp.int32, z.shape, 1)
        cand = jnp.sum(jnp.where(cols == loc, z, 0.0), axis=-1, keepdims=True)

        @pl.when(c == 1)
        def _init():
            macc[...] = cmax
            sacc[...] = jnp.sum(jnp.exp(z - cmax), axis=-1, keepdims=True)
            ztacc[...] = cand

        @pl.when(c > 1)
        def _acc():
            m_old = macc[...]
            m_new = jnp.maximum(m_old, cmax)
            sacc[...] = sacc[...] * jnp.exp(m_old - m_new) + jnp.sum(
                jnp.exp(z - m_new), axis=-1, keepdims=True
            )
            macc[...] = m_new
            ztacc[...] = ztacc[...] + cand

    @pl.when(c == nc)
    def _write():
        m_out[...] = macc[...]
        s_out[...] = sacc[...]
        zt_out[...] = ztacc[...]


def softmax_stats(
    x: jnp.ndarray,        # [N_pad, E] compute dtype, rows padded with zeros
    w: jnp.ndarray,        # [E, V_pad] compute dtype
    b: jnp.ndarray,        # [1, V_pad] compute dtype (pad cols -1e30)
    labels: jnp.ndarray,   # [N_pad, 1] int32
    *,
    block_n: int,
    block_v: int,
    interpret: bool = False,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """-> (m, s, zt), each [N_pad, 1] fp32 (lse = m + log s)."""
    n, e = x.shape
    v = w.shape[1]
    nc = v // block_v
    grid = (n // block_n, nc + 1)
    row = jax.ShapeDtypeStruct((n, 1), jnp.float32)
    return pl.pallas_call(
        functools.partial(_pass1_kernel, x.dtype, block_v),
        grid=grid,
        in_specs=[
            pl.BlockSpec((block_n, e), lambda r, c: (r, 0)),
            pl.BlockSpec((e, block_v),
                         lambda r, c: (0, jnp.minimum(c, nc - 1))),
            pl.BlockSpec((1, block_v),
                         lambda r, c: (0, jnp.minimum(c, nc - 1))),
            pl.BlockSpec((block_n, 1), lambda r, c: (r, 0)),
        ],
        out_specs=[pl.BlockSpec((block_n, 1), lambda r, c: (r, 0))] * 3,
        out_shape=[row, row, row],
        scratch_shapes=[
            pltpu.VMEM((2, block_n, block_v), x.dtype),
            pltpu.VMEM((block_n, 1), jnp.float32),
            pltpu.VMEM((block_n, 1), jnp.float32),
            pltpu.VMEM((block_n, 1), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=_VMEM_LIMIT),
        interpret=interpret,
    )(x, w, b, labels)


# ---------------------------------------------------------------------------
# pass 2: clipped-prob sum given lse
# ---------------------------------------------------------------------------


def _pass2_kernel(dtype, x_ref, w_ref, b_ref, lse_ref,
                  sa_out, cnt_out, zbuf, saacc, cntacc):
    c = pl.program_id(1)
    nc = pl.num_programs(1) - 1

    @pl.when(c < nc)
    def _mxu():
        z32 = jax.lax.dot_general(
            x_ref[...], w_ref[...], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        zbuf[c % 2] = z32.astype(dtype) + b_ref[...]

    @pl.when(c > 0)
    def _vpu():
        z = zbuf[(c - 1) % 2].astype(jnp.float32)
        p = jnp.exp(z - lse_ref[...])
        above = p > _EPS
        sa_c = jnp.sum(jnp.where(above, p, 0.0), axis=-1, keepdims=True)
        cnt_c = jnp.sum(above.astype(jnp.float32), axis=-1, keepdims=True)

        @pl.when(c == 1)
        def _init():
            saacc[...] = sa_c
            cntacc[...] = cnt_c

        @pl.when(c > 1)
        def _acc():
            saacc[...] = saacc[...] + sa_c
            cntacc[...] = cntacc[...] + cnt_c

    @pl.when(c == nc)
    def _write():
        sa_out[...] = saacc[...]
        cnt_out[...] = cntacc[...]


def clipped_prob_stats(
    x: jnp.ndarray,
    w: jnp.ndarray,
    b: jnp.ndarray,
    lse: jnp.ndarray,      # [N_pad, 1] fp32
    *,
    block_n: int,
    block_v: int,
    interpret: bool = False,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """-> (sa, cnt), each [N_pad, 1] fp32. Pad vocab columns (bias -1e30)
    give p == 0 and never count as above; callers add the eps floor for the
    below-set using the TRUE vocab size."""
    n, e = x.shape
    v = w.shape[1]
    nc = v // block_v
    grid = (n // block_n, nc + 1)
    row = jax.ShapeDtypeStruct((n, 1), jnp.float32)
    return pl.pallas_call(
        functools.partial(_pass2_kernel, x.dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec((block_n, e), lambda r, c: (r, 0)),
            pl.BlockSpec((e, block_v),
                         lambda r, c: (0, jnp.minimum(c, nc - 1))),
            pl.BlockSpec((1, block_v),
                         lambda r, c: (0, jnp.minimum(c, nc - 1))),
            pl.BlockSpec((block_n, 1), lambda r, c: (r, 0)),
        ],
        out_specs=[pl.BlockSpec((block_n, 1), lambda r, c: (r, 0))] * 2,
        out_shape=[row, row],
        scratch_shapes=[
            pltpu.VMEM((2, block_n, block_v), x.dtype),
            pltpu.VMEM((block_n, 1), jnp.float32),
            pltpu.VMEM((block_n, 1), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=_VMEM_LIMIT),
        interpret=interpret,
    )(x, w, b, lse)


# ---------------------------------------------------------------------------
# backward: dz tiles (dtype), dx, dbg partials
# ---------------------------------------------------------------------------


def _bwd_kernel(dtype, block_v, x_ref, wc_ref, wp_ref, b_ref, lse_ref,
                u_ref, cc_ref, lt_ref, lab_ref,
                dx_out, dz_out, dbg_out, zbuf, dxacc):
    c = pl.program_id(1)
    nc = pl.num_programs(1) - 1

    @pl.when(c < nc)
    def _mxu():
        z32 = jax.lax.dot_general(
            x_ref[...], wc_ref[...], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        zbuf[c % 2] = z32.astype(dtype) + b_ref[...]

    @pl.when(c > 0)
    def _vpu():
        z = zbuf[(c - 1) % 2].astype(jnp.float32)
        p = jnp.exp(z - lse_ref[...])
        a = (p > _EPS).astype(jnp.float32)
        dz = p * (u_ref[...] + cc_ref[...] * a)
        loc = lab_ref[...] - (c - 1) * block_v
        cols = jax.lax.broadcasted_iota(jnp.int32, z.shape, 1)
        # label one-hot subtracted BEFORE the dtype rounding, exactly like
        # the scan path's _scatter_sub -> astype(dtype)
        dz = dz - jnp.where(cols == loc, lt_ref[...], 0.0)
        dz_dt = dz.astype(dtype)
        dz_out[...] = dz_dt
        # fp32, pre-round; duplicated across 8 sublanes — a (1, block_v)
        # output block is Mosaic-illegal (sublane dim must be 8-divisible
        # or span the array), so each row tile owns an 8-row group and the
        # caller reads one row per group
        dbg_out[...] = jnp.broadcast_to(
            jnp.sum(dz, axis=0, keepdims=True), (8, dz.shape[1]))
        dxc = jax.lax.dot_general(
            dz_dt, wp_ref[...], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

        @pl.when(c == 1)
        def _init():
            dxacc[...] = dxc

        @pl.when(c > 1)
        def _acc():
            dxacc[...] = dxacc[...] + dxc

    @pl.when(c == nc)
    def _write():
        dx_out[...] = dxacc[...]


def sce_backward_tiles(
    x: jnp.ndarray,        # [N_pad, E] compute dtype
    w: jnp.ndarray,        # [E, V_pad] compute dtype
    b: jnp.ndarray,        # [1, V_pad] compute dtype
    lse: jnp.ndarray,      # [N_pad, 1] fp32
    u: jnp.ndarray,        # [N_pad, 1] fp32: w_ce + base  (see fused_loss._bwd)
    cc: jnp.ndarray,       # [N_pad, 1] fp32: the RCE coefficient c
    lab_term: jnp.ndarray,  # [N_pad, 1] fp32
    labels: jnp.ndarray,   # [N_pad, 1] int32
    *,
    block_n: int,
    block_v: int,
    interpret: bool = False,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """-> (dx [N_pad, E] fp32, dz [N_pad, V_pad] dtype, dbg_parts
    [8 * N_pad/block_n, V_pad] fp32 — each row tile's partial duplicated
    over an 8-sublane group, Mosaic-legal block shape). ``dwg = x^T @ dz``
    is left to one XLA GEMM (tile-local accumulation of a [E, V] buffer
    across row tiles would need non-consecutive output revisits, which the
    Mosaic pipeline forbids); ``dbg = dbg_parts[::8].sum(0)``."""
    n, e = x.shape
    v = w.shape[1]
    nc = v // block_v
    n_rows = n // block_n
    grid = (n_rows, nc + 1)
    row_spec = pl.BlockSpec((block_n, 1), lambda r, c: (r, 0))
    return pl.pallas_call(
        functools.partial(_bwd_kernel, x.dtype, block_v),
        grid=grid,
        in_specs=[
            pl.BlockSpec((block_n, e), lambda r, c: (r, 0)),
            pl.BlockSpec((e, block_v),
                         lambda r, c: (0, jnp.minimum(c, nc - 1))),
            pl.BlockSpec((e, block_v),
                         lambda r, c: (0, jnp.maximum(c - 1, 0))),
            pl.BlockSpec((1, block_v),
                         lambda r, c: (0, jnp.minimum(c, nc - 1))),
            row_spec, row_spec, row_spec, row_spec, row_spec,
        ],
        out_specs=[
            pl.BlockSpec((block_n, e), lambda r, c: (r, 0)),
            pl.BlockSpec((block_n, block_v),
                         lambda r, c: (r, jnp.maximum(c - 1, 0))),
            pl.BlockSpec((8, block_v),
                         lambda r, c: (r, jnp.maximum(c - 1, 0))),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((n, e), jnp.float32),
            jax.ShapeDtypeStruct((n, v), x.dtype),
            jax.ShapeDtypeStruct((8 * n_rows, v), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((2, block_n, block_v), x.dtype),
            pltpu.VMEM((block_n, e), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=_VMEM_LIMIT),
        interpret=interpret,
        # w rides in twice: the MXU phase consumes chunk c while the dx GEMM
        # consumes chunk c-1, and each view needs its own pipeline slot
    )(x, w, w, b, lse, u, cc, lab_term, labels)
