"""Fused LM-head + SCE loss: the [N, V] logits never exist in HBM.

The caption loss is ``alpha * CE + (1-alpha) * RCE`` over a vocab-30522
projection (reference ``CapDecoder.py:55-59`` + ``loss.py:69-92``). Both
terms are functions of only THREE per-position scalars:

* ``lse_i  = logsumexp_j(z_ij)``
* ``zt_i   = z_i[label_i]``                      (CE_i = lse_i - zt_i)
* ``S_i    = sum_j clip(softmax(z)_ij, 1e-7, 1)``  (RCE_i = -log(1e-4) * (S_i
  - clip(p_it, 1e-7, 1)); the clamped one-hot's log is 0 at the label and
  log(1e-4) elsewhere, see ``losses.sce_loss_parts``)

so the whole loss reduces over the vocab axis and the logits tensor is pure
intermediate state. The unfused path materializes it several times per step
(forward value, saved softmax residuals, backward gradient — ~0.7 GB of HBM
round-trips at B=64/S=32/V=30522 in fp32); this module computes the loss in
vocab chunks with a ``custom_vjp`` that recomputes each chunk's logits in the
backward pass — extra MXU work (the generator GEMM runs 3x forward+backward
instead of 1x+2x) traded for never touching HBM with anything wider than
``block_v``.

``stash=True`` (opt-in, mirroring ``TPUConfig.fused_loss_stash``; only
honored under differentiation and for 16-bit compute dtypes) replaces two
of those recompute GEMMs with one [N, V]
half-precision round trip: the vjp forward's pass 1 also emits each chunk's
``dtype`` logits (the exact values the recompute would produce — chunk
logits are rounded to ``dtype`` before the loss math either way), and
pass 2 plus the backward read them back instead of re-running the
generator GEMM. XLA may still reassociate the downstream reductions
between the two program shapes, so stash on/off agree to float-summation
order — the same tolerance as fused-vs-unfused. At B=256/S=31 the stash is
469 MB of bf16 (~1.2 ms of HBM traffic) replacing ~5 ms of MXU time. The
primal-only call (validation loss) never stashes — the stash lives in the
``custom_vjp`` forward rule, which only runs when gradients are requested.

Numerics: each chunk's logits are computed exactly like ``nn.Dense(dtype)``
(fp32-accumulated matmul rounded to ``dtype``, bias added in ``dtype``) and
the softmax statistics use the standard online rescaling — values match
``losses.sce_loss_parts`` on the materialized logits to float-summation
order (~1e-6 rel; exact when one chunk covers the vocab). Gradients match
the autodiff of the unfused path the same way (``tests/test_fused_loss.py``).

Replaces (performance-wise): the reference's ``nn.CrossEntropyLoss``/
``SCELoss`` over materialized logits (``/root/reference/model/loss.py:78-92``).
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

_LOG_OFF = -9.210340371976182  # log(1e-4)
_EPS = 1e-7  # softmax clip floor (reference loss.py:83 clamps the one-hot;
# losses.sce_loss_parts clips p to [1e-7, 1] — p <= 1 always holds, so only
# the floor is active)


def _chunk_logits_dt(x, wg, bg, start, block_v, dtype):
    """One vocab chunk's logits in ``dtype``, bit-matching nn.Dense(dtype):
    fp32-accumulated GEMM rounded to ``dtype``, bias added in ``dtype``.
    -> [N, block_v] dtype (widen to fp32 at the use site; the rounding to
    ``dtype`` here is what makes stashing this tensor lossless)."""
    w = jax.lax.dynamic_slice_in_dim(wg, start, block_v, axis=1)
    b = jax.lax.dynamic_slice_in_dim(bg, start, block_v, axis=0)
    z32 = jax.lax.dot_general(
        x.astype(dtype), w.astype(dtype), (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    return z32.astype(dtype) + b.astype(dtype)


def _chunk_logits(x, wg, bg, start, block_v, dtype):
    """-> [N, block_v] fp32 (see _chunk_logits_dt)."""
    return _chunk_logits_dt(x, wg, bg, start, block_v, dtype).astype(jnp.float32)


def _pad_vocab(wg, bg, block_v):
    """Pad V up to a multiple of block_v; pad columns get a -1e30 bias so
    exp(z - m) underflows to exactly 0 and they never matter."""
    v = wg.shape[1]
    v_pad = (v + block_v - 1) // block_v * block_v
    if v_pad != v:
        wg = jnp.pad(wg, ((0, 0), (0, v_pad - v)))
        bg = jnp.pad(bg, (0, v_pad - v), constant_values=-1e30)
    return wg, bg, v_pad


@functools.partial(jax.custom_vjp, nondiff_argnums=(6, 7, 8, 9, 10))
def linear_sce_parts(
    x: jnp.ndarray,        # [N, E] decoder outputs (generator input)
    wg: jnp.ndarray,       # [E, V] generator kernel (fp32 param)
    bg: jnp.ndarray,       # [V] generator bias (fp32 param)
    labels: jnp.ndarray,   # [N] int32 target ids
    keep_ce: jnp.ndarray,  # [N] fp32 CE weights (non-pad AND valid)
    m_rce: jnp.ndarray,    # [N] fp32 RCE weights (rect AND valid)
    dtype=jnp.float32,     # the Dense compute dtype (model dtype)
    block_v: int = 2048,
    with_rce: bool = True,
    stash: bool = False,   # keep the dtype logits for pass 2 + backward
    use_pallas: bool = False,  # Mosaic kernels for the sweeps (TPU only)
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """-> (ce_sum, ce_n, rce_sum, rce_n), identical in meaning to
    ``losses.sce_loss_parts(generator(x), labels, ...)`` with
    ``keep_ce = (labels != pad) * valid`` and ``m_rce = rect_mask * valid``.
    When ``with_rce=False`` the rce parts are zeros (CE-only, alpha == 1).
    ``stash`` trades a [N, V] dtype-width residual for two generator GEMMs
    (same values to float-summation order); it only takes effect under
    differentiation and for 16-bit dtypes — the primal call always
    recomputes. ``use_pallas`` routes the vocab sweeps through the
    software-pipelined Mosaic kernels (``ops.pallas_loss``) when the shapes
    are eligible (TPU backend, E % 128 == 0, big enough N/V); ``stash`` is
    then moot — the kernels overlap the recompute GEMM with the VPU sweep."""
    if _pallas_ok(use_pallas, x, wg, dtype):
        out, _ = _pallas_fwd_impl(x, wg, bg, labels, keep_ce, m_rce, dtype,
                                  with_rce)
    else:
        out, _ = _fwd_impl(x, wg, bg, labels, keep_ce, m_rce, dtype, block_v,
                           with_rce, stash=False)
    return out


# Mosaic kernel tile geometry (ops.pallas_loss). block_v is fixed at 512
# (chunk order — and therefore float-summation order — must not depend on
# dtype); block_n is chosen per kernel/dtype to fit the kernels' scoped-VMEM
# ceiling (pallas_loss._VMEM_LIMIT, 64 MiB — the compiler default of 16 MiB
# OOMed the first real-TPU compile at 17.5 MiB, and shrinking tiles to fit
# 16 MiB measured ~40% SLOWER than the XLA scans; Mosaic's actual stack runs
# ~1.3x the raw-buffer estimate below, hence budget*1.3 <= limit).
_PALLAS_BLOCK_N = 1024
_PALLAS_BLOCK_V = 512  # 1024 measured a wash (37.34 vs 37.60 ms at B=256)
_PALLAS_VMEM_BUDGET = 48_000_000  # raw-buffer bytes; ~budget*1.3 <= 64 MiB

# Row-count ceiling for the kernel dispatch, measured on v5e (round 4,
# tools/profile.py loss-ab): at N=2048 (B=64, the reference recipe) the
# kernels beat the scans 11.62 vs 12.40 ms/step (+6.7%); at N=7936 (B=256)
# they LOSE 37.6 vs 36.1 and at N=15872 78.5 vs 75.5. The loss algorithm
# needs ~9.4 ms of irreducible MXU GEMM work at B=256 (3 logits passes +
# dx + dwg) out of the scans' 12.6 ms, so hiding the VPU sweeps can win at
# most ~2-3 ms — and the kernel path gives ~1.2 ms back materializing the
# [N, V] dz tiles for its separated dwg GEMM (the scans compute dwg
# per-chunk with no HBM round trip). Below this N the dz tax shrinks with
# N while per-chunk serialization overhead doesn't, and the kernel wins.
_PALLAS_MAX_N = 4096


def _pallas_vmem_est(bn: int, e: int, dt: int, bwd: bool) -> int:
    """Raw VMEM bytes for one grid step (inputs/outputs double-buffered by
    the pipeline, scratch single): mirrors the BlockSpecs in pallas_loss."""
    bv = _PALLAS_BLOCK_V
    est = 2 * bn * e * dt          # x window
    est += 2 * bn * bv * dt        # zbuf two-slab scratch
    est += 2 * bv * dt + 64 * bn   # bias + per-row vectors/outs
    if bwd:
        est += 4 * e * bv * dt     # w rides in twice (chunk c and c-1)
        est += 2 * bn * e * 4      # dx_out (fp32)
        est += 2 * bn * bv * dt    # dz_out tiles
        est += 2 * 8 * bv * 4      # dbg 8-sublane partials (fp32)
        est += bn * e * 4          # dxacc scratch
    else:
        est += 2 * e * bv * dt     # w window
    return est


def _pallas_block_n(n: int, e: int, dtype, bwd: bool) -> int:
    from vct_tpu.ops.pallas_loss import _round_up

    dt = jnp.dtype(dtype).itemsize
    bn = min(_PALLAS_BLOCK_N, _round_up(n, 16))
    while bn > 16 and _pallas_vmem_est(bn, e, dt, bwd) > _PALLAS_VMEM_BUDGET:
        # keep 16-row (bf16 sublane) alignment while shrinking: plain
        # halving of a non-power-of-two bn (e.g. 272 -> 136) would hand
        # Mosaic a misaligned row tile and fail at lowering
        bn = max(_round_up(bn // 2, 16), 16)
    return bn

# Test hook: run the Mosaic kernels in interpreter mode on any backend so the
# full custom_vjp dispatch is exercised on CPU (tests/test_pallas_loss.py).
_INTERPRET = False


def _pallas_ok(use_pallas: bool, x, wg, dtype) -> bool:
    """Kernel eligibility — mirrors ops.attention._pallas_eligible's stance:
    the kernel must actually pay. Tiny N (tests, B=1 decode-side losses),
    big N (the dz-materialization tax outgrows the VPU-overlap win past
    ~_PALLAS_MAX_N rows — measured, see the constant's comment) and CPU
    runs ride the XLA scans. Meshes are handled by the Trainer: on a
    multi-device mesh the kernels either run per-shard under shard_map
    over 'data' (tpu.pallas_partition_kernels ->
    ``linear_sce_parts_sharded``; this gate then sees the PER-SHARD row
    count) or use_pallas is disabled in favor of the GSPMD-shardable
    scans — a bare single-device pallas_call cannot be auto-partitioned
    inside a multi-device jit."""
    if not use_pallas:
        return False
    return (
        x.ndim == 2
        and 256 <= x.shape[0] <= _PALLAS_MAX_N
        and x.shape[1] % 128 == 0
        and wg.shape[1] >= 2 * _PALLAS_BLOCK_V
        and jnp.dtype(dtype) in (jnp.dtype(jnp.bfloat16), jnp.dtype(jnp.float32))
        and (jax.default_backend() == "tpu" or _INTERPRET)
    )


def _pallas_pad_args(x, wg, bg, labels, dtype, *, bwd=False):
    """Shared fwd/bwd padding: rows to block_n (zero rows — zero per-row
    weights make them inert), vocab to block_v (bias -1e30 — exp == 0).
    block_n is footprint-fit per kernel shape (``_pallas_block_n``) —
    per-row results are bit-identical across block_n choices because every
    reduction is within-row and the vocab chunk order is fixed by block_v."""
    from vct_tpu.ops.pallas_loss import _round_up

    n = x.shape[0]
    block_n = _pallas_block_n(n, x.shape[1], dtype, bwd)
    wgp, bgp, v_pad = _pad_vocab(wg, bg, _PALLAS_BLOCK_V)
    w_dt = wgp.astype(dtype)
    b_dt = bgp.astype(dtype)[None, :]
    n_pad = _round_up(n, block_n)
    x_dt = x.astype(dtype)
    labels = labels.astype(jnp.int32)
    if n_pad != n:
        x_dt = jnp.pad(x_dt, ((0, n_pad - n), (0, 0)))
        labels = jnp.pad(labels, (0, n_pad - n))
    return x_dt, w_dt, b_dt, labels[:, None], block_n, n_pad


def _ce_parts(lse, zt, keep_ce):
    """CE sum/count from the softmax stats — shared kernel/scan epilogue."""
    ce = lse - zt
    return jnp.sum(ce * keep_ce), jnp.sum(keep_ce)


def _rce_parts(sa, cnt, v, zt, lse, m_rce):
    """Reverse-CE sum/count from the clipped-prob stats (reference
    ``model/loss.py`` SCE clip semantics) — ONE copy of the clip formula so
    the kernel and scan paths cannot silently diverge."""
    s_clip = sa + _EPS * (jnp.float32(v) - cnt)  # pad columns excluded
    pt = jnp.exp(zt - lse)
    pt_clip = jnp.maximum(pt, _EPS)
    rce = -_LOG_OFF * (s_clip - pt_clip)
    return jnp.sum(rce * m_rce), jnp.sum(m_rce)


def _pallas_fwd_impl(x, wg, bg, labels, keep_ce, m_rce, dtype, with_rce,
                     interpret=None):
    """Same contract as _fwd_impl (z_stack residual slot is always None)."""
    from vct_tpu.ops import pallas_loss

    interpret = _INTERPRET if interpret is None else interpret
    n = x.shape[0]
    v = wg.shape[1]
    x_p, w_dt, b_dt, lab_p, block_n, n_pad = _pallas_pad_args(
        x, wg, bg, labels, dtype)
    m, s, zt = pallas_loss.softmax_stats(
        x_p, w_dt, b_dt, lab_p, block_n=block_n, block_v=_PALLAS_BLOCK_V,
        interpret=interpret)
    m, s, zt = m[:n, 0], s[:n, 0], zt[:n, 0]
    lse = m + jnp.log(s)

    ce_sum, ce_n = _ce_parts(lse, zt, keep_ce)

    if with_rce:
        lse_p = jnp.pad(lse, (0, n_pad - n))[:, None]
        sa, cnt = pallas_loss.clipped_prob_stats(
            x_p, w_dt, b_dt, lse_p, block_n=block_n,
            block_v=_PALLAS_BLOCK_V, interpret=interpret)
        sa, cnt = sa[:n, 0], cnt[:n, 0]
        rce_sum, rce_n = _rce_parts(sa, cnt, v, zt, lse, m_rce)
    else:
        sa = jnp.zeros((n,), jnp.float32)
        rce_sum = jnp.zeros(())
        rce_n = jnp.zeros(())

    out = (ce_sum, ce_n, rce_sum, rce_n)
    res = (x, wg, bg, labels.astype(jnp.int32), keep_ce, m_rce, lse, zt, sa,
           None)
    return out, res


def _pallas_bwd_impl(dtype, with_rce, res, cts, interpret=None):
    """Same coefficient math as _bwd; the per-chunk sweep runs in the Mosaic
    kernel and dwg collapses to ONE XLA GEMM over the kernel's dtype-rounded
    dz tiles (the identical rounding the scan applies per chunk)."""
    from vct_tpu.ops import pallas_loss

    interpret = _INTERPRET if interpret is None else interpret
    x, wg, bg, labels, keep_ce, m_rce, lse, zt, sa, _ = res
    g_ce, _, g_rce, _ = cts
    n, e = x.shape
    v = wg.shape[1]

    pt = jnp.exp(zt - lse)
    at = (pt > _EPS).astype(jnp.float32)
    w_ce = g_ce * keep_ce
    c = (-_LOG_OFF) * g_rce * m_rce if with_rce else jnp.zeros((n,), jnp.float32)
    base = c * (at * pt - sa)
    lab_term = w_ce + c * at * pt
    u = w_ce + base

    x_p, w_dt, b_dt, lab_p, block_n, n_pad = _pallas_pad_args(
        x, wg, bg, labels, dtype, bwd=True)

    def row(vec):
        return jnp.pad(vec.astype(jnp.float32), (0, n_pad - n))[:, None]

    dx, dz, dbg_parts = pallas_loss.sce_backward_tiles(
        x_p, w_dt, b_dt, row(lse), row(u), row(c), row(lab_term), lab_p,
        block_n=block_n, block_v=_PALLAS_BLOCK_V, interpret=interpret)
    dx = dx[:n]
    dwg = jax.lax.dot_general(
        x_p, dz, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )[:, :v]
    dbg = jnp.sum(dbg_parts[::8], axis=0)[:v]  # one row per 8-sublane group

    import numpy as np

    return (
        dx.astype(x.dtype),
        dwg.astype(wg.dtype),
        dbg.astype(bg.dtype),
        np.zeros(labels.shape, jax.dtypes.float0),
        jnp.zeros_like(keep_ce),
        jnp.zeros_like(m_rce),
    )


def _stash_on(dtype, stash: bool) -> bool:
    return bool(stash) and jnp.dtype(dtype).itemsize <= 2


def _fwd_impl(x, wg, bg, labels, keep_ce, m_rce, dtype, block_v, with_rce,
              stash):
    n = x.shape[0]
    v = wg.shape[1]
    wgp, bgp, v_pad = _pad_vocab(wg, bg, block_v)
    n_chunks = v_pad // block_v
    labels = labels.astype(jnp.int32)

    def pass1(carry, ci):
        m, s, zt = carry
        start = ci * block_v
        z16 = _chunk_logits_dt(x, wgp, bgp, start, block_v, dtype)
        z = z16.astype(jnp.float32)
        cmax = jnp.max(z, axis=-1)
        m_new = jnp.maximum(m, cmax)
        s = s * jnp.exp(m - m_new) + jnp.sum(jnp.exp(z - m_new[:, None]), axis=-1)
        loc = labels - start
        in_chunk = (loc >= 0) & (loc < block_v)
        z_at = jnp.take_along_axis(
            z, jnp.clip(loc, 0, block_v - 1)[:, None], axis=-1
        )[:, 0]
        zt = jnp.where(in_chunk, z_at, zt)
        return (m_new, s, zt), (z16 if stash else None)

    init = (jnp.full((n,), -jnp.inf, jnp.float32),
            jnp.zeros((n,), jnp.float32),
            jnp.zeros((n,), jnp.float32))
    (m, s, zt), z_stack = jax.lax.scan(pass1, init, jnp.arange(n_chunks))
    lse = m + jnp.log(s)

    ce_sum, ce_n = _ce_parts(lse, zt, keep_ce)

    if with_rce:
        # pass 2: SA = sum of unclipped probs, cnt = #clipped (p <= eps);
        # S = SA + eps * cnt, minus the v_pad - v all-zero pad columns
        def pass2(carry, xs):
            sa, cnt = carry
            if stash:
                z = xs.astype(jnp.float32)
            else:
                z = _chunk_logits(x, wgp, bgp, xs * block_v, block_v, dtype)
            p = jnp.exp(z - lse[:, None])
            above = p > _EPS
            sa = sa + jnp.sum(jnp.where(above, p, 0.0), axis=-1)
            cnt = cnt + jnp.sum(above.astype(jnp.float32), axis=-1)
            return (sa, cnt), None

        (sa, cnt), _ = jax.lax.scan(
            pass2,
            (jnp.zeros((n,), jnp.float32), jnp.zeros((n,), jnp.float32)),
            z_stack if stash else jnp.arange(n_chunks),
        )
        rce_sum, rce_n = _rce_parts(sa, cnt, v, zt, lse, m_rce)
    else:
        sa = jnp.zeros((n,), jnp.float32)
        rce_sum = jnp.zeros(())
        rce_n = jnp.zeros(())

    out = (ce_sum, ce_n, rce_sum, rce_n)
    res = (x, wg, bg, labels, keep_ce, m_rce, lse, zt, sa, z_stack)
    return out, res


def _fwd(x, wg, bg, labels, keep_ce, m_rce, dtype, block_v, with_rce, stash,
         use_pallas):
    if _pallas_ok(use_pallas, x, wg, dtype):
        return _pallas_fwd_impl(x, wg, bg, labels, keep_ce, m_rce, dtype,
                                with_rce)
    return _fwd_impl(x, wg, bg, labels, keep_ce, m_rce, dtype, block_v,
                     with_rce, _stash_on(dtype, stash))


def _bwd(dtype, block_v, with_rce, stash, use_pallas, res, cts):
    # the fwd/bwd dispatch must agree; re-derive the predicate from the
    # residuals (same shapes the fwd saw)
    if _pallas_ok(use_pallas, res[0], res[1], dtype):
        return _pallas_bwd_impl(dtype, with_rce, res, cts)
    return _scan_bwd(dtype, block_v, with_rce, stash, res, cts)


def _scan_bwd(dtype, block_v, with_rce, stash, res, cts):
    x, wg, bg, labels, keep_ce, m_rce, lse, zt, sa, z_stack = res
    stash = _stash_on(dtype, stash)
    g_ce, _, g_rce, _ = cts  # counts don't depend on differentiable inputs
    n, e = x.shape
    v = wg.shape[1]
    wgp, bgp, v_pad = _pad_vocab(wg, bg, block_v)
    n_chunks = v_pad // block_v

    pt = jnp.exp(zt - lse)
    at = (pt > _EPS).astype(jnp.float32)  # clip pass-through at the label
    w_ce = g_ce * keep_ce                                       # [N]
    # rce_i = -log_off * (S_i - clip(p_t)); c_i multiplies d(S - p_t)/dz
    c = (-_LOG_OFF) * g_rce * m_rce if with_rce else jnp.zeros((n,), jnp.float32)
    # dS/dz_k = p_k (a_k - SA);  d clip(p_t)/dz_k = a_t p_t (1[k=t] - p_k)
    # => dz_k = w_ce (p_k - 1[k=t]) + c [ p_k (a_k - SA + a_t p_t) - 1[k=t] a_t p_t ]
    base = c * (at * pt - sa)                                    # [N]
    lab_term = w_ce + c * at * pt                                # coeff of -1[k=t]

    def bwd_chunk(carry, xs):
        dx, dwg, dbg = carry
        if stash:
            ci, z16 = xs
            z = z16.astype(jnp.float32)
        else:
            ci = xs
            z = _chunk_logits(x, wgp, bgp, ci * block_v, block_v, dtype)
        start = ci * block_v
        p = jnp.exp(z - lse[:, None])
        a = (p > _EPS).astype(jnp.float32)
        dz = p * (w_ce[:, None] + c[:, None] * a + base[:, None])
        loc = labels - start
        in_chunk = (loc >= 0) & (loc < block_v)
        onehot_w = jnp.where(in_chunk, lab_term, 0.0)
        dz = _scatter_sub(dz, jnp.clip(loc, 0, block_v - 1), onehot_w)
        dz_dt = dz.astype(dtype)
        w = jax.lax.dynamic_slice_in_dim(wgp, start, block_v, axis=1)
        dx = dx + jax.lax.dot_general(
            dz_dt, w.astype(dtype), (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        dwg_c = jax.lax.dot_general(
            x.astype(dtype), dz_dt, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        dbg_c = jnp.sum(dz, axis=0)
        # in-place slice updates on the carried buffers (no [n_chunks, E,
        # block_v] stack + relayout)
        dwg = jax.lax.dynamic_update_slice_in_dim(dwg, dwg_c, start, axis=1)
        dbg = jax.lax.dynamic_update_slice_in_dim(dbg, dbg_c, start, axis=0)
        return (dx, dwg, dbg), None

    (dx, dwg, dbg), _ = jax.lax.scan(
        bwd_chunk,
        (jnp.zeros((n, e), jnp.float32),
         jnp.zeros((e, v_pad), jnp.float32),
         jnp.zeros((v_pad,), jnp.float32)),
        (jnp.arange(n_chunks), z_stack) if stash else jnp.arange(n_chunks),
    )
    dwg = dwg[:, :v]
    dbg = dbg[:v]

    import numpy as np

    return (
        dx.astype(x.dtype),
        dwg.astype(wg.dtype),
        dbg.astype(bg.dtype),
        np.zeros(labels.shape, jax.dtypes.float0),  # int labels: no tangent
        jnp.zeros_like(keep_ce),          # masks derive from bools upstream
        jnp.zeros_like(m_rce),
    )


def _scatter_sub(dz, idx, w):
    """dz[i, idx[i]] -= w[i] without a gather/scatter (iota compare keeps it
    a fused elementwise op on TPU)."""
    cols = jax.lax.broadcasted_iota(jnp.int32, dz.shape, 1)
    return dz - jnp.where(cols == idx[:, None], w[:, None], 0.0)


linear_sce_parts.defvjp(_fwd, _bwd)


def linear_sce_parts_sharded(
    mesh, axis, x, wg, bg, labels, keep_ce, m_rce, dtype=jnp.float32,
    block_v: int = 2048, with_rce: bool = True, stash: bool = False,
    use_pallas: bool = False,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """``linear_sce_parts`` inside a multi-device jit.

    Mosaic kernels are single-device programs, so (exactly like
    ``pallas_attention.fused_attention_trainable_sharded``) the whole
    custom_vjp is wrapped in a ``shard_map`` over the mesh's batch axis: the
    loss rows are embarrassingly parallel, each shard runs the unmodified
    fwd/bwd on its N/n row slice, and the four SUM outputs are ``psum``-med —
    the only collective. Generator params replicate in; shard_map's
    transpose psums their per-shard cotangents back, which is the same
    gradient reduction GSPMD inserts for the scan path. Per-shard row counts
    feed ``_pallas_ok``, so the N<=4096 kernel-win window applies to the
    PER-DEVICE batch — the B=64/chip recipe (2048 rows/chip) stays on the
    kernels on any DP mesh instead of silently reverting to the scans
    (round-4 VERDICT #4).
    """
    from jax.experimental.shard_map import shard_map
    from jax.sharding import PartitionSpec as P

    n_dev = mesh.shape[axis]
    n = x.shape[0]
    if n % n_dev:
        raise ValueError(f"rows {n} not divisible by mesh axis '{axis}'={n_dev}")

    def inner(x, wg, bg, labels, keep_ce, m_rce):
        parts = linear_sce_parts(
            x, wg, bg, labels, keep_ce, m_rce, dtype, block_v, with_rce,
            stash, use_pallas,
        )
        return tuple(jax.lax.psum(p, axis) for p in parts)

    fn = shard_map(
        inner, mesh=mesh,
        in_specs=(P(axis, None), P(None, None), P(None), P(axis), P(axis),
                  P(axis)),
        out_specs=(P(), P(), P(), P()),
        check_rep=False,
    )
    return fn(x, wg, bg, labels, keep_ce, m_rce)


def linear_sce_parts_auto(
    x, wg, bg, labels, keep_ce, m_rce, dtype=jnp.float32, block_v: int = 2048,
    with_rce: bool = True, stash: bool = False, use_pallas: bool = False,
    partition_kernels: bool = False,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Call-site dispatcher mirroring ``ops.attention``'s stance: when the
    model opted into ``partition_kernels`` and the Trainer registered a
    multi-device mesh (``parallel.mesh.set_kernel_mesh``), route through the
    shard_map wrapper over 'data'; otherwise the plain custom_vjp (GSPMD
    shards its scans freely when the kernels are off)."""
    if use_pallas and partition_kernels:
        from vct_tpu.parallel.mesh import get_kernel_mesh

        mesh = get_kernel_mesh()
        if (
            mesh is not None
            and mesh.size > 1
            and "data" in mesh.shape
            and mesh.shape["data"] > 1
        ):
            if x.shape[0] % mesh.shape["data"] == 0:
                return linear_sce_parts_sharded(
                    mesh, "data", x, wg, bg, labels, keep_ce, m_rce, dtype,
                    block_v, with_rce, stash, use_pallas,
                )
            # Rows don't tile the data axis: a single-device pallas_call
            # cannot be auto-partitioned by GSPMD inside this multi-device
            # jit (it fails at lowering), so force the scan path — XLA
            # shards scans freely and the loss parts are identical.
            use_pallas = False
    return linear_sce_parts(
        x, wg, bg, labels, keep_ce, m_rce, dtype, block_v, with_rce, stash,
        use_pallas,
    )
