"""Scaled dot-product attention core.

Semantics match ``torch.nn.functional.multi_head_attention_forward`` (the
compute inside the reference's ``nn.TransformerEncoder/DecoderLayer``,
``/root/reference/model/MMEncoder.py:236-238`` and ``CapDecoder.py:17-24``):
``softmax(q @ k^T / sqrt(d_head) + bias)`` with dropout on the attention
weights, then ``@ v``.

TPU notes:
  * logits and softmax are computed in float32 regardless of the compute dtype
    (bfloat16 matmuls hit the MXU; the softmax reduction stays accurate),
  * masking uses a large-finite negative instead of ``-inf`` so fully-masked
    rows produce a uniform distribution instead of NaN (the reference inherits
    torch's NaN behavior; no shipped config ever creates a fully-masked row),
  * a Pallas fused kernel handles the hot no-dropout path when enabled
    (``vct_tpu.ops.pallas_attention``); this module is the XLA reference path
    and the fallback on CPU.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp

NEG_INF = -1e30

# Test/dryrun escape hatch: force the fused-kernel dispatch on a non-TPU
# backend with the kernels running in Pallas interpret mode, so the virtual
# 8-device CPU mesh can exercise the shard_mapped TRAINING path end-to-end
# (tests/test_parallel.py, __graft_entry__.dryrun_multichip). Never set in
# production: on TPU the gate below picks the kernel by measured
# profitability, and interpret mode is orders of magnitude slower.
FORCE_PALLAS_INTERPRET = False


def padding_bias(key_padding_mask: Optional[jnp.ndarray]) -> Optional[jnp.ndarray]:
    """[B, Tk] bool (True = PAD, the reference convention per
    ``dataloader.py:246``) -> additive [B, 1, 1, Tk] float32 bias."""
    if key_padding_mask is None:
        return None
    bias = jnp.where(key_padding_mask, NEG_INF, 0.0).astype(jnp.float32)
    return bias[:, None, None, :]


def causal_bias(length: int) -> jnp.ndarray:
    """Additive [1, 1, T, T] causal bias (reference
    ``utils.generate_square_subsequent_mask``, ``utils.py:63-66``)."""
    mask = jnp.tril(jnp.ones((length, length), dtype=bool))
    return jnp.where(mask, 0.0, NEG_INF).astype(jnp.float32)[None, None, :, :]


def combine_bias(*biases: Optional[jnp.ndarray]) -> Optional[jnp.ndarray]:
    out = None
    for b in biases:
        if b is None:
            continue
        out = b if out is None else out + b
    return out


def _pallas_eligible(q, k, deterministic, return_weights) -> bool:
    # Training is served too (round 2): the trainable wrapper carries a
    # custom_vjp with a Pallas backward and in-kernel dropout, so
    # deterministic is no longer a dispatch criterion.
    #
    # Shape criterion (round-3 trace finding): the kernel's grid is (B, H) —
    # one program per batch-head — so at short sequences each program does
    # [Tq, Tk, D]-sized work that is dwarfed by per-program overhead. At the
    # flagship's training shapes (S=31, B=256) the 8 kernel calls cost
    # ~8.3 ms/step against near-zero analytic FLOPs, and switching them to
    # XLA took the train step 51.8 -> 36.3 ms (+43% samples/s, identical
    # loss). The kernel's win is avoiding the [B, H, Tq, Tk] logits HBM
    # round-trip, which only pays once the score tile is large; gate on
    # Tq*Tk >= 128*128 so long-sequence configs keep the fused path while
    # the short caption/frame sequences ride XLA's fusions.
    del deterministic
    if FORCE_PALLAS_INTERPRET:
        # keep the structural exclusions (weights return, matvec steps) but
        # drop the profitability/backend gates — the point is coverage
        return not return_weights and q.shape[1] > 1
    return (
        not return_weights
        and q.shape[1] > 1  # single-token decode steps are matvecs; XLA wins
        and q.shape[1] * k.shape[1] >= 128 * 128
        and jax.default_backend() == "tpu"
    )


def dot_product_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    bias: Optional[jnp.ndarray] = None,
    *,
    dropout_rate: float = 0.0,
    dropout_rng: Optional[jax.Array] = None,
    deterministic: bool = True,
    return_weights: bool = False,
    use_pallas: bool = False,
    partition_kernels: bool = False,
    fast_math: bool = False,
) -> Tuple[jnp.ndarray, Optional[jnp.ndarray]]:
    """Attention over [B, T, H, D] tensors.

    Returns (output [B, Tq, H, D], weights [B, H, Tq, Tk] mean-ready or None).
    ``use_pallas`` opts the hot path into the fused kernel,
    ``partition_kernels`` additionally opts it into the shard_map wrapper
    when a multi-device mesh is registered — both threaded down from
    ``TPUConfig`` per model, so two models with different settings coexist.
    The kernel-mesh registry (``parallel.mesh.set_kernel_mesh``) is the only
    ambient state and is consulted ONLY by models that set
    ``partition_kernels``; models that never opted in are unaffected by it.
    """
    # fast_math routes to the XLA path below, which honors it: the Pallas
    # kernel keeps its fp32 softmax schedule, and silently ignoring the flag
    # on kernel-eligible shapes would mix statistic precisions across the
    # shape-dependent dispatch (same rule as the decode dispatch guard).
    if (use_pallas and not fast_math
            and _pallas_eligible(q, k, deterministic, return_weights)):
        from vct_tpu.ops.pallas_attention import (
            fused_attention_trainable,
            fused_attention_trainable_sharded,
        )

        kernel_mesh = None
        if partition_kernels:
            from vct_tpu.parallel.mesh import get_kernel_mesh

            kernel_mesh = get_kernel_mesh()

        interpret = FORCE_PALLAS_INTERPRET

        def call(rate, q, k, v, bias, keep):
            # the Pallas backward returns a ZERO bias cotangent (flash-style
            # recompute never materializes d_logits, and every bias in this
            # framework is a causal/padding mask constant). Make that
            # explicit: a future LEARNED bias (ALiBi-style) must not
            # silently train with zero gradients on this path while the XLA
            # fallback below the shape gate trains it correctly.
            if bias is not None:
                bias = jax.lax.stop_gradient(bias)
            if kernel_mesh is not None and kernel_mesh.size > 1:
                # multi-device jit: shard_map the kernel over the batch axis
                # (set via parallel.mesh.set_kernel_mesh when
                # tpu.pallas_partition_kernels is enabled)
                return fused_attention_trainable_sharded(
                    kernel_mesh, "data", rate, interpret, q, k, v, bias, keep
                )
            return fused_attention_trainable(rate, interpret, q, k, v, bias, keep)

        if deterministic:
            # no-dropout path, still differentiable (rate-0 trainable wrapper:
            # same kernel work; residuals are just the input refs). A plain
            # non-vjp kernel here would crash jax.grad of a deterministic loss.
            return call(0.0, q, k, v, bias, None), None
        rate = float(dropout_rate)
        keep = None
        if rate > 0.0:
            if dropout_rng is None:
                raise ValueError("dropout_rng required for non-deterministic attention")
            # the SAME bernoulli draw as the XLA path below — the two paths
            # produce bit-comparable dropout under a shared rng
            keep = jax.random.bernoulli(
                dropout_rng, 1.0 - rate,
                (q.shape[0], q.shape[2], q.shape[1], k.shape[1]),
            )
        return call(rate, q, k, v, bias, keep), None

    dtype = q.dtype
    d_head = q.shape[-1]
    # [B, H, Tq, Tk] logits: fp32 for torch parity; fast_math
    # (tpu.fast_numerics, opt-in) keeps them in the compute dtype — halves
    # the score-tensor HBM traffic and runs the softmax VPU pass at native
    # width. bf16 shares fp32's exponent range, so the NEG_INF mask bias and
    # the softmax max-subtraction stay well-behaved.
    acc = dtype if (fast_math and dtype != jnp.float32) else jnp.float32
    scale = 1.0 / jnp.sqrt(jnp.asarray(d_head, dtype=acc))

    logits = jnp.einsum("bqhd,bkhd->bhqk", q, k, preferred_element_type=acc)
    logits = logits * scale
    if bias is not None:
        logits = logits + bias.astype(acc)

    weights = jax.nn.softmax(logits, axis=-1)

    dropped = weights
    if dropout_rate > 0.0 and not deterministic:
        if dropout_rng is None:
            raise ValueError("dropout_rng required for non-deterministic attention")
        keep = jax.random.bernoulli(dropout_rng, 1.0 - dropout_rate, weights.shape)
        dropped = jnp.where(keep, weights / (1.0 - dropout_rate), 0.0)

    out = jnp.einsum(
        "bhqk,bkhd->bqhd", dropped.astype(dtype), v, preferred_element_type=jnp.float32
    ).astype(dtype)
    if return_weights:
        # torch's need_weights=True returns the pre-dropout weights averaged
        # over heads; keep per-head here, callers reduce.
        return out, weights
    return out, None
