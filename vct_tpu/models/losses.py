"""Loss functions: SCE caption loss and CLIP symmetric contrastive losses.

Pure jnp functions (no modules) mirroring ``/root/reference/model/loss.py``:

* ``cross_entropy`` — torch ``nn.CrossEntropyLoss(ignore_index=pad)``: mean of
  ``-log_softmax[label]`` over non-pad labels.
* ``sce_loss`` — Symmetric CE (``loss.py:69-92``): ``alpha * CE + beta * RCE``
  where RCE uses a clamped one-hot. Quirk preserved: the reference averages the
  RCE term over *all* positions of the padded [B, S-1] rectangle, pads
  included (``loss.py:91`` ``rce.mean()``), while CE ignores pads. Under
  vct_tpu's static shapes the rectangle is wider than the reference's ragged
  per-batch one, so callers pass ``rect_mask`` selecting the positions that
  exist inside the reference's rectangle (j < batch-max caption length - 1);
  this keeps the loss value bit-comparable.
* ``clip_symmetric_loss`` / ``clip_symmetric_loss_wds`` (``loss.py:7-66``):
  L2-normalize both sides, BxB similarity, symmetric CE both directions,
  averaged. The WDS variant multiplies by a dual softmax. NOTE the reference
  crashes when no temperature is configured (SURVEY.md quirk #3,
  ``loss.py:13-16,27``) — the shipped configs' exact situation; here "no
  temperature" means "no scaling", which is the only sane reading.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp

NEG_INF = -1e30  # large-finite mask value (matches ops.attention.NEG_INF)


def cross_entropy_parts(
    logits: jnp.ndarray,
    labels: jnp.ndarray,
    ignore_index: int = 0,
    valid: Optional[jnp.ndarray] = None,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """-> (nll sum, contributing count) over non-ignored positions.

    ``valid`` [N] bool additionally restricts to real (non-filler) positions —
    the reference never has filler rows (its batches are ragged), so excluding
    them is required for parity on vct_tpu's fixed rectangles.
    Exposing sum+count (not just the mean) lets ``val_epoch`` aggregate
    split-level losses exactly, independent of batching.
    """
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    nll = -jnp.take_along_axis(logp, labels[:, None], axis=-1)[:, 0]
    keep = (labels != ignore_index).astype(jnp.float32)
    if valid is not None:
        keep = keep * valid.astype(jnp.float32)
    return jnp.sum(nll * keep), jnp.sum(keep)


def cross_entropy(
    logits: jnp.ndarray,
    labels: jnp.ndarray,
    ignore_index: int = 0,
    valid: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """logits [N, V] fp-any, labels [N] int -> scalar mean over non-ignored."""
    s, n = cross_entropy_parts(logits, labels, ignore_index, valid)
    return s / jnp.maximum(n, 1.0)


def sce_loss_parts(
    logits: jnp.ndarray,
    labels: jnp.ndarray,
    *,
    ignore_index: int = 0,
    rect_mask: Optional[jnp.ndarray] = None,
    valid: Optional[jnp.ndarray] = None,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """-> (ce_sum, ce_n, rce_sum, rce_n): the two SCE terms as exact
    sum/count pairs so callers can form the mean per batch (train) or
    aggregate across batches without batching bias (val)."""
    ce_sum, ce_n = cross_entropy_parts(logits, labels, ignore_index, valid)

    p = jax.nn.softmax(logits.astype(jnp.float32), axis=-1)
    p = jnp.clip(p, 1e-7, 1.0)
    # log(clamped one-hot): 0 at the label, log(1e-4) elsewhere ->
    # rce_i = -log(1e-4) * (sum_j p_ij - p_i[label])  (p is clamped, so the sum
    # is computed explicitly rather than assumed to be 1).
    log_off = jnp.log(jnp.asarray(1e-4, jnp.float32))
    p_label = jnp.take_along_axis(p, labels[:, None], axis=-1)[:, 0]
    rce = -(jnp.sum(p, axis=-1) - p_label) * log_off
    if rect_mask is None:
        m = jnp.ones_like(rce)
    else:
        m = rect_mask.astype(jnp.float32)
    if valid is not None:
        m = m * valid.astype(jnp.float32)
    return ce_sum, ce_n, jnp.sum(rce * m), jnp.sum(m)


def sce_loss(
    logits: jnp.ndarray,
    labels: jnp.ndarray,
    *,
    alpha: float,
    beta: float,
    ignore_index: int = 0,
    rect_mask: Optional[jnp.ndarray] = None,
    valid: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """Symmetric cross-entropy over flattened positions.

    logits [N, V], labels [N]; ``rect_mask`` [N] bool selects positions inside
    the reference's ragged rectangle (None = all positions); ``valid`` [N]
    bool excludes filler positions entirely (both terms).
    """
    ce_sum, ce_n, rce_sum, rce_n = sce_loss_parts(
        logits, labels, ignore_index=ignore_index, rect_mask=rect_mask, valid=valid
    )
    ce = ce_sum / jnp.maximum(ce_n, 1.0)
    rce_mean = rce_sum / jnp.maximum(rce_n, 1.0)
    return alpha * ce + beta * rce_mean


def _l2_normalize(x: jnp.ndarray) -> jnp.ndarray:
    return x / jnp.linalg.norm(x.astype(jnp.float32), axis=-1, keepdims=True)


def _symmetric_ce(sim: jnp.ndarray, valid: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """Symmetric CE over a [B, B] similarity matrix. ``valid`` [B] bool
    restricts to the leading real sub-batch: filler rows/columns (repeated row
    0 from ``collate``) must act as neither anchors nor negatives — the result
    then equals the loss over the [B', B'] sub-matrix, which is exactly what
    the reference computes on its ragged final batch."""
    b = sim.shape[0]
    targets = jnp.arange(b)
    if valid is not None:
        # large-finite (not -inf): filler rows then softmax to a uniform
        # distribution instead of NaN, and their nll is weighted out below
        col_bias = jnp.where(valid, 0.0, NEG_INF).astype(jnp.float32)
        sim = sim + col_bias[None, :] + col_bias[:, None]
    logp_v = jax.nn.log_softmax(sim, axis=-1)
    logp_t = jax.nn.log_softmax(sim.T, axis=-1)
    nll_v = -jnp.take_along_axis(logp_v, targets[:, None], axis=-1)[:, 0]
    nll_t = -jnp.take_along_axis(logp_t, targets[:, None], axis=-1)[:, 0]
    if valid is None:
        return (jnp.mean(nll_v) + jnp.mean(nll_t)) / 2.0
    w = valid.astype(jnp.float32)
    n = jnp.maximum(jnp.sum(w), 1.0)
    return (jnp.sum(nll_v * w) + jnp.sum(nll_t * w)) / (2.0 * n)


def clip_symmetric_loss(
    video: jnp.ndarray,
    text: jnp.ndarray,
    temperature: Optional[jnp.ndarray] = None,
    valid: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """CSL (``loss.py:18-35``): sim scaled by ``exp(temperature)`` when given."""
    v = _l2_normalize(video)
    t = _l2_normalize(text)
    sim = v @ t.T
    if temperature is not None:
        sim = sim * jnp.exp(temperature.astype(jnp.float32))
    return _symmetric_ce(sim, valid)


def clip_symmetric_loss_wds(
    video: jnp.ndarray,
    text: jnp.ndarray,
    temperature: Optional[jnp.ndarray] = None,
    valid: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """CSL with dual softmax (``loss.py:52-66``). The reference's ``Matching``
    calls ``loss_fn(text_feat, vid_feat)`` (``Matching.py:27-30``), so its
    ``softmax(sim, dim=0)`` normalizes over *texts per video*. Here the
    argument order is (video, text) — ``sim[i, j] = vid_i · text_j`` is the
    reference matrix transposed — so the equivalent normalization is
    ``axis=1``; the symmetric CE itself is transpose-invariant. Temperature is
    required in the reference; default 1.0 here when absent."""
    v = _l2_normalize(video)
    t = _l2_normalize(text)
    sim = v @ t.T
    tem = jnp.asarray(1.0, jnp.float32) if temperature is None else temperature.astype(jnp.float32)
    if valid is None:
        sim = sim * jax.nn.softmax(sim / tem, axis=1) * sim.shape[0]
        return _symmetric_ce(sim)
    # dual softmax over the valid sub-batch only, scaled by the REAL batch
    # size (the reference multiplies by len(sim) of its ragged batch)
    col_bias = jnp.where(valid, 0.0, NEG_INF).astype(jnp.float32)
    n_valid = jnp.sum(valid.astype(jnp.float32))
    sim = sim * jax.nn.softmax(sim / tem + col_bias[None, :], axis=1) * n_valid
    return _symmetric_ce(sim, valid)
