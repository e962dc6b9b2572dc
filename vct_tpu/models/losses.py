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

from typing import Optional

import jax
import jax.numpy as jnp


def cross_entropy(
    logits: jnp.ndarray, labels: jnp.ndarray, ignore_index: int = 0
) -> jnp.ndarray:
    """logits [N, V] fp-any, labels [N] int -> scalar mean over non-ignored."""
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    nll = -jnp.take_along_axis(logp, labels[:, None], axis=-1)[:, 0]
    keep = (labels != ignore_index).astype(jnp.float32)
    return jnp.sum(nll * keep) / jnp.maximum(jnp.sum(keep), 1.0)


def sce_loss(
    logits: jnp.ndarray,
    labels: jnp.ndarray,
    *,
    alpha: float,
    beta: float,
    ignore_index: int = 0,
    rect_mask: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """Symmetric cross-entropy over flattened positions.

    logits [N, V], labels [N]; ``rect_mask`` [N] bool selects positions inside
    the reference's ragged rectangle (None = all positions).
    """
    ce = cross_entropy(logits, labels, ignore_index)

    p = jax.nn.softmax(logits.astype(jnp.float32), axis=-1)
    p = jnp.clip(p, 1e-7, 1.0)
    # log(clamped one-hot): 0 at the label, log(1e-4) elsewhere ->
    # rce_i = -log(1e-4) * (sum_j p_ij - p_i[label])  (p is clamped, so the sum
    # is computed explicitly rather than assumed to be 1).
    log_off = jnp.log(jnp.asarray(1e-4, jnp.float32))
    p_label = jnp.take_along_axis(p, labels[:, None], axis=-1)[:, 0]
    rce = -(jnp.sum(p, axis=-1) - p_label) * log_off
    if rect_mask is None:
        rce_mean = jnp.mean(rce)
    else:
        m = rect_mask.astype(jnp.float32)
        rce_mean = jnp.sum(rce * m) / jnp.maximum(jnp.sum(m), 1.0)
    return alpha * ce + beta * rce_mean


def _l2_normalize(x: jnp.ndarray) -> jnp.ndarray:
    return x / jnp.linalg.norm(x.astype(jnp.float32), axis=-1, keepdims=True)


def _symmetric_ce(sim: jnp.ndarray) -> jnp.ndarray:
    b = sim.shape[0]
    targets = jnp.arange(b)
    logp_v = jax.nn.log_softmax(sim, axis=-1)
    logp_t = jax.nn.log_softmax(sim.T, axis=-1)
    loss_v = -jnp.mean(jnp.take_along_axis(logp_v, targets[:, None], axis=-1))
    loss_t = -jnp.mean(jnp.take_along_axis(logp_t, targets[:, None], axis=-1))
    return (loss_v + loss_t) / 2.0


def clip_symmetric_loss(
    video: jnp.ndarray,
    text: jnp.ndarray,
    temperature: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """CSL (``loss.py:18-35``): sim scaled by ``exp(temperature)`` when given."""
    v = _l2_normalize(video)
    t = _l2_normalize(text)
    sim = v @ t.T
    if temperature is not None:
        sim = sim * jnp.exp(temperature.astype(jnp.float32))
    return _symmetric_ce(sim)


def clip_symmetric_loss_wds(
    video: jnp.ndarray,
    text: jnp.ndarray,
    temperature: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """CSL with dual softmax (``loss.py:52-66``): ``sim * softmax(sim/tem,
    axis=0) * B`` before the symmetric CE. Temperature is required in the
    reference; default 1.0 here when absent."""
    v = _l2_normalize(video)
    t = _l2_normalize(text)
    sim = v @ t.T
    tem = jnp.asarray(1.0, jnp.float32) if temperature is None else temperature.astype(jnp.float32)
    sim = sim * jax.nn.softmax(sim / tem, axis=0) * sim.shape[0]
    return _symmetric_ce(sim)
