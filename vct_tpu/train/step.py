"""Jitted train/val steps over the device mesh.

One compiled program per task; the global batch arrives sharded over the
mesh's ``data`` axis and GSPMD inserts the gradient all-reduce over ICI —
the TPU equivalent of the reference's DDP ``backward()`` + NCCL bucketing
(``/root/reference/train.py:123-126,218``). The loss the step returns is
already the global mean, which also covers the reference's explicit
``dist.all_reduce(loss)/world_size`` logging reduction (``train.py:129-131``).
"""

from __future__ import annotations

import functools
from typing import Any, Callable, Dict, List, Tuple

import jax
import jax.numpy as jnp
import optax

from vct_tpu.models.mmt4caption import MMT4Caption
from vct_tpu.train.state import TrainState


def _task_loss(model, variables, task, batch, *, deterministic, rngs=None):
    feats: List[jnp.ndarray] = batch["feats"]
    masks = batch.get("masks")
    row_valid = batch.get("row_valid")
    if task == "caption":
        loss = model.apply(
            variables, feats, masks, batch["token_ids"], batch["token_mask"],
            deterministic=deterministic, rngs=rngs, row_valid=row_valid,
            method=MMT4Caption.caption_loss,
        )
        return loss, {"loss": loss, "cap_loss": loss}
    if task == "match":
        loss = model.apply(
            variables, feats, masks, batch["text_feat"],
            deterministic=deterministic, rngs=rngs, row_valid=row_valid,
            method=MMT4Caption.match_loss,
        )
        return loss, {"loss": loss, "match_loss": loss}
    if task == "cross":
        loss, cap, match = model.apply(
            variables, feats, masks, batch["token_ids"], batch["token_mask"],
            batch["text_feat"], deterministic=deterministic, rngs=rngs,
            row_valid=row_valid, method=MMT4Caption.cross_loss,
        )
        return loss, {"loss": loss, "cap_loss": cap, "match_loss": match}
    raise ValueError(f"unknown task {task}")


def make_train_step(
    model: MMT4Caption, optimizer: optax.GradientTransformation, task: str
) -> Callable[[TrainState, Dict[str, Any]], Tuple[TrainState, Dict[str, jnp.ndarray]]]:
    # On TPU, draw dropout masks with the hardware RNG ('rbg' keys: XLA
    # RngBitGenerator for the bits, threefry for split/fold_in). Threefry mask
    # generation costs ~3 ms/step at B=64 and ~29 ms at B=256 on v5e — 16-35%
    # of the whole train step (measured; now tools/profile.py train). The swap
    # changes which bernoulli stream dropout sees (any stream is equally
    # valid) but keeps param-init and data-order reproducibility (state.rng
    # stays threefry). Off-TPU keeps threefry so the CPU-mesh DDP-equivalence
    # tests stay bit-comparable across mesh shapes.
    use_hw_rng = jax.default_backend() == "tpu"

    # donate the incoming state: params/opt buffers are updated in place on
    # device instead of double-buffered (halves train-state HBM footprint)
    @functools.partial(jax.jit, donate_argnums=(0,))
    def step(state: TrainState, batch: Dict[str, Any]):
        rng, dropout_rng = jax.random.split(state.rng)
        if use_hw_rng:
            data = (
                dropout_rng
                if jnp.issubdtype(dropout_rng.dtype, jnp.uint32)
                else jax.random.key_data(dropout_rng)
            )
            # an rbg key needs exactly 4 words; don't assume the incoming
            # key is 2-word threefry (jax_default_prng_impl=rbg hands us 4)
            if data.shape[-1] != 4:
                data = jnp.tile(data, 4 // data.shape[-1])
            dropout_rng = jax.random.wrap_key_data(data, impl="rbg")

        def loss_fn(params):
            variables = {"params": params, "buffers": state.buffers}
            return _task_loss(
                model, variables, task, batch,
                deterministic=False, rngs={"dropout": dropout_rng},
            )

        (loss, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(state.params)
        updates, opt_state = optimizer.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        new_state = state.replace(
            params=params, opt_state=opt_state, step=state.step + 1, rng=rng
        )
        return new_state, metrics

    return step


def make_eval_step(model: MMT4Caption, task: str):
    """Deterministic forward-only validation step (reference ``val_epoch``,
    ``train.py:152-168``). Returns exact SUM/COUNT parts — not per-batch
    means — so the caller's aggregation is independent of how the split was
    batched (collate filler rows contribute nothing; a split of size B+1
    scores the same batched [B, 1] or [B+1])."""

    @jax.jit
    def step(variables, batch):
        feats = batch["feats"]
        masks = batch.get("masks")
        row_valid = batch.get("row_valid")
        n_valid = (
            jnp.sum(row_valid.astype(jnp.float32))
            if row_valid is not None
            else jnp.asarray(float(feats[0].shape[0]))
        )
        if task == "caption":
            ce_sum, ce_n, rce_sum, rce_n = model.apply(
                variables, feats, masks, batch["token_ids"], batch["token_mask"],
                row_valid=row_valid, method=MMT4Caption.caption_loss_parts,
            )
            return {"ce_sum": ce_sum, "ce_n": ce_n,
                    "rce_sum": rce_sum, "rce_n": rce_n}
        if task == "match":
            loss = model.apply(
                variables, feats, masks, batch["text_feat"],
                row_valid=row_valid, method=MMT4Caption.match_loss,
            )
            return {"match_sum": loss * n_valid, "match_n": n_valid}
        if task == "cross":
            ce_sum, ce_n, rce_sum, rce_n, match = model.apply(
                variables, feats, masks, batch["token_ids"], batch["token_mask"],
                batch["text_feat"], row_valid=row_valid,
                method=MMT4Caption.cross_loss_parts,
            )
            return {"ce_sum": ce_sum, "ce_n": ce_n,
                    "rce_sum": rce_sum, "rce_n": rce_n,
                    "match_sum": match * n_valid, "match_n": n_valid}
        raise ValueError(f"unknown task {task}")

    return step


def combine_eval_parts(task: str, agg: Dict[str, float], *, sce_alpha: float,
                       loss_beta: float) -> Dict[str, float]:
    """Host-side reduction of summed eval-step parts -> metric dict with the
    reference's keys (loss / cap_loss / match_loss)."""
    out: Dict[str, float] = {}
    if "ce_sum" in agg:
        ce = agg["ce_sum"] / max(agg["ce_n"], 1.0)
        rce = agg["rce_sum"] / max(agg["rce_n"], 1.0)
        out["cap_loss"] = sce_alpha * ce + (1.0 - sce_alpha) * rce
    if "match_sum" in agg:
        out["match_loss"] = agg["match_sum"] / max(agg["match_n"], 1.0)
    if task == "caption":
        out["loss"] = out["cap_loss"]
    elif task == "match":
        out["loss"] = out["match_loss"]
    else:
        out["loss"] = (
            loss_beta * out["cap_loss"] + (1.0 - loss_beta) * out["match_loss"]
        )
    return out


def batch_to_arrays(batch, text_encoder=None) -> Dict[str, Any]:
    """collate.Batch -> the dict the jitted steps consume."""
    import numpy as np

    b = batch.feats[0].shape[0]
    out: Dict[str, Any] = {
        "feats": [jnp.asarray(f) for f in batch.feats],
        "masks": [jnp.asarray(m) for m in batch.masks],
        # leading-rows-real mask (static shape: no recompile across batches).
        # None (not 0) means "all rows real": collate always sets n_valid>=1,
        # and `or b` would silently count filler rows if a future constructor
        # left the field at a falsy default.
        "row_valid": jnp.asarray(
            np.arange(b) < (b if batch.n_valid is None else batch.n_valid)),
    }
    if batch.token_ids is not None:
        out["token_ids"] = jnp.asarray(batch.token_ids)
        out["token_mask"] = jnp.asarray(batch.token_mask)
    if text_encoder is not None:
        out["text_feat"] = jnp.asarray(text_encoder(list(batch.captions)))
    return out
