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
    if task == "caption":
        loss = model.apply(
            variables, feats, masks, batch["token_ids"], batch["token_mask"],
            deterministic=deterministic, rngs=rngs, method=MMT4Caption.caption_loss,
        )
        return loss, {"loss": loss, "cap_loss": loss}
    if task == "match":
        loss = model.apply(
            variables, feats, masks, batch["text_feat"],
            deterministic=deterministic, rngs=rngs, method=MMT4Caption.match_loss,
        )
        return loss, {"loss": loss, "match_loss": loss}
    if task == "cross":
        loss, cap, match = model.apply(
            variables, feats, masks, batch["token_ids"], batch["token_mask"],
            batch["text_feat"], deterministic=deterministic, rngs=rngs,
            method=MMT4Caption.cross_loss,
        )
        return loss, {"loss": loss, "cap_loss": cap, "match_loss": match}
    raise ValueError(f"unknown task {task}")


def make_train_step(
    model: MMT4Caption, optimizer: optax.GradientTransformation, task: str
) -> Callable[[TrainState, Dict[str, Any]], Tuple[TrainState, Dict[str, jnp.ndarray]]]:
    # donate the incoming state: params/opt buffers are updated in place on
    # device instead of double-buffered (halves train-state HBM footprint)
    @functools.partial(jax.jit, donate_argnums=(0,))
    def step(state: TrainState, batch: Dict[str, Any]):
        rng, dropout_rng = jax.random.split(state.rng)

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
    """Deterministic forward-only loss (reference ``val_epoch``,
    ``train.py:152-168``)."""

    @jax.jit
    def step(variables, batch):
        _, metrics = _task_loss(model, variables, task, batch, deterministic=True)
        return metrics

    return step


def batch_to_arrays(batch, text_encoder=None) -> Dict[str, Any]:
    """collate.Batch -> the dict the jitted steps consume."""
    out: Dict[str, Any] = {
        "feats": [jnp.asarray(f) for f in batch.feats],
        "masks": [jnp.asarray(m) for m in batch.masks],
    }
    if batch.token_ids is not None:
        out["token_ids"] = jnp.asarray(batch.token_ids)
        out["token_mask"] = jnp.asarray(batch.token_mask)
    if text_encoder is not None:
        out["text_feat"] = jnp.asarray(text_encoder(list(batch.captions)))
    return out
