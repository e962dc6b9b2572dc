"""Optimizers, LR schedules, and task-freezing masks.

Mirrors the reference recipe (``/root/reference/train.py:20-47``):
Adam / AdamW / SGD selected by ``train.optimizer.name``, CosineAnnealingLR or
ReduceLROnPlateau stepped **per epoch** (``train.py:239``). The schedulers are
host-side objects with exact torch semantics; the per-epoch LR is pushed into
the optimizer through ``optax.inject_hyperparams``, so the jitted step never
recompiles on LR changes.

Selective parameter freezing replaces the reference's ``requires_grad``
flipping (``MMT4Caption.py:189-211``): ``freeze_mask`` labels the parameter
tree by task and ``optax.multi_transform`` zeroes updates for frozen subtrees
— functionally identical, but expressed on the optimizer (the idiomatic JAX
split; the loss still flows through frozen modules exactly as in torch).
"""

from __future__ import annotations

import math
from typing import Any, Dict, Optional, Tuple

import jax
import optax

from vct_tpu.config import TrainConfig


# ---------------------------------------------------------------------------
# host-side schedulers (torch semantics, stepped per epoch)
# ---------------------------------------------------------------------------


class CosineAnnealingLR:
    """torch.optim.lr_scheduler.CosineAnnealingLR:
    lr(e) = eta_min + (base - eta_min) * (1 + cos(pi * e / T_max)) / 2."""

    def __init__(self, base_lr: float, T_max: int, eta_min: float = 0.0):
        self.base_lr = base_lr
        self.T_max = T_max
        self.eta_min = eta_min
        self.epoch = 0

    def step(self) -> float:
        self.epoch += 1
        return self.lr

    @property
    def lr(self) -> float:
        return (
            self.eta_min
            + (self.base_lr - self.eta_min)
            * (1 + math.cos(math.pi * self.epoch / self.T_max))
            / 2
        )

    # run-control checkpointing (flat float scalars; see state.save_checkpoint)
    def state_dict(self) -> Dict[str, float]:
        return {"epoch": float(self.epoch)}

    def load_state_dict(self, sd: Dict[str, float]) -> None:
        self.epoch = int(sd["epoch"])


class ReduceLROnPlateau:
    """torch.optim.lr_scheduler.ReduceLROnPlateau (min mode, default
    threshold=1e-4 in 'rel' mode: improvement iff metric < best * (1 - 1e-4),
    matching torch's ``_is_better``)."""

    def __init__(self, base_lr: float, factor: float = 0.1, patience: int = 10,
                 min_lr: float = 0.0, threshold: float = 1e-4):
        self.current = base_lr
        self.factor = factor
        self.patience = patience
        self.min_lr = min_lr
        self.threshold = threshold
        self.best: Optional[float] = None
        self.bad_epochs = 0

    def step(self, metric: float) -> float:
        if self.best is None or metric < self.best * (1.0 - self.threshold):
            self.best = metric
            self.bad_epochs = 0
        else:
            self.bad_epochs += 1
            if self.bad_epochs > self.patience:
                self.current = max(self.current * self.factor, self.min_lr)
                self.bad_epochs = 0
        return self.lr

    @property
    def lr(self) -> float:
        return self.current

    def state_dict(self) -> Dict[str, float]:
        return {
            "current": float(self.current),
            "best": float("nan") if self.best is None else float(self.best),
            "bad_epochs": float(self.bad_epochs),
        }

    def load_state_dict(self, sd: Dict[str, float]) -> None:
        self.current = float(sd["current"])
        self.best = None if math.isnan(sd["best"]) else float(sd["best"])
        self.bad_epochs = int(sd["bad_epochs"])


class ConstantLR:
    def __init__(self, base_lr: float):
        self.base_lr = base_lr

    def step(self, *_: Any) -> float:
        return self.base_lr

    @property
    def lr(self) -> float:
        return self.base_lr

    def state_dict(self) -> Dict[str, float]:
        return {}

    def load_state_dict(self, sd: Dict[str, float]) -> None:
        pass


def build_scheduler(cfg: TrainConfig):
    s = cfg.lr_scheduler
    base = cfg.optimizer.learning_rate
    if s.name == "CosineAnnealingLR":
        return CosineAnnealingLR(base, s.T_max, s.eta_min)
    if s.name == "ReduceLROnPlateau":
        return ReduceLROnPlateau(base, s.factor, s.patience)
    return ConstantLR(base)


# ---------------------------------------------------------------------------
# optimizer
# ---------------------------------------------------------------------------


def _base_optimizer(cfg: TrainConfig) -> optax.GradientTransformation:
    o = cfg.optimizer

    @optax.inject_hyperparams
    def make(learning_rate):
        if o.name == "adam":
            if o.weight_decay:
                # the reference dispatch: name 'adam' with weight_decay != 0
                # builds torch.optim.AdamW (train.py:22-31) — decoupled
                # decay, which optax.adamw matches (pinned vs torch in
                # tests/test_train.py)
                return optax.adamw(
                    learning_rate, b1=o.beta[0], b2=o.beta[1],
                    weight_decay=o.weight_decay,
                )
            return optax.adam(learning_rate, b1=o.beta[0], b2=o.beta[1])
        if o.name == "adamw":
            return optax.adamw(
                learning_rate, b1=o.beta[0], b2=o.beta[1], weight_decay=o.weight_decay
            )
        if o.name == "sgd":
            return optax.sgd(learning_rate, momentum=o.momentum or None)
        raise ValueError(f"unsupported optimizer: {o.name}")

    return make(o.learning_rate)


def freeze_labels(params: Dict, task: str) -> Dict:
    """Label tree: 'train' / 'frozen' per top-level module, following
    MMT4Caption.mode (``MMT4Caption.py:189-211``): caption freezes matching,
    match freezes cap_decoder, cross trains both."""
    frozen_roots = {
        "caption": {"matching"},
        "match": {"cap_decoder"},
        "cross": set(),
    }[task]

    def label(root):
        tag = "frozen" if root in frozen_roots else "train"
        return jax.tree_util.tree_map(lambda _: tag, params[root])

    return {k: label(k) for k in params}


def build_optimizer(cfg: TrainConfig, params: Optional[Dict] = None) -> optax.GradientTransformation:
    """Optimizer with task-freezing applied when ``params`` is given."""
    base = _base_optimizer(cfg)
    if params is None:
        return base
    labels = freeze_labels(params, cfg.task)
    return optax.multi_transform(
        {"train": base, "frozen": optax.set_to_zero()}, labels
    )


def set_learning_rate(opt_state, lr: float):
    """Push a host-scheduler LR into an inject_hyperparams state in-place-ish."""

    def visit(s):
        if hasattr(s, "hyperparams") and "learning_rate" in s.hyperparams:
            s.hyperparams["learning_rate"] = jax.numpy.asarray(
                lr, s.hyperparams["learning_rate"].dtype
            )
        return s

    return jax.tree_util.tree_map(
        visit, opt_state, is_leaf=lambda s: hasattr(s, "hyperparams")
    )


def current_learning_rate(opt_state) -> Optional[float]:
    found = []

    def visit(s):
        if hasattr(s, "hyperparams") and "learning_rate" in s.hyperparams:
            found.append(float(s.hyperparams["learning_rate"]))
        return s

    jax.tree_util.tree_map(visit, opt_state, is_leaf=lambda s: hasattr(s, "hyperparams"))
    return found[0] if found else None
