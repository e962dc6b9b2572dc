"""Train state + orbax checkpointing.

The reference saves bare ``state_dict`` files with no optimizer/epoch/RNG
state, so "resume" means re-finetune (SURVEY.md §5 checkpoint/resume). Here a
checkpoint is the complete training state — params, buffers, optimizer state,
epoch, step, PRNG key — written with orbax, making training preemption-safe
(the failure-recovery story the reference lacks). Plain ``.pth`` checkpoints
still enter through ``vct_tpu.convert``.
"""

from __future__ import annotations

import dataclasses
import os
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np


@dataclasses.dataclass
class TrainState:
    params: Dict[str, Any]
    buffers: Dict[str, Any]
    opt_state: Any
    step: jnp.ndarray  # scalar int32
    rng: jax.Array

    @property
    def variables(self) -> Dict[str, Any]:
        return {"params": self.params, "buffers": self.buffers}

    def replace(self, **kw) -> "TrainState":
        return dataclasses.replace(self, **kw)


jax.tree_util.register_dataclass(
    TrainState, data_fields=["params", "buffers", "opt_state", "step", "rng"], meta_fields=[]
)


def make_train_state(variables: Dict[str, Any], optimizer, seed: int = 666) -> TrainState:
    params = variables["params"]
    return TrainState(
        params=params,
        buffers=variables.get("buffers", {}),
        opt_state=optimizer.init(params),
        step=jnp.asarray(0, jnp.int32),
        rng=jax.random.PRNGKey(seed),
    )


# ---------------------------------------------------------------------------
# orbax persistence
# ---------------------------------------------------------------------------


def _checkpointer():
    import orbax.checkpoint as ocp

    return ocp.PyTreeCheckpointer()


def save_checkpoint(path: str, state: TrainState, *, epoch: int = 0, force: bool = True,
                    run_ctl: Optional[Dict[str, float]] = None) -> None:
    """``run_ctl`` carries flat float scalars of run-control state (earlystop
    best/counter, scheduler internals) so a resumed run makes the same
    save/stop/LR decisions as an uninterrupted one — the reference loses all
    of this on restart (its checkpoints are bare state_dicts)."""
    payload = {
        "params": state.params,
        "buffers": state.buffers,
        "opt_state": state.opt_state,
        "step": state.step,
        "rng": state.rng,
        "epoch": jnp.asarray(epoch, jnp.int32),
    }
    if run_ctl:
        # float64 numpy scalars: run-control values (LRs, metric bests) must
        # round-trip exactly, and jnp would silently downcast to float32
        payload["run_ctl"] = {
            k: np.asarray(v, np.float64) for k, v in run_ctl.items()
        }
    _checkpointer().save(os.path.abspath(path), payload, force=force)


def restore_checkpoint(path: str, template_state: TrainState, epoch: int = 0,
                       run_ctl_template: Optional[Dict[str, float]] = None):
    """-> (TrainState, epoch, run_ctl dict or None). ``template_state``
    supplies the tree structure. ``run_ctl`` is restored only when BOTH the
    caller provides a template and the checkpoint carries it (round-1
    checkpoints predate run_ctl and restore as None)."""
    import orbax.checkpoint as ocp

    template = {
        "params": template_state.params,
        "buffers": template_state.buffers,
        "opt_state": template_state.opt_state,
        "step": template_state.step,
        "rng": template_state.rng,
        "epoch": jnp.asarray(epoch, jnp.int32),
    }
    abspath = os.path.abspath(path)
    want_ctl = False
    if run_ctl_template:
        try:
            meta_tree = _checkpointer().metadata(abspath).item_metadata.tree
            want_ctl = "run_ctl" in meta_tree
        except Exception:
            want_ctl = False
        if want_ctl:
            template["run_ctl"] = {
                k: np.asarray(v, np.float64) for k, v in run_ctl_template.items()
            }

    restored = _checkpointer().restore(abspath, args=ocp.args.PyTreeRestore(template))
    state = TrainState(
        params=restored["params"],
        buffers=restored["buffers"],
        opt_state=restored["opt_state"],
        step=restored["step"],
        rng=restored["rng"],
    )
    run_ctl = None
    if want_ctl:
        run_ctl = {k: float(v) for k, v in restored["run_ctl"].items()}
    return state, int(restored["epoch"]), run_ctl


def save_params_only(path: str, variables: Dict[str, Any]) -> None:
    """Inference-weight export (the reference's .pth analog)."""
    _checkpointer().save(
        os.path.abspath(path),
        {"params": variables["params"], "buffers": variables.get("buffers", {})},
        force=True,
    )


def restore_params_only(path: str, template_variables: Dict[str, Any]) -> Dict[str, Any]:
    import orbax.checkpoint as ocp

    template = {
        "params": template_variables["params"],
        "buffers": template_variables.get("buffers", {}),
    }
    restored = _checkpointer().restore(
        os.path.abspath(path),
        args=ocp.args.PyTreeRestore(template, partial_restore=True),
    )
    return restored
