"""Device mesh and sharding helpers — the reference's distributed layer,
re-designed for TPU.

The reference does single-node data parallelism with torch DDP over NCCL:
process-per-GPU, ``DistributedSampler`` feeding per-rank shards, bucketed
gradient all-reduce inside ``backward()`` and explicit ``dist.all_reduce`` /
``barrier`` calls in the epoch loop (``/root/reference/utils.py:137-146``,
``train.py:218,129,246``). On TPU none of that machinery survives:

* one process sees the whole ``jax.sharding.Mesh``; axes ``('data', 'model')``
  — ``data`` is the DDP-equivalent axis, ``model`` carries tensor
  parallelism (``tpu.mesh_model``; Megatron FFN split + vocab-sharded LM
  head via ``_TP_RULES`` below),
* the *global* batch is laid out with ``NamedSharding(P('data'))``; GSPMD
  splits it across devices and inserts the gradient ``psum`` over ICI
  automatically when the jitted train step averages the loss,
* parameters and optimizer moments are placed by ``shard_train_state``:
  replicated like DDP replicas at ``model=1``, TP-sharded otherwise,
* there are no barriers: XLA's dataflow is the synchronization.

Multi-chip correctness is exercised on a virtual 8-device CPU mesh in
``tests/test_parallel.py`` and by ``__graft_entry__.dryrun_multichip``.
"""

from __future__ import annotations

from typing import Any, Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(data: int = -1, model: int = 1, devices: Optional[Sequence] = None) -> Mesh:
    """Build a ('data', 'model') mesh. ``data=-1`` = all remaining devices."""
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if data == -1:
        if n % model:
            raise ValueError(f"{n} devices not divisible by model={model}")
        data = n // model
    if data * model > n:
        raise ValueError(f"mesh {data}x{model} needs {data*model} devices, have {n}")
    if 1 < data * model < n:
        # underuse is legal (-ws deliberately caps the mesh) but must not be
        # silent — a config typo here halves throughput with no other signal
        import warnings

        warnings.warn(
            f"mesh {data}x{model} uses {data * model} of {n} visible devices; "
            f"the remaining {n - data * model} idle",
            stacklevel=2,
        )
    arr = np.asarray(devices[: data * model]).reshape(data, model)
    return Mesh(arr, ("data", "model"))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P("data"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch_arrays(mesh: Mesh, tree: Any) -> Any:
    """device_put every array leaf with batch-dim sharding over 'data'."""
    sh = batch_sharding(mesh)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sh), tree)


def replicate(mesh: Mesh, tree: Any) -> Any:
    sh = replicated(mesh)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sh), tree)


# ---------------------------------------------------------------------------
# tensor parallelism over the 'model' axis
# ---------------------------------------------------------------------------

# Megatron-style shardings (Shoeybi et al. 2019; the scaling-book recipe):
# FFN column-split linear1 / row-split linear2 — the GELU between them stays
# local and GSPMD inserts ONE reduce after linear2 — plus a vocab-sharded
# LM head (each chip scores V/model tokens; the softmax/logsumexp reduction
# rides a psum over 'model'). Attention and embeddings stay replicated: at
# this model scale (E=768, H=8) head-splitting buys less than its collective
# costs, and the [V, E] embedding is 23 MB. Matched by path suffix so the
# SAME rules cover params and their optimizer moments (mu/nu mirror the
# param tree). Rules only fire when the sharded dim divides evenly.
_TP_RULES = (
    (("generator", "kernel"), P(None, "model")),
    (("generator", "bias"), P("model")),
    (("linear1", "kernel"), P(None, "model")),
    (("linear1", "bias"), P("model")),
    (("linear2", "kernel"), P("model", None)),
)


def _path_names(path) -> tuple:
    names = []
    for p in path:
        if hasattr(p, "key"):
            names.append(str(p.key))
        elif hasattr(p, "name"):
            names.append(str(p.name))
    return tuple(names)


def tp_spec(path_names: tuple, leaf, model_size: int) -> P:
    """PartitionSpec for one param/moment leaf under 'model'-axis TP."""
    if model_size <= 1 or not hasattr(leaf, "ndim"):
        return P()
    for suffix, spec in _TP_RULES:
        if path_names[-len(suffix):] == suffix and leaf.ndim == len(spec):
            divisible = all(
                leaf.shape[i] % model_size == 0
                for i, ax in enumerate(spec)
                if ax == "model"
            )
            if divisible:
                return spec
    return P()


# Mesh the Pallas kernels should shard_map over when traced inside a
# multi-device jit (set by the Trainer when tpu.pallas_partition_kernels is
# on). A registry rather than a per-call argument because the kernels sit at
# the bottom of the flax module tree, which has no mesh in scope; consulted
# only at trace time, and ONLY by models whose TPUConfig sets
# pallas_partition_kernels — models that never opted in are unaffected.
# Last-set-wins: two concurrently-traced opted-in Trainers with different
# meshes would clobber each other (don't do that in one process), and the
# registry is not part of the jit cache key, so re-register before
# re-tracing an opted-in model against a different mesh.
_KERNEL_MESH: Optional[Mesh] = None


def set_kernel_mesh(mesh: Optional[Mesh]) -> None:
    global _KERNEL_MESH
    _KERNEL_MESH = mesh


def get_kernel_mesh() -> Optional[Mesh]:
    return _KERNEL_MESH


def shard_train_state(mesh: Mesh, state: Any) -> Any:
    """device_put a train-state (or variables) pytree for the 2-D mesh:
    TP rules over 'model' for params and optimizer moments, everything else
    replicated. Degenerates to ``replicate`` when the model axis is 1."""
    model_size = mesh.shape.get("model", 1)

    def put(path, leaf):
        spec = tp_spec(_path_names(path), leaf, model_size)
        return jax.device_put(leaf, NamedSharding(mesh, spec))

    return jax.tree_util.tree_map_with_path(put, state)
