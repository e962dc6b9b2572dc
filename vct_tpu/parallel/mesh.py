"""Device mesh and sharding helpers — the reference's distributed layer,
re-designed for TPU.

The reference does single-node data parallelism with torch DDP over NCCL:
process-per-GPU, ``DistributedSampler`` feeding per-rank shards, bucketed
gradient all-reduce inside ``backward()`` and explicit ``dist.all_reduce`` /
``barrier`` calls in the epoch loop (``/root/reference/utils.py:137-146``,
``train.py:218,129,246``). On TPU none of that machinery survives:

* one process sees the whole ``jax.sharding.Mesh``; axes ``('data', 'model')``
  — ``data`` is the DDP-equivalent axis, ``model`` is reserved for tensor
  parallelism (size 1 at this model scale, but every sharding below is
  written against the 2-D mesh so scaling it up is a config change),
* the *global* batch is laid out with ``NamedSharding(P('data'))``; GSPMD
  splits it across devices and inserts the gradient ``psum`` over ICI
  automatically when the jitted train step averages the loss,
* parameters are replicated (``P()``) exactly like DDP replicas,
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
