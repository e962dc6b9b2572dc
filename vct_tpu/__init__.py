"""vct_tpu — a TPU-native (JAX/XLA/Pallas/pjit) video-captioning framework.

Re-designed from scratch with the capability surface of the reference
Video-Captioning-Transformer (Kamino666), but built TPU-first:

* Flax models with static shapes, jitted end to end.
* KV-cached greedy/beam decoding as ``lax.while_loop`` (the reference re-runs
  the full decoder per token, ``/root/reference/model/CapDecoder.py:62-79``).
* Data parallelism via ``jax.sharding.Mesh`` + NamedSharding collectives over
  ICI (the reference uses torch DDP/NCCL, ``/root/reference/utils.py:137-146``).
* Pallas fused-attention kernels for the hot path.
* Pure-Python caption metrics (the reference shells out to Java,
  ``/root/reference/eval.py:11-15``).
"""

__version__ = "0.1.0"

from vct_tpu.config import Config, load_config  # noqa: F401
