"""Small host-side utilities (reference ``utils.py`` leftovers that are not
config/earlystop/masking — those live in ``config.py``, ``train/earlystop.py``
and ``ops/attention.py`` respectively)."""

from __future__ import annotations

import os
import random

import numpy as np


def show_input_shape(**kwargs) -> None:
    """Debug shape printer (reference ``show_input_shape``, ``utils.py:69-79``),
    generalized to anything with ``.shape`` plus dicts/lists of such."""
    print("\n" + "*" * 39)
    for name, arg in kwargs.items():
        if hasattr(arg, "shape"):
            print(f"{name}: {arg.shape}")
        elif isinstance(arg, dict):
            print(f"{name}: " + "  ".join(
                f"{k}:{getattr(v, 'shape', v)}" for k, v in arg.items()))
        elif isinstance(arg, (list, tuple)):
            print(f"{name}: [" + ", ".join(
                str(getattr(v, "shape", v)) for v in arg) + "]")
    print("*" * 39 + "\n")


def enable_compilation_cache(cache_dir: str | None = None) -> str:
    """Point JAX's persistent compilation cache at ``cache_dir`` (default
    ``~/.cache/vct_tpu/jax``; ``JAX_COMPILATION_CACHE_DIR`` wins if set) and
    return the directory used.

    The production decode kernels are large straight-line Mosaic programs —
    the multi-token kernel takes 1-6 min to compile through a remote-compile
    relay (measured: unroll=2 55 s, unroll=4 195-334 s) — but the cache is
    hit across processes (verified on the relay toolchain), so every entry
    point that launches them calls this first and only the first-ever run
    pays. No-op if the application already configured a cache dir."""
    import jax

    cache_dir = (os.environ.get("JAX_COMPILATION_CACHE_DIR") or cache_dir
                 or os.path.expanduser("~/.cache/vct_tpu/jax"))
    if jax.config.jax_compilation_cache_dir is None:
        os.makedirs(cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
    return jax.config.jax_compilation_cache_dir


def setup_seed(seed: int = 666) -> None:
    """Seed host RNGs (reference ``setup_seed``, ``utils.py:115-123``; 666 at
    ``train.py:308``). Device randomness is explicit PRNG keys in JAX, so the
    reference's cudnn-determinism knobs have no equivalent — XLA is
    deterministic by default."""
    random.seed(seed)
    np.random.seed(seed)
