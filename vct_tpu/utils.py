"""Small host-side utilities (reference ``utils.py`` leftovers that are not
config/earlystop/masking — those live in ``config.py``, ``train/earlystop.py``
and ``ops/attention.py`` respectively)."""

from __future__ import annotations

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


def setup_seed(seed: int = 666) -> None:
    """Seed host RNGs (reference ``setup_seed``, ``utils.py:115-123``; 666 at
    ``train.py:308``). Device randomness is explicit PRNG keys in JAX, so the
    reference's cudnn-determinism knobs have no equivalent — XLA is
    deterministic by default."""
    random.seed(seed)
    np.random.seed(seed)
